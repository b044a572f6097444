"""Data pipeline: host-side datasets, augmentation, correspondence matching,
and fixed-shape batching feeding the jitted TPU step.

Replaces the reference L2 layer (pretrain/pointcontrast/lib/ddp_data_loaders.py,
lib/transforms.py, lib/data_sampler.py) with a TPU-first design: every batch
is collated to *static bucketed shapes* (coords/features/kernel maps/sampled
pair indices), so the XLA program never recompiles and never syncs back to
the host mid-step.
"""

from pointcontrast_tpu.data.transforms import Compose, Jitter
from pointcontrast_tpu.data.matching import radius_matches
from pointcontrast_tpu.data.pair_dataset import (
    ScanNetMatchPairDataset,
    SyntheticPairDataset,
    sample_random_trans,
    rotation_matrix,
)
from pointcontrast_tpu.data.collate import (
    PadScheme,
    PairBatch,
    collate_pair,
    sample_nce_pairs,
    sample_hardest_contrastive,
)
from pointcontrast_tpu.data.sampler import InfSampler, DistributedInfSampler
from pointcontrast_tpu.data.loader import PairLoader
