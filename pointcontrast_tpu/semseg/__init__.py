"""Semantic-segmentation application (ScanNet / Stanford S3DIS finetuning).

Mirrors the reference downstream/semseg app (SURVEY.md section 2.3):
voxelization datasets + augmentation, CE training with PolyLR and lenient
pretrain-weight transfer, mIoU/AP eval with full-pointcloud label transfer.
"""

from pointcontrast_tpu.semseg.voxelizer import Voxelizer
from pointcontrast_tpu.semseg import transforms
from pointcontrast_tpu.semseg.dataset import (
    VoxelizationDataset,
    SemsegBatch,
    collate_semseg,
    SemsegLoader,
)
from pointcontrast_tpu.semseg.datasets import load_dataset, DATASETS
