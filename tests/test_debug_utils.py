"""Validation + checkify utilities."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
from pointcontrast_tpu.semseg.dataset import collate_semseg
from pointcontrast_tpu.semseg.datasets.synthetic import SyntheticSemsegDataset
from pointcontrast_tpu.utils.debug import checkify_step, validate_batch


class TestValidateBatch:
    def test_pair_batch_valid(self):
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=400, seed=0)
        b = collate_pair([ds[0]], PadScheme(npad0=1024), mode="nce", npos=32,
                         rng=np.random.RandomState(0), fuse_frames=True)
        assert validate_batch(b)

    def test_semseg_batch_valid(self):
        ds = SyntheticSemsegDataset(num_scenes=1, points=500, seed=0)
        b = collate_semseg([ds[0]], PadScheme(npad0=2048))
        assert validate_batch(b)

    def test_corrupted_batch_rejected(self):
        ds = SyntheticSemsegDataset(num_scenes=1, points=500, seed=0)
        b = collate_semseg([ds[0]], PadScheme(npad0=2048))
        bad_feats = np.asarray(b.feats).copy()
        bad_feats[-1] = 1.0  # poke a padded row
        bad = b.replace(feats=bad_feats)
        with pytest.raises(AssertionError):
            validate_batch(bad)


class TestCheckify:
    def test_nan_detected(self):
        def step(state, batch):
            return state, {"loss": batch / (batch - batch)}  # 0/0 -> nan

        run = checkify_step(step)
        with pytest.raises(Exception):
            run(0.0, 1.0)

    def test_clean_step_passes(self):
        def step(state, batch):
            return state + 1.0, {"loss": batch * 2.0}

        run = checkify_step(step)
        state, metrics = run(0.0, 3.0)
        assert float(metrics["loss"]) == 6.0
