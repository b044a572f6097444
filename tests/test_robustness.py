"""Regressions for pipeline-robustness fixes: collator overflow valves,
loader resilience, full-pass detection eval, BoxNet training, oversized-scene
inference export."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.data.collate import PadScheme


class TestDetectionCollateOverflow:
    def test_subsamples_instead_of_crashing(self):
        from pointcontrast_tpu.detect.datasets import (
            SyntheticDetectionDataset,
            collate_detection,
        )

        ds = SyntheticDetectionDataset(num_scenes=2, num_objects=4,
                                       num_points=6000, seed=0)
        scheme = PadScheme(npad0=2048)  # far below 2 x 6000 potential voxels
        batch = collate_detection([ds[0], ds[1]], voxel_size=0.02,
                                  scheme=scheme)
        npad0 = scheme.npads[0]
        assert batch.voxel_feats.shape[0] == npad0
        pvi = np.asarray(batch.point_voxel_idx)
        assert pvi.shape == (2, 6000)
        assert pvi.max() <= npad0 - 1  # orphaned points -> pad row
        assert (pvi == npad0 - 1).any()
        # non-orphaned points map to real (one-feature) voxel rows
        valid = np.asarray(batch.voxel_pyramid.levels[0].valid)
        live = pvi[pvi < npad0 - 1]
        assert valid[live].all()


class TestLoaderResilience:
    def test_producer_survives_sample_errors(self):
        from pointcontrast_tpu.data import PairLoader, SyntheticPairDataset

        class Flaky(SyntheticPairDataset):
            def __getitem__(self, idx, rng=None):
                if idx == 1:
                    raise RuntimeError("transient sample failure")
                return super().__getitem__(idx, rng=rng)

        ds = Flaky(num_pairs=3, points_per_frame=300, seed=0)
        loader = PairLoader(ds, batch_size=1, scheme=PadScheme(npad0=2048),
                            mode="nce", npos=32, num_workers=1, seed=0,
                            shuffle=False)
        got_error = False
        got_batches = 0
        for _ in range(6):
            try:
                b = next(loader)
                got_batches += 1
            except RuntimeError:
                got_error = True
        loader.close()
        assert got_error, "the bad sample's error must surface"
        assert got_batches >= 3, "the producer must keep delivering batches"


class TestBoxNetTrains:
    def test_boxnet_step_runs(self):
        from pointcontrast_tpu.detect.datasets import (
            SyntheticDetectionDataset,
            collate_detection,
        )
        from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
        from pointcontrast_tpu.detect.votenet import BoxNet

        ds = SyntheticDetectionDataset(num_scenes=1, num_objects=3,
                                       num_points=1500, seed=0)
        dc = ds.dc
        batch = collate_detection([ds[0]])
        model = BoxNet(
            num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
            num_size_cluster=dc.num_size_cluster,
            mean_size_arr=dc.mean_size_arr, num_proposal=16,
        )
        trainer = DetectTrainer(model, dc, DetectConfig(learning_rate=1e-4),
                                batch)
        state, metrics = trainer._step(trainer.state, batch)
        m = jax.device_get(metrics)
        assert np.isfinite(float(m["loss"]))
        assert float(m["vote_loss"]) == 0.0  # BoxNet has no voting branch


class TestVotenetEpochEval:
    def test_epoch_visits_every_scene_once(self):
        from pointcontrast_tpu.apps.votenet import _BatchLoader
        from pointcontrast_tpu.detect.datasets import SyntheticDetectionDataset

        ds = SyntheticDetectionDataset(num_scenes=5, num_objects=2,
                                       num_points=500, seed=0)
        loader = _BatchLoader(ds, batch_size=2)
        sizes = [b.point_clouds.shape[0] for b in loader.epoch()]
        assert sizes == [2, 2, 1]
        # deterministic: a second pass is identical
        again = [b.point_clouds.shape[0] for b in loader.epoch()]
        assert again == sizes


class TestOversizedSceneInference:
    def test_test_model_keeps_every_point(self, tmp_path):
        import optax

        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.semseg.datasets.synthetic import (
            SyntheticSemsegDataset,
        )
        from pointcontrast_tpu.semseg.dataset import collate_semseg
        from pointcontrast_tpu.semseg.test import test_model
        from pointcontrast_tpu.train.state import create_train_state

        ds = SyntheticSemsegDataset(num_scenes=1, points=3000)
        scheme = PadScheme(npad0=1024)  # deliberately smaller than the scene
        sample = ds.__getitem__(0, rng=np.random.RandomState(0))
        n_voxels = len(sample[0])
        assert n_voxels > scheme.npads[0] - 1, "fixture must overflow"

        model = load_model("Res16UNet14A")(in_channels=3,
                                           out_channels=ds.num_classes)
        batch = collate_semseg([sample], PadScheme(npad0=4096),
                               rng=np.random.RandomState(0))
        state = create_train_state(jax.random.PRNGKey(0), model,
                                   optax.sgd(0.1), (batch.feats, batch.pyramid))
        out = test_model(state, ds, ds.num_classes, scheme,
                         save_pred_dir=str(tmp_path))
        assert np.isfinite(out["miou"])
        import os

        pred = np.load(os.path.join(str(tmp_path), "pred_0000_00.npy"))
        # every voxelized point exported, 1:1 with the scene's coords
        redone = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert len(pred) == len(redone[0])
