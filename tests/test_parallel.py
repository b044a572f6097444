"""Data-parallel correctness on the virtual CPU mesh."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
from pointcontrast_tpu.nn.res16unet import Res16UNetBase
from pointcontrast_tpu.nn.resnet_block import BasicBlock
from pointcontrast_tpu.parallel import make_mesh, replicate, shard_batch
from pointcontrast_tpu.parallel.mesh import data_parallel_step
from pointcontrast_tpu.train import PretrainConfig, make_train_step
from pointcontrast_tpu.train import optim
from pointcontrast_tpu.train.state import create_train_state


class TinyUNet(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
    INIT_DIM = 4


def _make_state(batch, lr=0.1):
    model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)
    cfg = PretrainConfig(mode="nce", npos=64, lr=lr)
    tx = optim.make_optimizer(
        "sgd", cfg.lr, optim.exp_lr(cfg.exp_gamma, cfg.lr_update_freq), cfg
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0)
    )
    return state, cfg


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
class TestDataParallel:
    def test_replicated_batch_matches_single_device(self):
        """Identical per-device batches: the pmean'd update must equal the
        single-device update exactly (gradients identical on each shard)."""
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=500, seed=0)
        scheme = PadScheme(npad0=2048)
        rng = np.random.RandomState(0)
        local = collate_pair([ds[0]], scheme, mode="nce", npos=64, rng=rng,
                             fuse_frames=True)
        state, cfg = _make_state(local)
        step = make_train_step(cfg)

        # single device
        s1, m1 = jax.jit(lambda s, b: step(s, b, axis_name=None))(state, local)

        # 2-device mesh with the SAME batch on both shards
        n = 2
        stacked = jax.tree.map(
            lambda x: np.stack([np.asarray(x)] * n) if hasattr(x, "ndim") else x,
            local,
        )
        mesh = make_mesh(n)
        dp = data_parallel_step(step, mesh, donate_state=False)
        s2, m2 = dp(replicate(state, mesh), shard_batch(stacked, mesh))

        np.testing.assert_allclose(
            float(m1["loss"]), float(jax.device_get(m2["loss"])), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s1.params)),
            jax.tree.leaves(jax.device_get(s2.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

    def test_distinct_batches_average_gradients(self):
        """Distinct shards: DP loss is the mean of per-shard losses."""
        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=500, seed=1)
        scheme = PadScheme(npad0=2048)
        rng = np.random.RandomState(0)
        parts = [
            collate_pair([ds[i]], scheme, mode="nce", npos=64,
                         rng=np.random.RandomState(i), fuse_frames=True)
            for i in range(2)
        ]
        state, cfg = _make_state(parts[0])
        step = make_train_step(cfg)
        single = jax.jit(lambda s, b: step(s, b, axis_name=None))
        losses = [float(single(state, p)[1]["loss"]) for p in parts]

        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs])
            if hasattr(xs[0], "ndim") else xs[0],
            *parts,
        )
        mesh = make_mesh(2)
        dp = data_parallel_step(step, mesh, donate_state=False)
        _, m = dp(replicate(state, mesh), shard_batch(stacked, mesh))
        np.testing.assert_allclose(
            float(jax.device_get(m["loss"])), np.mean(losses), rtol=1e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
class TestMeshTrainer:
    def test_pretrain_trainer_on_mesh(self, tmp_path):
        """Full PretrainTrainer path with a 2-device mesh and a loader that
        stacks one device-batch per mesh slot."""
        from pointcontrast_tpu.data import PairLoader
        from pointcontrast_tpu.parallel import make_mesh
        from pointcontrast_tpu.train import PretrainConfig, PretrainTrainer

        ds = SyntheticPairDataset(num_pairs=4, points_per_frame=400, seed=0)
        scheme = PadScheme(npad0=1024)
        loader = PairLoader(
            ds, batch_size=1, scheme=scheme, mode="nce", npos=64,
            num_device_batches=2, num_workers=1, seed=0, fuse_frames=True,
        )
        model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)
        cfg = PretrainConfig(
            mode="nce", npos=64, max_iter=3, stat_freq=1, save_freq=100,
            checkpoint_dir=str(tmp_path), lr=0.05,
        )
        trainer = PretrainTrainer(model, loader, cfg, mesh=make_mesh(2))
        history = trainer.train(3)
        loader.close()
        assert len(history) == 3
        assert all(np.isfinite(m["loss"]) for _, m in history)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
class TestSemsegMesh:
    def test_semseg_trainer_on_mesh(self, tmp_path):
        """SemsegTrainer with a 2-device mesh + stacking loader (the path the
        semseg app takes when multiple devices are visible)."""
        from pointcontrast_tpu.semseg.dataset import SemsegLoader
        from pointcontrast_tpu.semseg.datasets.synthetic import (
            SyntheticSemsegDataset,
        )
        from pointcontrast_tpu.semseg.train import SemsegConfig, SemsegTrainer

        ds = SyntheticSemsegDataset(num_scenes=4, points=600, seed=0)
        scheme = PadScheme(npad0=2048)
        loader = SemsegLoader(
            ds, batch_size=1, scheme=scheme, num_workers=1, seed=0,
            num_device_batches=2,
        )
        model = TinyUNet(in_channels=3, out_channels=ds.num_classes)
        cfg = SemsegConfig(
            lr=0.1, max_iter=2, stat_freq=1, val_freq=100, save_freq=100,
            checkpoint_dir=str(tmp_path),
        )
        trainer = SemsegTrainer(
            model, loader, None, cfg, num_classes=ds.num_classes,
            mesh=make_mesh(2),
        )
        history = trainer.train(2)
        loader.close()
        assert len(history) == 2
        assert all(np.isfinite(m["loss"]) for _, m in history)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
class TestDetectMesh:
    def test_detect_trainer_on_mesh(self, tmp_path):
        """DetectTrainer with a 2-device mesh + stacking loader (the
        reference trains VoteNet under DDP, ddp_main.py) — one epoch runs,
        metrics are finite, and the replicated-vs-single first-step loss
        matches when both devices see the same batch."""
        from pointcontrast_tpu.apps.votenet import _BatchLoader
        from pointcontrast_tpu.detect.datasets import SyntheticDetectionDataset
        from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
        from pointcontrast_tpu.detect.votenet import VoteNet
        from pointcontrast_tpu.parallel import make_mesh

        ds = SyntheticDetectionDataset(num_scenes=4, num_objects=3,
                                       num_points=1200, seed=0)
        dc = ds.dc
        loader = _BatchLoader(ds, batch_size=1, seed=0, num_device_batches=2)
        model = VoteNet(
            num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
            num_size_cluster=dc.num_size_cluster,
            mean_size_arr=dc.mean_size_arr, num_proposal=16,
        )
        cfg = DetectConfig(learning_rate=1e-4,
                           checkpoint_dir=str(tmp_path / "mesh"))
        trainer = DetectTrainer(model, dc, cfg, next(loader),
                                mesh=make_mesh(2))

        # parity FIRST (same fresh PRNGKey(0) init in both trainers):
        # identical per-device batches -> pmean == single-device step
        import jax as _jax

        single = DetectTrainer(model, dc, DetectConfig(
            learning_rate=1e-4, checkpoint_dir=str(tmp_path / "single")),
            _jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") else x,
                          next(loader)))
        b1 = next(loader)
        dup = _jax.tree.map(
            lambda x: np.stack([x[0], x[0]]) if hasattr(x, "ndim") else x, b1)
        local = _jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") else x, dup)
        trainer.state, m_mesh = trainer._step(trainer.state, dup)
        single.state, m_single = single._step(single.state, local)
        np.testing.assert_allclose(
            float(_jax.device_get(m_mesh["loss"])),
            float(_jax.device_get(m_single["loss"])), rtol=1e-5)

        loss = trainer.train_epoch(loader, num_batches=2)
        assert np.isfinite(loss)
