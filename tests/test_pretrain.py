"""End-to-end pretraining tests on a tiny model + synthetic pairs.

Mirrors the reference's integration-test-by-tiny-dataset strategy
(SURVEY.md section 4: "run the trainer on the 50-pair example dataset").
"""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.data import PadScheme, PairLoader, SyntheticPairDataset
from pointcontrast_tpu.nn.res16unet import Res16UNetBase
from pointcontrast_tpu.nn.resnet_block import BasicBlock
from pointcontrast_tpu.train import (
    PretrainConfig,
    PretrainTrainer,
    lenient_filter,
    load_checkpoint,
    latest_checkpoint,
)


class TinyUNet(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
    INIT_DIM = 4


def make_loader(mode, **kw):
    ds = SyntheticPairDataset(num_pairs=4, points_per_frame=600, seed=0)
    scheme = PadScheme(npad0=2048)
    return PairLoader(
        ds, batch_size=1, scheme=scheme, mode=mode, num_workers=1, seed=0, **kw
    )


@pytest.fixture(scope="module")
def nce_run(tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt_nce"))
    loader = make_loader("nce", npos=256)
    model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)
    cfg = PretrainConfig(
        mode="nce", npos=256, max_iter=4, stat_freq=1, save_freq=4,
        checkpoint_dir=ckpt_dir, lr=0.05,
    )
    trainer = PretrainTrainer(model, loader, cfg)
    history = trainer.train(4)
    loader.close()
    return trainer, history, ckpt_dir, model


class TestNCEPretrain:
    def test_loss_finite(self, nce_run):
        _, history, _, _ = nce_run
        losses = [m["loss"] for _, m in history]
        assert len(losses) == 4
        assert all(np.isfinite(l) for l in losses)

    def test_checkpoint_roundtrip(self, nce_run):
        trainer, _, ckpt_dir, model = nce_run
        path = latest_checkpoint(ckpt_dir)
        assert path is not None and path.endswith("checkpoint_4")
        payload = load_checkpoint(path)
        assert int(payload["curr_iter"]) == 4
        # restored params numerically equal current state
        restored = payload["params"]
        for a, b in zip(
            jax.tree.leaves(restored), jax.tree.leaves(jax.device_get(trainer.state.params))
        ):
            np.testing.assert_array_equal(a, b)

    def test_lenient_transfer(self, nce_run):
        trainer, _, _, _ = nce_run
        source = jax.device_get(trainer.state.params)
        # target: same arch but different head width -> final layer skipped
        target_model = TinyUNet(in_channels=3, out_channels=5)
        from pointcontrast_tpu.train.state import create_train_state
        import optax

        loader = make_loader("nce", npos=256)
        batch = next(loader)
        loader.close()
        st = create_train_state(
            jax.random.PRNGKey(1), target_model, optax.sgd(0.1),
            (batch.feats0, batch.pyramid0),
        )
        merged, loaded, skipped = lenient_filter(st.params, source)
        assert any("final" in s for s in skipped)
        assert len(loaded) > len(skipped)
        # a loaded leaf actually carries the source value
        got = jax.tree.leaves(merged)
        assert any(
            a.shape == b.shape and np.allclose(a, b)
            for a, b in zip(got, jax.tree.leaves(source))
        )


class TestHardestPretrain:
    def test_losses_finite_and_decrease(self, tmp_path):
        loader = make_loader("hardest", num_pos=256, num_hn=128)
        model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)
        cfg = PretrainConfig(
            mode="hardest", max_iter=6, stat_freq=1, save_freq=1000,
            checkpoint_dir=str(tmp_path), lr=0.1,
        )
        trainer = PretrainTrainer(model, loader, cfg)
        history = trainer.train(6)
        loader.close()
        losses = [m["loss"] for _, m in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
        assert all("pos_loss" in m and "neg_loss" in m for _, m in history)
