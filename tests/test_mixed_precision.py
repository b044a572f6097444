"""bfloat16-activation mode: parity with f32 and trainability.

Mixed precision here means activations (and the gathered conv tables) in
bf16 while parameters, norm statistics, and loss logits stay f32 — the
config surface is ``net.dtype`` in the apps / ``dtype=`` on the models.
On TPU this also keeps the level-0 gather table inside the fast-gather
VMEM footprint (PERF.md round 3).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
from pointcontrast_tpu.nn.registry import load_model
from pointcontrast_tpu.train import PretrainConfig, make_train_step, optim
from pointcontrast_tpu.train.state import create_train_state


def _batch():
    ds = SyntheticPairDataset(num_pairs=1, points_per_frame=500, seed=0)
    return collate_pair(
        [ds[0]], PadScheme(npad0=2048), mode="nce", npos=64,
        rng=np.random.RandomState(0), fuse_frames=True,
    )


class TestBf16Activations:
    def test_forward_tracks_f32(self):
        batch = _batch()
        out = {}
        for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            model = load_model("Res16UNet34C")(
                in_channels=3, out_channels=32, normalize_feature=True,
                dtype=dtype,
            )
            variables = jax.jit(
                lambda r, f, p, m=model: m.init(r, f, p, train=False)
            )(jax.random.PRNGKey(0), batch.feats0, batch.pyramid0)
            # params are f32 in BOTH modes (casting happens at use)
            for leaf in jax.tree.leaves(variables["params"]):
                assert leaf.dtype == jnp.float32
            out[name] = np.asarray(
                model.apply(variables, batch.feats0, batch.pyramid0,
                            train=False), np.float32,
            )
        n = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
        a, b = out["f32"][:n], out["bf16"][:n]
        # outputs are L2-normalized rows: compare directionally
        cos = (a * b).sum(axis=1)
        assert np.all(cos > 0.98), f"min cos {cos.min()}"
        assert np.all(out["bf16"][n:] == 0)  # padding invariant survives

    def test_bf16_train_step_descends(self):
        batch = _batch()
        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=32, normalize_feature=True,
            dtype=jnp.bfloat16,
        )
        cfg = PretrainConfig(mode="nce", npos=64, lr=0.3)
        tx = optim.make_optimizer(
            "sgd", cfg.lr, optim.exp_lr(cfg.exp_gamma, cfg.lr_update_freq), cfg
        )
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0)
        )
        step = jax.jit(lambda s, b: make_train_step(cfg)(s, b, axis_name=None))
        losses = []
        for _ in range(5):
            state, m = step(state, batch)
            losses.append(float(jax.device_get(m["loss"])))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_votenet_sparseconv_bf16_backbone_trains(self):
        """dtype= on VoteNet runs the sparseconv backbone in bf16 while the
        voting/proposal heads and losses stay f32 (detect/votenet.py casts
        vout back); params stay f32 and training stays finite.  No descent
        assertion: at this tiny scale the VoteNet loss is step-noisy in BOTH
        dtypes (argmin object assignments flip discretely; the f32 arm fails
        the same 20-step window protocol), so descent is pinned by the f32
        end-to-end test (test_detect.py) and here we pin the precision
        contract instead."""
        from pointcontrast_tpu.detect.datasets import (
            SyntheticDetectionDataset,
            collate_detection,
        )
        from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
        from pointcontrast_tpu.detect.votenet import VoteNet

        ds = SyntheticDetectionDataset(
            num_scenes=1, num_objects=3, num_points=1200, seed=0
        )
        dc = ds.dc
        batch = collate_detection([ds[0]], voxel_size=0.05,
                                  scheme=PadScheme(npad0=2048))
        model = VoteNet(
            num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
            num_size_cluster=dc.num_size_cluster,
            mean_size_arr=dc.mean_size_arr, num_proposal=32,
            backbone="sparseconv", dtype=jnp.bfloat16,
        )
        trainer = DetectTrainer(model, dc, DetectConfig(learning_rate=1e-4),
                                batch)
        for leaf in jax.tree.leaves(trainer.state.params):
            assert leaf.dtype == jnp.float32

        # The sparse backbone computes in bf16 (its captured module output is
        # bf16) and the heads consume the f32 cast (vote_features is f32).
        from pointcontrast_tpu.detect.train import _batch_to_inputs

        _, inter = model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            _batch_to_inputs(batch), train=False,
            capture_intermediates=lambda mdl, name: mdl.name == "net",
        )
        net_out = jax.tree.leaves(
            inter["intermediates"]["backbone_net"]["net"]["__call__"]
        )[0]
        assert net_out.dtype == jnp.bfloat16
        end_points = model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            _batch_to_inputs(batch), train=False,
        )
        assert end_points["fp2_features"].dtype == jnp.float32

        params0 = jax.tree.map(np.asarray, jax.device_get(trainer.state.params))
        losses = []
        for _ in range(5):
            trainer.state, m = trainer._step(trainer.state, batch)
            losses.append(float(jax.device_get(m["loss"])))
        assert np.all(np.isfinite(losses))
        moved = sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(
                jax.tree.leaves(jax.device_get(trainer.state.params)),
                jax.tree.leaves(params0),
            )
        )
        assert moved > 0.0
