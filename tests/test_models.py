"""Res16UNet family: shape, masking, jit, and train/eval behavior tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcontrast_tpu.nn.registry import load_model, MODELS
from pointcontrast_tpu.sparse.topology import build_pyramid


def make_inputs(n=400, cin=3, seed=0, num_batch=2, extent=24):
    rng = np.random.RandomState(seed)
    coords = rng.randint(0, extent, size=(n * 2, 4)).astype(np.int32)
    coords[:, 0] = rng.randint(0, num_batch, size=n * 2)
    coords = np.unique(coords, axis=0)[:n]
    pyr, meta = build_pyramid(coords, num_levels=5)
    feats = np.zeros((meta.npads[0], cin), np.float32)
    feats[: len(coords)] = rng.randn(len(coords), cin)
    return jnp.asarray(feats), pyr, meta


class TestRes16UNet:
    def test_forward_shapes_and_padding(self):
        feats, pyr, meta = make_inputs()
        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=32, normalize_feature=True
        )
        params = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
        out = model.apply(params, feats, pyr, train=False)
        assert out.shape == (meta.npads[0], 32)
        n = meta.counts[0]
        # valid rows are unit-norm, padded rows exactly zero
        norms = np.linalg.norm(np.asarray(out)[:n], axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
        assert np.abs(np.asarray(out)[n:]).max() == 0

    def test_train_mode_updates_batch_stats(self):
        feats, pyr, _ = make_inputs(n=200)
        model = load_model("Res16UNet14A")(in_channels=3, out_channels=16)
        variables = model.init(jax.random.PRNGKey(0), feats, pyr, train=True)
        out, new_state = model.apply(
            variables, feats, pyr, train=True, mutable=["batch_stats"]
        )
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )
        assert changed

    def test_jit_forward(self):
        feats, pyr, meta = make_inputs(n=200)
        model = load_model("Res16UNet14")(in_channels=3, out_channels=8)
        params = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
        f = jax.jit(
            lambda p, x, t: model.apply(p, x, t, train=False)
        )
        out = f(params, feats, pyr)
        assert np.isfinite(np.asarray(out)).all()

    def test_bottleneck_variant(self):
        feats, pyr, meta = make_inputs(n=150)
        model = load_model("Res16UNet50")(in_channels=3, out_channels=8)
        params = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
        out = model.apply(params, feats, pyr, train=False)
        assert out.shape == (meta.npads[0], 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_conv1_kernel_size_5(self):
        rng = np.random.RandomState(0)
        coords = np.unique(
            rng.randint(0, 20, size=(300, 4)).astype(np.int32), axis=0
        )
        coords[:, 0] = 0
        pyr, meta = build_pyramid(coords, num_levels=5, conv0_kernel_size=5)
        feats = np.zeros((meta.npads[0], 3), np.float32)
        feats[: len(coords)] = 1.0
        model = load_model("Res16UNet14")(
            in_channels=3, out_channels=8, conv1_kernel_size=5
        )
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), pyr,
                            train=False)
        k = params["params"]["conv0p1s1"]["kernel"]
        assert k.shape[0] == 125

    def test_registry_has_all_reference_variants(self):
        expected = {
            "Res16UNet14", "Res16UNet18", "Res16UNet34", "Res16UNet50",
            "Res16UNet101", "Res16UNet14A", "Res16UNet14A2", "Res16UNet14B",
            "Res16UNet14B2", "Res16UNet14B3", "Res16UNet14C", "Res16UNet14D",
            "Res16UNet18A", "Res16UNet18B", "Res16UNet18D", "Res16UNet34A",
            "Res16UNet34B", "Res16UNet34C",
        }
        assert expected <= set(MODELS)

    def test_res16unet34c_param_count(self):
        """Res16UNet34C should have the well-known ~37.9M parameters."""
        feats, pyr, _ = make_inputs(n=100)
        model = load_model("Res16UNet34C")(in_channels=3, out_channels=32)
        params = model.init(jax.random.PRNGKey(0), feats, pyr, train=False)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params["params"]))
        assert 30e6 < n < 45e6, n
