"""Finite-difference gradient checks for the sparse ops (the reference's
only op-level test is a CUDA gradcheck of three_interpolate,
pointnet2_test.py:18-33 — these cover our whole sparse-op surface)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointcontrast_tpu.sparse import ops
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.topology import build_pyramid


def finite_diff(f, x, eps=1e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(x, jnp.float32)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(x, jnp.float32)))
        flat[i] = orig
        gf[i] = (fp - fm) / (2 * eps)
    return g


@pytest.fixture(scope="module")
def topo():
    rng = np.random.RandomState(0)
    coords = np.concatenate(
        [np.zeros((60, 1), int), rng.randint(0, 6, (60, 3))], 1
    )
    uc = coords[sparse_quantize(coords, return_index=True)]
    pyr, meta = build_pyramid(uc, 2, npads=[64, 33])
    return pyr, meta, rng


class TestSparseConvGrad:
    def test_grad_wrt_features(self, topo):
        pyr, meta, rng = topo
        lv = pyr.levels[0]
        c = 3
        feats = np.zeros((meta.npads[0], c))
        feats[: meta.counts[0]] = rng.randn(meta.counts[0], c) * 0.5
        w = jnp.asarray(rng.randn(27, c, 2) * 0.3, jnp.float32)

        def loss(f):
            out = ops.sparse_conv(f, lv.nbr, w, valid_out=lv.valid)
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(feats, jnp.float32)))
        want = finite_diff(loss, feats)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)

    def test_grad_wrt_weights(self, topo):
        pyr, meta, rng = topo
        lv = pyr.levels[0]
        c = 2
        feats = jnp.asarray(
            np.vstack([rng.randn(meta.counts[0], c),
                       np.zeros((meta.npads[0] - meta.counts[0], c))]),
            jnp.float32,
        )
        w0 = rng.randn(27, c, 2) * 0.3

        def loss(w):
            out = ops.sparse_conv(feats, lv.nbr, w, valid_out=lv.valid)
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(w0, jnp.float32)))
        want = finite_diff(loss, w0)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


class TestTransposeConvGrad:
    def test_grad_wrt_features(self, topo):
        pyr, meta, rng = topo
        lv = pyr.levels[0]
        c = 2
        coarse = np.zeros((meta.npads[1], c))
        coarse[: meta.counts[1]] = rng.randn(meta.counts[1], c) * 0.5
        w = jnp.asarray(rng.randn(8, c, 3) * 0.3, jnp.float32)

        def loss(f):
            out = ops.sparse_conv_transpose(
                f, lv.up_parent, lv.up_offset, w, valid_out=lv.valid
            )
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(coarse, jnp.float32)))
        want = finite_diff(loss, coarse)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


class TestChunkedTransposeConvGrad:
    """FD gradcheck of the fused chunked transposed conv (_conv_tr_chunk):
    one stacked-table gather forward, single-scatter custom VJP backward."""

    @pytest.fixture(scope="class")
    def ctopo(self):
        from pointcontrast_tpu.sparse.chunk import build_chunked_pyramid

        rng = np.random.RandomState(1)
        coords = np.concatenate(
            [np.repeat([[0], [1]], 30, axis=0), rng.randint(0, 6, (60, 3))], 1
        )
        uc = coords[sparse_quantize(coords, return_index=True)]
        pyr, meta, rows, orphan = build_chunked_pyramid(
            uc, 2, npads=[80, 48], num_batch=2
        )
        return pyr, meta, rng

    def test_grad_wrt_features(self, ctopo):
        pyr, meta, rng = ctopo
        lv = pyr.levels[0]
        assert lv.up_parent.ndim == 2  # chunked [B, S_fine]
        c = 2
        coarse = np.zeros((meta.npads[1], c))
        coarse[: meta.counts[1]] = rng.randn(meta.counts[1], c) * 0.5
        coarse *= np.asarray(pyr.levels[1].valid)[:, None]
        w = jnp.asarray(rng.randn(8, c, 3) * 0.3, jnp.float32)

        def loss(f):
            out = ops.sparse_conv_transpose(
                f, lv.up_parent, lv.up_offset, w, valid_out=lv.valid
            )
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(coarse, jnp.float32)))
        want = finite_diff(loss, coarse)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

    def test_grad_wrt_weights(self, ctopo):
        pyr, meta, rng = ctopo
        lv = pyr.levels[0]
        c = 2
        coarse = np.zeros((meta.npads[1], c))
        coarse[: meta.counts[1]] = rng.randn(meta.counts[1], c) * 0.5
        coarse *= np.asarray(pyr.levels[1].valid)[:, None]
        coarse = jnp.asarray(coarse, jnp.float32)
        w0 = rng.randn(8, c, 3) * 0.3

        def loss(w):
            out = ops.sparse_conv_transpose(
                coarse, lv.up_parent, lv.up_offset, w, valid_out=lv.valid
            )
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(w0, jnp.float32)))
        want = finite_diff(loss, w0)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


class TestPoolGrad:
    def test_avg_pool_grad(self, topo):
        pyr, meta, rng = topo
        lv0, lv1 = pyr.levels
        c = 2
        feats = np.zeros((meta.npads[0], c))
        feats[: meta.counts[0]] = rng.randn(meta.counts[0], c)

        def loss(f):
            out = ops.sparse_avg_pool(f, lv0.down_nbr, lv0.valid, lv1.valid)
            return jnp.sum(out * out)

        got = np.asarray(jax.grad(loss)(jnp.asarray(feats, jnp.float32)))
        want = finite_diff(loss, feats)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


class TestLossGrad:
    def test_hardest_contrastive_grad(self):
        rng = np.random.RandomState(0)
        n, c, p, h = 24, 3, 6, 8
        f0 = rng.randn(n, c) * 0.5
        f1 = jnp.asarray(rng.randn(n, c) * 0.5, jnp.float32)
        from pointcontrast_tpu.losses.contrastive import hardest_contrastive_loss

        pos0 = jnp.asarray(rng.choice(n, p, replace=False), jnp.int32)
        pos1 = jnp.asarray(rng.choice(n, p, replace=False), jnp.int32)
        pv = jnp.ones(p, jnp.float32)
        c0 = jnp.asarray(rng.choice(n, h, replace=False), jnp.int32)
        c1 = jnp.asarray(rng.choice(n, h, replace=False), jnp.int32)
        cv = jnp.ones(h, jnp.float32)
        col = jnp.zeros((p, h), bool)

        def loss(f):
            pl, nl = hardest_contrastive_loss(
                f, f1, pos0, pos1, pv, c0, cv, c1, cv, col, col
            )
            return pl + nl

        got = np.asarray(jax.grad(loss)(jnp.asarray(f0, jnp.float32)))
        want = finite_diff(loss, f0, eps=1e-4)
        # argmin ties can flip under perturbation; compare loosely
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
