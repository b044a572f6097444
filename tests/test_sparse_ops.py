"""Sparse conv / pooling ops vs dense-convolution and brute-force oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import build_pyramid
from pointcontrast_tpu.sparse import ops


def make_case(n=200, cin=5, cout=7, seed=0, extent=8, num_batch=2):
    rng = np.random.RandomState(seed)
    coords = rng.randint(0, extent, size=(n * 2, 4))
    coords[:, 0] = rng.randint(0, num_batch, size=n * 2)
    coords = np.unique(coords, axis=0)[:n].astype(np.int32)
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)
    return coords, feats


def densify(coords, feats, extent, num_batch):
    cin = feats.shape[1]
    grid = np.zeros((num_batch, extent, extent, extent, cin), np.float32)
    for c, f in zip(coords, feats):
        grid[c[0], c[1], c[2], c[3]] = f
    return grid


class TestStride1Conv:
    def test_vs_dense_conv(self):
        extent, num_batch, cin, cout = 8, 2, 5, 7
        coords, feats = make_case(extent=extent, num_batch=num_batch,
                                  cin=cin, cout=cout)
        pyr, meta = build_pyramid(coords, num_levels=1)
        npad = meta.npads[0]
        fpad = np.zeros((npad, cin), np.float32)
        fpad[: len(coords)] = feats

        rng = np.random.RandomState(1)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

        out = ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(pyr.levels[0].nbr), jnp.asarray(w),
            valid_out=jnp.asarray(pyr.levels[0].valid),
        )

        # Dense oracle: lax cross-correlation with SAME padding.
        grid = densify(coords, feats, extent, num_batch)
        offs = kernel_offsets(3, 3, "hypercube")
        wk = np.zeros((3, 3, 3, cin, cout), np.float32)
        for k, o in enumerate(offs):
            wk[o[0] + 1, o[1] + 1, o[2] + 1] = w[k]
        dense_out = jax.lax.conv_general_dilated(
            jnp.asarray(grid), jnp.asarray(wk),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )
        dense_out = np.asarray(dense_out)
        for j, c in enumerate(coords):
            np.testing.assert_allclose(
                np.asarray(out)[j], dense_out[c[0], c[1], c[2], c[3]],
                rtol=1e-4, atol=1e-4,
            )
        # padded rows remain zero
        assert np.abs(np.asarray(out)[len(coords):]).max() == 0


class TestStride2Conv:
    def test_vs_dense_strided_conv(self):
        extent, num_batch, cin, cout = 8, 2, 4, 6
        coords, feats = make_case(extent=extent, num_batch=num_batch, cin=cin)
        pyr, meta = build_pyramid(coords, num_levels=2)
        npad0 = meta.npads[0]
        fpad = np.zeros((npad0, cin), np.float32)
        fpad[: len(coords)] = feats

        rng = np.random.RandomState(2)
        w = rng.randn(8, cin, cout).astype(np.float32) * 0.1
        out = ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(pyr.levels[0].down_nbr),
            jnp.asarray(w), valid_out=jnp.asarray(pyr.levels[1].valid),
        )

        grid = densify(coords, feats, extent, num_batch)
        offs = kernel_offsets(2, 3, "hypercube")
        wk = np.zeros((2, 2, 2, cin, cout), np.float32)
        for k, o in enumerate(offs):
            wk[o[0], o[1], o[2]] = w[k]
        dense_out = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(grid), jnp.asarray(wk),
            window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        ))
        coarse = meta.coords[1]
        for j, c in enumerate(coarse):
            np.testing.assert_allclose(
                np.asarray(out)[j], dense_out[c[0], c[1], c[2], c[3]],
                rtol=1e-4, atol=1e-4,
            )


class TestTransposeConv:
    def test_vs_bruteforce(self):
        coords, _ = make_case(extent=8)
        cin, cout = 6, 3
        pyr, meta = build_pyramid(coords, num_levels=2)
        nc, npad1 = meta.counts[1], meta.npads[1]
        rng = np.random.RandomState(3)
        fc = np.zeros((npad1, cin), np.float32)
        fc[:nc] = rng.randn(nc, cin)
        w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

        out = ops.sparse_conv_transpose(
            jnp.asarray(fc), jnp.asarray(pyr.levels[0].up_parent),
            jnp.asarray(pyr.levels[0].up_offset), jnp.asarray(w),
            valid_out=jnp.asarray(pyr.levels[0].valid),
        )
        offs2 = kernel_offsets(2, 3, "hypercube")
        coarse_lookup = {tuple(c): i for i, c in enumerate(meta.coords[1])}
        for f, c in enumerate(meta.coords[0]):
            parent = c.copy()
            parent[1:] = c[1:] // 2
            p = coarse_lookup[tuple(parent)]
            off = c[1:] - 2 * parent[1:]
            k = int(np.where((offs2 == off).all(axis=1))[0][0])
            expect = fc[p] @ w[k]
            np.testing.assert_allclose(np.asarray(out)[f], expect, rtol=1e-4,
                                       atol=1e-5)


class TestPooling:
    def test_sum_and_avg_pool(self):
        coords, feats = make_case(extent=8, cin=4)
        pyr, meta = build_pyramid(coords, num_levels=2)
        npad0 = meta.npads[0]
        fpad = np.zeros((npad0, 4), np.float32)
        fpad[: len(coords)] = feats
        s = ops.sparse_sum_pool(
            jnp.asarray(fpad), jnp.asarray(pyr.levels[0].down_nbr),
            valid_out=jnp.asarray(pyr.levels[1].valid))
        a = ops.sparse_avg_pool(
            jnp.asarray(fpad), jnp.asarray(pyr.levels[0].down_nbr),
            jnp.asarray(pyr.levels[0].valid),
            valid_out=jnp.asarray(pyr.levels[1].valid))
        # brute force per coarse voxel
        for j, c in enumerate(meta.coords[1]):
            children = [
                i for i, fc in enumerate(coords)
                if fc[0] == c[0] and tuple(fc[1:] // 2) == tuple(c[1:])
            ]
            np.testing.assert_allclose(
                np.asarray(s)[j], feats[children].sum(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(a)[j], feats[children].mean(0), rtol=1e-5, atol=1e-5)

    def test_global_pool_and_broadcast(self):
        coords, feats = make_case(extent=8, cin=4, num_batch=3)
        pyr, meta = build_pyramid(coords, num_levels=1)
        npad = meta.npads[0]
        fpad = np.zeros((npad, 4), np.float32)
        fpad[: len(coords)] = feats
        g = ops.global_pool(jnp.asarray(fpad), jnp.asarray(pyr.levels[0].batch),
                            pyr.num_batch)
        for b in range(pyr.num_batch):
            sel = coords[:, 0] == b
            np.testing.assert_allclose(np.asarray(g)[b], feats[sel].mean(0),
                                       rtol=1e-5, atol=1e-5)
        back = ops.broadcast_to_points(
            g, jnp.asarray(pyr.levels[0].batch),
            valid=jnp.asarray(pyr.levels[0].valid))
        for i, c in enumerate(coords):
            np.testing.assert_allclose(np.asarray(back)[i],
                                       np.asarray(g)[c[0]], rtol=1e-6)

    def test_masked_moments(self):
        coords, feats = make_case(extent=8, cin=4)
        npad = 512
        fpad = np.zeros((npad, 4), np.float32)
        fpad[: len(coords)] = feats
        valid = np.zeros(npad, np.float32)
        valid[: len(coords)] = 1
        mean, var, n = ops.masked_moments(jnp.asarray(fpad), jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(mean), feats.mean(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var), feats.var(0), rtol=1e-4)
        assert int(n) == len(coords)
