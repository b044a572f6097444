"""PointNet++ op tests against numpy brute-force oracles (semantics of the
reference CUDA kernels, SURVEY.md section 2.6)."""
import numpy as np
import jax
import jax.numpy as jnp

from pointcontrast_tpu.detect.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    interpolation_weights,
    three_interpolate,
    three_nn,
)


def np_fps(xyz, npoint):
    n = xyz.shape[0]
    idxs = np.zeros(npoint, np.int32)
    dists = np.full(n, np.inf)
    last = 0
    for i in range(1, npoint):
        d = ((xyz - xyz[last]) ** 2).sum(1)
        dists = np.minimum(dists, d)
        last = int(dists.argmax())
        idxs[i] = last
    return idxs


class TestFPS:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        xyz = rng.randn(2, 100, 3).astype(np.float32)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
        for b in range(2):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))

    def test_spread(self):
        """FPS picks spread-out points: min pairwise distance far above random."""
        rng = np.random.RandomState(1)
        xyz = rng.rand(1, 1000, 3).astype(np.float32)
        idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))[0]
        sel = xyz[0, idx]
        d = ((sel[:, None] - sel[None, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        assert np.sqrt(d.min()) > 0.15  # random picks land ~0.03 apart

    def test_jit(self):
        xyz = jnp.asarray(np.random.RandomState(2).randn(1, 50, 3), jnp.float32)
        f = jax.jit(lambda x: furthest_point_sample(x, 8))
        assert f(xyz).shape == (1, 8)


class TestBallQuery:
    def _oracle(self, centers, pts, radius, nsample):
        m = centers.shape[0]
        out = np.zeros((m, nsample), np.int32)
        for i in range(m):
            hits = np.where(((pts - centers[i]) ** 2).sum(1) < radius**2)[0]
            if len(hits) == 0:
                out[i] = 0
            else:
                take = hits[:nsample]
                out[i, : len(take)] = take
                out[i, len(take):] = take[0]
        return out

    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(2, 200, 3).astype(np.float32)
        centers = rng.rand(2, 37, 3).astype(np.float32)
        got = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.2, 8))
        for b in range(2):
            np.testing.assert_array_equal(got[b], self._oracle(centers[b], pts[b], 0.2, 8))

    def test_chunked_equals_unchunked(self):
        rng = np.random.RandomState(1)
        pts = rng.rand(1, 300, 3).astype(np.float32)
        centers = rng.rand(1, 100, 3).astype(np.float32)
        a = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.25, 4, chunk=16))
        b = np.asarray(ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.25, 4, chunk=512))
        np.testing.assert_array_equal(a, b)


class TestGatherGroup:
    def test_gather(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(2, 4, 10).astype(np.float32)
        idx = rng.randint(0, 10, (2, 5)).astype(np.int32)
        got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][:, idx[b]])

    def test_group(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(2, 3, 10).astype(np.float32)
        idx = rng.randint(0, 10, (2, 4, 6)).astype(np.int32)
        got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            for m in range(4):
                np.testing.assert_allclose(got[b, :, m], pts[b][:, idx[b, m]])

    def test_group_backward_is_scatter_add(self):
        pts = jnp.ones((1, 1, 5))
        idx = jnp.asarray([[[0, 0, 1]]], jnp.int32)  # point 0 used twice

        def f(p):
            return group_points(p, idx).sum()

        g = np.asarray(jax.grad(f)(pts))[0, 0]
        np.testing.assert_allclose(g, [2.0, 1.0, 0.0, 0.0, 0.0])


class TestThreeNN:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        unknown = rng.rand(1, 20, 3).astype(np.float32)
        known = rng.rand(1, 9, 3).astype(np.float32)
        dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        d2 = ((unknown[0][:, None] - known[0][None]) ** 2).sum(-1)
        want_idx = np.argsort(d2, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(np.asarray(idx)[0], 1), np.sort(want_idx, 1))
        np.testing.assert_allclose(
            np.sort(np.asarray(dist)[0], 1),
            np.sort(np.sqrt(np.take_along_axis(d2, want_idx, 1)), 1),
            rtol=1e-4,
        )

    def test_interpolate(self):
        rng = np.random.RandomState(1)
        feats = rng.randn(1, 4, 9).astype(np.float32)
        unknown = rng.rand(1, 20, 3).astype(np.float32)
        known = rng.rand(1, 9, 3).astype(np.float32)
        dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        w = interpolation_weights(dist)
        out = np.asarray(three_interpolate(jnp.asarray(feats), idx, w))
        assert out.shape == (1, 4, 20)
        # exact coincidence -> exact feature copy
        unknown2 = known.copy()
        dist2, idx2 = three_nn(jnp.asarray(unknown2), jnp.asarray(known))
        w2 = interpolation_weights(dist2)
        out2 = np.asarray(three_interpolate(jnp.asarray(feats), idx2, w2))
        np.testing.assert_allclose(out2, feats, atol=1e-3)
