"""TPU-native PointNet++ ops.

Replaces the vendored CUDA extension
(/root/reference/downstream/votenet_det_new/models/backbone/pointnet2/
_ext_src/src/{sampling,ball_query,group_points,interpolate}_gpu.cu, ~980 LoC
C++/CUDA; Python wrappers pointnet2_utils.py:51-291) with jittable XLA
programs over static shapes:

  - furthest_point_sample: iterative max-min selection via ``lax.fori_loop``
    (the inherently sequential part; each step is a fused [B, N] update).
  - ball_query: full pairwise distances + cumsum-capped first-``nsample``
    selection, reproducing the CUDA kernel's first-hit-padding semantics.
  - gather/group: plain ``take_along_axis`` (XLA gathers; their backward is
    the atomicAdd scatter the reference hand-writes).
  - three_nn / three_interpolate: top-3 by negative distance + weighted
    gather.

All functions are batched [B, ...] and differentiable where the reference's
are (FPS and ball_query indices are integer outputs, as in
pointnet2_utils.py:51-77 which marks them non-differentiable).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, M, 3] -> [B, N, M] squared distances.

    Matmul (MXU) form: |a|^2 + |b|^2 - 2 a.b — no [B, N, M, 3] temp."""
    a2 = jnp.sum(a * a, axis=-1)[:, :, None]
    b2 = jnp.sum(b * b, axis=-1)[:, None, :]
    ab = jnp.einsum("bnc,bmc->bnm", a, b, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """[B, N, 3] -> [B, npoint] int32 indices; starts at index 0 like the
    CUDA kernel (sampling_gpu.cu seeds old=0)."""
    b, n, _ = xyz.shape

    def body(i, state):
        idxs, dists, last = state
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum(jnp.square(xyz - last_xyz), axis=-1)  # [B, N]
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)  # [B]
        idxs = idxs.at[:, i].set(nxt)
        return idxs, dists, nxt

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    dists0 = jnp.full((b, n), jnp.inf, jnp.float32)
    last0 = jnp.zeros((b,), jnp.int32)
    idxs, _, _ = jax.lax.fori_loop(1, npoint, body, (idxs0, dists0, last0))
    return idxs


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, C, N] x [B, M] -> [B, C, M] (matches _ext gather_points layout)."""
    return jnp.take_along_axis(points, idx[:, None, :], axis=2)


def _ball_query_block(new_xyz, xyz, radius, nsample):
    """Unchunked core over [B, M_blk, 3] centers.

    The first ``nsample`` in-radius indices per center, in point order, are
    the ``nsample`` SMALLEST values of the key ``where(inside, col, N)`` —
    one ``top_k`` call, no scatter.  (A scatter-min formulation measured
    738 ms per [4, 512, 40000] block on v5e vs 118 ms for this top_k form:
    TPU scatters serialize, top_k streams.)"""
    d2 = _sqdist(new_xyz, xyz)  # [B, Mb, N]
    n = xyz.shape[1]
    col = jnp.arange(n, dtype=jnp.int32)
    inside = d2 < radius * radius
    key = jnp.where(inside, col[None, None, :], n)  # misses sort last
    vals, _ = jax.lax.top_k(-key, nsample)  # descending -key == ascending key
    out = (-vals).astype(jnp.int32)  # first hits in point order; miss == n
    first = out[..., 0:1]
    first = jnp.where(first == n, 0, first)  # zero hits -> index 0
    return jnp.where(out == n, first, out)


def ball_query(
    new_xyz: jnp.ndarray,  # [B, M, 3] query centers
    xyz: jnp.ndarray,  # [B, N, 3] points
    radius: float,
    nsample: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """[B, M, nsample] int32: for each center, the indices of the first
    ``nsample`` points (in point order) within ``radius``; slots beyond the
    hit count repeat the FIRST hit, and centers with zero hits return index
    0 — exactly the CUDA kernel's semantics (ball_query_gpu.cu:14-59).

    Centers are processed in chunks so the [B, chunk, N] distance block stays
    small (the CUDA kernel streams; a full [B, M, N] boolean + cumsum would
    be GBs at VoteNet scales)."""
    b, m, _ = new_xyz.shape
    if m <= chunk:
        return _ball_query_block(new_xyz, xyz, radius, nsample)
    pad = (-m) % chunk
    padded = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    blocks = padded.reshape(b, -1, chunk, 3).swapaxes(0, 1)  # [nblk, B, chunk, 3]
    out = jax.lax.map(
        lambda nx: _ball_query_block(nx, xyz, radius, nsample), blocks
    )  # [nblk, B, chunk, nsample]
    out = out.swapaxes(0, 1).reshape(b, m + pad, nsample)
    return out[:, :m]


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, C, N] x [B, M, S] -> [B, C, M, S]."""
    b, c, n = points.shape
    m, s = idx.shape[1:]
    flat = idx.reshape(b, 1, m * s)
    g = jnp.take_along_axis(points, flat, axis=2)
    return g.reshape(b, c, m, s)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """[B, N, 3] x [B, M, 3] -> (dist [B, N, 3], idx [B, N, 3]): the three
    nearest known points per unknown (interpolate_gpu.cu three_nn).

    Ranking uses the MXU distance form; the returned distances are then
    recomputed exactly for the 3 winners (the matmul form loses ~1e-6
    absolute precision to cancellation, which matters when a distance is
    ~0 and feeds an inverse-distance weight)."""
    d2 = _sqdist(unknown, known)  # [B, N, M]
    _, idx = jax.lax.top_k(-d2, 3)
    idx = idx.astype(jnp.int32)
    sel = jnp.take_along_axis(
        known[:, None, :, :],  # [B, 1, M, 3]
        idx[:, :, :, None].astype(jnp.int32),
        axis=2,
    )  # [B, N, 3, 3]
    exact = jnp.sum(jnp.square(unknown[:, :, None, :] - sel), axis=-1)
    return jnp.sqrt(jnp.maximum(exact, 0.0)), idx


def three_interpolate(
    points: jnp.ndarray,  # [B, C, M]
    idx: jnp.ndarray,  # [B, N, 3]
    weight: jnp.ndarray,  # [B, N, 3]
) -> jnp.ndarray:
    """Weighted 3-point gather -> [B, C, N]."""
    b, c, m = points.shape
    n = idx.shape[1]
    flat = idx.reshape(b, 1, n * 3)
    g = jnp.take_along_axis(points, flat, axis=2).reshape(b, c, n, 3)
    return jnp.sum(g * weight[:, None, :, :], axis=-1)


def interpolation_weights(dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights as in pointnet2_modules FP layers."""
    recip = 1.0 / jnp.maximum(dist, eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
