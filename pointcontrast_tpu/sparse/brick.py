"""Brick (2^D micro-dense) sparse layout: the TPU gather-amortized engine.

Motivation (PERF.md): the flat voxel layout is gather-row-overhead bound --
a K=27 sparse conv issues 27*N row gathers of only C*4 bytes each, and on
this chip a row gather costs ~3 ns regardless of width below ~1 KB.  The
brick layout packs each voxel into its parent "brick" (the 2^D cell of the
next pyramid level), so

  * features at level l are stored ``[NB*2^D, C]`` with voxel (brick b,
    slot s) at row ``b*2^D + s``; ``NB = npad_{l+1}`` because a level-l
    brick IS a level-(l+1) coordinate (floor(c/2)).  Empty slots hold
    exactly zero (the padding invariant extends to slots).
  * a same-level k^3 conv gathers 2^D-voxel brick rows (8*C*4 bytes -- the
    bandwidth-bound gather regime) from the 3^D neighbor bricks, which are
    exactly the entries of the *coarser* level's same-level kernel map; per
    neighbor it runs one packed block matmul covering every valid
    (slot, out-slot, tap) combination, so FLOPs match the occupancy bound
    (8/avg-occupancy inflation, ~2-3x on ScanNet surfaces) while gather rows
    drop ~10x.
  * the stride-2 k=2 down conv needs NO kernel map at all: brick slots ARE
    the k=2 kernel offsets, so it is one dense matmul
    ``[NB, 8*Cin] @ [8*Cin, Cout]`` followed by a placement gather into the
    next level's brick layout.
  * the stride-2 k=2 transpose conv is one row gather (each fine brick's id
    is its coarse parent voxel) plus one ``[NB, Cin] @ [Cin, 8*Cout]``
    matmul.

Weight shapes are IDENTICAL to the flat ops in ``sparse.ops`` ([K, Cin,
Cout] in the same kernel_offsets enumeration), so the same checkpoint runs
in either layout and the flat path is a numerical oracle for this one.

Replaces the same ME surface as ``sparse.ops`` (MinkowskiConvolution /
ConvolutionTranspose; reference pretrain/pointcontrast/model/modules/
common.py:117-167) -- this module is the TPU-native re-design, not a
translation: MinkowskiEngine has no analogous layout.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, offset_index
from pointcontrast_tpu.sparse.ops import mask_rows


class BrickPlan(NamedTuple):
    """Static (hashable) schedule for a same-level brick conv.

    steps: per neighbor-brick offset d (index into the coarse level's
      kernel map rows): (d_idx, s_ranges, p_ranges, taps, is_center).
      s_ranges/p_ranges are per-axis (lo, hi) ranges over the brick's
      [2]*D slot grid (participating slots are always axis-rectangular),
      ordered slowest-axis-first to match a row-major reshape of the slot
      dimension; taps[i][j] is the kernel tap index for the i-th input /
      j-th output slot of those ranges' row-major enumerations, or -1 when
      that combination falls outside the kernel region.

    The rectangularity is what keeps the device program gather-free inside
    a step: slot selection lowers to static strided slices, never to a
    second per-row gather.
    """

    steps: tuple
    num_taps: int
    num_slots: int
    dimension: int


@functools.lru_cache(maxsize=None)
def build_plan(
    kernel_size,
    dimension: int = 3,
    region: str = "hypercube",
    dilation: int = 1,
    axis_types: tuple | None = None,
) -> BrickPlan:
    """Plan a same-level conv in brick layout.

    Valid for kernels whose reach stays within one neighbor brick per axis:
    max |offset| <= 2 (k <= 5 for hypercube), because voxel p+off of an
    output voxel in brick b must live in a brick b+d with d in {-1,0,1}^D
    (the coarse kernel map rows).
    """
    offs_k = kernel_offsets(kernel_size, dimension, region, dilation, axis_types)
    if int(np.abs(offs_k).max()) > 2:
        raise ValueError(
            f"brick layout supports kernel offsets |off|<=2, got {kernel_size}"
        )
    tap_of = offset_index(offs_k)
    nbrs = kernel_offsets(3, dimension)  # coarse same-level map row order
    max_tap = int(np.abs(offs_k).max())
    steps = []
    for d_idx, d in enumerate(nbrs):
        # Participating slot values per axis: tap_a = 2*d_a + s_a - p_a must
        # be reachable (|tap_a| <= kernel reach on that axis for SOME p/s).
        s_vals, p_vals = [], []
        for a in range(dimension):
            sv = [s for s in (0, 1)
                  if any(abs(2 * int(d[a]) + s - p) <= max_tap for p in (0, 1))]
            pv = [p for p in (0, 1)
                  if any(abs(2 * int(d[a]) + s - p) <= max_tap for s in (0, 1))]
            s_vals.append(sv)
            p_vals.append(pv)
        if any(not v for v in s_vals + p_vals):
            continue
        # slot id = sum_a s_a * 2^a (axis 0 fastest) -> slot grid dims are
        # ordered slowest-axis-first; enumerate ranges in that same order.
        import itertools as _it

        s_list = [tuple(reversed(c)) for c in _it.product(*reversed(s_vals))]
        p_list = [tuple(reversed(c)) for c in _it.product(*reversed(p_vals))]
        taps = []
        any_tap = False
        for s in s_list:
            row = []
            for p in p_list:
                t = tuple(2 * int(d[a]) + s[a] - p[a] for a in range(dimension))
                row.append(tap_of.get(t, -1))
                any_tap |= t in tap_of
            taps.append(tuple(row))
        if not any_tap:
            continue
        s_ranges = tuple((min(v), max(v) + 1) for v in s_vals)
        p_ranges = tuple((min(v), max(v) + 1) for v in p_vals)
        steps.append((d_idx, s_ranges, p_ranges, tuple(taps),
                      bool((d == 0).all())))
    return BrickPlan(steps=tuple(steps), num_taps=len(offs_k),
                     num_slots=1 << dimension, dimension=dimension)


@struct.dataclass
class BrickMap:
    """Same-level conv geometry in brick layout: the coarse level's kernel
    map plus the static packing plan.  Duck-types the flat ``nbr`` array's
    ``.shape[0]`` (kernel volume) so model code is layout-agnostic."""

    nbr: Any  # [K3, NB] coarse same-level map (pad row = NB-1)
    plan: BrickPlan = struct.field(pytree_node=False, default=None)

    @property
    def shape(self):
        return (self.plan.num_taps,)


@struct.dataclass
class BrickDownMap:
    """Stride-2 k=2 down-conv geometry: where each conv output (a coarse
    voxel) sits in the *next* level's brick layout.  ``place=None`` marks a
    brick->voxel boundary: the matmul's output rows ARE the next level's
    flat voxel rows, so no placement is needed at all."""

    place: Any  # [2^D, NB_next] = down_nbr of level l+1, or None at boundary
    num_slots: int = struct.field(pytree_node=False, default=8)

    @property
    def shape(self):
        return (self.num_slots,)


def build_brick_pyramid(
    coords: np.ndarray,
    num_levels: int,
    npads: list,  # >= num_levels (+1 when every level is bricked)
    num_batch: int,
    dimension: int = 3,
    conv0_kernel_size: int = 3,
    allow_truncate: bool = True,
    brick_levels: int | None = None,
):
    """Build a hybrid pyramid: the finest ``brick_levels`` levels in brick
    layout (level l's bricks ARE level l+1's coordinates, so their gather
    maps are read one level up), the rest flat.  The layout transition is
    free in both directions: a brick down conv's matmul output already IS
    the flat next level, and a flat coarse level is already brick-indexed
    for the transpose conv.

    Brick layout pays an occupancy-bound FLOP inflation (2^D / avg brick
    occupancy) to amortize gather-row overhead, which wins at fine levels
    (small C, huge N) and loses at deep ones (C >= 128, tiny N) -- hence the
    hybrid default of 2 brick levels.

    Returns (Pyramid, PyramidMeta, rows0, orphan0):
      rows0[v]: level-0 row of input voxel v (scatter features there);
      orphan0[v]: True when coarse-level truncation dropped v's brick (such
      voxels have no row; callers must drop them and count the loss).

    Brick-level LevelTopo fields are reinterpreted (same model code paths):
      nbr/nbr0 -> BrickMap, down_nbr -> BrickDownMap,
      up_parent -> flat up-gather row ids, up_offset -> None,
      valid/batch -> slot-resolution [NB*2^D] arrays.
    """
    from pointcontrast_tpu.sparse.topology import LevelTopo, Pyramid, build_pyramid

    bl = num_levels if brick_levels is None else max(0, min(brick_levels, num_levels))
    depth = num_levels + 1 if bl >= num_levels else num_levels
    if len(npads) < depth:
        raise ValueError(f"hybrid pyramid needs {depth} npads, got {len(npads)}")
    base, meta = build_pyramid(
        coords,
        num_levels=depth,
        dimension=dimension,
        npads=list(npads[:depth]),
        num_batch=num_batch,
        conv0_kernel_size=conv0_kernel_size,
        allow_truncate=allow_truncate,
        first_nbr_level=1 if bl >= 1 else 0,
    )
    lv = base.levels
    ns = 1 << dimension
    plan3 = build_plan(3, dimension)
    plan0 = (
        build_plan(conv0_kernel_size, dimension)
        if conv0_kernel_size != 3 else None
    )
    levels = []
    for l in range(num_levels):
        if l >= bl:  # flat levels pass through unchanged
            levels.append(lv[l])
            continue
        pad_l = lv[l].valid.shape[0] - 1
        valid = (lv[l].down_nbr != pad_l).T.astype(np.float32).reshape(-1)
        batch = np.repeat(lv[l + 1].batch, ns).astype(np.int32)
        batch = np.where(valid > 0, batch, num_batch).astype(np.int32)
        next_is_brick = (l + 1) < bl
        down = BrickDownMap(
            lv[l + 1].down_nbr if next_is_brick else None, num_slots=ns
        )
        upg = (
            (lv[l + 1].up_parent.astype(np.int64) * ns + lv[l + 1].up_offset)
            .astype(np.int32)
            if next_is_brick else None
        )
        levels.append(
            LevelTopo(
                nbr=BrickMap(lv[l + 1].nbr, plan3),
                valid=valid,
                batch=batch,
                down_nbr=down,
                up_parent=upg,
                up_offset=None,
                nbr0=BrickMap(lv[l + 1].nbr, plan0) if l == 0 and plan0 else None,
            )
        )
    if bl >= 1:
        n0 = meta.counts[0]
        parent = lv[0].up_parent[:n0].astype(np.int64)
        orphan0 = parent == (lv[1].valid.shape[0] - 1)
        rows0 = (parent * ns + lv[0].up_offset[:n0]).astype(np.int64)
        rows0[orphan0] = 0  # callers must mask these via orphan0
    else:
        n0 = meta.counts[0]
        rows0 = np.arange(n0, dtype=np.int64)
        orphan0 = np.zeros(n0, dtype=bool)
    return Pyramid(levels=tuple(levels), num_batch=num_batch), meta, rows0, orphan0


def brick_conv(
    features: jnp.ndarray,  # [NB*2^D, Cin], empty slots zero
    nbr: jnp.ndarray,  # [K3, NB] coarse same-level map
    weights: jnp.ndarray,  # [K_taps, Cin, Cout] (kernel_offsets order)
    plan: BrickPlan,
    bias: jnp.ndarray | None = None,
    valid_out: jnp.ndarray | None = None,  # [NB*2^D]
) -> jnp.ndarray:
    """Same-level sparse conv over brick rows.

    Per neighbor offset d: gather whole brick rows (wide, bandwidth-bound),
    then one block matmul [NB, |S|*Cin] @ [|S|*Cin, |P|*Cout] whose (s, p)
    block is W[tap(2d+s-p)] (zero when outside the kernel region).  Python-
    unrolled so every slot selection/placement is a static slice, never a
    device gather/scatter.

    Differentiation goes through a custom VJP (scatter-free, minimal
    residuals) when the plan's tap set is centrally symmetric — see
    ``_brick_bwd``."""
    rev = _tap_reversal(plan)
    if rev is not None and valid_out is not None:
        out = _brick_sym(features, nbr, weights, plan, rev)
    else:
        out = _brick_core(features, nbr, weights, plan)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


@functools.lru_cache(maxsize=None)
def _tap_reversal(plan: BrickPlan):
    """Permutation over tap ids with offset(rev[t]) == -offset(t), derived
    from the plan's tap matrices (taps of d at (s, p) and of -d at (p, s)
    are negations of each other)."""
    by_d = {}
    for d_idx, s_r, p_r, taps, _ in plan.steps:
        by_d[d_idx] = (s_r, p_r, np.asarray(taps))
    k3 = 3 ** plan.dimension
    rev = np.full(plan.num_taps, -1, np.int64)
    for d_idx, (s_r, p_r, taps) in by_d.items():
        nd = k3 - 1 - d_idx  # hypercube enumeration: offset(k3-1-k) = -offset(k)
        if nd not in by_d:
            return None
        ns_r, np_r, ntaps = by_d[nd]
        if ns_r != p_r or np_r != s_r:
            return None
        for i in range(taps.shape[0]):
            for j in range(taps.shape[1]):
                t = taps[i, j]
                if t < 0:
                    continue
                t2 = ntaps[j, i]
                if t2 < 0:
                    return None
                rev[t] = t2
    if (rev < 0).any():
        return None
    return tuple(int(v) for v in rev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _brick_sym(features, nbr, weights, plan, rev):
    return _brick_core(features, nbr, weights, plan)


def _brick_sym_fwd(features, nbr, weights, plan, rev):
    return _brick_core(features, nbr, weights, plan), (features, nbr, weights)


def _slot_slice(x, nb, c, ranges, plan):
    """Brick rows (any layout reshapeable to [NB, ns, c]) restricted to a
    per-axis slot range -> [NB, n_range * c] (the range covering all slots
    is a plain reshape).  The ONE place that encodes the slot-axis ordering
    (slowest spatial axis first, reversed range list) — shared by the
    forward and the custom backward so the convention cannot drift."""
    ns, dim = plan.num_slots, plan.dimension
    n_r = int(np.prod([hi - lo for lo, hi in ranges]))
    if n_r == ns:
        return x.reshape(nb, ns * c), n_r
    g = x.reshape((nb,) + (2,) * dim + (c,))
    sl = tuple(slice(*ranges[dim - 1 - j]) for j in range(dim))
    return g[(slice(None),) + sl].reshape(nb, n_r * c), n_r


def _step_sources(features, f_rows, nbr, plan, step):
    """Gathered + slot-sliced source block ``gs [NB, n_s*cin]`` for one plan
    step (shared between _brick_core and _brick_sym_bwd)."""
    d_idx, s_ranges, p_ranges, taps, is_center = step
    nb = nbr.shape[1]
    cin = features.shape[-1]
    g = features if is_center else jnp.take(f_rows, nbr[d_idx], axis=0)
    gs, n_s = _slot_slice(g, nb, cin, s_ranges, plan)
    n_p = int(np.prod([hi - lo for lo, hi in p_ranges]))
    return gs, n_s, n_p


def _brick_sym_bwd(plan, rev, res, ct):
    """d_features is the same brick conv applied to the cotangent with
    weights W'[t] = W[-t]^T (pad/empty-slot cotangents are zero because the
    forward masks them); dW re-uses the forward's gathers: per neighbor d,
    dWd = gs^T @ ct_p and its (s, p) blocks accumulate into dW[tap]."""
    import itertools as _it

    features, nbr, weights = res
    wrev = jnp.transpose(
        jnp.take(weights, np.asarray(rev, np.int64), axis=0), (0, 2, 1)
    )
    df = _brick_core(ct, nbr, wrev, plan)

    nb = nbr.shape[1]
    ns = plan.num_slots
    cin = features.shape[-1]
    cout = ct.shape[-1]
    f_rows = features.reshape(nb, ns * cin)
    f32 = jnp.float32
    dw_blocks: dict = {}
    for step in plan.steps:
        taps = step[3]
        gs, n_s, n_p = _step_sources(features, f_rows, nbr, plan, step)
        cp, _ = _slot_slice(ct, nb, cout, step[2], plan)
        m = jnp.dot(gs.astype(f32).T, cp.astype(f32),
                    preferred_element_type=f32)
        m = m.reshape(n_s, cin, n_p, cout)
        for i, j in _it.product(range(n_s), range(n_p)):
            t = taps[i][j]
            if t < 0:
                continue
            blk = m[i, :, j, :]
            dw_blocks[t] = blk if t not in dw_blocks else dw_blocks[t] + blk
    dw = jnp.stack([dw_blocks[t] for t in range(plan.num_taps)], axis=0)
    return df, None, dw.astype(weights.dtype)


_brick_sym.defvjp(_brick_sym_fwd, _brick_sym_bwd)


def _brick_core(
    features: jnp.ndarray,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    plan: BrickPlan,
) -> jnp.ndarray:
    import itertools as _it

    nb = nbr.shape[1]
    ns = plan.num_slots
    dim = plan.dimension
    cin = features.shape[-1]
    cout = weights.shape[-1]
    f_rows = features.reshape(nb, ns * cin)
    acc: list = [None] * ns
    for step in plan.steps:
        _, _, p_ranges, taps, _ = step
        gs, n_s, n_p = _step_sources(features, f_rows, nbr, plan, step)
        tap_m = np.asarray(taps)
        wd = jnp.take(weights, np.maximum(tap_m, 0).reshape(-1), axis=0)
        wd = wd.reshape(n_s, n_p, cin, cout)
        if (tap_m < 0).any():
            wd = wd * jnp.asarray(
                (tap_m >= 0).astype(np.float32)
            )[:, :, None, None].astype(wd.dtype)
        wd = wd.transpose(0, 2, 1, 3).reshape(n_s * cin, n_p * cout)
        y = jnp.dot(gs, wd, preferred_element_type=jnp.float32)
        y = y.reshape(nb, n_p, cout)
        # output slots: row-major over the p ranges (slowest axis first),
        # mirroring the taps enumeration; slot id = sum_a v_a * 2^a.
        p_iter = _it.product(*[range(lo, hi) for lo, hi in reversed(p_ranges)])
        for j, pv in enumerate(p_iter):
            slot = sum(v << (dim - 1 - a) for a, v in enumerate(pv))
            sl = y[:, j, :]
            acc[slot] = sl if acc[slot] is None else acc[slot] + sl
    out = jnp.stack(
        [a if a is not None else jnp.zeros((nb, cout), jnp.float32) for a in acc],
        axis=1,
    ).reshape(nb * ns, cout).astype(features.dtype)
    return out


def brick_down_conv(
    features: jnp.ndarray,  # [NB*2^D, Cin] level-l brick rows
    place: jnp.ndarray,  # [2^D, NB_next] level-(l+1) down_nbr
    weights: jnp.ndarray,  # [2^D, Cin, Cout]
    bias: jnp.ndarray | None = None,
    valid_out: jnp.ndarray | None = None,  # [NB_next*2^D]
) -> jnp.ndarray:
    """Stride-2 k=2 conv: slots ARE the kernel offsets, so the conv itself is
    one dense matmul; the gather only re-lays the outputs (level-(l+1)
    voxels) into level-(l+1)'s own brick layout.  With ``place=None`` the
    matmul result is returned directly as flat voxel rows (hybrid-pyramid
    boundary: the coarser level runs in the flat layout)."""
    ns, cin, cout = weights.shape
    nb = features.shape[0] // ns
    y = jnp.dot(
        features.reshape(nb, ns * cin),
        weights.reshape(ns * cin, cout),
        preferred_element_type=jnp.float32,
    )  # [nb = npad_{l+1}, cout], row v = conv output at level-(l+1) voxel v
    if place is None:
        out = y.astype(features.dtype)
    else:
        nb_next = place.shape[1]
        out = jnp.take(y, place.reshape(-1), axis=0)  # slot-major
        out = out.reshape(ns, nb_next, cout).transpose(1, 0, 2)
        out = out.reshape(nb_next * ns, cout).astype(features.dtype)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def brick_up_conv(
    features: jnp.ndarray,  # [NB_coarse*2^D, Cin] level-(l+1) brick rows
    up_gather: jnp.ndarray,  # [NB_l] level-(l+1) voxel -> its brick-layout row
    weights: jnp.ndarray,  # [2^D, Cin, Cout]
    bias: jnp.ndarray | None = None,
    valid_out: jnp.ndarray | None = None,  # [NB_l*2^D]
) -> jnp.ndarray:
    """Stride-2 k=2 transpose conv onto the reused finer level: a fine brick's
    id IS its coarse parent voxel, and a fine voxel's slot IS its kernel
    offset, so this is one gather + one [NB, Cin] @ [Cin, 2^D*Cout] matmul.
    With ``up_gather=None`` (hybrid boundary: the coarse level is flat) the
    gather is the identity -- coarse voxel rows are already brick-indexed."""
    ns, cin, cout = weights.shape
    if up_gather is None:
        g = features  # flat coarse rows: row b IS fine brick b's parent
    else:
        g = jnp.take(features, up_gather, axis=0)  # [NB_l, cin]
    nb = g.shape[0]
    w = jnp.transpose(weights, (1, 0, 2)).reshape(cin, ns * cout)
    out = jnp.dot(g, w, preferred_element_type=jnp.float32)
    out = out.reshape(nb * ns, cout).astype(features.dtype)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out
