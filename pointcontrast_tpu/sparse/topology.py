"""Batch coordinate pyramid + kernel maps: the coordinate-manager replacement.

MinkowskiEngine builds (and caches) kernel maps inside its C++ coordinate
manager every time a conv layer runs (reference call path:
/root/reference/pretrain/pointcontrast/model/modules/common.py:127-167 ->
ME.MinkowskiConvolution).  The TPU design inverts this: the full coordinate
pyramid for a sparse U-Net -- every stride level's coordinate set and every
gather map -- is computed *once per batch on the host* (vectorized numpy) and
fed to the jitted step as static-shaped int32 arrays.  The jitted graph is
then pure gather + matmul, which XLA maps straight onto the MXU.

Key structural facts that make the maps gather-only (no scatter):
  - stride-1 conv: output coords == input coords; for each kernel offset an
    output voxel has at most ONE input neighbor  -> nbr[K, N] gather map.
  - stride-2 k=2 conv: output coords = unique(floor(in/2)); input child at
    2c+off exists at most once per offset       -> down_nbr[2^D, N_out].
  - stride-2 k=2 transpose conv: outputs at the (reused) finer level coords;
    each fine voxel has exactly one coarse parent and one kernel offset
    (f - 2*floor(f/2))                          -> up_parent/up_offset[N_out].

Missing neighbors point at the last padded row, whose features are kept at
zero by the masked ops in ``sparse.ops``, so no masking is needed inside the
matmul itself.

All shapes are padded to bucketed sizes (``bucket_size``) so XLA sees a small
number of distinct compiled shapes across batches.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
from flax import struct

from pointcontrast_tpu.sparse.hashing import HashSpec
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, reversal_permutation

_BUCKET_BASE = 256


def _shrink_idx(arr: np.ndarray, index_space: int) -> np.ndarray:
    """Downcast gather maps to uint16 when every index fits: halves the
    host->device bytes for all but the finest level's maps (XLA widens
    indices on device for free; the transfer is what costs)."""
    if arr is not None and index_space <= 65536:
        return arr.astype(np.uint16)
    return arr


def bucket_size(n: int, base: int = _BUCKET_BASE) -> int:
    """Smallest bucket strictly greater than n, from a geometric {1, 1.5}*2^k
    grid, so recompilation happens only O(log N) times across batch sizes."""
    b = base
    while b <= n:
        b = b * 3 // 2 if (b & (b - 1)) == 0 else (b // 3) * 4
    return b


# flax.struct needs a type annotation object; arrays may be numpy or jax.
# (must precede LevelTopo: only the from-__future__ lazy annotations keep a
# later definition working, and that is one typing/flax change from breaking)
jnp_array = object


@struct.dataclass
class LevelTopo:
    """Static-shaped per-level gather maps (device-side pytree)."""

    nbr: jnp_array = struct.field(default=None)  # [K, Npad] same-level map
    valid: jnp_array = struct.field(default=None)  # [Npad] float32 mask
    batch: jnp_array = struct.field(default=None)  # [Npad] int32 sample id
    down_nbr: Optional["jnp_array"] = None  # [2^D, Npad_next]: level l -> l+1
    down_nbr3: Optional["jnp_array"] = None  # [3^D, Npad_next]: k=3 s=2 map
    up_parent: Optional["jnp_array"] = None  # [Npad]: idx into level l+1
    up_offset: Optional["jnp_array"] = None  # [Npad]: kernel offset id in [0, 2^D)
    nbr0: Optional["jnp_array"] = None  # level-0 only: conv0 map when k != 3
    # static offset-reversal permutations for nbr/nbr0 (None when the kernel
    # region is not centrally symmetric): enable the scatter-free conv
    # backward (ops._conv_sym_bwd)
    rev: Optional[tuple] = struct.field(pytree_node=False, default=None)
    rev0: Optional[tuple] = struct.field(pytree_node=False, default=None)


@struct.dataclass
class Pyramid:
    levels: tuple
    num_batch: int = struct.field(pytree_node=False, default=1)


@dataclasses.dataclass
class PyramidMeta:
    """Host-only metadata (not part of the jitted pytree)."""

    coords: list  # [Nl, 1+D] int32 level coords in level units, padded rows excluded
    counts: list  # true voxel count per level
    npads: list  # padded size per level
    dimension: int
    truncated: list  # (level, n_dropped) pairs when allow_truncate kicked in


def _key_join(keys: np.ndarray, base: np.ndarray, off_keys: np.ndarray,
              pad: int) -> np.ndarray:
    """[K, len(base)] indices into ``keys``'s row order for every query
    ``base[i] + off_keys[k]``; misses map to ``pad``.  The single hash-join
    primitive behind every gather map (native hash table when available,
    sorted-key searchsorted otherwise)."""
    from pointcontrast_tpu.sparse import native

    if native.get_lib() is not None:
        return native.query_map(keys, base, off_keys, pad)

    n = len(keys)
    qkeys = base[None, :].astype(np.int64) + off_keys[:, None]  # [K, M]
    if n == 0:
        return np.full(qkeys.shape, pad, dtype=np.int32)
    order = np.argsort(keys)
    skeys = keys[order]
    pos = np.searchsorted(skeys, qkeys.ravel()).reshape(qkeys.shape)
    pos_c = np.minimum(pos, n - 1)
    found = skeys[pos_c] == qkeys
    return np.where(found, order[pos_c], pad).astype(np.int32)


def _same_level_map(
    coords: np.ndarray, offsets: np.ndarray, npad: int, dimension: int
) -> np.ndarray:
    """nbr[K, npad]: for each output voxel j and offset k, the index of the
    input voxel at coords[j] + offsets[k], else the pad row (npad-1).

    Key linearity makes this cheap: with a mixed-radix spec, the key of
    ``c + off`` is ``key(c) + off . stride``, so each offset's query keys are
    one scalar away from the precomputed base keys."""
    n = len(coords)
    pad = npad - 1
    max_off = int(np.abs(offsets).max()) if len(offsets) else 0
    spec = HashSpec.from_coords(coords, margin=max_off + 1)
    keys = spec.encode(coords)  # [N]
    off_keys = offsets.astype(np.int64) @ spec.stride[1:]  # [K]

    out = np.full((len(offsets), npad), pad, dtype=np.int32)
    out[:, :n] = _key_join(keys, keys, off_keys, pad)
    return out


def _downsample(coords: np.ndarray, stride_axes: np.ndarray | None = None):
    """Unique floor(c/2) coarse coords + per-fine parent index & offset id.

    stride_axes: bool mask over spatial axes; False axes are not halved
    (spatio-temporal nets stride (2,2,2,1), reference resunet.py
    space_n_time_m)."""
    coarse_of_fine = coords.copy()
    if stride_axes is None:
        coarse_of_fine[:, 1:] = np.floor_divide(coords[:, 1:], 2)
    else:
        halved = np.floor_divide(coords[:, 1:], 2)
        coarse_of_fine[:, 1:] = np.where(stride_axes[None, :], halved, coords[:, 1:])
    spec = HashSpec.from_coords(coarse_of_fine)

    if stride_axes is None and coords.shape[1] == 4:
        from pointcontrast_tpu.sparse import native

        if native.get_lib() is not None:
            coarse, parent = native.downsample(coords, spec.lo, spec.stride)
            child_off = (coords[:, 1:] - 2 * coarse_of_fine[:, 1:]).astype(np.int32)
            return coarse, parent, child_off

    keys = spec.encode(coarse_of_fine)
    sorted_keys, first_idx, inverse = np.unique(
        keys, return_index=True, return_inverse=True
    )
    # Keep coarse voxels in first-occurrence (input) order for determinism.
    perm = np.argsort(first_idx, kind="stable")  # rank -> slot order
    slot_of_rank = np.empty_like(perm)
    slot_of_rank[perm] = np.arange(len(perm))
    coarse = coarse_of_fine[np.sort(first_idx)]
    parent = slot_of_rank[inverse].astype(np.int32)  # fine -> coarse slot
    if stride_axes is None:
        child_off = (coords[:, 1:] - 2 * coarse_of_fine[:, 1:]).astype(np.int32)
    else:
        scale = np.where(stride_axes, 2, 1)[None, :]
        child_off = (coords[:, 1:] - scale * coarse_of_fine[:, 1:]).astype(np.int32)
    return coarse, parent, child_off


def build_pyramid(
    coords: np.ndarray,
    num_levels: int,
    dimension: int = 3,
    conv0_kernel_size: int = 3,
    block_kernel_size: int = 3,
    region: str = "hypercube",
    npads: list | None = None,
    num_batch: int | None = None,
    allow_truncate: bool = True,
    build_down3: bool = False,
    axis_types: tuple | None = None,
    stride_axes: tuple | None = None,
    first_nbr_level: int = 0,
):
    """Build the full coordinate pyramid for a sparse U-Net.

    Args:
      coords: [N, 1+dimension] int array of unique batched voxel coords
        (batch index first, spatial coords in voxel units).
      num_levels: number of stride levels (Res16UNet: 5 -> strides 1,2,4,8,16).
      conv0_kernel_size: kernel size of the stem conv (level 0); if != 3 an
        extra map ``nbr0`` is built.
      npads: optional explicit padded sizes per level (default: bucket_size).
      allow_truncate: drop coarse voxels beyond a level's pad instead of
        raising (meta.truncated records (level, n_dropped)).
      build_down3: also build kernel-3 stride-2 maps (``down_nbr3``), used by
        the ResNet family's strided residual blocks (reference
        downstream/semseg/models/resnet.py:99-130 builds stride-2 k=3 convs).
      axis_types: for region='hybrid', per-axis 'hypercube'/'hypercross'
        (4D spatio-temporal nets: cube over space, cross over time).
      stride_axes: per-spatial-axis bool, False = not downsampled
        (ST nets stride (2,2,2,1)).
      first_nbr_level: skip building same-level kernel maps for levels below
        this index (brick layout reads level l's conv geometry from level
        l+1's map, so level 0's -- the largest -- is never needed).

    Returns:
      (Pyramid, PyramidMeta)
    """
    coords = np.asarray(coords)
    if coords.ndim != 2 or coords.shape[1] != dimension + 1:
        raise ValueError(f"coords must be [N, {dimension + 1}], got {coords.shape}")
    coords = coords.astype(np.int32)
    if num_batch is None:
        num_batch = int(coords[:, 0].max()) + 1 if len(coords) else 1

    offs3 = kernel_offsets(
        block_kernel_size, dimension, region,
        axis_types=tuple(axis_types) if axis_types else None,
    )
    sa = np.asarray(
        stride_axes if stride_axes is not None else [True] * dimension, bool
    )
    down_ks = tuple(2 if v else 1 for v in sa)
    offs2 = kernel_offsets(down_ks, dimension, "hypercube")
    stride_vec = None if sa.all() else sa

    levels = []
    meta_coords, meta_counts, meta_npads, truncated = [], [], [], []
    cur = coords
    for lvl in range(num_levels):
        n = len(cur)
        npad = npads[lvl] if npads is not None else bucket_size(n)
        if npad <= n:
            raise ValueError(f"level {lvl}: npad {npad} must exceed count {n}")

        nbr = (
            _same_level_map(cur, offs3, npad, dimension)
            if lvl >= first_nbr_level else None
        )
        valid = np.zeros(npad, dtype=np.float32)
        valid[:n] = 1.0
        batch = np.full(npad, num_batch, dtype=np.int32)
        batch[:n] = cur[:, 0]

        nbr0 = None
        rev0 = None
        if (
            lvl == 0
            and first_nbr_level == 0  # brick callers skip all level-0 maps
            and (conv0_kernel_size != block_kernel_size or axis_types)
        ):
            ks0 = (
                tuple(conv0_kernel_size if v else 1 for v in sa)
                if stride_vec is not None else conv0_kernel_size
            )
            offs0 = kernel_offsets(ks0, dimension, "hypercube")
            nbr0 = _same_level_map(cur, offs0, npad, dimension)
            rev0 = reversal_permutation(offs0)

        level = dict(
            nbr=_shrink_idx(nbr, npad), valid=valid, batch=batch,
            nbr0=_shrink_idx(nbr0, npad),
            rev=reversal_permutation(offs3) if nbr is not None else None,
            rev0=rev0,
        )
        meta_coords.append(cur)
        meta_counts.append(n)
        meta_npads.append(npad)

        if lvl < num_levels - 1:
            coarse, parent, child_off = _downsample(cur, stride_vec)
            nc = len(coarse)
            npad_next = npads[lvl + 1] if npads is not None else bucket_size(nc)
            if npad_next <= nc:
                if not allow_truncate:
                    raise ValueError(
                        f"level {lvl + 1}: npad {npad_next} must exceed count {nc}"
                    )
                # Graceful truncation: keep the first npad-1 coarse voxels
                # (first-occurrence order); orphaned fine voxels point at the
                # coarse pad row, so they receive zeros from the decoder's
                # transpose conv but keep their encoder features via the skip
                # concat.  Bounded accuracy loss instead of a shape blow-up.
                limit = npad_next - 1
                coarse = coarse[:limit]
                dropped = parent >= limit
                parent = np.where(dropped, limit, parent).astype(np.int32)
                child_off = np.where(dropped[:, None], 0, child_off).astype(np.int32)
                truncated.append((lvl + 1, nc - limit))
                nc = limit
            up_parent = np.full(npad, npad_next - 1, dtype=np.int32)
            up_parent[:n] = parent
            up_offset = np.zeros(npad, dtype=np.int32)
            pow2 = 1 << np.arange(dimension)
            lut = np.full(1 << dimension, -1, dtype=np.int32)
            lut[offs2 @ pow2] = np.arange(len(offs2), dtype=np.int32)
            up_offset[:n] = lut[child_off @ pow2]
            # down_nbr built from the coarse (output) side: child at 2c + off.
            # Base key of the doubled coarse coords + linear offset keys.
            down_nbr = np.full((len(offs2), npad_next), npad - 1, dtype=np.int32)
            fine_spec = HashSpec.from_coords(cur, margin=2)
            fine_keys = fine_spec.encode(cur)
            doubled = coarse.astype(np.int64).copy()
            doubled[:, 1:] *= np.where(sa, 2, 1)[None, :]
            base = fine_spec.encode(doubled)  # [nc]
            off_keys = offs2.astype(np.int64) @ fine_spec.stride[1:]
            down_nbr[:, :nc] = _key_join(fine_keys, base, off_keys, npad - 1)

            level.update(
                down_nbr=_shrink_idx(down_nbr, npad),
                up_parent=_shrink_idx(up_parent, npad_next),
                up_offset=up_offset.astype(np.uint16),
            )

            if build_down3:
                offs3s = kernel_offsets(3, dimension, "hypercube")
                off3_keys = offs3s.astype(np.int64) @ fine_spec.stride[1:]
                down_nbr3 = np.full((len(offs3s), npad_next), npad - 1, dtype=np.int32)
                down_nbr3[:, :nc] = _key_join(fine_keys, base, off3_keys, npad - 1)
                level.update(down_nbr3=_shrink_idx(down_nbr3, npad))

            cur = coarse
        levels.append(LevelTopo(**level))

    pyramid = Pyramid(levels=tuple(levels), num_batch=num_batch)
    meta = PyramidMeta(
        coords=meta_coords, counts=meta_counts, npads=meta_npads,
        dimension=dimension, truncated=truncated,
    )
    return pyramid, meta
