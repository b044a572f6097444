"""Bilateral / trilateral mean-field CRF wrappers.

Mirrors /root/reference/downstream/votenet_det_new/models/backbone/
sparseconv/models/conditional_random_fields.py:19-173 and wrapper.py:12-35:
the segmentation logits are refined by mean-field iterations of
(softmax -> pairwise sparse conv in a bilateral grid -> + unary).  The
bilateral grid lives in 6D (x,y,z)/sigma_s ⊕ (r,g,b)/sigma_c (7D with time);
our generic N-D kernel-map machinery builds its neighbor map host-side, so
the filter itself is an ordinary static-shape jitted loop.

The reference skips the filter with p=0.5 during training to keep the
backbone filter-invariant (wrapper.py:29-31); callers control that with
``apply_filter``.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from flax import linen as nn

from pointcontrast_tpu.sparse import ops
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import _same_level_map


def build_bilateral_map(
    coords: np.ndarray,  # [N, 1+3] int (batch, x, y, z) voxel coords
    colors: np.ndarray,  # [N, 3] in [0, 255]
    npad: int,
    spatial_sigma: float = 1.0,
    chromatic_sigma: float = 12.0,
    kernel_size: int = 3,
    region: str = "hypercross",
    time_coords: np.ndarray | None = None,
    temporal_sigma: float = 1.0,
    rows: np.ndarray | None = None,
) -> np.ndarray:
    """Neighbor map over the (tri/)bilateral grid -> [K, npad] int32.

    Mirrors MeanField.initialize_coords' grid construction
    (conditional_random_fields.py:67-122): floor(spatial/sigma_s) ⊕
    floor(color/sigma_c) (⊕ floor(t/sigma_t)) ⊕ batch.

    rows: optional row placement — voxel i of ``coords`` lives at feature row
    ``rows[i]`` instead of row i (the chunked layout's per-sample slices,
    sparse/chunk.py).  The returned map is then a FLAT [K, npad] map over the
    scattered rows with missing neighbors (and unoccupied rows) pointing at
    the global pad row npad-1, which is a zero row in every layout — so the
    CRF head runs flat-conv over chunked-arranged logits without any
    backbone-layout downgrade (VERDICT r3 item 8)."""
    cols = [
        coords[:, :1],  # batch first (matches our (b, spatial...) layout)
        np.floor(coords[:, 1:4] / spatial_sigma).astype(np.int32),
        np.floor(colors / chromatic_sigma).astype(np.int32),
    ]
    if time_coords is not None:
        cols.append(np.floor(time_coords[:, None] / temporal_sigma).astype(np.int32))
    grid = np.concatenate(cols, axis=1).astype(np.int32)
    dim = grid.shape[1] - 1
    offs = kernel_offsets(kernel_size, dim, region)
    if rows is None:
        return _same_level_map(grid, offs, npad, dim)
    n = len(grid)
    packed = _same_level_map(grid, offs, n + 1, dim)  # pad index == n
    rows = np.asarray(rows, np.int64)
    trans = np.concatenate([rows, [npad - 1]]).astype(np.int32)
    out = np.full((len(offs), npad), npad - 1, dtype=np.int32)
    out[:, rows] = trans[packed[:, :n]]
    return out


class MeanFieldCRF(nn.Module):
    """Mean-field iterations with a learned pairwise kernel
    (conditional_random_fields.py:124-146)."""

    nchannels: int
    kernel_volume: int
    meanfield_iterations: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, unary, crf_nbr, valid):
        dtype = self.dtype or unary.dtype
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.1),
            (self.kernel_volume, self.nchannels, self.nchannels),
        ).astype(dtype)
        out = unary
        for _ in range(self.meanfield_iterations):
            out = jax.nn.softmax(out, axis=1)
            out = ops.mask_rows(out, valid)
            out = ops.sparse_conv(out, crf_nbr, kernel, valid_out=valid)
            out = out + unary
        return out


class Wrapper(nn.Module):
    """Backbone + CRF filter (reference wrapper.py:12-35).  The backbone is
    any registry model; the CRF neighbor map comes in with the batch."""

    net: nn.Module
    nchannels: int
    kernel_volume: int
    meanfield_iterations: int = 10

    @nn.compact
    def __call__(self, features, pyramid, crf_nbr, train: bool = True,
                 apply_filter: bool = True):
        logits = self.net(features, pyramid, train=train)
        if not apply_filter:
            return logits
        return MeanFieldCRF(
            self.nchannels, self.kernel_volume,
            self.meanfield_iterations, name="filter",
        )(logits, crf_nbr, pyramid.levels[0].valid)


class BilateralCRF(Wrapper):
    """6D grid: spatial + chromatic (conditional_random_fields.py:148-159)."""


class TrilateralCRF(Wrapper):
    """7D grid: spatial + chromatic + temporal
    (conditional_random_fields.py:161-173)."""
