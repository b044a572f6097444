"""Fixed-shape pair collation: variable point clouds -> static XLA shapes.

The reference collates by plain concatenation with running index offsets
(/root/reference/pretrain/pointcontrast/lib/ddp_data_loaders.py:52-112) and
lets the GPU kernels cope with dynamic sizes; its loss then samples positive
pairs and hard-negative candidates *per iteration on the CPU*
(lib/ddp_trainer.py:199-234, :403-417).  TPU-first inversion: everything
dynamic happens here, once, on the host —

  1. concatenate the batch, prepend batch indices, offset the matches
     (same semantics as ``default_collate_pair_fn``);
  2. build both frames' full coordinate pyramids (all gather maps) padded to
     the static sizes of a ``PadScheme``;
  3. pre-sample the loss indices (PointInfoNCE anchors / hardest-contrastive
     positives+candidates+collision bitmaps) to fixed sizes with validity
     masks.

The jitted train step then runs with zero host syncs and one compiled shape.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
from flax import struct

from pointcontrast_tpu.sparse.brick import build_brick_pyramid
from pointcontrast_tpu.sparse.topology import build_pyramid

jnp_array = Any


@dataclasses.dataclass(frozen=True)
class PadScheme:
    """Static padded sizes for a batch's coordinate pyramid.

    ``npads[l]`` must exceed the true voxel count at level ``l``; level
    counts shrink ~4x per stride-2 downsample on surface data, so a shrink
    factor of 2 leaves a wide margin.  One PadScheme == one compiled program.
    """

    npad0: int
    num_levels: int = 5
    shrink: float = 2.0
    min_pad: int = 256
    # Per-level pad ratios (override shrink when set). ScanNet-like surface
    # data at 2.5cm measures ~(1.0, 0.65, 0.25, 0.07, 0.02); the defaults
    # leave ~25% headroom — deeper-level overflow degrades gracefully via
    # build_pyramid's truncation, so tight pads trade rare cropping for a
    # 15-20% cut in per-conv gather traffic.
    level_ratios: tuple | None = None

    @property
    def npads(self) -> list[int]:
        return self.npads_for(self.num_levels)

    def npads_for(self, n_levels: int) -> list[int]:
        """Padded sizes for ``n_levels`` levels (the brick layout needs
        ``num_levels + 1``: level l's bricks are level l+1's coordinates).
        Levels beyond the configured ratios extrapolate with the last
        observed shrink factor."""
        if self.level_ratios is not None:
            if len(self.level_ratios) < self.num_levels:
                raise ValueError(
                    f"level_ratios has {len(self.level_ratios)} entries but "
                    f"num_levels={self.num_levels}"
                )
            ratios = list(self.level_ratios[:n_levels])
            while len(ratios) < n_levels:
                shrink = (
                    ratios[-1] / ratios[-2]
                    if len(ratios) >= 2 and ratios[-2] else 0.5
                )
                ratios.append(ratios[-1] * min(shrink, 1.0))
            return [
                max(int(self.npad0 * r) + 1, self.min_pad) for r in ratios
            ]
        # Level 1 keeps the level-0 budget: at fine voxel sizes the first
        # downsample can merge almost nothing (isolated surface voxels), so
        # shrinking starts at level 2.
        return [
            max(int(self.npad0 / self.shrink ** max(lvl - 1, 0)) + 1, self.min_pad)
            for lvl in range(n_levels)
        ]

    @staticmethod
    def scannet(npad0: int, num_levels: int = 5) -> "PadScheme":
        """Tight pads for ScanNet-density scenes (2-2.5cm voxels).

        Ratios are measured on saturated surface scans (every surface voxel
        in view occupied, like real depth-frame unprojections and merged
        scene meshes): level counts shrink ~(1, 0.29, 0.073, 0.019, 0.005)
        per stride; entries carry ~30-40% headroom on top.  Data sparser
        than that (sub-voxel-density point samples) merges less per stride
        -- use an explicit ``level_ratios`` for such inputs."""
        return PadScheme(
            npad0, num_levels,
            level_ratios=(1.0, 0.38, 0.105, 0.03, 0.011, 0.004),
        )


@struct.dataclass
class PairBatch:
    """Device-side batch pytree (all arrays statically shaped)."""

    feats0: jnp_array  # [npad0, C] padded rows zero
    feats1: jnp_array
    pyramid0: Any  # sparse.topology.Pyramid
    pyramid1: Any
    # PointInfoNCE sampling (None in hardest-contrastive mode)
    q_idx: Optional[jnp_array] = None  # [npos] rows into frame-0 features
    k_idx: Optional[jnp_array] = None  # [npos] rows into frame-1 features
    pair_valid: Optional[jnp_array] = None  # [npos] float 1/0
    # hardest-contrastive sampling (None in NCE mode)
    pos0_idx: Optional[jnp_array] = None  # [P]
    pos1_idx: Optional[jnp_array] = None  # [P]
    pos_valid: Optional[jnp_array] = None  # [P]
    cand0_idx: Optional[jnp_array] = None  # [H]
    cand0_valid: Optional[jnp_array] = None  # [H]
    cand1_idx: Optional[jnp_array] = None  # [H]
    cand1_valid: Optional[jnp_array] = None  # [H]
    collide0: Optional[jnp_array] = None  # [P, H/8] uint8 (bit-packed, LE)
    collide1: Optional[jnp_array] = None  # [P, H/8] uint8 (bit-packed, LE)
    # scalar count of voxels dropped by graceful coarse-level truncation
    # (topology.PyramidMeta.truncated); a pytree leaf so the jitted step can
    # surface it in metrics without recompilation or host syncs
    truncated_voxels: Optional[jnp_array] = None
    # host-side metadata (not traced)
    num_pairs: int = struct.field(pytree_node=False, default=0)


def _concat_with_batch_index(coords_list, feats_list):
    rows = []
    for b, c in enumerate(coords_list):
        bc = np.concatenate(
            [np.full((len(c), 1), b, dtype=np.int32), c.astype(np.int32)], axis=1
        )
        rows.append(bc)
    return np.concatenate(rows, 0), np.concatenate(feats_list, 0).astype(np.float32)


def _offset_matches(matches_list, len0, len1):
    out = []
    o0 = o1 = 0
    for m, n0, n1 in zip(matches_list, len0, len1):
        if len(m) == 0:
            m = np.zeros((1, 2), dtype=np.int64)  # dummy (0,0), as reference :83-85
        out.append(m + np.array([o0, o1], dtype=np.int64))
        o0 += n0
        o1 += n1
    return np.concatenate(out, 0)


def _pad_feats(feats: np.ndarray, npad: int) -> np.ndarray:
    out = np.zeros((npad, feats.shape[1]), dtype=np.float32)
    out[: len(feats)] = feats
    return out


def _brick_feats(feats: np.ndarray, rows: np.ndarray, orphan: np.ndarray,
                 nrows: int) -> np.ndarray:
    """Scatter voxel features to their brick-layout rows (orphans dropped so
    the zero-row invariant holds for every absent voxel)."""
    out = np.zeros((nrows, feats.shape[1]), dtype=np.float32)
    keep = ~orphan
    out[rows[keep]] = feats[keep]
    return out


def _remap_idx(idx, valid, rows: np.ndarray, orphan: np.ndarray):
    """Map loss indices from voxel ids to brick rows; entries pointing at
    orphaned (truncation-dropped) voxels are invalidated."""
    idx = np.asarray(idx, dtype=np.int64)
    ok = ~orphan[idx]
    out = rows[idx].astype(np.int32)
    out[~ok] = 0
    v = ok.astype(np.float32) if valid is None else (valid * ok).astype(np.float32)
    return out, v


def _subsample_frame(coords, feats, keep_n, rng):
    """Random voxel subset preserving order (overflow safety valve)."""
    sel = np.sort(rng.choice(len(coords), keep_n, replace=False))
    remap = np.full(len(coords), -1, dtype=np.int64)
    remap[sel] = np.arange(keep_n)
    return coords[sel], feats[sel], remap


def parse_layout(layout: str):
    """'voxel' | 'chunked' | 'brick' (default 2 brick levels) | 'brick:N'
    -> (kind, N)."""
    if layout == "voxel":
        return "voxel", 0
    if layout == "chunked":
        return "chunked", 0
    if layout == "brick":
        return "brick", 2
    if layout.startswith("brick:"):
        return "brick", int(layout.split(":", 1)[1])
    raise ValueError(f"unknown layout {layout!r}")


def _build_padded_pyramid(coords, scheme: PadScheme, num_batch: int,
                          conv0_kernel_size: int = 3, layout: str = "voxel"):
    """Returns (pyramid, meta, rows, orphan); rows/orphan are None for the
    flat voxel layout and the brick-row mapping for layout='brick[:N]'."""
    kind, brick_levels = parse_layout(layout)
    if kind == "brick":
        pyr, meta, rows, orphan = build_brick_pyramid(
            coords,
            num_levels=scheme.num_levels,
            npads=scheme.npads_for(scheme.num_levels + 1),
            num_batch=num_batch,
            conv0_kernel_size=conv0_kernel_size,
            brick_levels=brick_levels,
        )
        return pyr, meta, rows, orphan
    if kind == "chunked":
        from pointcontrast_tpu.sparse.chunk import build_chunked_pyramid

        pyr, meta, rows, orphan = build_chunked_pyramid(
            coords,
            num_levels=scheme.num_levels,
            npads=scheme.npads,
            num_batch=num_batch,
            conv0_kernel_size=conv0_kernel_size,
        )
        return pyr, meta, rows, orphan
    pyr, meta = build_pyramid(
        coords,
        num_levels=scheme.num_levels,
        npads=scheme.npads,
        num_batch=num_batch,
        conv0_kernel_size=conv0_kernel_size,
    )
    return pyr, meta, None, None


def sample_nce_pairs(
    matches: np.ndarray, npos: int, rng: np.random.RandomState
):
    """PointInfoNCE anchor sampling (reference ddp_trainer.py:403-417):
    one random positive per unique frame-0 anchor, then subsample to
    ``npos`` anchors; padded with zeros + validity mask."""
    q_idx = np.zeros(npos, dtype=np.int32)
    k_idx = np.zeros(npos, dtype=np.int32)
    valid = np.zeros(npos, dtype=np.float32)
    if len(matches):
        # run reconstruction below requires source-major ordering; sort
        # defensively (in-repo matches are already lexsorted — cheap check)
        src = matches[:, 0]
        if np.any(src[1:] < src[:-1]):
            matches = matches[np.argsort(src, kind="stable")]
        uniq, counts = np.unique(matches[:, 0], return_counts=True)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        off = np.floor(rng.rand(len(counts)) * counts).astype(np.int64)
        # matches are sorted by source index, so runs are contiguous
        k_sel = matches[starts + off, 1]
        if npos < len(uniq):
            pick = rng.choice(len(uniq), npos, replace=False)
            uniq, k_sel = uniq[pick], k_sel[pick]
        n = len(uniq)
        q_idx[:n] = uniq
        k_idx[:n] = k_sel
        valid[:n] = 1.0
    return q_idx, k_idx, valid


def sample_hardest_contrastive(
    matches: np.ndarray,
    n0: int,
    n1: int,
    num_pos: int,
    num_hn: int,
    rng: np.random.RandomState,
):
    """Positive-pair + hard-negative-candidate sampling with precomputed
    collision bitmaps (reference ddp_trainer.py:186-238; the bitmaps replace
    its per-iteration numpy hash/isin on the argmin results, making the loss
    fully device-resident)."""
    h0 = min(n0, num_hn)
    h1 = min(n1, num_hn)
    cand0 = np.zeros(num_hn, dtype=np.int32)
    cand1 = np.zeros(num_hn, dtype=np.int32)
    cand0[:h0] = rng.choice(n0, h0, replace=False)
    cand1[:h1] = rng.choice(n1, h1, replace=False)
    cand0_valid = (np.arange(num_hn) < h0).astype(np.float32)
    cand1_valid = (np.arange(num_hn) < h1).astype(np.float32)

    p = min(len(matches), num_pos)
    pos0 = np.zeros(num_pos, dtype=np.int32)
    pos1 = np.zeros(num_pos, dtype=np.int32)
    if len(matches) > num_pos:
        pick = rng.choice(len(matches), num_pos, replace=False)
        sampled = matches[pick]
    else:
        sampled = matches
    pos0[:p] = sampled[:, 0]
    pos1[:p] = sampled[:, 1]
    pos_valid = (np.arange(num_pos) < p).astype(np.float32)

    # Collision bitmaps against the FULL positive set (reference hashes all
    # positive_pairs, not just the sampled ones — ddp_trainer.py:222-234).
    # Sparse build: each anchor has only a handful of true matches, so mark
    # exactly those (anchor, candidate-position) cells instead of testing all
    # P x H memberships.
    # Bit-packed along the candidate axis (H/8 bytes/row, little-endian bit
    # order): the loss only ever tests bit [i, argmin_i], so it gathers the
    # byte and shifts — an 8x cut in H2D bitmap traffic (8 MB -> 1 MB/batch
    # at P=4096, H=1024).
    collide0 = np.packbits(
        _collision_bitmap(matches[:, 0], matches[:, 1], pos0, cand1, h1, n1),
        axis=1, bitorder="little",
    )
    collide1 = np.packbits(
        _collision_bitmap(matches[:, 1], matches[:, 0], pos1, cand0, h0, n0),
        axis=1, bitorder="little",
    )
    return dict(
        pos0_idx=pos0,
        pos1_idx=pos1,
        pos_valid=pos_valid,
        cand0_idx=cand0,
        cand0_valid=cand0_valid,
        cand1_idx=cand1,
        cand1_valid=cand1_valid,
        collide0=collide0,
        collide1=collide1,
    )


def _collision_bitmap(
    match_anchor: np.ndarray,  # [M] anchor column of the match list
    match_other: np.ndarray,  # [M] other-frame column
    anchors: np.ndarray,  # [P] sampled anchor indices
    cands: np.ndarray,  # [H] sampled candidate indices (other frame)
    num_valid_cands: int,
    n_other: int,
) -> np.ndarray:
    """bitmap[i, j] = (anchors[i], cands[j]) is a true positive pair."""
    p, h = len(anchors), len(cands)
    out = np.zeros((p, h), dtype=bool)
    if len(match_anchor) == 0 or num_valid_cands == 0:
        return out
    order = np.argsort(match_anchor, kind="stable")
    sa, so = match_anchor[order], match_other[order]
    starts = np.searchsorted(sa, anchors, side="left")
    ends = np.searchsorted(sa, anchors, side="right")
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return out
    anchor_rows = np.repeat(np.arange(p), counts)
    flat = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    targets = so[np.repeat(starts, counts) + flat]
    inv = np.full(n_other, -1, dtype=np.int64)
    inv[cands[:num_valid_cands]] = np.arange(num_valid_cands)
    cols = inv[targets]
    keep = cols >= 0
    out[anchor_rows[keep], cols[keep]] = True
    return out


def collate_pair(
    samples: list,
    scheme: PadScheme,
    mode: str = "nce",
    npos: int = 4096,
    num_pos: int = 4096,
    num_hn: int = 1024,
    rng: np.random.RandomState | None = None,
    max_fit_attempts: int = 6,
    fuse_frames: bool = False,
    conv0_kernel_size: int = 3,
    layout: str = "voxel",
) -> PairBatch:
    """Collate ``__getitem__`` tuples into one static-shaped ``PairBatch``.

    mode: 'nce' (PointInfoNCE sampling) or 'hardest' (positives +
    hard-negative candidates + collision bitmaps).

    layout: 'voxel' (flat [npad0, C] rows) or 'brick' (2^D micro-dense rows,
    sparse.brick) -- features land at brick rows and all loss indices are
    remapped; voxels orphaned by coarse-level truncation are dropped from
    the loss with their count added to ``truncated_voxels``.

    fuse_frames: treat frame 1's clouds as additional sparse-batch samples
    (batch ids B..2B-1) and build ONE pyramid over all 2B frames.  The
    reference runs two forward passes per iteration (ddp_trainer.py:290-297);
    fusing them into one halves the op count and doubles the rows per MXU
    matmul.  Loss indices are pre-offset into the combined feature table.
    BN then normalizes over both frames jointly (the reference normalizes
    each forward separately); per-frame parity mode is fuse_frames=False.
    """
    rng = rng or np.random.RandomState()
    xyz0, xyz1, coords0, coords1, feats0, feats1, matches, trans = zip(*samples)
    coords0, feats0, coords1, feats1 = (
        list(coords0),
        list(feats0),
        list(coords1),
        list(feats1),
    )
    matches = [np.asarray(m, dtype=np.int64).reshape(-1, 2) for m in matches]
    nb = len(samples)

    for attempt in range(max_fit_attempts):
        len0 = [len(c) for c in coords0]
        len1 = [len(c) for c in coords1]
        c0, f0 = _concat_with_batch_index(coords0, feats0)
        c1, f1 = _concat_with_batch_index(coords1, feats1)
        budget = (scheme.npads[0] - 1) // 2 if fuse_frames else scheme.npads[0] - 1
        if len(c0) > budget or len(c1) > budget:
            # Too many voxels for the compiled shape: evenly subsample frames
            # (the reference's analogue is limit_numpoints truncation,
            # downstream/semseg/lib/transforms.py:260-267).
            for frame, (cl, fl, ml, col) in enumerate(
                [(coords0, feats0, matches, 0), (coords1, feats1, matches, 1)]
            ):
                total = sum(len(c) for c in cl)
                if total <= budget:
                    continue
                ratio = budget / total * 0.999
                for b in range(nb):
                    keep = max(1, int(len(cl[b]) * ratio))
                    cl[b], fl[b], remap = _subsample_frame(cl[b], fl[b], keep, rng)
                    m = ml[b]
                    kept_rows = remap[m[:, col]] >= 0
                    m = m[kept_rows]
                    m[:, col] = remap[m[:, col]]
                    ml[b] = m
            continue
        try:
            if fuse_frames:
                c1f = c1.copy()
                c1f[:, 0] += nb  # frame-1 clouds as extra batch samples
                pyr0, meta0, rows0, orph0 = _build_padded_pyramid(
                    np.concatenate([c0, c1f]), scheme, 2 * nb,
                    conv0_kernel_size, layout,
                )
                pyr1, meta1, rows1, orph1 = None, None, None, None
            else:
                pyr0, meta0, rows0, orph0 = _build_padded_pyramid(
                    c0, scheme, nb, conv0_kernel_size, layout)
                pyr1, meta1, rows1, orph1 = _build_padded_pyramid(
                    c1, scheme, nb, conv0_kernel_size, layout)
        except ValueError:
            # deeper-level overflow: shrink level 0 and retry
            for frame_lists in ((coords0, feats0, 0), (coords1, feats1, 1)):
                cl, fl, col = frame_lists
                for b in range(nb):
                    keep = max(1, int(len(cl[b]) * 0.8))
                    cl[b], fl[b], remap = _subsample_frame(cl[b], fl[b], keep, rng)
                    m = matches[b]
                    kept_rows = remap[m[:, col]] >= 0
                    m = m[kept_rows]
                    m[:, col] = remap[m[:, col]]
                    matches[b] = m
            continue
        break
    else:
        raise ValueError(
            f"batch does not fit PadScheme {scheme} after {max_fit_attempts} attempts"
        )

    all_matches = _offset_matches(matches, len0, len1)
    truncated = sum(n for _, n in meta0.truncated)
    if meta1 is not None:
        truncated += sum(n for _, n in meta1.truncated)
    if layout != "voxel":
        truncated += int(orph0.sum()) + (int(orph1.sum()) if orph1 is not None else 0)

    def frame_feats(feats, pyr, rows, orphan):
        if layout != "voxel":
            return _brick_feats(feats, rows, orphan, pyr.levels[0].valid.shape[0])
        return _pad_feats(feats, scheme.npads[0])

    if fuse_frames:
        batch = dict(
            feats0=frame_feats(np.concatenate([f0, f1]), pyr0, rows0, orph0),
            feats1=None,
            pyramid0=pyr0,
            pyramid1=None,
            num_pairs=nb,
        )
        off1 = len(c0)  # frame-1 rows start here in the combined table
        rows_f1, orph_f1 = rows0, orph0
    else:
        batch = dict(
            feats0=frame_feats(f0, pyr0, rows0, orph0),
            feats1=frame_feats(f1, pyr1, rows1, orph1),
            pyramid0=pyr0,
            pyramid1=pyr1,
            num_pairs=nb,
        )
        off1 = 0
        rows_f1, orph_f1 = rows1, orph1
    if mode == "nce":
        q, k, v = sample_nce_pairs(all_matches, npos, rng)
        if layout != "voxel":
            q, v = _remap_idx(q, v, rows0, orph0)
            k, v = _remap_idx(k + off1, v, rows_f1, orph_f1)
            batch.update(q_idx=q, k_idx=k, pair_valid=v)
        else:
            batch.update(q_idx=q, k_idx=k + off1, pair_valid=v)
    elif mode == "hardest":
        hc = sample_hardest_contrastive(
            all_matches, len(c0), len(c1), num_pos, num_hn, rng
        )
        if off1:
            hc["pos1_idx"] = hc["pos1_idx"] + off1
            hc["cand1_idx"] = hc["cand1_idx"] + off1
        if layout != "voxel":
            hc["pos0_idx"], v = _remap_idx(hc["pos0_idx"], hc["pos_valid"], rows0, orph0)
            hc["pos1_idx"], hc["pos_valid"] = _remap_idx(
                hc["pos1_idx"], v, rows_f1, orph_f1)
            hc["cand0_idx"], hc["cand0_valid"] = _remap_idx(
                hc["cand0_idx"], hc["cand0_valid"], rows0, orph0)
            hc["cand1_idx"], hc["cand1_valid"] = _remap_idx(
                hc["cand1_idx"], hc["cand1_valid"], rows_f1, orph_f1)
        batch.update(hc)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    batch["truncated_voxels"] = np.asarray(truncated, np.float32)
    return PairBatch(**batch)
