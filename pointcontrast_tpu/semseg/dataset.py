"""Voxelization dataset framework + fixed-shape semseg batching.

Mirrors /root/reference/downstream/semseg/lib/dataset.py:80-385
(DictDataset -> VoxelizationDatasetBase -> VoxelizationDataset with PLY
loading, prevoxel downsample, prevoxel/input/target transforms, label-map
remap to ignore_label, coords->feats augmentation) and the collators of
lib/transforms.py:240-316, re-designed for static XLA shapes: the collator
concatenates the batch, optionally applies the train loop's random
coordinate translation (train.py:110 — must happen *before* kernel maps are
built), builds the pyramid at PadScheme sizes, and pads labels with
ignore_label so the CE loss masks them for free.
"""
from __future__ import annotations

from typing import Any

import numpy as np
from flax import struct

from pointcontrast_tpu.data.collate import (
    PadScheme,
    _concat_with_batch_index,
    parse_layout,
)
from pointcontrast_tpu.data.loader import PrefetchLoaderBase
from pointcontrast_tpu.semseg.voxelizer import Voxelizer
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.topology import build_pyramid
from pointcontrast_tpu.utils.ply import read_ply_xyzrgbl

jnp_array = Any


@struct.dataclass
class SemsegBatch:
    feats: jnp_array  # [npad0, C], padded rows zero
    labels: jnp_array  # [npad0] int32, padding = ignore_label
    pyramid: Any
    # scalar count of voxels dropped by graceful coarse-level truncation
    # (topology.PyramidMeta.truncated); a leaf so the step can report it
    truncated_voxels: Any = None
    # [K, npad0] bilateral-grid neighbor map when a CRF wrapper is active
    # (reference wrapper.py:31: the filter's coords are built per batch)
    crf_nbr: Any = None
    num_samples: int = struct.field(pytree_node=False, default=0)


class VoxelizationDataset:
    """Base: load PLY -> prevoxel downsample/transforms -> voxelize ->
    input/target transforms -> label remap -> optional coords-as-feats."""

    VOXEL_SIZE = 0.05
    CLIP_BOUND = None
    TEST_CLIP_BOUND = None
    SCALE_AUGMENTATION_BOUND = (0.9, 1.1)
    ROTATION_AUGMENTATION_BOUND = (
        (-np.pi / 6, np.pi / 6), (-np.pi, np.pi), (-np.pi / 6, np.pi / 6)
    )
    TRANSLATION_AUGMENTATION_RATIO_BOUND = ((-0.2, 0.2), (-0.05, 0.05), (-0.2, 0.2))
    ELASTIC_DISTORT_PARAMS = None
    PREVOXELIZATION_VOXEL_SIZE = None
    AUGMENT_COORDS_TO_FEATS = False
    ROTATION_AXIS = "z"
    IS_TEMPORAL = False
    NUM_LABELS = -1
    IGNORE_LABELS: tuple = ()
    IS_FULL_POINTCLOUD_EVAL = False

    def __init__(
        self,
        data_paths,
        data_root: str = "/",
        prevoxel_transform=None,
        input_transform=None,
        target_transform=None,
        augment_data: bool = False,
        ignore_label: int = 255,
        return_transformation: bool = False,
        cache: bool = False,
        seed: int | None = None,
    ):
        self.data_paths = sorted(data_paths)
        self.data_root = data_root
        self.prevoxel_transform = prevoxel_transform
        self.input_transform = input_transform
        self.target_transform = target_transform
        self.augment_data = augment_data
        self.ignore_mask = ignore_label
        self.return_transformation = return_transformation
        self.cache = cache
        self._cache_store: dict = {}
        self.rng = np.random.RandomState(seed)

        self.voxelizer = Voxelizer(
            voxel_size=self.VOXEL_SIZE,
            clip_bound=self.CLIP_BOUND,
            use_augmentation=augment_data,
            scale_augmentation_bound=self.SCALE_AUGMENTATION_BOUND,
            rotation_augmentation_bound=self.ROTATION_AUGMENTATION_BOUND,
            translation_augmentation_ratio_bound=self.TRANSLATION_AUGMENTATION_RATIO_BOUND,
            ignore_label=ignore_label,
        )

        # Label remap: unevaluated labels -> ignore (dataset.py:249-259).
        label_map = {}
        n_used = 0
        for l in range(self.NUM_LABELS):
            if l in self.IGNORE_LABELS:
                label_map[l] = self.ignore_mask
            else:
                label_map[l] = n_used
                n_used += 1
        label_map[self.ignore_mask] = self.ignore_mask
        self.label_map = label_map
        self.num_classes = self.NUM_LABELS - len(self.IGNORE_LABELS)

    def __len__(self):
        return len(self.data_paths)

    def load_sample(self, index: int):
        """(coords[N,3] f32, feats[N,3] f32, labels[N] i32, center|None)."""
        if self.cache and index in self._cache_store:
            c, f, l = self._cache_store[index]
            return c.copy(), f.copy(), l.copy(), None
        import os

        coords, colors, labels = read_ply_xyzrgbl(
            os.path.join(self.data_root, self.data_paths[index])
        )
        if self.cache:
            self._cache_store[index] = (coords.copy(), colors.copy(), labels.copy())
        return coords, colors, labels, None

    def _remap_labels(self, labels: np.ndarray) -> np.ndarray:
        lut_size = max(self.NUM_LABELS, self.ignore_mask + 1)
        lut = np.full(lut_size, self.ignore_mask, dtype=np.int32)
        for k, v in self.label_map.items():
            if 0 <= k < lut_size:
                lut[k] = v
        safe = np.clip(labels, 0, lut_size - 1)
        out = lut[safe]
        out[(labels < 0) | (labels >= lut_size)] = self.ignore_mask
        return out

    def _augment_coords_to_feats(self, coords, feats):
        norm_coords = coords - coords.mean(0)
        return np.concatenate([feats, norm_coords], 1)

    def __getitem__(self, index: int, rng=None):
        rng = rng if rng is not None else self.rng
        coords, feats, labels, center = self.load_sample(index)
        if self.PREVOXELIZATION_VOXEL_SIZE is not None:
            inds = sparse_quantize(
                coords / self.PREVOXELIZATION_VOXEL_SIZE, return_index=True
            )
            coords, feats, labels = coords[inds], feats[inds], labels[inds]
        if self.prevoxel_transform is not None:
            coords, feats, labels = self.prevoxel_transform(
                coords, feats, labels, rng=rng
            )
        coords, feats, labels, transformation = self.voxelizer.voxelize(
            coords, feats, labels, center=center, rng=rng
        )
        if self.input_transform is not None:
            coords, feats, labels = self.input_transform(coords, feats, labels, rng=rng)
        if self.target_transform is not None:
            coords, feats, labels = self.target_transform(
                coords, feats, labels, rng=rng
            )
        if self.IGNORE_LABELS is not None:
            labels = self._remap_labels(np.asarray(labels))
        if self.AUGMENT_COORDS_TO_FEATS:
            feats = self._augment_coords_to_feats(coords, feats)
        out = (coords.astype(np.int32), feats.astype(np.float32),
               labels.astype(np.int32))
        if self.return_transformation:
            out = out + (transformation.astype(np.float32),)
        return out


def collate_semseg(
    samples: list,
    scheme: PadScheme,
    ignore_label: int = 255,
    shift_coords: bool = False,
    normalize_color: bool = True,
    limit_numpoints: int = 0,
    rng: np.random.RandomState | None = None,
    num_levels: int | None = None,
    conv0_kernel_size: int = 3,
    layout: str = "voxel",
    crf: dict | None = None,
    num_chunks: int | None = None,
) -> SemsegBatch:
    """Concatenate + pad to static shapes and build the pyramid.

    crf: when set (keys: kernel_size, region, spatial_sigma,
    chromatic_sigma), also build the bilateral-grid neighbor map for a CRF
    wrapper from the batch's coords + raw colors (reference
    models/wrapper.py:31 builds the filter coords per forward).

    shift_coords: the reference train loop adds a random [0,100) translation
    to all coords each iteration for grid-parity invariance (train.py:110);
    it changes the voxel lattice so it must precede kernel-map construction.
    normalize_color: feats = feats/255 - 0.5 (train.py:114-116).
    limit_numpoints: truncate whole samples beyond the budget, as
    cfl_collate_fn does (transforms.py:260-267).
    num_chunks: chunked layout only — fix the number of per-sample slices
    (pass the loader's batch_size so every batch, including short final
    ones, compiles to the same shapes; missing samples become empty,
    fully-masked chunks).
    """
    rng = rng or np.random.RandomState()
    coords_l, feats_l, labels_l = [], [], []
    total = 0
    budget = min(
        scheme.npads[0] - 1,
        limit_numpoints if limit_numpoints else scheme.npads[0] - 1,
    )
    for s in samples:
        c, f, l = s[:3]
        if total + len(c) > budget:
            if total == 0:  # single sample too big: subsample it
                keep = rng.choice(len(c), budget, replace=False)
                keep.sort()
                c, f, l = c[keep], f[keep], l[keep]
            else:
                break
        coords_l.append(c)
        feats_l.append(f)
        labels_l.append(l)
        total += len(c)

    nb = len(coords_l)
    coords, feats = _concat_with_batch_index(coords_l, feats_l)
    labels = np.concatenate(labels_l).astype(np.int32)
    if shift_coords:
        coords[:, 1:] += rng.randint(0, 100, 3, dtype=np.int32)
    crf_nbr = None
    raw_rgb = feats[:, :3].copy() if crf is not None else None

    def _crf_map(sel=None, rows=None, npad=None):
        # raw colors: first 3 feature channels BEFORE normalization.  For
        # the chunked layout the map is built over the scattered slice rows
        # (rows=), so the CRF head runs flat-conv on chunked logits without
        # downgrading the backbone layout (semseg/crf.build_bilateral_map).
        from pointcontrast_tpu.semseg.crf import build_bilateral_map

        c = coords if sel is None else coords[sel]
        rgb = raw_rgb if sel is None else raw_rgb[sel]
        return build_bilateral_map(
            c, rgb, npad if npad is not None else scheme.npads[0],
            spatial_sigma=crf.get("spatial_sigma", 1.0),
            chromatic_sigma=crf.get("chromatic_sigma", 12.0),
            kernel_size=crf.get("kernel_size", 3),
            region=crf.get("region", "hypercross"),
            rows=rows,
        )

    if crf is not None and layout == "voxel":
        crf_nbr = _crf_map()
    if normalize_color:
        # only the RGB channels (train.py:115 `input[:, :3]`): appended
        # channels (e.g. AUGMENT_COORDS_TO_FEATS centered coords) keep scale
        feats = feats.astype(np.float32).copy()
        feats[:, :3] = feats[:, :3] / 255.0 - 0.5

    n_levels = num_levels or scheme.num_levels
    kind, brick_levels = parse_layout(layout)
    if kind != "voxel":
        if kind == "brick":
            from pointcontrast_tpu.sparse.brick import build_brick_pyramid

            pyr, meta, rows, orphan = build_brick_pyramid(
                coords,
                num_levels=n_levels,
                npads=scheme.npads_for(n_levels + 1),
                num_batch=nb,
                conv0_kernel_size=conv0_kernel_size,
                brick_levels=brick_levels,
            )
        else:  # chunked: per-sample slices + frame-local maps (sparse/chunk)
            from pointcontrast_tpu.sparse.chunk import build_chunked_pyramid

            pyr, meta, rows, orphan = build_chunked_pyramid(
                coords,
                num_levels=n_levels,
                npads=scheme.npads,
                num_batch=num_chunks or nb,
                conv0_kernel_size=conv0_kernel_size,
            )
        nrows = pyr.levels[0].valid.shape[0]
        keep = ~orphan
        fpad = np.zeros((nrows, feats.shape[1]), np.float32)
        fpad[rows[keep]] = feats[keep]
        lpad = np.full(nrows, ignore_label, np.int32)
        lpad[rows[keep]] = labels[keep]
        if crf is not None:
            crf_nbr = _crf_map(sel=keep, rows=rows[keep], npad=nrows)
        truncated = sum(n for _, n in meta.truncated) + int(orphan.sum())
        return SemsegBatch(
            feats=fpad, labels=lpad, pyramid=pyr,
            truncated_voxels=np.asarray(truncated, np.float32),
            crf_nbr=crf_nbr,
            num_samples=nb,
        )
    pyr, meta = build_pyramid(
        coords,
        num_levels=n_levels,
        npads=scheme.npads,
        num_batch=nb,
        conv0_kernel_size=conv0_kernel_size,
    )
    npad0 = scheme.npads[0]
    fpad = np.zeros((npad0, feats.shape[1]), np.float32)
    fpad[: len(feats)] = feats
    lpad = np.full(npad0, ignore_label, np.int32)
    lpad[: len(labels)] = labels
    return SemsegBatch(
        feats=fpad, labels=lpad, pyramid=pyr,
        truncated_voxels=np.asarray(
            sum(n for _, n in meta.truncated), np.float32
        ),
        crf_nbr=crf_nbr,
        num_samples=nb,
    )


class SemsegLoader(PrefetchLoaderBase):
    """Prefetching loader for semseg batches (pipeline machinery shared
    with PairLoader via PrefetchLoaderBase)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        scheme: PadScheme,
        shuffle: bool = True,
        augment_shift: bool = False,
        limit_numpoints: int = 0,
        num_workers: int = 2,
        prefetch: int = 2,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        num_levels: int | None = None,
        conv0_kernel_size: int = 3,
        num_device_batches: int = 1,
        layout: str = "voxel",
        crf: dict | None = None,
    ):
        """num_device_batches > 1 stacks that many per-device batches on a
        leading axis (the data-parallel mesh axis), like PairLoader."""
        self.layout = layout
        self.crf = crf
        self.scheme = scheme
        self.augment_shift = augment_shift
        self.limit_numpoints = limit_numpoints
        self.num_levels = num_levels
        self.conv0_kernel_size = conv0_kernel_size
        self.batch_size = batch_size
        self._start_pipeline(
            dataset, batch_size, num_device_batches, shuffle, seed,
            num_shards, shard_id, num_workers, prefetch, rng_salt=17,
        )

    def _collate(self, samples):
        return collate_semseg(
            samples,
            self.scheme,
            ignore_label=self.dataset.ignore_mask,
            shift_coords=self.augment_shift,
            limit_numpoints=self.limit_numpoints,
            rng=self.rng,
            num_levels=self.num_levels,
            conv0_kernel_size=self.conv0_kernel_size,
            layout=self.layout,
            crf=self.crf,
            num_chunks=self.batch_size,
        )