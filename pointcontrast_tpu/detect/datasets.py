"""Detection datasets: ScanNet / SUN RGB-D loaders + voxelized wrapper +
a synthetic dataset for tests.

Mirrors:
  - ScannetDetectionDataset
    (/root/reference/downstream/votenet_det_new/lib/datasets/scannet/
     scannet_detection_dataset.py:26-224): load {scene}_vert/_ins_label/
     _sem_label/_bbox.npy, random-sample num_points, flip/rotz augment with
     box rotation, votes to instance centroid (3 identical GT votes).
  - SunrgbdDetectionVotesDataset (sunrgbd/sunrgbd_detection_dataset.py):
    precomputed votes in npz, 12 heading bins, flip/rot/scale augment.
  - the voxelized wrapper (models/backbone/sparseconv/voxelized_dataset.py:
    22-65): floor(pc/voxel) + sparse_quantize; here it also builds the
    pyramid + point->voxel index so the sparseconv backbone runs fully
    jitted.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np
from flax import struct

from pointcontrast_tpu.data.collate import PadScheme
from pointcontrast_tpu.detect.configs import ScannetDatasetConfig
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.topology import build_pyramid

MAX_NUM_OBJ = 64
MEAN_COLOR_RGB = np.array([109.8, 97.2, 83.8])


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rotate_aligned_boxes(boxes: np.ndarray, rot_mat: np.ndarray) -> np.ndarray:
    """Axis-aligned box rotation via corner extents
    (model_util_scannet.py:70-91)."""
    centers, lengths = boxes[:, 0:3], boxes[:, 3:6]
    new_centers = centers @ rot_mat.T
    dx, dy = lengths[:, 0] / 2.0, lengths[:, 1] / 2.0
    new_x = np.zeros((len(dx), 4))
    new_y = np.zeros((len(dx), 4))
    for i, (cx, cy) in enumerate([(-1, -1), (1, -1), (1, 1), (-1, 1)]):
        crnrs = np.zeros((len(dx), 3))
        crnrs[:, 0] = cx * dx
        crnrs[:, 1] = cy * dy
        crnrs = crnrs @ rot_mat.T
        new_x[:, i] = crnrs[:, 0]
        new_y[:, i] = crnrs[:, 1]
    new_dx = 2.0 * new_x.max(1)
    new_dy = 2.0 * new_y.max(1)
    new_lengths = np.stack([new_dx, new_dy, lengths[:, 2]], axis=1)
    return np.concatenate([new_centers, new_lengths], axis=1)


def random_sampling(pc: np.ndarray, num_sample: int, rng=None):
    rng = rng or np.random
    n = len(pc)
    if n >= num_sample:
        choices = rng.choice(n, num_sample, replace=False)
    else:
        extra = rng.choice(n, num_sample - n, replace=True)
        choices = np.concatenate([np.arange(n), extra])
    return pc[choices], choices


class ScannetDetectionDataset:
    """Loads the reference's preprocessed per-scene npy files."""

    def __init__(
        self,
        data_path: str,
        split_file: str | None = None,
        scan_names: list | None = None,
        num_points: int = 20000,
        use_color: bool = False,
        use_height: bool = False,
        augment: bool = False,
        data_ratio: float = 1.0,
        seed: int | None = None,
    ):
        self.data_path = data_path
        self.dc = ScannetDatasetConfig()
        if scan_names is None:
            avail = {
                os.path.basename(x)[0:12]
                for x in os.listdir(data_path)
                if x.startswith("scene")
            }
            with open(split_file) as f:
                scan_names = [s for s in f.read().splitlines() if s in avail]
            scan_names = scan_names[: int(len(scan_names) * data_ratio)]
        self.scan_names = scan_names
        self.num_points = num_points
        self.use_color = use_color
        self.use_height = use_height
        self.augment = augment
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.scan_names)

    def _load_scene(self, scan_name: str):
        p = os.path.join(self.data_path, scan_name)
        return (
            np.load(p + "_vert.npy"),
            np.load(p + "_ins_label.npy"),
            np.load(p + "_sem_label.npy"),
            np.load(p + "_bbox.npy"),
        )

    def __getitem__(self, idx: int) -> dict:
        rng = self.rng
        dc = self.dc
        mesh_vertices, instance_labels, semantic_labels, instance_bboxes = (
            self._load_scene(self.scan_names[idx])
        )
        if not self.use_color:
            point_cloud = mesh_vertices[:, 0:3]
        else:
            point_cloud = mesh_vertices[:, 0:6].copy()
            point_cloud[:, 3:] = (point_cloud[:, 3:] - MEAN_COLOR_RGB) / 256.0
        if self.use_height:
            floor = np.percentile(point_cloud[:, 2], 0.99)
            point_cloud = np.concatenate(
                [point_cloud, (point_cloud[:, 2] - floor)[:, None]], 1
            )

        target_bboxes = np.zeros((MAX_NUM_OBJ, 6))
        target_bboxes_mask = np.zeros(MAX_NUM_OBJ)
        angle_classes = np.zeros(MAX_NUM_OBJ)
        angle_residuals = np.zeros(MAX_NUM_OBJ)
        size_classes = np.zeros(MAX_NUM_OBJ)
        size_residuals = np.zeros((MAX_NUM_OBJ, 3))

        point_cloud, choices = random_sampling(point_cloud, self.num_points, rng)
        instance_labels = instance_labels[choices]
        semantic_labels = semantic_labels[choices]

        nb = instance_bboxes.shape[0]
        target_bboxes_mask[:nb] = 1
        target_bboxes[:nb] = instance_bboxes[:, 0:6]

        if self.augment:
            if rng.random_sample() > 0.5:
                point_cloud[:, 0] = -point_cloud[:, 0]
                target_bboxes[:, 0] = -target_bboxes[:, 0]
            if rng.random_sample() > 0.5:
                point_cloud[:, 1] = -point_cloud[:, 1]
                target_bboxes[:, 1] = -target_bboxes[:, 1]
            rot_angle = rng.random_sample() * np.pi / 18 - np.pi / 36
            rot = rotz(rot_angle)
            point_cloud[:, 0:3] = point_cloud[:, 0:3] @ rot.T
            target_bboxes = rotate_aligned_boxes(target_bboxes, rot)

        # votes to per-instance centroid, computed AFTER augmentation
        point_votes = np.zeros((self.num_points, 3))
        point_votes_mask = np.zeros(self.num_points)
        for i_inst in np.unique(instance_labels):
            ind = np.where(instance_labels == i_inst)[0]
            if semantic_labels[ind[0]] in dc.nyu40ids:
                x = point_cloud[ind, :3]
                center = 0.5 * (x.min(0) + x.max(0))
                point_votes[ind] = center - x
                point_votes_mask[ind] = 1.0
        point_votes = np.tile(point_votes, (1, 3))

        class_ind = [dc.nyu40id2class[int(x)] for x in instance_bboxes[:, -1]]
        size_classes[:nb] = class_ind
        size_residuals[:nb] = target_bboxes[:nb, 3:6] - dc.mean_size_arr[class_ind]
        sem_cls = np.zeros(MAX_NUM_OBJ)
        sem_cls[:nb] = class_ind

        return {
            "point_clouds": point_cloud.astype(np.float32),
            "center_label": target_bboxes[:, 0:3].astype(np.float32),
            "heading_class_label": angle_classes.astype(np.int32),
            "heading_residual_label": angle_residuals.astype(np.float32),
            "size_class_label": size_classes.astype(np.int32),
            "size_residual_label": size_residuals.astype(np.float32),
            "sem_cls_label": sem_cls.astype(np.int32),
            "box_label_mask": target_bboxes_mask.astype(np.float32),
            "vote_label": point_votes.astype(np.float32),
            "vote_label_mask": point_votes_mask.astype(np.int32),
            "scan_idx": np.int32(idx),
        }


class SyntheticDetectionDataset(ScannetDetectionDataset):
    """Random rooms with box objects; same sample contract as ScanNet
    (used by tests — the reference's integration test is likewise 'run on
    tiny data')."""

    def __init__(self, num_scenes: int = 8, num_objects: int = 6,
                 scene_seed: int = 31, **kwargs):
        self.num_scenes = num_scenes
        self.num_objects = num_objects
        self.scene_seed = scene_seed
        super().__init__(
            data_path=".", scan_names=[f"synth{i}" for i in range(num_scenes)],
            **kwargs,
        )

    def _load_scene(self, scan_name: str):
        rng = np.random.RandomState(self.scene_seed + int(scan_name[5:]))
        dc = self.dc
        room = 6.0
        n_bg = 6000
        pts = [rng.rand(n_bg, 3) * [room, room, 0.05]]
        ins = [np.zeros(n_bg)]
        sem = [np.zeros(n_bg)]
        bboxes = []
        for i in range(self.num_objects):
            cls = rng.randint(dc.num_class)
            size = dc.mean_size_arr[cls] * (0.8 + 0.4 * rng.rand(3))
            center = rng.rand(3) * [room - 1, room - 1, 1.0] + [0.5, 0.5, size[2] / 2]
            m = 700
            p = (rng.rand(m, 3) - 0.5) * size
            axis = rng.randint(3)
            p[:, axis] = np.sign(p[:, axis]) * size[axis] / 2
            pts.append(p + center)
            ins.append(np.full(m, i + 1))
            sem.append(np.full(m, dc.nyu40ids[cls]))
            bboxes.append(np.concatenate([center, size, [dc.nyu40ids[cls]]]))
        verts = np.concatenate(pts).astype(np.float32)
        verts = np.concatenate([verts, np.zeros_like(verts)], 1)  # fake color
        return (
            verts,
            np.concatenate(ins).astype(np.int32),
            np.concatenate(sem).astype(np.int32),
            np.stack(bboxes),
        )


@struct.dataclass
class DetectionBatch:
    """Static-shaped device batch for VoteNet."""

    point_clouds: Any
    center_label: Any
    heading_class_label: Any
    heading_residual_label: Any
    size_class_label: Any
    size_residual_label: Any
    sem_cls_label: Any
    box_label_mask: Any
    vote_label: Any
    vote_label_mask: Any
    # sparseconv backbone extras (None for pointnet2)
    voxel_feats: Any = None
    voxel_pyramid: Any = None
    point_voxel_idx: Any = None


def collate_detection(
    samples: list[dict],
    voxel_size: float | None = None,
    scheme: PadScheme | None = None,
    layout: str = "voxel",
) -> DetectionBatch:
    """Stack samples; optionally voxelize for the sparseconv backbone
    (reference voxelized_dataset.py:22-65 — feats are all-ones; here the
    point->voxel index replaces its per-sample voxel_inds lists).

    layout='chunked' builds the per-frame chunked pyramid (sparse/chunk.py
    — faster sparse convs at ~200k-row scales); point_voxel_idx is remapped
    to chunked rows, with dropped/orphaned voxels pointing at their own
    slice's zero pad row."""
    out = {
        k: np.stack([s[k] for s in samples])
        for k in samples[0]
        if k != "scan_idx"
    }
    batch = {k: v for k, v in out.items() if k in DetectionBatch.__dataclass_fields__}
    if voxel_size is not None:
        assert scheme is not None
        coords_l, pvi_l = [], []
        for s in samples:
            pc = s["point_clouds"][:, :3]
            vox = np.floor(pc / voxel_size).astype(np.int32)
            sel = sparse_quantize(vox, return_index=True)
            coords_l.append(vox[sel])
            # map each point to its voxel slot (within-sample)
            uniq = vox[sel]
            # hash join point->voxel
            from pointcontrast_tpu.sparse.hashing import HashSpec

            spec = HashSpec.from_coords(vox)
            keys = spec.encode(vox)
            ukeys = spec.encode(uniq)
            order = np.argsort(ukeys)
            pos = np.searchsorted(ukeys[order], keys)
            pvi_l.append(order[np.minimum(pos, len(order) - 1)])
        npad0 = scheme.npads[0]
        budget = npad0 - 1
        total = sum(len(c) for c in coords_l)
        orphan_row = npad0 - 1  # level-0 pad row: zero features
        if total > budget:
            # Evenly subsample each sample's voxel set (the safety valve the
            # pair/semseg collators have); points whose voxel is dropped
            # gather the zero pad row — graceful, like coarse truncation.
            rng = np.random.RandomState(0)
            ratio = budget / total * 0.999
            for b in range(len(samples)):
                n = len(coords_l[b])
                keep = max(1, int(n * ratio))
                keep_idx = np.sort(rng.choice(n, keep, replace=False))
                remap = np.full(n, -1, np.int64)
                remap[keep_idx] = np.arange(keep)
                coords_l[b] = coords_l[b][keep_idx]
                pvi_l[b] = remap[pvi_l[b]]
        lens = [len(c) for c in coords_l]
        offs = np.cumsum([0] + lens[:-1])
        coords = np.concatenate(
            [
                np.concatenate(
                    [np.full((len(c), 1), b, np.int32), c], 1
                )
                for b, c in enumerate(coords_l)
            ]
        )
        if layout == "chunked":
            from pointcontrast_tpu.sparse.chunk import build_chunked_pyramid

            nb = len(samples)
            pyr, meta, rows, orphan = build_chunked_pyramid(
                coords, num_levels=scheme.num_levels, npads=scheme.npads,
                num_batch=nb,
            )
            nrows = pyr.levels[0].valid.shape[0]
            s0 = nrows // nb
            feats = np.zeros((nrows, 3), np.float32)
            feats[rows[~orphan]] = 1.0
            pvi = np.stack(
                [
                    np.where(
                        (pvi_l[b] >= 0)
                        & ~orphan[np.maximum(pvi_l[b], 0) + offs[b]],
                        rows[np.maximum(pvi_l[b], 0) + offs[b]],
                        b * s0 + s0 - 1,  # slice pad row: zero features
                    )
                    for b in range(nb)
                ]
            ).astype(np.int32)
            batch.update(
                voxel_feats=feats, voxel_pyramid=pyr, point_voxel_idx=pvi
            )
            return DetectionBatch(**batch)
        pyr, meta = build_pyramid(
            coords, num_levels=scheme.num_levels, npads=scheme.npads,
            num_batch=len(samples),
        )
        feats = np.zeros((npad0, 3), np.float32)
        feats[: len(coords)] = 1.0
        pvi = np.stack(
            [
                np.where(pvi_l[b] >= 0, pvi_l[b] + offs[b], orphan_row)
                for b in range(len(samples))
            ]
        ).astype(np.int32)
        batch.update(
            voxel_feats=feats, voxel_pyramid=pyr, point_voxel_idx=pvi
        )
    return DetectionBatch(**batch)
