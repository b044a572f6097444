"""Stanford S3DIS (Area 5) semantic segmentation datasets.

Mirrors /root/reference/downstream/semseg/lib/datasets/stanford.py:19-184:
14 raw labels with stairs (10) ignored -> 13 classes, 4m clip bound, area
splits (train on areas 1,2,3,4,6; val/test on area 5), 3/5/7.5/10cm voxel
variants, room-merging full-pointcloud evaluation.
"""
from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from pointcontrast_tpu.losses.semseg import fast_hist, per_class_iu
from pointcontrast_tpu.semseg.dataset import VoxelizationDataset
from pointcontrast_tpu.utils.ply import read_ply_xyzrgbl

CLASSES = (
    "clutter", "beam", "board", "bookcase", "ceiling", "chair", "column",
    "door", "floor", "sofa", "table", "wall", "window",
)

SPLIT_FILES = {
    "train": ["train.txt"],
    "val": ["val.txt"],
    "trainval": ["trainval.txt"],
    "test": ["test.txt"],
}


class StanfordDataset(VoxelizationDataset):
    VOXEL_SIZE = 0.05
    CLIP_BOUND = 4  # +-4m around the (translated) center
    TEST_CLIP_BOUND = None
    CLIP_SIZE = None
    LOCFEAT_IDX = 2
    ROTATION_AXIS = "z"
    NUM_LABELS = 14
    IGNORE_LABELS = (10,)  # remove stairs, following SegCloud
    IS_FULL_POINTCLOUD_EVAL = True

    ROTATION_AUGMENTATION_BOUND = (
        (-np.pi / 32, np.pi / 32), (-np.pi / 32, np.pi / 32), (-np.pi, np.pi)
    )
    TRANSLATION_AUGMENTATION_RATIO_BOUND = ((-0.2, 0.2), (-0.2, 0.2), (-0.05, 0.05))
    ELASTIC_DISTORT_PARAMS = ((0.2, 0.4), (0.8, 1.6))
    AUGMENT_COORDS_TO_FEATS = False
    NUM_IN_CHANNEL = 3

    SPLITS = SPLIT_FILES

    def __init__(
        self,
        data_root: str,
        phase: str = "train",
        data_paths: list | None = None,
        **kwargs,
    ):
        if phase not in ("train", "trainval"):
            self.CLIP_BOUND = self.TEST_CLIP_BOUND
        if data_paths is None:
            data_paths = []
            vendored = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "splits", "stanford",
            )
            for split in self.SPLITS[phase]:
                path = os.path.join(data_root, "splits", split)
                if not os.path.exists(path):  # fall back to vendored lists
                    path = os.path.join(vendored, split)
                with open(path) as f:
                    data_paths += [l.strip() for l in f if l.strip()]
        super().__init__(data_paths, data_root=data_root, **kwargs)

    def _augment_coords_to_feats(self, coords, feats):
        # Center x,y only (stanford.py:88-94).
        center = coords.mean(0, keepdims=True).astype(coords.dtype)
        center[0, 2] = 0
        return np.concatenate([feats, coords - center], 1)

    def test_pointcloud(self, pred_dir: str):
        """Room-merging full-cloud eval (stanford.py:41-86)."""
        from scipy import spatial

        room_dict = defaultdict(list)
        for i, data_path in enumerate(self.data_paths):
            area, room = os.path.split(data_path)
            room, _ = os.path.splitext(room)
            room_id = "_".join(room.split("_")[:-1])
            room_dict[(area, room_id)].append(i)
        pred_list = sorted(os.listdir(pred_dir))
        n = self.num_classes
        hist = np.zeros((n, n))
        for room_list in room_dict.values():
            pred = np.zeros((0, 4))
            xyz = np.zeros((0, 3))
            gt = np.zeros((0,), dtype=int)
            for i in room_list:
                pred = np.vstack([pred, np.load(os.path.join(pred_dir, pred_list[i]))])
                c, _f, l = read_ply_xyzrgbl(
                    os.path.join(self.data_root, self.data_paths[i])
                )
                xyz = np.vstack([xyz, c])
                gt = np.concatenate([gt, l])
            tree = spatial.cKDTree(pred[:, :3], leafsize=500)
            _, result = tree.query(xyz)
            ptc_pred = pred[result, 3].astype(int)
            ptc_pred = self._remap_labels(ptc_pred)
            ptc_gt = self._remap_labels(gt)
            hist += fast_hist(ptc_pred, ptc_gt, n)
        ious = per_class_iu(hist) * 100
        return float(np.nanmean(ious)), ious


class StanfordArea5Dataset(StanfordDataset):
    SPLITS = {
        "train": ["area1.txt", "area2.txt", "area3.txt", "area4.txt", "area6.txt"],
        "val": ["area5.txt"],
        "test": ["area5.txt"],
        # the reference's Area5 dict omits TrainVal (stanford.py:167-171);
        # supported here as all six areas so the base class's phase surface
        # is uniform across datasets
        "trainval": ["area1.txt", "area2.txt", "area3.txt", "area4.txt",
                     "area5.txt", "area6.txt"],
    }


class StanfordArea53cmDataset(StanfordArea5Dataset):
    CLIP_BOUND = 3.2
    VOXEL_SIZE = 0.03


class StanfordArea57d5cmDataset(StanfordArea5Dataset):
    VOXEL_SIZE = 0.075


class StanfordArea510cmDataset(StanfordArea5Dataset):
    VOXEL_SIZE = 0.1
