"""ScanNet 20-class semantic segmentation dataset.

Mirrors /root/reference/downstream/semseg/lib/datasets/scannet.py:18-177:
41 raw labels remapped to the 20 evaluated classes, 5cm (and 2cm) voxels,
z-rotation-dominant augmentation bounds, elastic distortion params, and
full-pointcloud evaluation by nearest-voxel label transfer.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from pointcontrast_tpu.losses.semseg import fast_hist, per_class_iu
from pointcontrast_tpu.semseg.dataset import VoxelizationDataset
from pointcontrast_tpu.utils.ply import read_ply_xyzrgbl, save_ply

CLASS_LABELS = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)
VALID_CLASS_IDS = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39
)
SCANNET_COLOR_MAP = {
    0: (0.0, 0.0, 0.0), 1: (174.0, 199.0, 232.0), 2: (152.0, 223.0, 138.0),
    3: (31.0, 119.0, 180.0), 4: (255.0, 187.0, 120.0), 5: (188.0, 189.0, 34.0),
    6: (140.0, 86.0, 75.0), 7: (255.0, 152.0, 150.0), 8: (214.0, 39.0, 40.0),
    9: (197.0, 176.0, 213.0), 10: (148.0, 103.0, 189.0), 11: (196.0, 156.0, 148.0),
    12: (23.0, 190.0, 207.0), 14: (247.0, 182.0, 210.0), 15: (66.0, 188.0, 102.0),
    16: (219.0, 219.0, 141.0), 17: (140.0, 57.0, 197.0), 18: (202.0, 185.0, 52.0),
    19: (51.0, 176.0, 203.0), 20: (200.0, 54.0, 131.0), 21: (92.0, 193.0, 61.0),
    22: (78.0, 71.0, 183.0), 23: (172.0, 114.0, 82.0), 24: (255.0, 127.0, 14.0),
    25: (91.0, 163.0, 138.0), 26: (153.0, 98.0, 156.0), 27: (140.0, 153.0, 101.0),
    28: (158.0, 218.0, 229.0), 29: (100.0, 125.0, 154.0), 30: (178.0, 127.0, 135.0),
    32: (146.0, 111.0, 194.0), 33: (44.0, 160.0, 44.0), 34: (112.0, 128.0, 144.0),
    35: (96.0, 207.0, 209.0), 36: (227.0, 119.0, 194.0), 37: (213.0, 92.0, 176.0),
    38: (94.0, 106.0, 211.0), 39: (82.0, 84.0, 163.0), 40: (100.0, 85.0, 144.0),
}

SPLIT_FILES = {
    "train": "scannetv2_train.txt",
    "val": "scannetv2_val.txt",
    "trainval": "scannetv2_trainval.txt",
    "test": "scannetv2_test.txt",
}


class ScannetVoxelizationDataset(VoxelizationDataset):
    CLIP_BOUND = None
    TEST_CLIP_BOUND = None
    VOXEL_SIZE = 0.05

    ROTATION_AUGMENTATION_BOUND = (
        (-np.pi / 64, np.pi / 64), (-np.pi / 64, np.pi / 64), (-np.pi, np.pi)
    )
    TRANSLATION_AUGMENTATION_RATIO_BOUND = ((-0.2, 0.2), (-0.2, 0.2), (0, 0))
    ELASTIC_DISTORT_PARAMS = ((0.2, 0.4), (0.8, 1.6))

    ROTATION_AXIS = "z"
    LOCFEAT_IDX = 2
    NUM_LABELS = 41  # remapped to 20 via IGNORE_LABELS
    IGNORE_LABELS = tuple(set(range(41)) - set(VALID_CLASS_IDS))
    IS_FULL_POINTCLOUD_EVAL = True

    def __init__(
        self,
        data_root: str,
        phase: str = "train",
        splits_dir: str | None = None,
        data_paths: list | None = None,
        **kwargs,
    ):
        if phase not in ("train", "trainval"):
            self.CLIP_BOUND = self.TEST_CLIP_BOUND
        if data_paths is None:
            # data_root/splits overrides; otherwise the in-repo vendored
            # lists (mirroring reference downstream/semseg/splits/scannet)
            splits_dir = splits_dir or os.path.join(data_root, "splits")
            path = os.path.join(splits_dir, SPLIT_FILES[phase])
            if not os.path.exists(path):
                path = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "splits", "scannet", SPLIT_FILES[phase],
                )
            with open(path) as f:
                data_paths = [l.strip() for l in f if l.strip()]
        super().__init__(data_paths, data_root=data_root, **kwargs)

    def get_output_id(self, iteration: int) -> str:
        return "_".join(Path(self.data_paths[iteration]).stem.split("_")[:2])

    def test_pointcloud(self, pred_dir: str):
        """Full-resolution eval: nearest-voxel label transfer
        (reference scannet.py:131-172); preds saved as
        pred_%04d_%02d.npy rows [x y z raw_label]."""
        from scipy import spatial

        eval_path = os.path.join(pred_dir, "fulleval")
        os.makedirs(eval_path, exist_ok=True)
        n = self.num_classes
        hist = np.zeros((n, n))
        for i, data_path in enumerate(self.data_paths):
            room_id = self.get_output_id(i)
            pred = np.load(os.path.join(pred_dir, "pred_%04d_%02d.npy" % (i, 0)))
            save_ply(
                f"{eval_path}/{room_id}_voxel.ply",
                pred[:, :3],
                np.array([SCANNET_COLOR_MAP.get(int(c), (0, 0, 0)) for c in pred[:, -1]]),
            )
            query_xyz, _, query_label = read_ply_xyzrgbl(
                os.path.join(self.data_root, data_path)
            )
            tree = spatial.cKDTree(pred[:, :3], leafsize=500)
            _, result = tree.query(query_xyz)
            ptc_pred = pred[result, 3].astype(int)
            np.savetxt(f"{eval_path}/{room_id}.txt", ptc_pred, fmt="%i")
            if self.IGNORE_LABELS is not None:
                ptc_pred = self._remap_labels(ptc_pred)
                query_label = self._remap_labels(query_label)
            hist += fast_hist(ptc_pred, query_label, n)
        ious = per_class_iu(hist) * 100
        return float(np.nanmean(ious)), ious


class ScannetVoxelization2cmDataset(ScannetVoxelizationDataset):
    VOXEL_SIZE = 0.02
