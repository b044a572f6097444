"""SUN RGB-D detection dataset (precomputed votes).

Behavioral mirror of /root/reference/downstream/votenet_det_new/lib/datasets/
sunrgbd/sunrgbd_detection_dataset.py:1-280: per-scan ``{scan}_pc.npz{pc}``,
``{scan}_bbox.npy`` (K x 8: center3, half-size3, heading, class) and
``{scan}_votes.npz{point_votes}`` (N x 10: mask + 3 votes); YZ-plane flip,
+-30 degree z-rotation, color and scale augmentation; 12 heading bins via
``SunrgbdDatasetConfig``.
"""
from __future__ import annotations

import os

import numpy as np

from pointcontrast_tpu.detect.configs import SunrgbdDatasetConfig
from pointcontrast_tpu.detect.datasets import MAX_NUM_OBJ, random_sampling, rotz

MEAN_COLOR_RGB = np.array([0.5, 0.5, 0.5])


class SunrgbdDetectionVotesDataset:
    def __init__(
        self,
        data_path: str,
        split_set: str = "train",
        num_points: int = 20000,
        use_color: bool = False,
        use_height: bool = False,
        use_v1: bool = True,
        augment: bool = False,
        scan_names: list | None = None,
        seed: int | None = None,
    ):
        self.dc = SunrgbdDatasetConfig()
        self.data_path = os.path.join(
            data_path, f"sunrgbd_pc_bbox_votes_50k_{'v1' if use_v1 else 'v2'}_{split_set}"
        ) if scan_names is None else data_path
        if scan_names is None:
            scan_names = sorted(
                {os.path.basename(x)[0:6] for x in os.listdir(self.data_path)}
            )
        self.scan_names = scan_names
        self.num_points = num_points
        self.use_color = use_color
        self.use_height = use_height
        self.augment = augment
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.scan_names)

    def _load_scan(self, scan_name: str):
        p = os.path.join(self.data_path, scan_name)
        pc = np.load(p + "_pc.npz")["pc"]  # [N, 6]
        bboxes = np.load(p + "_bbox.npy")  # [K, 8]
        votes = np.load(p + "_votes.npz")["point_votes"]  # [N, 10]
        return pc, bboxes, votes

    def __getitem__(self, idx: int) -> dict:
        rng = self.rng
        dc = self.dc
        point_cloud, bboxes, point_votes = self._load_scan(self.scan_names[idx])
        bboxes = bboxes.copy()
        point_votes = point_votes.copy()

        if not self.use_color:
            point_cloud = point_cloud[:, 0:3].copy()
        else:
            point_cloud = point_cloud[:, 0:6].copy()
            point_cloud[:, 3:] -= MEAN_COLOR_RGB
        if self.use_height:
            floor = np.percentile(point_cloud[:, 2], 0.99)
            point_cloud = np.concatenate(
                [point_cloud, (point_cloud[:, 2] - floor)[:, None]], 1
            )

        if self.augment:
            if rng.random_sample() > 0.5:
                point_cloud[:, 0] = -point_cloud[:, 0]
                bboxes[:, 0] = -bboxes[:, 0]
                bboxes[:, 6] = np.pi - bboxes[:, 6]
                point_votes[:, [1, 4, 7]] = -point_votes[:, [1, 4, 7]]

            rot_angle = rng.random_sample() * np.pi / 3 - np.pi / 6
            rot = rotz(rot_angle)
            ends = np.zeros_like(point_votes)
            for s in (1, 4, 7):
                ends[:, s:s + 3] = (point_cloud[:, 0:3] + point_votes[:, s:s + 3]) @ rot.T
            point_cloud[:, 0:3] = point_cloud[:, 0:3] @ rot.T
            bboxes[:, 0:3] = bboxes[:, 0:3] @ rot.T
            bboxes[:, 6] -= rot_angle
            for s in (1, 4, 7):
                point_votes[:, s:s + 3] = ends[:, s:s + 3] - point_cloud[:, 0:3]

            if self.use_color:
                rgb = point_cloud[:, 3:6] + MEAN_COLOR_RGB
                rgb *= 1 + 0.4 * rng.random_sample(3) - 0.2
                rgb += 0.1 * rng.random_sample(3) - 0.05
                rgb += (0.05 * rng.random_sample(len(point_cloud)) - 0.025)[:, None]
                rgb = np.clip(rgb, 0, 1)
                rgb *= (rng.random_sample(len(point_cloud)) > 0.3)[:, None]
                point_cloud[:, 3:6] = rgb - MEAN_COLOR_RGB

            scale = rng.random_sample() * 0.3 + 0.85
            point_cloud[:, 0:3] *= scale
            bboxes[:, 0:3] *= scale
            bboxes[:, 3:6] *= scale
            for s in (1, 4, 7):
                point_votes[:, s:s + 3] *= scale
            if self.use_height:
                point_cloud[:, -1] *= scale

        # labels
        angle_classes = np.zeros(MAX_NUM_OBJ)
        angle_residuals = np.zeros(MAX_NUM_OBJ)
        size_classes = np.zeros(MAX_NUM_OBJ)
        size_residuals = np.zeros((MAX_NUM_OBJ, 3))
        centers = np.zeros((MAX_NUM_OBJ, 3))
        sem_cls = np.zeros(MAX_NUM_OBJ)
        mask = np.zeros(MAX_NUM_OBJ)
        nb = bboxes.shape[0]
        mask[:nb] = 1
        for i in range(nb):
            b = bboxes[i]
            centers[i] = b[0:3]
            sem_cls[i] = b[7]
            ac, ar = dc.angle2class(b[6])
            angle_classes[i], angle_residuals[i] = ac, ar
            size3d = b[3:6] * 2  # stored as half-lengths
            sc, sr = dc.size2class(size3d, dc.class2type[int(b[7])])
            size_classes[i], size_residuals[i] = sc, sr

        point_cloud, choices = random_sampling(point_cloud, self.num_points, rng)
        point_votes_mask = point_votes[choices, 0]
        point_votes = point_votes[choices, 1:]

        return {
            "point_clouds": point_cloud.astype(np.float32),
            "center_label": centers.astype(np.float32),
            "heading_class_label": angle_classes.astype(np.int32),
            "heading_residual_label": angle_residuals.astype(np.float32),
            "size_class_label": size_classes.astype(np.int32),
            "size_residual_label": size_residuals.astype(np.float32),
            "sem_cls_label": sem_cls.astype(np.int32),
            "box_label_mask": mask.astype(np.float32),
            "vote_label": point_votes.astype(np.float32),
            "vote_label_mask": point_votes_mask.astype(np.int32),
            "scan_idx": np.int32(idx),
        }
