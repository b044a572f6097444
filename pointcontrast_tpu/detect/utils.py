"""Detection misc utilities: result dumping, per-scene precision/recall,
oriented-box mesh export.

Mirrors:
  - models/dump_helper.py:21-138 (PLY dumps of seeds/votes/proposals/GT for
    visualization)
  - lib/utils/metric_util.py:27-172 (calculate_pr / per-scene precision and
    recall at an IoU threshold)
  - lib/utils/pc_util.py write_oriented_bbox (OBB -> triangle-soup PLY;
    trimesh replaced by direct box tessellation).
"""
from __future__ import annotations

import os

import numpy as np

from pointcontrast_tpu.detect.ap_helper import softmax
from pointcontrast_tpu.detect.box_util import get_3d_box_batch, get_iou_obb
from pointcontrast_tpu.utils.ply import save_ply

_BOX_FACES = np.array(
    [
        [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
        [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
        [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
    ]
)


def write_oriented_bbox(boxes_corners: np.ndarray, path: str):
    """[K, 8, 3] corner boxes -> one PLY mesh (vertices + faces)."""
    verts = boxes_corners.reshape(-1, 3)
    faces = np.concatenate(
        [_BOX_FACES + 8 * i for i in range(len(boxes_corners))]
    )
    header = [
        "ply", "format ascii 1.0",
        f"element vertex {len(verts)}",
        "property float x", "property float y", "property float z",
        f"element face {len(faces)}",
        "property list uchar int vertex_indices", "end_header",
    ]
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def dump_results(end_points: dict, dump_dir: str, config,
                 inference_switch: bool = False):
    """Write per-scene PLY dumps (dump_helper.py:21-138): input cloud, seeds,
    votes, proposal centers (all / confident), GT centers, and OBB meshes."""
    os.makedirs(dump_dir, exist_ok=True)
    point_clouds = np.asarray(end_points["point_clouds"])[:, :, :3]
    b = point_clouds.shape[0]

    seed_xyz = np.asarray(end_points["seed_xyz"])
    vote_xyz = np.asarray(end_points.get("vote_xyz", seed_xyz))
    agg_xyz = np.asarray(end_points["aggregated_vote_xyz"])
    center = np.asarray(end_points["center"])
    obj_prob = softmax(np.asarray(end_points["objectness_scores"]))[:, :, 1]

    pred_heading_class = np.argmax(np.asarray(end_points["heading_scores"]), -1)
    pred_heading_residual = np.take_along_axis(
        np.asarray(end_points["heading_residuals"]),
        pred_heading_class[..., None], axis=2,
    )[..., 0]
    pred_size_class = np.argmax(np.asarray(end_points["size_scores"]), -1)
    pred_size_residual = np.take_along_axis(
        np.asarray(end_points["size_residuals"]),
        pred_size_class[..., None, None], axis=2,
    )[:, :, 0, :]

    for i in range(b):
        save_ply(os.path.join(dump_dir, f"{i:06d}_pc.ply"), point_clouds[i])
        save_ply(os.path.join(dump_dir, f"{i:06d}_seed_pc.ply"), seed_xyz[i])
        save_ply(os.path.join(dump_dir, f"{i:06d}_vgen_pc.ply"), vote_xyz[i])
        save_ply(
            os.path.join(dump_dir, f"{i:06d}_aggregated_vote_pc.ply"), agg_xyz[i]
        )
        conf = obj_prob[i] > 0.5
        save_ply(
            os.path.join(dump_dir, f"{i:06d}_confident_proposal_pc.ply"),
            center[i][conf] if conf.any() else center[i][:1],
        )
        if conf.any():
            sizes = config.class2size_batch(
                pred_size_class[i][conf], pred_size_residual[i][conf]
            )
            angles = config.class2angle_batch(
                pred_heading_class[i][conf], pred_heading_residual[i][conf]
            )
            corners = get_3d_box_batch(sizes, angles, center[i][conf])
            write_oriented_bbox(
                corners, os.path.join(dump_dir, f"{i:06d}_pred_confident_bbox.ply")
            )
        if "center_label" in end_points and not inference_switch:
            mask = np.asarray(end_points["box_label_mask"])[i] > 0
            save_ply(
                os.path.join(dump_dir, f"{i:06d}_gt_centroids.ply"),
                np.asarray(end_points["center_label"])[i][mask],
            )


def calculate_pr(pred_all: dict, gt_all: dict, iou_threshold: float = 0.25):
    """Per-scene precision/recall with greedy IoU matching
    (metric_util.py:27-172).  pred_all/gt_all: {scan: [(cls, box, score)]} /
    {scan: [(cls, box)]}.  Returns (precision, recall)."""
    tp = fp = fn = 0
    for scan in gt_all:
        gts = list(gt_all[scan])
        preds = sorted(
            pred_all.get(scan, []), key=lambda x: -float(x[2])
        )
        matched = [False] * len(gts)
        for cls, box, _score in preds:
            best, best_j = 0.0, -1
            for j, (gcls, gbox) in enumerate(gts):
                if matched[j] or gcls != cls:
                    continue
                iou = get_iou_obb(box, gbox)
                if iou > best:
                    best, best_j = iou, j
            if best >= iou_threshold and best_j >= 0:
                matched[best_j] = True
                tp += 1
            else:
                fp += 1
        fn += matched.count(False)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return precision, recall
