"""Semseg result visualization & voxel->point permutation utilities.

Counterparts of /root/reference/downstream/semseg/lib/utils.py:351-429
(visualize_results, permute_pointcloud): PLY dumps of prediction /
ground-truth / RGB point clouds for inspection, and the voxel-output ->
original-point permutation used by full-cloud evaluation wrappers.
"""
from __future__ import annotations

import os

import numpy as np

from pointcontrast_tpu.utils.ply import save_ply


def colorize_pointcloud(xyz: np.ndarray, labels: np.ndarray,
                        color_map: dict) -> np.ndarray:
    """[N, 6] xyz+rgb with per-label colors (reference pc_utils usage)."""
    colors = np.array(
        [color_map.get(int(l), (0, 0, 0)) for l in labels], np.float64
    )
    return np.hstack([xyz, colors])


def visualize_results(
    coords: np.ndarray,  # [N, 1+3] (batch, x, y, z) voxel coords
    colors: np.ndarray,  # [N, 3] input colors (0..255 or 0..1)
    target: np.ndarray,  # [N] ground-truth labels (ignore = ignore_label)
    pred: np.ndarray,  # [N] predicted labels
    color_map: dict,
    out_dir: str,
    prefix: str,  # '<dataset>_<model>' in the reference naming
    iteration: int,
    ignore_label: int = 255,
    batch_index: int = 0,
) -> list:
    """Dump pred/rgb/gt PLYs for one batch sample (reference
    lib/utils.py:351-379 naming: '<prefix>_{pred,rgb,gt}_%04d.ply').
    Voxels with ignored ground truth are included colored black, like the
    reference's ptc_nonpred rows.  Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    in_batch = coords[:, 0] == batch_index
    xyz = coords[in_batch, 1:4].astype(np.float64)
    tgt = np.asarray(target)[in_batch]
    prd = np.asarray(pred)[in_batch]
    rgb = np.asarray(colors)[in_batch, :3]
    valid = tgt != ignore_label
    black = np.hstack([xyz[~valid], np.zeros((int((~valid).sum()), 3))])

    written = []
    for tag, labels in (("pred", prd), ("gt", tgt)):
        cloud = np.vstack(
            [colorize_pointcloud(xyz[valid], labels[valid], color_map), black]
        )
        path = os.path.join(out_dir, f"{prefix}_{tag}_{iteration:04d}.ply")
        save_ply(path, cloud[:, :3], colors=cloud[:, 3:6].astype(np.uint8))
        written.append(path)
    path = os.path.join(out_dir, f"{prefix}_rgb_{iteration:04d}.ply")
    scale = 255.0 if rgb.max() <= 1.0 + 1e-6 else 1.0
    save_ply(path, xyz, colors=np.clip(rgb * scale, 0, 255).astype(np.uint8))
    written.append(path)
    return written


def permute_pointcloud(
    input_coords: np.ndarray,  # [Nv, 1+3] batched voxel coords (batch FIRST)
    pointcloud: np.ndarray,  # [Np, 1+3+1] (batch, xyz, label) original points
    transformation: np.ndarray,  # [B, 16] per-sample 4x4 voxelization matrix
    label_map: dict,  # raw label -> train id (dataset.label_map)
    voxel_output: np.ndarray,  # [Nv, C] logits at voxels
    voxel_pred: np.ndarray,  # [Nv] predictions at voxels
    ignore_label: int = 255,
):
    """Carry voxel outputs back to the original points: transform each
    point by its sample's voxelization matrix, join against the voxel
    coordinate set, and permute outputs/predictions (points that fell
    outside the voxel set get zero output / class 0, as the reference does
    — lib/utils.py:381-429).  Returns (point_output [Np, C],
    point_pred [Np], point_target [Np])."""
    nb = int(input_coords[:, 0].max()) + 1 if len(input_coords) else 0
    n_pts = len(pointcloud)
    perm = np.full(n_pts, -1, np.int64)
    for b in range(nb):
        vmask = input_coords[:, 0] == b
        pmask = pointcloud[:, 0] == b
        vcoords = input_coords[vmask, 1:4].astype(np.int64)
        pts = pointcloud[pmask, 1:4].astype(np.float64)
        t = transformation[b].reshape(4, 4)
        homo = np.hstack([pts, np.ones((len(pts), 1))])
        pcoords = np.floor(homo @ t.T)[:, :3].astype(np.int64)
        # hash join on a shared dense key space
        lo = np.minimum(
            vcoords.min(0) if len(vcoords) else 0,
            pcoords.min(0) if len(pcoords) else 0,
        )
        dims = (
            np.maximum(vcoords.max(0), pcoords.max(0)) - lo + 1
            if len(vcoords) and len(pcoords) else np.ones(3, np.int64)
        )
        def key(c):
            return np.ravel_multi_index((c - lo).T, dims, mode="clip")

        vrows = np.flatnonzero(vmask)
        order = np.argsort(key(vcoords))
        vkeys = key(vcoords)[order]
        q = key(pcoords)
        pos = np.searchsorted(vkeys, q)
        pos_c = np.minimum(pos, len(vkeys) - 1) if len(vkeys) else pos * 0
        found = len(vkeys) > 0 and vkeys[pos_c] == q
        perm[np.flatnonzero(pmask)[found]] = vrows[order][pos_c[found]]

    mask = perm >= 0
    point_output = np.zeros((n_pts, voxel_output.shape[1]),
                            voxel_output.dtype)
    point_output[mask] = voxel_output[perm[mask]]
    point_pred = np.zeros(n_pts, np.int64)
    point_pred[mask] = np.asarray(voxel_pred)[perm[mask]]
    raw = pointcloud[:, 4].astype(np.int64)
    # raw ids absent from label_map score as ignore, never as train class 0
    lut_keys = np.array(list(label_map.keys()) or [0], np.int64)
    size = int(max(lut_keys.max(), raw.max() if len(raw) else 0)) + 1
    lut = np.full(size, ignore_label, np.int64)
    for k, v in label_map.items():
        lut[k] = v
    point_target = lut[np.clip(raw, 0, size - 1)]
    return point_output, point_pred, point_target
