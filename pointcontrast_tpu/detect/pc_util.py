"""Point-cloud <-> occupancy-volume converters.

Counterpart of the conversion block in
/root/reference/downstream/votenet_det_new/lib/utils/pc_util.py:49-230
(point_cloud_to_volume[, _batch], volume_to_point_cloud,
point_cloud_to_volume_v2[, _batch]), vectorized instead of per-point loops.
Volumes assume points in [-radius, radius]; cells are vsize^D over that box.
"""
from __future__ import annotations

import numpy as np


def _locations(points: np.ndarray, vsize: int, radius: float) -> np.ndarray:
    voxel = 2.0 * radius / float(vsize)
    loc = ((points[:, :3] + radius) / voxel).astype(np.int64)
    return np.clip(loc, 0, vsize - 1)


def point_cloud_to_volume(points: np.ndarray, vsize: int,
                          radius: float = 1.0) -> np.ndarray:
    """[N, 3] -> binary occupancy [vsize, vsize, vsize]."""
    vol = np.zeros((vsize, vsize, vsize), np.float32)
    loc = _locations(points, vsize, radius)
    vol[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    return vol


def point_cloud_to_volume_batch(point_clouds: np.ndarray, vsize: int = 12,
                                radius: float = 1.0, flatten: bool = True):
    """[B, N, 3] -> [B, vsize^3] (flatten) or [B, vsize, vsize, vsize, 1]."""
    vols = [point_cloud_to_volume(pc, vsize, radius) for pc in point_clouds]
    if flatten:
        return np.stack([v.reshape(-1) for v in vols])
    return np.stack(vols)[..., None]


def volume_to_point_cloud(vol: np.ndarray) -> np.ndarray:
    """Occupancy grid -> [N, 3] integer cell coordinates."""
    return np.argwhere(vol == 1).astype(np.float64)


def point_cloud_to_volume_v2(points: np.ndarray, vsize: int,
                             radius: float = 1.0,
                             num_sample: int = 128) -> np.ndarray:
    """[N, 3] -> [vsize, vsize, vsize, num_sample, 3]: up to num_sample
    points per occupied cell (replicated when fewer), coordinates expressed
    relative to the cell center in cell units, like the reference."""
    vol = np.zeros((vsize, vsize, vsize, num_sample, 3), np.float32)
    if len(points) == 0:
        return vol
    voxel = 2.0 * radius / float(vsize)
    loc = _locations(points, vsize, radius)
    flat = np.ravel_multi_index(loc.T, (vsize, vsize, vsize))
    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    pts_sorted = points[order, :3]
    starts = np.flatnonzero(np.concatenate([[True], flat_sorted[1:] != flat_sorted[:-1]]))
    ends = np.concatenate([starts[1:], [len(flat_sorted)]])
    for s, e in zip(starts, ends):
        cell = np.unravel_index(flat_sorted[s], (vsize, vsize, vsize))
        pts = pts_sorted[s:e]
        if len(pts) >= num_sample:
            sel = pts[:num_sample]
        else:
            reps = np.resize(np.arange(len(pts)), num_sample)
            sel = pts[reps]
        center = (np.array(cell) + 0.5) * voxel - radius
        vol[cell][:] = (sel - center) / voxel
    return vol


def point_cloud_to_volume_v2_batch(point_clouds: np.ndarray, vsize: int = 12,
                                   radius: float = 1.0,
                                   num_sample: int = 128) -> np.ndarray:
    """[B, N, 3] -> [B, vsize, vsize, vsize, num_sample, 3]."""
    return np.stack([
        point_cloud_to_volume_v2(pc, vsize, radius, num_sample)
        for pc in point_clouds
    ])
