"""SUN RGB-D raw -> per-scan npz/npy artifact dumper.

Re-implements the Python stage of the reference's detection data prep
(/root/reference/downstream/votenet_det_new/lib/datasets/sunrgbd/
sunrgbd_data.py:172-263 ``extract_sunrgbd_data`` + the label/calib/depth
readers of sunrgbd_utils.py): from the MATLAB-exported raw layout
(``image/ calib/ depth/ label[_v1]/`` with %06d-indexed files) it writes the
artifacts ``detect.sunrgbd.SunrgbdDetectionVotesDataset`` consumes:

  %06d_pc.npz    {pc: [num_point, 6]}  xyz + rgb(0..1), upright-depth coords
  %06d_bbox.npy  [K, 8]   center3, half-size3 (l, w, h), heading, class id
  %06d_votes.npz {point_votes: [num_point, 10]}  mask + 3 GT center votes

The upstream MATLAB scripts that produce the raw layout are out of scope
(not Python; documented delta in PARITY.md) -- this module replaces the
340-line Python dumper itself.

Usage:
  python -m pointcontrast_tpu.tools.sunrgbd_data --raw sunrgbd_trainval \\
      --idx train_data_idx.txt --out sunrgbd_pc_bbox_votes_50k_v1_train \\
      --save-votes [--use-v1] [--num-point 50000]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from pointcontrast_tpu.detect.datasets import random_sampling

TYPE_WHITELIST = (
    "bed", "table", "sofa", "chair", "toilet", "desk", "dresser",
    "night_stand", "bookshelf", "bathtub",
)
TYPE2CLASS = {t: i for i, t in enumerate(TYPE_WHITELIST)}


class SunObject3d:
    """One line of a SUN RGB-D label file: ``classname xmin ymin dx dy
    cx cy cz w l h ox oy`` (2D box as corner+extent, centroid, HALF sizes,
    in-plane orientation vector; heading = -atan2(oy, ox))."""

    def __init__(self, line: str):
        parts = line.split(" ")
        vals = [float(x) for x in parts[1:]]
        self.classname = parts[0]
        self.box2d = np.array(
            [vals[0], vals[1], vals[0] + vals[2], vals[1] + vals[3]]
        )
        self.centroid = np.array(vals[4:7])
        self.w, self.l, self.h = vals[7], vals[8], vals[9]
        self.heading_angle = -np.arctan2(vals[11], vals[10])


def read_label(path: str) -> list:
    with open(path) as f:
        return [SunObject3d(line.rstrip()) for line in f if line.strip()]


def load_depth_points_mat(path: str) -> np.ndarray:
    """[N, 6] xyz+rgb point cloud from the MATLAB export ('instance' var)."""
    import scipy.io as sio

    return sio.loadmat(path)["instance"]


def read_calib(path: str):
    """(Rtilt [3,3], K [3,3]) from the two-line calib txt.

    The files are MATLAB exports, flattened column-major: recover with a
    Fortran-order reshape and NO transpose, exactly like the reference
    (sunrgbd_utils.py:92 ``np.reshape(..., order='F')``)."""
    with open(path) as f:
        lines = [line.rstrip() for line in f if line.strip()]
    rtilt = np.array([float(x) for x in lines[0].split(" ")]).reshape(3, 3, order="F")
    k = np.array([float(x) for x in lines[1].split(" ")]).reshape(3, 3, order="F")
    return rtilt, k


def box_corners_upright(center, half_size, heading) -> np.ndarray:
    """[8, 3] corners of an OBB in upright-depth coords (z-up; rotation by
    -heading about z, matching sunrgbd_utils.my_compute_box_3d)."""
    length, w, h = half_size
    c, s = np.cos(-heading), np.sin(-heading)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    signs = np.array(
        [[-1, 1, 1], [1, 1, 1], [1, -1, 1], [-1, -1, 1],
         [-1, 1, -1], [1, 1, -1], [1, -1, -1], [-1, -1, -1]], np.float64
    )
    corners = signs * np.array([length, w, h])
    return corners @ rot.T + np.asarray(center)


def points_in_obb(points: np.ndarray, center, half_size, heading) -> np.ndarray:
    """Boolean mask of points inside the OBB (box-frame bound check: exact
    for rectangular boxes, equivalent to the reference's Delaunay hull test
    on the 8 corners)."""
    c, s = np.cos(-heading), np.sin(-heading)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    local = (points[:, :3] - np.asarray(center)) @ rot  # inverse rotation
    return np.all(np.abs(local) <= np.asarray(half_size) + 1e-9, axis=1)


def extract_scene(pc: np.ndarray, objects: list, num_point: int,
                  rng=None, type_whitelist=TYPE_WHITELIST,
                  save_votes: bool = True):
    """One scene -> (pc_sub [num_point, 6], obbs [K, 8], votes [num_point, 10]
    or None).  Votes follow the reference layout: col 0 = in-any-box mask,
    cols 1:10 = up to three center offsets (first vote replicated)."""
    keep = [o for o in objects if o.classname in type_whitelist]
    obbs = np.zeros((len(keep), 8))
    for i, o in enumerate(keep):
        obbs[i, 0:3] = o.centroid
        obbs[i, 3:6] = (o.l, o.w, o.h)
        obbs[i, 6] = o.heading_angle
        obbs[i, 7] = TYPE2CLASS[o.classname]
    pc_sub, _ = random_sampling(pc, num_point, rng=rng)
    votes = None
    if save_votes:
        n = len(pc_sub)
        votes = np.zeros((n, 10))
        vote_idx = np.zeros(n, np.int64)
        for o in keep:
            inside = points_in_obb(pc_sub, o.centroid, (o.l, o.w, o.h),
                                   o.heading_angle)
            offs = o.centroid - pc_sub[inside, 0:3]
            rows = np.flatnonzero(inside)
            votes[rows, 0] = 1
            for row, off in zip(rows, offs):
                slot = vote_idx[row]
                votes[row, 1 + 3 * slot: 4 + 3 * slot] = off
                if slot == 0:  # replicate the first vote into all three
                    votes[row, 4:7] = off
                    votes[row, 7:10] = off
            vote_idx[rows] = np.minimum(2, vote_idx[rows] + 1)
    return pc_sub, obbs, votes


def extract_sunrgbd_data(idx_filename: str, raw_root: str, output_folder: str,
                         num_point: int = 20000,
                         type_whitelist=TYPE_WHITELIST,
                         save_votes: bool = False, use_v1: bool = False,
                         skip_empty_scene: bool = True, seed: int = 0):
    """Mirror of the reference extract_sunrgbd_data (sunrgbd_data.py:172)."""
    label_dir = os.path.join(raw_root, "label_v1" if use_v1 else "label")
    depth_dir = os.path.join(raw_root, "depth")
    os.makedirs(output_folder, exist_ok=True)
    rng = np.random.RandomState(seed)
    with open(idx_filename) as f:
        idx_list = [int(line.rstrip()) for line in f if line.strip()]
    written = []
    for idx in idx_list:
        objects = read_label(os.path.join(label_dir, "%06d.txt" % idx))
        if skip_empty_scene and not any(
            o.classname in type_whitelist for o in objects
        ):
            continue
        pc = load_depth_points_mat(os.path.join(depth_dir, "%06d.mat" % idx))
        pc_sub, obbs, votes = extract_scene(
            pc, objects, num_point, rng, type_whitelist, save_votes)
        np.savez_compressed(
            os.path.join(output_folder, "%06d_pc.npz" % idx), pc=pc_sub)
        np.save(os.path.join(output_folder, "%06d_bbox.npy" % idx), obbs)
        if save_votes:
            np.savez_compressed(
                os.path.join(output_folder, "%06d_votes.npz" % idx),
                point_votes=votes)
        written.append(idx)
    return written


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True, help="sunrgbd_trainval dir")
    p.add_argument("--idx", required=True, help="txt of scan indices")
    p.add_argument("--out", required=True)
    p.add_argument("--num-point", type=int, default=20000)
    p.add_argument("--save-votes", action="store_true")
    p.add_argument("--use-v1", action="store_true")
    p.add_argument("--keep-empty", action="store_true")
    args = p.parse_args(argv)
    written = extract_sunrgbd_data(
        args.idx, args.raw, args.out, num_point=args.num_point,
        save_votes=args.save_votes, use_v1=args.use_v1,
        skip_empty_scene=not args.keep_empty)
    print(f"wrote {len(written)} scenes to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
