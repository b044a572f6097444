"""ScanNet frame-pair extraction pipeline.

Ports /root/reference/pretrain/data_preprocess/scannet_pair/:
  - reader.py:13-46            -> ``export_scene``
  - point_cloud_extractor.py:43-83 -> ``extract_pointclouds``
  - compute_full_overlapping.py:29-83 -> ``compute_scene_overlaps``
  - generate_list.py:20-28     -> ``generate_pair_list``

All numpy; the O(F^2 * N) KDTree overlap loop becomes the vectorized
grid-hash join from ``data.matching`` (orders of magnitude faster on CPU).
Run per scene (embarrassingly parallel), then ``generate_pair_list`` over
all scenes' overlap.txt.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from pointcontrast_tpu.data.matching import radius_matches
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.tools.sensor_data import SensorData


def export_scene(sens_path: str, output_path: str, frame_skip: int = 25):
    """reader.py equivalent: dump depth/pose/intrinsics every Nth frame."""
    sd = SensorData(sens_path)
    sd.export_depth_arrays(os.path.join(output_path, "depth"), frame_skip)
    sd.export_poses(os.path.join(output_path, "pose"), frame_skip)
    sd.export_intrinsics(os.path.join(output_path, "intrinsic"))
    return sd


def unproject_depth(depth: np.ndarray, intrinsic: np.ndarray,
                    pose: np.ndarray, depth_shift: float = 1000.0):
    """Depth map -> world-frame point cloud
    (point_cloud_extractor.py:43-83)."""
    h, w = depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    z = depth.astype(np.float64) / depth_shift
    valid = z.ravel() != 0
    u = x.ravel()[valid]
    v = y.ravel()[valid]
    z = z.ravel()[valid]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    bx, by = intrinsic[0, 3], intrinsic[1, 3]
    pts = np.ones((len(z), 4))
    pts[:, 0] = (u - cx) * z / fx + bx
    pts[:, 1] = (v - cy) * z / fy + by
    pts[:, 2] = z
    world = pts @ pose.T
    return world[:, :3]


def extract_pointclouds(scene_path: str, output_path: str | None = None):
    """Per exported frame: unproject + save {frame}.npz{pcd}."""
    output_path = output_path or os.path.join(scene_path, "pcd")
    os.makedirs(output_path, exist_ok=True)
    intrinsic = np.loadtxt(
        os.path.join(scene_path, "intrinsic", "intrinsic_depth.txt")
    )
    out = []
    for depth_file in sorted(
        glob.glob(os.path.join(scene_path, "depth", "*.npy")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0]),
    ):
        frame = os.path.splitext(os.path.basename(depth_file))[0]
        pose = np.loadtxt(os.path.join(scene_path, "pose", f"{frame}.txt"))
        if not np.isfinite(pose).all():
            continue
        pcd = unproject_depth(np.load(depth_file), intrinsic, pose)
        path = os.path.join(output_path, f"{frame}.npz")
        np.savez(path, pcd=pcd.astype(np.float32))
        out.append(path)
    return out


def _voxel_down(points: np.ndarray, voxel_size: float) -> np.ndarray:
    sel = sparse_quantize(points / voxel_size, return_index=True)
    return points[sel]


def _overlap_of_downsampled(d0, d1, voxel_size: float) -> float:
    """max of the two directed match fractions at 1.5x voxel radius on
    pre-downsampled clouds; K=1 semantics (count source points with >=1
    match) — the one place this formula lives."""
    if len(d0) == 0 or len(d1) == 0:
        return 0.0
    m01 = radius_matches(d0, d1, 1.5 * voxel_size)
    m10 = radius_matches(d1, d0, 1.5 * voxel_size)
    n01 = len(np.unique(m01[:, 0])) if len(m01) else 0
    n10 = len(np.unique(m10[:, 0])) if len(m10) else 0
    return max(n01 / len(d0), n10 / len(d1))


def compute_overlap_ratio(pcd0, pcd1, voxel_size: float) -> float:
    """max of the two directed match fractions at 1.5x voxel radius
    (compute_full_overlapping.py:29-37)."""
    return _overlap_of_downsampled(
        _voxel_down(pcd0, voxel_size), _voxel_down(pcd1, voxel_size),
        voxel_size,
    )


def compute_scene_overlaps(scene_path: str, voxel_size: float = 0.05,
                           pcd_dir: str | None = None) -> str:
    """All-pairs overlap for one scene -> overlap.txt."""
    pcd_dir = pcd_dir or os.path.join(scene_path, "pcd")
    files = sorted(glob.glob(os.path.join(pcd_dir, "*.npz")))
    clouds = []
    for f in files:
        pts = np.load(f)["pcd"]
        if len(pts):
            clouds.append((f, _voxel_down(pts, voxel_size)))
    out_path = os.path.join(scene_path, "overlap.txt")
    with open(out_path, "w") as out:
        for i in range(len(clouds)):
            for j in range(i + 1, len(clouds)):
                f0, d0 = clouds[i]
                f1, d1 = clouds[j]
                overlap = _overlap_of_downsampled(d0, d1, voxel_size)
                out.write(f"{f0} {f1} {overlap}\n")
    return out_path


def generate_pair_list(scenes_dir: str, output_file: str,
                       threshold: float = 0.3) -> int:
    """Concatenate all scenes' overlap.txt, keep pairs >= threshold
    (generate_list.py:20-28).  Returns the number of pairs written."""
    n = 0
    with open(output_file, "w") as out:
        for overlap_file in sorted(
            glob.glob(os.path.join(scenes_dir, "*", "overlap.txt"))
        ):
            with open(overlap_file) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 3 and float(parts[2]) >= threshold:
                        out.write(line)
                        n += 1
    return n


def main(argv=None):
    """CLI mirroring the reference's per-stage scripts
    (data_preprocess/README.md:15-31: reader.py, point_cloud_extractor.py,
    compute_full_overlapping.py, generate_list.py) as subcommands, plus a
    ``scene`` convenience running all three per-scene stages."""
    import argparse

    p = argparse.ArgumentParser(prog="pair_pipeline", description=main.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("export", help="dump depth/pose/intrinsics from a .sens")
    s.add_argument("--filename", required=True, help=".sens file to read")
    s.add_argument("--output_path", required=True)
    s.add_argument("--frame_skip", type=int, default=25)

    s = sub.add_parser("extract", help="unproject exported frames to .npz clouds")
    s.add_argument("--input_path", required=True, help="exported scene dir")
    s.add_argument("--output_path", default=None, help="default <scene>/pcd")

    s = sub.add_parser("overlap", help="all-pairs overlap -> overlap.txt")
    s.add_argument("--input_path", required=True, help="scene dir with pcd/")
    s.add_argument("--voxel_size", type=float, default=0.05)

    s = sub.add_parser("pairlist", help="filter overlaps into the corpus list")
    s.add_argument("--target_dir", required=True, help="dir of scene subdirs")
    s.add_argument("--output_file", default=None,
                   help="default <target_dir>/overlap-30.txt")
    s.add_argument("--threshold", type=float, default=0.3)

    s = sub.add_parser("scene", help="export+extract+overlap for one .sens")
    s.add_argument("--filename", required=True)
    s.add_argument("--output_path", required=True)
    s.add_argument("--frame_skip", type=int, default=25)
    s.add_argument("--voxel_size", type=float, default=0.05)

    args = p.parse_args(argv)
    if args.cmd == "export":
        export_scene(args.filename, args.output_path, args.frame_skip)
    elif args.cmd == "extract":
        files = extract_pointclouds(args.input_path, args.output_path)
        print(f"extracted {len(files)} clouds")
    elif args.cmd == "overlap":
        print(compute_scene_overlaps(args.input_path, args.voxel_size))
    elif args.cmd == "pairlist":
        out = args.output_file or os.path.join(
            args.target_dir, "overlap-30.txt"
        )
        n = generate_pair_list(args.target_dir, out, args.threshold)
        print(f"{n} pairs -> {out}")
    elif args.cmd == "scene":
        export_scene(args.filename, args.output_path, args.frame_skip)
        extract_pointclouds(args.output_path)
        print(compute_scene_overlaps(args.output_path, args.voxel_size))


if __name__ == "__main__":
    main()
