"""Semseg dataset preprocessors.

Ports /root/reference/downstream/semseg/lib/datasets/preprocessing/:
  - stanford.py:17-134 -> ``convert_stanford`` (per-room annotation txt files
    merged into labeled PLYs, 1cm label-aware quantization, area split files)
  - scannet.py:11-66   -> ``convert_scannet`` (_vh_clean_2.ply + .labels.ply
    merged into xyzrgb+label PLYs, 3 known label bugs fixed)
"""
from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.utils.ply import read_ply, read_ply_xyzrgbl, save_ply

STANFORD_CLASSES = [
    "clutter", "beam", "board", "bookcase", "ceiling", "chair", "column",
    "door", "floor", "sofa", "stairs", "table", "wall", "window",
]

SCANNET_POINTCLOUD_FILE = "_vh_clean_2.ply"
SCANNET_LABEL_BUGS = {
    "train/scene0270_00.ply": 50,
    "train/scene0270_02.ply": 50,
    "train/scene0384_00.ply": 149,
}


def _read_stanford_txt(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 6:
                try:
                    rows.append([float(x) for x in parts])
                except ValueError:
                    continue
    pc = np.asarray(rows, dtype=np.float32)
    return pc[:, :3], pc[:, 3:].astype(np.uint8)


def convert_stanford(root_path: str, out_path: str,
                     quantization_size: float = 0.01) -> list[str]:
    """Merge each room's per-instance annotation txts into one labeled PLY
    at 1cm label-aware quantization (stanford.py:66-117)."""
    written = []
    for room_txt in sorted(glob.glob(os.path.join(root_path, "*/*/*.txt"))):
        parts = os.path.normpath(room_txt).split(os.sep)
        target_dir = os.path.join(out_path, parts[-3])
        out_file = os.path.join(target_dir, parts[-2] + ".ply")
        if os.path.exists(out_file):
            continue
        annotation_dir = os.path.join(os.path.dirname(room_txt), "Annotations")
        subclouds = glob.glob(os.path.join(annotation_dir, "*.txt"))
        coords, feats, labels = [], [], []
        for subcloud in subclouds:
            cls_name = os.path.basename(subcloud).split("_")[0]
            if cls_name not in STANFORD_CLASSES:
                continue
            xyz, rgb = _read_stanford_txt(subcloud)
            coords.append(xyz)
            feats.append(rgb)
            labels.append(
                np.full(len(xyz), STANFORD_CLASSES.index(cls_name), np.int32)
            )
        if not coords:
            continue
        coords = np.concatenate(coords)
        feats = np.concatenate(feats)
        labels = np.concatenate(labels)
        qc, qf, ql = sparse_quantize(
            coords / quantization_size, feats, labels, ignore_label=255
        )
        os.makedirs(target_dir, exist_ok=True)
        save_ply(out_file, qc * quantization_size, qf, ql)
        written.append(out_file)
    return written


def generate_stanford_splits(out_path: str, split_dir: str | None = None):
    """Area split files (stanford.py:120-131)."""
    split_dir = split_dir or os.path.join(out_path, "splits")
    os.makedirs(split_dir, exist_ok=True)
    for i in range(1, 7):
        files = sorted(
            glob.glob(os.path.join(out_path, f"Area_{i}", "*.ply"))
        )
        rel = [os.path.relpath(f, out_path) for f in files]
        with open(os.path.join(split_dir, f"area{i}.txt"), "w") as f:
            f.write("\n".join(rel))


def convert_scannet(raw_path: str, out_path: str, workers: int = 8):
    """Merge _vh_clean_2.ply + .labels.ply into xyzrgb+label PLYs
    (scannet.py:11-66), fixing the three known bugged labels."""
    tasks = []
    for dest, subset in [("train", "scans"), ("test", "scans_test")]:
        dest_dir = os.path.join(out_path, dest)
        os.makedirs(dest_dir, exist_ok=True)
        for f in sorted(
            glob.glob(os.path.join(raw_path, subset, "*/*" + SCANNET_POINTCLOUD_FILE))
        ):
            tasks.append((f, dest_dir))

    def handle(task):
        f, dest_dir = task
        coords, colors, _ = read_ply_xyzrgbl(f)
        label_f = f[: -len(".ply")] + ".labels.ply"
        if os.path.isfile(label_f):
            lv = read_ply(label_f)
            labels = lv["label"].astype(np.int32)
            assert len(labels) == len(coords)
        else:
            labels = np.zeros(len(coords), np.int32)
        base = os.path.basename(f)[: -len(SCANNET_POINTCLOUD_FILE)] + ".ply"
        out_f = os.path.join(dest_dir, base)
        save_ply(out_f, coords, colors, labels)
        return out_f

    with ThreadPoolExecutor(max_workers=workers) as pool:
        written = list(pool.map(handle, tasks))

    for rel, bug_label in SCANNET_LABEL_BUGS.items():
        f = os.path.join(out_path, rel)
        if os.path.exists(f):
            coords, colors, labels = read_ply_xyzrgbl(f)
            mask = labels == bug_label
            if mask.any():
                labels[mask] = 0
                save_ply(f, coords, colors, labels)
    return written


def main(argv=None):
    """CLI mirroring the reference preprocess scripts
    (downstream/semseg/lib/datasets/preprocessing/{scannet,stanford}.py —
    both are run-as-script converters with hardcoded paths; here the paths
    are arguments)."""
    import argparse

    p = argparse.ArgumentParser(prog="preprocess_semseg", description=main.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("scannet", help="merge clean_2 + labels PLYs")
    s.add_argument("--raw_path", required=True, help="dir with scans/, scans_test/")
    s.add_argument("--out_path", required=True)
    s.add_argument("--workers", type=int, default=8)

    s = sub.add_parser("stanford", help="convert S3DIS txt rooms to PLY")
    s.add_argument("--raw_path", required=True, help="Stanford3dDataset root")
    s.add_argument("--out_path", required=True)

    args = p.parse_args(argv)
    if args.cmd == "scannet":
        written = convert_scannet(args.raw_path, args.out_path, args.workers)
        print(f"wrote {len(written)} scans")
    elif args.cmd == "stanford":
        written = convert_stanford(args.raw_path, args.out_path)
        generate_stanford_splits(args.out_path)
        print(f"wrote {len(written)} rooms + splits")


if __name__ == "__main__":
    main()
