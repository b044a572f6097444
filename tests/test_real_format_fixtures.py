"""Byte-faithful ScanNet artifact fixtures.

Fabricates files matching the real dataset's on-disk bytes — the
``_vh_clean_2.ply`` / ``_vh_clean_2.labels.ply`` headers (VCGLIB/MLIB
comment lines, uchar alpha, ushort label, binary face list elements) and
the ``scannetv2-labels.combined.tsv`` quirks (categories with spaces,
blank nyu40id cells) — and drives the real readers/preprocessors over
them.  Guards the parsers against exactly the header variants the
synthetic-dataset tests never exercise
(reference surface: downstream/semseg/lib/datasets/preprocessing/scannet.py:11-66,
downstream/votenet_det_new/lib/datasets/scannet/scannet_utils.py).
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from pointcontrast_tpu.utils.ply import read_ply, read_ply_xyzrgbl
from pointcontrast_tpu.tools.preprocess_semseg import convert_scannet
from pointcontrast_tpu.tools.preprocess_detection import read_label_mapping


def _vh_clean_2_bytes(coords, colors, faces, labels=None, alpha=255):
    """Byte-exact ScanNet mesh PLY: binary little-endian, alpha channel,
    face element with a uchar-count int-index list property."""
    n = len(coords)
    header = [
        b"ply",
        b"format binary_little_endian 1.0",
        b"comment MLIB generated" if labels is not None else b"comment VCGLIB generated",
        b"element vertex %d" % n,
        b"property float x",
        b"property float y",
        b"property float z",
        b"property uchar red",
        b"property uchar green",
        b"property uchar blue",
        b"property uchar alpha",
    ]
    if labels is not None:
        header.append(b"property ushort label")
    header += [
        b"element face %d" % len(faces),
        b"property list uchar int vertex_indices",
        b"end_header",
    ]
    buf = b"\n".join(header) + b"\n"
    for i in range(n):
        buf += struct.pack("<fff", *coords[i])
        buf += struct.pack("<BBBB", *colors[i], alpha)
        if labels is not None:
            buf += struct.pack("<H", labels[i])
    for tri in faces:
        buf += struct.pack("<B3i", 3, *tri)
    return buf


def _fabricate_scene(scene_dir, name, n=50, labels=None, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 3).astype(np.float32) * 4
    colors = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    faces = rng.randint(0, n, (2 * n, 3)).astype(np.int64)
    os.makedirs(scene_dir, exist_ok=True)
    mesh = os.path.join(scene_dir, name + "_vh_clean_2.ply")
    with open(mesh, "wb") as f:
        f.write(_vh_clean_2_bytes(coords, colors, faces))
    if labels is not None:
        with open(
            os.path.join(scene_dir, name + "_vh_clean_2.labels.ply"), "wb"
        ) as f:
            f.write(_vh_clean_2_bytes(coords, colors, faces, labels=labels))
    return coords, colors


def test_read_real_header_mesh_and_labels(tmp_path):
    scene = str(tmp_path / "scene0000_00")
    labels = np.arange(50).astype(np.uint16) % 41
    coords, colors = _fabricate_scene(scene, "scene0000_00", labels=labels)

    v = read_ply(os.path.join(scene, "scene0000_00_vh_clean_2.ply"))
    np.testing.assert_allclose(
        np.stack([v["x"], v["y"], v["z"]], 1), coords, rtol=1e-6
    )
    assert v["red"].dtype == np.uint8
    assert np.unique(v["alpha"]).size == 1  # the reference asserts this too

    lv = read_ply(os.path.join(scene, "scene0000_00_vh_clean_2.labels.ply"))
    assert lv["label"].dtype == np.uint16
    np.testing.assert_array_equal(lv["label"], labels)

    # xyzrgbl convenience reader sees through the extra alpha property
    c2, f2, l2 = read_ply_xyzrgbl(
        os.path.join(scene, "scene0000_00_vh_clean_2.labels.ply")
    )
    np.testing.assert_allclose(c2, coords, rtol=1e-6)
    np.testing.assert_array_equal(l2, labels.astype(np.int32))


def test_convert_scannet_on_faithful_raw_tree(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "processed"

    # a normal labeled train scene, the bugged scene0270_00, and an
    # unlabeled test scene — the three real-world cases
    labels_a = (np.arange(60) % 41).astype(np.uint16)
    _fabricate_scene(
        str(raw / "scans" / "scene0001_00"), "scene0001_00",
        n=60, labels=labels_a, seed=1,
    )
    labels_bug = np.full(40, 50, dtype=np.uint16)  # the known bad label
    labels_bug[:10] = 3
    _fabricate_scene(
        str(raw / "scans" / "scene0270_00"), "scene0270_00",
        n=40, labels=labels_bug, seed=2,
    )
    _fabricate_scene(
        str(raw / "scans_test" / "scene0707_00"), "scene0707_00",
        n=30, labels=None, seed=3,
    )

    written = convert_scannet(str(raw), str(out), workers=2)
    assert len(written) == 3

    _, _, l_norm = read_ply_xyzrgbl(str(out / "train" / "scene0001_00.ply"))
    np.testing.assert_array_equal(l_norm, labels_a.astype(np.int32))

    _, _, l_fix = read_ply_xyzrgbl(str(out / "train" / "scene0270_00.ply"))
    assert not (l_fix == 50).any(), "bugged label 50 must be remapped to 0"
    assert (l_fix == 0).sum() == 30 and (l_fix == 3).sum() == 10

    _, _, l_test = read_ply_xyzrgbl(str(out / "test" / "scene0707_00.ply"))
    assert (l_test == 0).all()


def test_scannet_pair_tree(tmp_path):
    """Byte-faithful pretraining pair artifacts: nested
    data_f25/<scene>/pcd/<frame>.npz files with a 'pcd' array and a
    three-column 'path0 path1 overlap' list file
    (reference example_dataset/overlap-30-50p-subset.txt +
    lib/ddp_data_loaders.py:196-202)."""
    from pointcontrast_tpu.data import PadScheme, ScanNetMatchPairDataset
    from pointcontrast_tpu.data.collate import collate_pair

    rng = np.random.RandomState(0)
    root = tmp_path
    lines = []
    for scene, (f0, f1) in [("scene0589_00", (850, 1150)),
                            ("scene0571_00", (125, 1275))]:
        d = root / "data_f25" / scene / "pcd"
        os.makedirs(d)
        base = rng.rand(4000, 3) * 2.0
        # two overlapping views: same cloud + small disjoint extras
        np.savez(d / f"{f0}.npz", pcd=np.concatenate(
            [base, rng.rand(500, 3) * 2.0]))
        np.savez(d / f"{f1}.npz", pcd=np.concatenate(
            [base + rng.randn(*base.shape) * 0.005, rng.rand(500, 3) * 2.0]))
        lines.append(
            f"data_f25/{scene}/pcd/{f0}.npz data_f25/{scene}/pcd/{f1}.npz "
            f"0.794144556267"
        )
    (root / "overlap-30.txt").write_text("\n".join(lines) + "\n")

    ds = ScanNetMatchPairDataset(str(root), "overlap-30.txt", seed=0)
    assert len(ds) == 2
    xyz0, xyz1, c0, c1, f0_, f1_, matches, trans = ds[0]
    assert len(matches) > 100, "overlapping views must produce matches"
    batch = collate_pair([ds[0], ds[1]], PadScheme(npad0=8192), mode="nce",
                         npos=128, rng=np.random.RandomState(0),
                         fuse_frames=True)
    assert batch.num_pairs == 2
    assert np.asarray(batch.pair_valid).sum() > 0


def test_scannet_detection_npy_tree(tmp_path):
    """Byte-faithful detection artifacts: {scene}_vert.npy [N,6] xyzrgb,
    _ins_label/_sem_label.npy [N], _bbox.npy [K,7] with a trailing nyu40
    class id, plus the split txt (reference
    scannet_detection_dataset.py:26-224 / batch_load_scannet_data.py)."""
    from pointcontrast_tpu.detect.datasets import (
        ScannetDetectionDataset,
        collate_detection,
    )

    rng = np.random.RandomState(0)
    n = 3000
    scene = "scene0000_00"
    pts = rng.rand(n, 3) * 4.0
    rgb = rng.randint(0, 256, (n, 3)).astype(np.float64)
    ins = np.zeros(n, np.int64)
    sem = np.zeros(n, np.int64)
    # two object instances with nyu40 ids in the 18-class set (3=cabinet,
    # 4=bed), plus background walls (id 1, not an object class)
    ins[:500], sem[:500] = 1, 3
    pts[:500] = pts[:500] * 0.2 + [1.0, 1.0, 0.2]
    ins[500:900], sem[500:900] = 2, 4
    pts[500:900] = pts[500:900] * 0.3 + [2.5, 2.5, 0.3]
    sem[900:] = 1
    bboxes = []
    for lo, hi, cls in [(0, 500, 3), (500, 900, 4)]:
        x = pts[lo:hi]
        c = 0.5 * (x.min(0) + x.max(0))
        d = x.max(0) - x.min(0)
        bboxes.append(np.concatenate([c, d, [cls]]))
    np.save(tmp_path / f"{scene}_vert.npy", np.hstack([pts, rgb]))
    np.save(tmp_path / f"{scene}_ins_label.npy", ins)
    np.save(tmp_path / f"{scene}_sem_label.npy", sem)
    np.save(tmp_path / f"{scene}_bbox.npy", np.stack(bboxes))
    split = tmp_path / "scannetv2_train.txt"
    split.write_text(f"{scene}\nscene9999_00\n")  # unknown scenes filtered

    ds = ScannetDetectionDataset(
        str(tmp_path), split_file=str(split), num_points=2000,
        use_color=True, use_height=True, augment=True, seed=0,
    )
    assert len(ds) == 1
    s = ds[0]
    assert s["point_clouds"].shape == (2000, 7)  # xyz + rgb + height
    assert s["box_label_mask"].sum() == 2
    assert set(s["sem_cls_label"][:2]) == {ds.dc.nyu40id2class[3],
                                           ds.dc.nyu40id2class[4]}
    # votes: object points point at their instance centroid, walls don't
    assert 0 < s["vote_label_mask"].sum() < 2000
    m = s["vote_label_mask"].astype(bool)
    voted = s["point_clouds"][m, :3] + s["vote_label"][m, :3]
    assert np.std(voted, axis=0).max() < np.std(
        s["point_clouds"][m, :3], axis=0).max()

    batch = collate_detection([s])
    assert batch.point_clouds.shape == (1, 2000, 7)


def test_label_mapping_tsv_quirks(tmp_path):
    # faithful to scannetv2-labels.combined.tsv: tab-separated, many
    # columns, categories containing spaces/apostrophes, blank nyu40id
    tsv = tmp_path / "scannetv2-labels.combined.tsv"
    rows = [
        "id\traw_category\tcategory\tcount\tnyu40id\tnyu40class",
        "1\twall\twall\t8277\t1\twall",
        "3\tcabinet\tcabinet\t731\t3\tcabinet",
        "5\tcoffee table\ttable\t258\t7\ttable",
        "9\tkleenex box\tobject\t21\t40\totherprop",
        "17\tperson's bag\tbag\t5\t37\tbag",
        "99\tunknownthing\tobject\t1\t\totherprop",  # blank nyu40id cell
    ]
    tsv.write_text("\n".join(rows) + "\n")
    m = read_label_mapping(str(tsv))
    assert m["wall"] == 1
    assert m["coffee table"] == 7
    assert m["person's bag"] == 37
    assert "unknownthing" not in m  # blank id rows are skipped, not 0
    assert len(m) == 5
