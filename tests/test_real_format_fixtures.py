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
