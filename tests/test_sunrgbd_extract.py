"""Fixture-driven tests for the Python port of the SUN RGB-D MATLAB
extraction stage (tools/sunrgbd_extract.py vs matlab/extract_rgbd_data_v2.m,
extract_split.m): fabricated official-release .mat structures + sensor-coded
depth PNGs run through the full chain into tools/sunrgbd_data.py."""
import os

import numpy as np
import pytest

sio = pytest.importorskip("scipy.io")
PIL_Image = pytest.importorskip("PIL.Image")

from pointcontrast_tpu.tools.sunrgbd_extract import (
    extract_rgbd_data_v1,
    extract_rgbd_data_v2,
    extract_split,
    read_3d_points,
    read_sunrgbd_depth,
)

PREFIX = "/n/fs/sun3d/data"  # the 16 chars the MATLAB scripts strip
H, W = 4, 5
FX = FY = 2.0
CX, CY = 2.5, 1.5


def _encode_depth(depth_mm: np.ndarray) -> np.ndarray:
    """Inverse of the sensor packing: rotate left by 3 bits."""
    d = depth_mm.astype(np.uint16)
    return ((d << 3) | (d >> 13)).astype(np.uint16)


def _save_depth_png(path, depth_mm):
    PIL_Image.fromarray(_encode_depth(depth_mm)).save(path)


def _bb(classname, centroid, coeffs, orientation, box2d=None):
    fields = [
        ("classname", "O"), ("centroid", "O"), ("coeffs", "O"),
        ("orientation", "O"), ("gtBb2D", "O"),
    ]
    return (
        classname,
        np.asarray(centroid, np.float64).reshape(1, 3),
        np.asarray(coeffs, np.float64).reshape(1, 3),
        np.asarray(orientation, np.float64).reshape(1, 3),
        np.asarray(box2d if box2d is not None else [1, 2, 3, 4],
                   np.float64).reshape(1, 4),
    ), fields


def _meta_entry(depthpath, rgbpath, rtilt, k, boxes):
    vals, fields = zip(*[_bb(*b) for b in boxes]) if boxes else ((), None)
    bb = np.array(
        list(vals),
        dtype=[("classname", "O"), ("centroid", "O"), ("coeffs", "O"),
               ("orientation", "O"), ("gtBb2D", "O")],
    ).reshape(1, -1) if boxes else np.empty((1, 0))
    return (
        depthpath, rgbpath, np.asarray(rtilt, np.float64),
        np.asarray(k, np.float64), bb, bb,
    )


META_DTYPE = [
    ("depthpath", "O"), ("rgbpath", "O"), ("Rtilt", "O"), ("K", "O"),
    ("groundtruth3DBB", "O"), ("groundtruth2DBB", "O"),
]


class TestDepthDecode:
    def test_roundtrip_and_clamp(self, tmp_path):
        rng = np.random.RandomState(0)
        depth_mm = rng.randint(0, 7999, (H, W)).astype(np.uint16)
        depth_mm[0, 0] = 0
        p = str(tmp_path / "d.png")
        _save_depth_png(p, depth_mm)
        m = read_sunrgbd_depth(p)
        np.testing.assert_allclose(m, depth_mm / 1000.0, atol=1e-6)

        _save_depth_png(p, np.full((H, W), 8190, np.uint16))
        assert (read_sunrgbd_depth(p) == 8.0).all()

    def test_unproject_matches_toolbox_formula(self):
        depth = np.zeros((H, W), np.float32)
        depth[1, 2] = 1.5  # MATLAB pixel (x=3, y=2)
        k = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
        pts, _ = read_3d_points(depth, k)
        # column-major flatten: (y=1, x=2) -> index x*H + y = 9
        i = 2 * H + 1
        np.testing.assert_allclose(
            pts[i], [(3 - CX) * 1.5 / FX, 1.5, -(2 - CY) * 1.5 / FY]
        )
        other = np.delete(np.arange(H * W), i)
        assert np.isnan(pts[other]).all()


class TestExtractV2:
    def _fixture(self, tmp_path, n_images=2):
        official = tmp_path / "OFFICIAL_SUNRGBD"
        rng = np.random.RandomState(1)
        entries = []
        truths = []
        for i in range(n_images):
            sub = f"/kv1/scene{i}"
            ddir = official / sub.lstrip("/") / "depth"
            rdir = official / sub.lstrip("/") / "image"
            ddir.mkdir(parents=True)
            rdir.mkdir(parents=True)
            depth_mm = np.zeros((H, W), np.uint16)
            depth_mm[1, 2] = 1500 + i * 100
            _save_depth_png(str(ddir / "0.png"), depth_mm)
            color = np.full((H, W, 3), 128, np.uint8)
            PIL_Image.fromarray(color).save(str(rdir / "0.jpg"))
            theta = 0.1 * (i + 1)
            rtilt = np.array([
                [1, 0, 0],
                [0, np.cos(theta), -np.sin(theta)],
                [0, np.sin(theta), np.cos(theta)],
            ])
            k = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
            boxes = [(
                "chair", [1.0 + i, 2.0, 0.5], [0.4, 0.3, 0.25],
                [0.6, 0.8, 0.0], [10, 20, 30, 40],
            )]
            entries.append(_meta_entry(
                PREFIX + sub + "/depth/0.png", PREFIX + sub + "/image/0.jpg",
                rtilt, k, boxes,
            ))
            truths.append((depth_mm, rtilt, k, boxes))
        meta = np.array(entries, dtype=META_DTYPE).reshape(1, -1)
        m3 = str(tmp_path / "SUNRGBDMeta3DBB_v2.mat")
        m2 = str(tmp_path / "SUNRGBDMeta2DBB_v2.mat")
        sio.savemat(m3, {"SUNRGBDMeta": meta})
        sio.savemat(m2, {"SUNRGBDMeta2DBB": meta})
        return m3, m2, str(official), truths

    def test_extract_and_chain_into_dumper(self, tmp_path):
        from pointcontrast_tpu.tools.sunrgbd_data import (
            extract_sunrgbd_data,
            read_calib,
            read_label,
        )

        m3, m2, official, truths = self._fixture(tmp_path)
        out = str(tmp_path / "sunrgbd_trainval")
        done = extract_rgbd_data_v2(m3, m2, official, out)
        assert done == [1, 2]

        for image_id, (depth_mm, rtilt, k, boxes) in zip(done, truths):
            inst = sio.loadmat(
                os.path.join(out, "depth", "%06d.mat" % image_id)
            )["instance"]
            assert inst.shape == (1, 6)  # one valid depth pixel
            d = depth_mm[1, 2] / 1000.0
            cam = np.array(
                [(3 - CX) * d / FX, d, -(2 - CY) * d / FY]
            )
            np.testing.assert_allclose(inst[0, :3], rtilt @ cam, atol=1e-6)
            np.testing.assert_allclose(inst[0, 3:], 128 / 255.0, atol=0.02)

            rt2, k2 = read_calib(
                os.path.join(out, "calib", "%06d.txt" % image_id)
            )
            np.testing.assert_allclose(rt2, rtilt, atol=1e-12)
            np.testing.assert_allclose(k2, k, atol=1e-12)

            objs = read_label(
                os.path.join(out, "label", "%06d.txt" % image_id)
            )
            assert len(objs) == 1 and objs[0].classname == "chair"
            np.testing.assert_allclose(objs[0].centroid, boxes[0][1])
            np.testing.assert_allclose(
                objs[0].heading_angle, -np.arctan2(0.8, 0.6)
            )
            assert os.path.exists(
                os.path.join(out, "image", "%06d.jpg" % image_id)
            )

        # chain: the dumper consumes this layout directly
        idxf = str(tmp_path / "idx.txt")
        with open(idxf, "w") as f:
            f.write("1\n2\n")
        dump = str(tmp_path / "dump")
        written = extract_sunrgbd_data(
            idxf, out, dump, num_point=4, save_votes=True
        )
        assert written == [1, 2]
        pc = np.load(os.path.join(dump, "000001_pc.npz"))["pc"]
        assert pc.shape == (4, 6)

    def test_v1_labels(self, tmp_path):
        m3, _, _, _ = self._fixture(tmp_path)
        out = str(tmp_path / "tv")
        done = extract_rgbd_data_v1(m3, out)
        assert done == [1, 2]
        assert os.path.exists(os.path.join(out, "label_v1", "000001.txt"))


class TestExtractSplit:
    def test_split_lists(self, tmp_path):
        m3 = str(tmp_path / "meta.mat")
        entries = [
            _meta_entry(PREFIX + f"/kv1/scene{i}/depth/0.png",
                        PREFIX + f"/kv1/scene{i}/image/0.jpg",
                        np.eye(3), np.eye(3), [])
            for i in range(3)
        ]
        sio.savemat(
            m3, {"SUNRGBDMeta": np.array(entries, dtype=META_DTYPE).reshape(1, -1)}
        )
        split = {
            "alltrain": np.array(
                [[PREFIX + "/kv1/scene0/", PREFIX + "/kv1/scene2/"]], object
            ),
            "alltest": np.array([[PREFIX + "/kv1/scene1/"]], object),
        }
        sp = str(tmp_path / "allsplit.mat")
        sio.savemat(sp, split)
        out = str(tmp_path / "tv")
        n_train, n_val = extract_split(sp, m3, out)
        assert (n_train, n_val) == (2, 1)
        train = open(os.path.join(out, "train_data_idx.txt")).read().split()
        val = open(os.path.join(out, "val_data_idx.txt")).read().split()
        assert train == ["1", "3"] and val == ["2"]
