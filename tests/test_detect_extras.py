"""Extras: BoxNet loss, SUN RGB-D loader, dump/PR utils, CRF wrapper."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


class TestBoxNetLoss:
    def test_loss_and_labels(self):
        from pointcontrast_tpu.detect.loss import get_loss_boxnet

        rng = np.random.RandomState(0)
        B, K, K2, N = 2, 16, 6, 200

        class DC:
            num_class = 5
            num_heading_bin = 4
            num_size_cluster = 5
            mean_size_arr = np.abs(rng.randn(5, 3)) + 0.3

        ep = {
            "aggregated_vote_xyz": jnp.asarray(rng.rand(B, K, 3), jnp.float32),
            "aggregated_vote_inds": jnp.asarray(rng.randint(0, 64, (B, K)), jnp.int32),
            "seed_inds": jnp.asarray(rng.randint(0, N, (B, 64)), jnp.int32),
            "seed_xyz": jnp.asarray(rng.rand(B, 64, 3), jnp.float32),
            "vote_label_mask": jnp.asarray(rng.randint(0, 2, (B, N)), jnp.float32),
            "objectness_scores": jnp.asarray(rng.randn(B, K, 2), jnp.float32),
            "center": jnp.asarray(rng.rand(B, K, 3), jnp.float32),
            "center_label": jnp.asarray(rng.rand(B, K2, 3), jnp.float32),
            "box_label_mask": jnp.asarray(rng.randint(0, 2, (B, K2)), jnp.float32),
            "heading_scores": jnp.asarray(rng.randn(B, K, 4), jnp.float32),
            "heading_residuals_normalized": jnp.asarray(rng.randn(B, K, 4) * .1, jnp.float32),
            "heading_class_label": jnp.asarray(rng.randint(0, 4, (B, K2)), jnp.int32),
            "heading_residual_label": jnp.asarray(rng.randn(B, K2) * .1, jnp.float32),
            "size_scores": jnp.asarray(rng.randn(B, K, 5), jnp.float32),
            "size_residuals_normalized": jnp.asarray(rng.randn(B, K, 5, 3) * .1, jnp.float32),
            "size_class_label": jnp.asarray(rng.randint(0, 5, (B, K2)), jnp.int32),
            "size_residual_label": jnp.asarray(rng.randn(B, K2, 3) * .1, jnp.float32),
            "sem_cls_scores": jnp.asarray(rng.randn(B, K, 5), jnp.float32),
            "sem_cls_label": jnp.asarray(rng.randint(0, 5, (B, K2)), jnp.int32),
        }
        loss, ep = get_loss_boxnet(ep, DC)
        assert np.isfinite(float(loss))
        assert float(ep["vote_loss"]) == 0.0  # no voting in BoxNet
        assert np.all(np.asarray(ep["objectness_mask"]) == 1)  # no gray zone


class TestSunrgbdDataset:
    def test_loader_contract(self, tmp_path):
        from pointcontrast_tpu.detect.sunrgbd import SunrgbdDetectionVotesDataset

        rng = np.random.RandomState(0)
        n, k = 3000, 3
        pc = rng.rand(n, 6).astype(np.float32)
        bboxes = np.zeros((k, 8))
        bboxes[:, 0:3] = rng.rand(k, 3) * 3
        bboxes[:, 3:6] = 0.3 + rng.rand(k, 3) * 0.3  # half sizes
        bboxes[:, 6] = rng.rand(k) * np.pi
        bboxes[:, 7] = rng.randint(0, 10, k)
        votes = np.zeros((n, 10), np.float32)
        votes[: n // 2, 0] = 1
        votes[: n // 2, 1:] = np.tile(rng.randn(n // 2, 3) * 0.1, (1, 3))
        np.savez(tmp_path / "000001_pc.npz", pc=pc)
        np.save(tmp_path / "000001_bbox.npy", bboxes)
        np.savez(tmp_path / "000001_votes.npz", point_votes=votes)

        ds = SunrgbdDetectionVotesDataset(
            str(tmp_path), scan_names=["000001"], num_points=1024,
            augment=True, seed=0,
        )
        s = ds[0]
        assert s["point_clouds"].shape == (1024, 3)
        assert s["vote_label"].shape == (1024, 9)
        assert s["box_label_mask"].sum() == k
        assert s["heading_class_label"].max() < 12
        # angle2class roundtrip applied to stored heading
        dc = ds.dc
        for i in range(k):
            back = dc.class2angle(
                int(s["heading_class_label"][i]),
                float(s["heading_residual_label"][i]), to_label_format=False,
            )
            assert np.isfinite(back)


class TestDetectUtils:
    def test_write_obb_and_dump(self, tmp_path):
        from pointcontrast_tpu.detect.box_util import get_3d_box_batch
        from pointcontrast_tpu.detect.utils import write_oriented_bbox

        corners = get_3d_box_batch(
            np.array([[1.0, 1, 1], [2, 1, 0.5]]),
            np.array([0.0, 0.5]),
            np.zeros((2, 3)),
        )
        p = str(tmp_path / "boxes.ply")
        write_oriented_bbox(corners, p)
        text = open(p).read()
        assert "element vertex 16" in text and "element face 24" in text

    def test_calculate_pr(self):
        from pointcontrast_tpu.detect.box_util import get_3d_box
        from pointcontrast_tpu.detect.utils import calculate_pr

        box = get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        far = get_3d_box((1, 1, 1), 0.0, (9, 0, 0))
        pred = {0: [("chair", box, 0.9), ("chair", far, 0.8)]}
        gt = {0: [("chair", box)]}
        precision, recall = calculate_pr(pred, gt, 0.25)
        assert precision == 0.5 and recall == 1.0


class TestCRF:
    def test_meanfield_refines(self):
        from pointcontrast_tpu.semseg.crf import MeanFieldCRF, build_bilateral_map

        rng = np.random.RandomState(0)
        n, npad, c = 100, 129, 4
        coords = np.concatenate(
            [np.zeros((n, 1), int), rng.randint(0, 10, (n, 3))], 1
        )
        colors = rng.rand(n, 3) * 255
        nbr = build_bilateral_map(coords, colors, npad)
        valid = np.zeros(npad, np.float32)
        valid[:n] = 1
        unary = np.zeros((npad, c), np.float32)
        unary[:n] = rng.randn(n, c)
        crf = MeanFieldCRF(nchannels=c, kernel_volume=nbr.shape[0],
                           meanfield_iterations=2)
        v = crf.init(jax.random.PRNGKey(0), jnp.asarray(unary), nbr, valid)
        out = crf.apply(v, jnp.asarray(unary), nbr, valid)
        assert out.shape == (npad, c)
        assert np.isfinite(np.asarray(out)).all()
        assert np.all(np.asarray(out)[n:] == 0)


class TestSparseMM:
    def test_mapping_matmul_and_grad(self):
        from pointcontrast_tpu.utils.sparse_mm import mapping_matrix, sparse_mm

        rng = np.random.RandomState(0)
        dense = jnp.asarray(rng.randn(10, 4), jnp.float32)
        rows = np.array([3, 1, 7])
        m = mapping_matrix(rows, 10)
        out = sparse_mm(m, dense)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense)[rows])
        g = jax.grad(lambda d: sparse_mm(m, d).sum())(dense)
        want = np.zeros((10, 4))
        want[rows] = 1
        np.testing.assert_allclose(np.asarray(g), want)


class TestSunrgbdDumper:
    def test_extract_roundtrip(self, tmp_path):
        """Fabricated raw SUN RGB-D layout -> dumper -> our detection
        dataset loads it and the votes point at box centroids."""
        import scipy.io as sio

        from pointcontrast_tpu.detect.sunrgbd import SunrgbdDetectionVotesDataset
        from pointcontrast_tpu.tools.sunrgbd_data import extract_sunrgbd_data

        raw = tmp_path / "raw"
        for sub in ("depth", "label"):
            (raw / sub).mkdir(parents=True)
        rng = np.random.RandomState(0)
        # scene 1: a box of points around (1, 2, 0.5) + background
        centroid = np.array([1.0, 2.0, 0.5])
        half = np.array([0.4, 0.3, 0.25])
        inside = centroid + (rng.rand(300, 3) - 0.5) * 2 * half * 0.9
        bg = rng.rand(500, 3) * 6 - 1
        bg = bg[~np.all(np.abs(bg - centroid) <= half, axis=1)]
        pts = np.concatenate([inside, bg])
        pc = np.concatenate([pts, rng.rand(len(pts), 3)], 1)
        sio.savemat(raw / "depth" / "000001.mat", {"instance": pc})
        # label: classname xmin ymin dx dy cx cy cz w l h ox oy
        (raw / "label" / "000001.txt").write_text(
            f"chair 10 10 50 50 {centroid[0]} {centroid[1]} {centroid[2]} "
            f"{half[1]} {half[0]} {half[2]} 1 0\n"
            "unknown_thing 0 0 5 5 0 0 0 0.1 0.1 0.1 1 0\n"
        )
        idxf = tmp_path / "idx.txt"
        idxf.write_text("1\n")
        out = tmp_path / "out"
        written = extract_sunrgbd_data(
            str(idxf), str(raw), str(out), num_point=600, save_votes=True)
        assert written == [1]

        obbs = np.load(out / "000001_bbox.npy")
        assert obbs.shape == (1, 8)  # whitelist filtered the unknown class
        np.testing.assert_allclose(obbs[0, :3], centroid)
        np.testing.assert_allclose(obbs[0, 3:6], [half[0], half[1], half[2]])
        votes = np.load(out / "000001_votes.npz")["point_votes"]
        pcs = np.load(out / "000001_pc.npz")["pc"]
        in_mask = votes[:, 0] > 0
        assert in_mask.sum() > 50
        np.testing.assert_allclose(
            pcs[in_mask, :3] + votes[in_mask, 1:4],
            np.broadcast_to(centroid, (int(in_mask.sum()), 3)), atol=1e-6)

        ds = SunrgbdDetectionVotesDataset(
            str(out), scan_names=["000001"], num_points=512, seed=0)
        sample = ds[0]
        assert sample["point_clouds"].shape == (512, 3)


class TestVendoredSplits:
    def test_scannet_and_stanford_fallback(self, tmp_path):
        from pointcontrast_tpu.semseg.datasets.scannet import (
            ScannetVoxelization2cmDataset,
        )
        from pointcontrast_tpu.semseg.datasets.stanford import (
            StanfordArea5Dataset,
        )

        ds = ScannetVoxelization2cmDataset(str(tmp_path), phase="val")
        assert len(ds) == 312  # reference scannetv2_val.txt
        st = StanfordArea5Dataset(str(tmp_path), phase="val")
        assert len(st) == 68  # reference area5.txt (67 newlines + unterminated last line)


class TestPcUtilVolumes:
    def test_volume_roundtrip(self):
        rng = np.random.RandomState(0)
        from pointcontrast_tpu.detect import pc_util

        pts = rng.rand(500, 3) * 2 - 1
        vol = pc_util.point_cloud_to_volume(pts, vsize=12, radius=1.0)
        assert vol.shape == (12, 12, 12) and set(np.unique(vol)) <= {0.0, 1.0}
        back = pc_util.volume_to_point_cloud(vol)
        assert len(back) == int(vol.sum())
        # every input point's cell is occupied
        voxel = 2.0 / 12
        cells = np.clip(((pts + 1.0) / voxel).astype(int), 0, 11)
        assert vol[cells[:, 0], cells[:, 1], cells[:, 2]].all()

        batch = pc_util.point_cloud_to_volume_batch(
            np.stack([pts, pts]), vsize=12, flatten=True)
        assert batch.shape == (2, 12 ** 3)
        np.testing.assert_array_equal(batch[0].reshape(12, 12, 12), vol)

    def test_volume_v2_samples(self):
        from pointcontrast_tpu.detect import pc_util

        rng = np.random.RandomState(1)
        pts = rng.rand(400, 3) * 2 - 1
        vol = pc_util.point_cloud_to_volume_v2(pts, vsize=4, num_sample=8)
        assert vol.shape == (4, 4, 4, 8, 3)
        # relative coords stay within one cell (|d| <= 1 cell unit)
        assert np.abs(vol).max() <= 1.0 + 1e-6
        occupied = np.abs(vol).sum(axis=(3, 4)) > 0
        assert occupied.sum() > 0


class TestSemsegViz:
    def test_visualize_and_permute(self, tmp_path):
        from pointcontrast_tpu.semseg.viz import permute_pointcloud, visualize_results
        from pointcontrast_tpu.semseg.datasets.scannet import SCANNET_COLOR_MAP
        from pointcontrast_tpu.utils.ply import read_ply

        rng = np.random.RandomState(0)
        n = 300
        coords = np.concatenate(
            [np.zeros((n, 1), np.int32), rng.randint(0, 20, (n, 3))], 1)
        coords = np.unique(coords, axis=0)
        n = len(coords)
        target = rng.randint(0, 5, n)
        target[:10] = 255
        pred = rng.randint(0, 5, n)
        colors = rng.randint(0, 255, (n, 3)).astype(np.float64)
        paths = visualize_results(
            coords, colors, target, pred, SCANNET_COLOR_MAP,
            str(tmp_path), "scannet_Res16UNet34C", 7)
        assert len(paths) == 3 and all(p.endswith("0007.ply") for p in paths)
        data = read_ply(paths[0])
        assert len(data["x"]) == n

        # permute: original points ARE the voxel centers (identity transform)
        pts = np.concatenate(
            [coords[:, :1], coords[:, 1:4].astype(np.float64) + 0.5,
             rng.randint(0, 5, (n, 1))], 1)
        tf = np.tile(np.eye(4).reshape(-1), (1, 1))
        vout = rng.randn(n, 5).astype(np.float32)
        vpred = rng.randint(0, 5, n)
        pout, ppred, ptgt = permute_pointcloud(
            coords, pts, tf, {i: i for i in range(6)}, vout, vpred)
        np.testing.assert_array_equal(ppred, vpred)
        np.testing.assert_allclose(pout, vout)
        np.testing.assert_array_equal(ptgt, pts[:, 4].astype(int))

        # raw labels absent from label_map score as ignore, not class 0
        pts_gap = pts.copy()
        pts_gap[:, 4] = 40  # raw id with no label_map entry
        _, _, ptgt_gap = permute_pointcloud(
            coords, pts_gap, tf, {i: i for i in range(6)}, vout, vpred)
        assert (ptgt_gap == 255).all()
