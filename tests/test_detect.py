"""Detection stack tests: box IoU oracles, NMS, VOC AP, VoteNet end-to-end."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.detect.box_util import (
    box3d_iou,
    get_3d_box,
    get_3d_box_batch,
    poly_area,
)
from pointcontrast_tpu.detect.configs import (
    ScannetDatasetConfig,
    SunrgbdDatasetConfig,
)
from pointcontrast_tpu.detect.datasets import (
    SyntheticDetectionDataset,
    collate_detection,
)
from pointcontrast_tpu.detect.eval_det import eval_det, voc_ap
from pointcontrast_tpu.detect.nms import nms_2d_faster, nms_3d_faster


class TestBoxUtil:
    def test_get_3d_box_axis_aligned(self):
        corners = get_3d_box((2.0, 4.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        assert corners.shape == (8, 3)
        np.testing.assert_allclose(np.abs(corners[:, 0]).max(), 1.0)
        np.testing.assert_allclose(np.abs(corners[:, 1]).max(), 0.5)
        np.testing.assert_allclose(np.abs(corners[:, 2]).max(), 2.0)

    def test_batch_matches_single(self):
        rng = np.random.RandomState(0)
        sizes = rng.rand(5, 3) + 0.5
        angles = rng.rand(5) * np.pi
        centers = rng.randn(5, 3)
        batched = get_3d_box_batch(sizes, angles, centers)
        for i in range(5):
            single = get_3d_box(sizes[i], angles[i], centers[i])
            np.testing.assert_allclose(batched[i], single, atol=1e-9)

    def test_iou_identical(self):
        c = get_3d_box((1.0, 1.0, 1.0), 0.3, (0.0, 0.0, 0.0))
        iou3d, iou2d = box3d_iou(c, c)
        assert abs(iou3d - 1.0) < 1e-6 and abs(iou2d - 1.0) < 1e-6

    def test_iou_known_overlap(self):
        # unit cubes offset by 0.5 in x: intersection 0.5, union 1.5
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.5, 0.0, 0.0))
        iou3d, _ = box3d_iou(a, b)
        np.testing.assert_allclose(iou3d, 0.5 / 1.5, atol=1e-6)

    def test_iou_disjoint(self):
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), 0.0, (5.0, 0.0, 0.0))
        iou3d, iou2d = box3d_iou(a, b)
        assert iou3d == 0.0 and iou2d == 0.0

    def test_iou_rotated_45(self):
        # two unit squares, one rotated 45 deg about the shared center:
        # known intersection area 2*(sqrt(2)-1)
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), np.pi / 4, (0.0, 0.0, 0.0))
        iou3d, _ = box3d_iou(a, b)
        inter = 2 * (np.sqrt(2) - 1)
        want = inter / (2 - inter)
        np.testing.assert_allclose(iou3d, want, atol=1e-4)


class TestNMS:
    def test_2d_suppresses_overlap(self):
        boxes = np.array([
            [0, 0, 1, 1, 0.9],
            [0.05, 0.05, 1.05, 1.05, 0.8],  # heavy overlap with first
            [2, 2, 3, 3, 0.7],
        ])
        pick = nms_2d_faster(boxes, 0.5)
        assert sorted(pick) == [0, 2]

    def test_3d_keeps_all_disjoint(self):
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.9],
            [2, 2, 2, 3, 3, 3, 0.8],
            [5, 5, 5, 6, 6, 6, 0.7],
        ])
        assert sorted(nms_3d_faster(boxes, 0.3)) == [0, 1, 2]


class TestVocAP:
    def test_perfect_detection(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert abs(voc_ap(rec, prec) - 1.0) < 1e-6

    def test_eval_det_perfect(self):
        box = get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        pred = {0: [("chair", box, 0.9)]}
        gt = {0: [("chair", box)]}
        rec, prec, ap = eval_det(pred, gt, ovthresh=0.25)
        assert ap["chair"] == 1.0

    def test_eval_det_miss(self):
        b1 = get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        b2 = get_3d_box((1, 1, 1), 0.0, (10, 0, 0))
        pred = {0: [("chair", b2, 0.9)]}
        gt = {0: [("chair", b1)]}
        _, _, ap = eval_det(pred, gt, ovthresh=0.25)
        assert ap["chair"] == 0.0


class TestConfigs:
    def test_sunrgbd_angle_roundtrip(self):
        dc = SunrgbdDatasetConfig()
        for angle in [0.1, 1.5, 3.0, 5.0]:
            cls, res = dc.angle2class(angle)
            back = dc.class2angle(cls, res, to_label_format=False)
            np.testing.assert_allclose(back % (2 * np.pi), angle % (2 * np.pi),
                                       atol=1e-6)

    def test_batch_angle_matches_scalar(self):
        dc = SunrgbdDatasetConfig()
        cls = np.array([0, 3, 11])
        res = np.array([0.05, -0.1, 0.2])
        batch = dc.class2angle_batch(cls, res)
        for i in range(3):
            assert abs(batch[i] - dc.class2angle(int(cls[i]), res[i])) < 1e-9


class TestVoteNetEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
        from pointcontrast_tpu.detect.votenet import VoteNet

        ds = SyntheticDetectionDataset(
            num_scenes=3, num_objects=4, num_points=2000, augment=True, seed=0
        )
        dc = ds.dc
        batches = [collate_detection([ds[i]]) for i in range(3)]
        model = VoteNet(
            num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
            num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
            num_proposal=32, sampling="vote_fps",
        )
        # batch size 1 on tiny synthetic scenes is unstable at the reference
        # lr (1e-3); 1e-4 converges monotonically enough to assert on.
        cfg = DetectConfig(learning_rate=1e-4)
        trainer = DetectTrainer(model, dc, cfg, batches[0])
        return trainer, batches

    def test_loss_decreases(self, setup):
        """Overfit a single fixed batch — the reliable smoke signal at this
        scale (multi-scene generalization needs far more steps)."""
        trainer, batches = setup

        class Loop:
            def __init__(self, items):
                self.items, self.i = items, 0

            def __next__(self):
                item = self.items[self.i % len(self.items)]
                self.i += 1
                return item

        one = Loop(batches[:1])
        losses = [trainer.train_epoch(one, 1) for _ in range(40)]
        assert all(np.isfinite(l) for l in losses)
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_evaluate_produces_map(self, setup):
        trainer, batches = setup

        class Loop:
            def __init__(self, items):
                self.items, self.i = items, 0

            def __next__(self):
                item = self.items[self.i % len(self.items)]
                self.i += 1
                return item

        metrics = trainer.evaluate(Loop(batches), 2)
        assert 0.25 in metrics and 0.5 in metrics
        assert "mAP" in metrics[0.25]
        assert 0.0 <= metrics[0.25]["mAP"] <= 1.0


class TestBackboneTransferLoad:
    def test_pretrain_params_load_into_sparseconv_backbone(self):
        """The reference finetunes VoteNet from the pretrain checkpoint by
        remapping the .pth keys onto the sparseconv backbone
        (downstream/votenet_det_new sparseconv backbone config).  Pin the
        equivalent path here: a bare pretrain Res16UNet tree nested under
        backbone_net/net lenient-loads into VoteNet(backbone='sparseconv',
        backbone_model=...), covering every backbone leaf except the final
        classifier, and the loaded leaves are the pretrain values."""
        import jax.numpy as jnp

        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.detect.votenet import VoteNet
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.train.checkpoint import lenient_filter

        ds = SyntheticDetectionDataset(num_scenes=1, num_objects=3,
                                       num_points=1500, seed=0)
        scheme = PadScheme(npad0=4096,
                           level_ratios=(1.0, 1.0, 0.5, 0.25, 0.12))
        batch = collate_detection([ds[0]], voxel_size=0.05, scheme=scheme)
        pre_model = load_model("Res16UNet14")(in_channels=3, out_channels=32)
        pre_params = jax.jit(
            lambda r, f, p: pre_model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(7), jnp.asarray(batch.voxel_feats),
          batch.voxel_pyramid)["params"]

        dc = ds.dc
        model = VoteNet(
            num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
            num_size_cluster=dc.num_size_cluster,
            mean_size_arr=dc.mean_size_arr, num_proposal=16,
            backbone="sparseconv", backbone_model="Res16UNet14",
        )
        inputs = {
            "point_clouds": jnp.asarray(batch.point_clouds),
            "voxel_feats": jnp.asarray(batch.voxel_feats),
            "voxel_pyramid": batch.voxel_pyramid,
            "point_voxel_idx": jnp.asarray(batch.point_voxel_idx),
        }
        vn_params = jax.jit(
            lambda r: model.init(r, inputs, train=False)
        )(jax.random.PRNGKey(0))["params"]

        merged, loaded, skipped = lenient_filter(
            vn_params, {"backbone_net": {"net": pre_params}}
        )
        # every pretrain leaf except the final classifier head transfers
        n_pre = len(jax.tree_util.tree_leaves(pre_params))
        n_final = len(jax.tree_util.tree_leaves(pre_params["final"]))
        assert len(loaded) == n_pre - n_final
        assert all("backbone_net" in k for k in loaded)
        # heads (voting/proposal) and the backbone final conv stay untouched
        assert any("vgen" in k for k in skipped)
        assert any("pnet" in k for k in skipped)
        np.testing.assert_array_equal(
            np.asarray(merged["backbone_net"]["net"]["conv0p1s1"]["kernel"]),
            np.asarray(pre_params["conv0p1s1"]["kernel"]),
        )
