"""Cross-app integration: pretrain -> checkpoint -> resume -> semseg
transfer -> eval. The PointContrast pipeline glue, end to end on synthetic
data."""
import os

import numpy as np
import pytest
import jax

from pointcontrast_tpu.data import PadScheme, PairLoader, SyntheticPairDataset
from pointcontrast_tpu.nn.res16unet import Res16UNetBase
from pointcontrast_tpu.nn.resnet_block import BasicBlock
from pointcontrast_tpu.semseg.dataset import SemsegLoader
from pointcontrast_tpu.semseg.datasets.synthetic import SyntheticSemsegDataset
from pointcontrast_tpu.semseg.train import SemsegConfig, SemsegTrainer
from pointcontrast_tpu.train import (
    PretrainConfig,
    PretrainTrainer,
    latest_checkpoint,
    load_checkpoint,
)


class TinyUNet(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
    INIT_DIM = 4


class TestPipeline:
    def test_pretrain_resume_then_transfer(self, tmp_path):
        ckpt_dir = str(tmp_path / "pretrain")
        scheme = PadScheme(npad0=2048)
        ds = SyntheticPairDataset(num_pairs=4, points_per_frame=500, seed=0)

        def make_trainer():
            loader = PairLoader(
                ds, batch_size=1, scheme=scheme, mode="nce", npos=128,
                num_workers=1, seed=0, fuse_frames=True,
            )
            model = TinyUNet(in_channels=3, out_channels=8,
                             normalize_feature=True)
            cfg = PretrainConfig(
                mode="nce", npos=128, max_iter=100, stat_freq=1, save_freq=3,
                checkpoint_dir=ckpt_dir, lr=0.05,
            )
            return PretrainTrainer(model, loader, cfg), loader

        trainer, loader = make_trainer()
        trainer.train(3)
        loader.close()
        assert int(trainer.state.step) == 3

        # a fresh trainer resumes from the checkpoint
        trainer2, loader2 = make_trainer()
        assert int(trainer2.state.step) == 3
        trainer2.train(2)
        loader2.close()
        assert int(trainer2.state.step) == 5
        # resumed params match the first trainer's end state at step 3 start
        ck = latest_checkpoint(ckpt_dir)
        payload = load_checkpoint(ck)
        assert int(payload["curr_iter"]) == 5

        # transfer the pretrained encoder into a semseg head
        seg_ds = SyntheticSemsegDataset(num_scenes=3, points=800, seed=0)
        seg_loader = SemsegLoader(seg_ds, 1, scheme, num_workers=1, seed=0)
        seg_model = TinyUNet(in_channels=3, out_channels=seg_ds.num_classes)
        seg_cfg = SemsegConfig(
            lr=0.2, max_iter=3, stat_freq=1, val_freq=100, save_freq=100,
            checkpoint_dir=str(tmp_path / "semseg"),
        )
        seg_trainer = SemsegTrainer(
            seg_model, seg_loader, None, seg_cfg,
            num_classes=seg_ds.num_classes,
            pretrained_params=payload["params"],
        )
        # the transferred stem conv must carry the pretrain values
        stem_pre = np.asarray(
            jax.tree.leaves(payload["params"]["conv0p1s1"])[0]
        )
        stem_seg = np.asarray(
            jax.tree.leaves(
                jax.device_get(seg_trainer.state.params)["conv0p1s1"]
            )[0]
        )
        np.testing.assert_allclose(stem_pre, stem_seg)
        history = seg_trainer.train(3)
        seg_loader.close()
        assert all(np.isfinite(m["loss"]) for _, m in history)

        # metrics JSONL written by both trainers
        from pointcontrast_tpu.utils.metrics import read_metrics

        events = read_metrics(os.path.join(ckpt_dir, "metrics.jsonl"))
        assert any(e["tag"] == "train/loss" for e in events)
