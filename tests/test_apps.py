"""CLI app contract: config loading, overrides, snapshot/resume, training."""
import os

import numpy as np
import pytest

from pointcontrast_tpu.config import Config, load_config, save_config


class TestConfig:
    def test_overrides_and_types(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a:\n  b: 1\n  c: hello\nd: [1, 2]\n")
        cfg = load_config(str(p), ["a.b=2.5", "a.c=false", "d=[3,4]", "e.f=x"])
        assert cfg.a.b == 2.5
        assert cfg.a.c is False
        assert cfg.d == [3, 4]
        assert cfg.e.f == "x"

    def test_snapshot_roundtrip(self, tmp_path):
        cfg = Config({"x": {"y": 3}, "z": "s"})
        save_config(cfg, str(tmp_path / "snap.yaml"))
        back = load_config(str(tmp_path / "snap.yaml"))
        assert back.to_dict() == cfg.to_dict()

    def test_shipped_defaults(self):
        """The shipped YAMLs parse and declare the measured-fastest sparse
        row layout (chunked — PERF.md round 3: pretrain 1.15x, semseg 1.60x,
        VoteNet sparseconv 1.11x over the flat voxel layout)."""
        from pointcontrast_tpu.apps import pretrain, semseg, votenet

        for app in (pretrain, semseg, votenet):
            cfg = load_config(app.DEFAULT_CONFIG)
            assert cfg.data.layout == "chunked", app.DEFAULT_CONFIG
        assert load_config(semseg.DEFAULT_CONFIG).net.wrapper_type == ""


class TestPretrainApp:
    def test_cli_end_to_end(self, tmp_path):
        from pointcontrast_tpu.apps.pretrain import main

        out = str(tmp_path / "run")
        history = main([
            "data.dataset=SyntheticPairDataset", "data.num_pairs=2",
            "data.points_per_frame=400", "data.npad0=2048",
            "trainer.batch_size=1", "trainer.trainer=PointNCELossTrainer",
            "net.model=Res16UNet14A", "misc.npos=64", "opt.max_iter=2",
            "trainer.stat_freq=1", f"misc.out_dir={out}",
            "distributed.num_devices=1", "misc.num_workers=1",
        ])
        assert len(history) == 2
        assert all(np.isfinite(m["loss"]) for _, m in history)
        # snapshot + checkpoint + metrics written
        assert os.path.exists(os.path.join(out, "config.yaml"))
        assert os.path.exists(os.path.join(out, "weights", "weights.latest"))
        assert os.path.exists(os.path.join(out, "weights", "metrics.jsonl"))

        # resume: the config snapshot is authoritative (max_iter=2) and the
        # checkpoint restores step 2 -> nothing left to train, no errors
        history2 = main([
            "data.dataset=SyntheticPairDataset", f"misc.out_dir={out}",
            "opt.max_iter=99",  # ignored — the snapshot wins (reference
            # resumes the saved config the same way, ddp_train.py:44-51)
        ])
        assert history2 == []

    def test_signal_handlers_restored_after_main(self, tmp_path):
        """A finished run must not leave its preemption handlers installed:
        a later SIGTERM in the same host process (pytest, notebooks) would be
        silently swallowed and flip an unrelated trainer into the requeue
        path (observed once under an external SIGTERM mid-suite)."""
        import signal

        from pointcontrast_tpu.apps.pretrain import main

        before = (signal.getsignal(signal.SIGTERM),
                  signal.getsignal(signal.SIGUSR1))
        main([
            "data.dataset=SyntheticPairDataset", "data.num_pairs=2",
            "data.points_per_frame=400", "data.npad0=2048",
            "trainer.batch_size=1", "trainer.trainer=PointNCELossTrainer",
            "net.model=Res16UNet14A", "misc.npos=64", "opt.max_iter=1",
            "trainer.stat_freq=1", f"misc.out_dir={tmp_path / 'run'}",
            "distributed.num_devices=1", "misc.num_workers=1",
        ])
        after = (signal.getsignal(signal.SIGTERM),
                 signal.getsignal(signal.SIGUSR1))
        assert after == before


class TestVotenetApp:
    def test_cli_end_to_end_synthetic_sparseconv(self, tmp_path):
        """The votenet app runs from the shipped default config (chunked
        layout) with the synthetic dataset branch: one epoch + one full AP
        eval pass, no data on disk."""
        import numpy as np

        from pointcontrast_tpu.apps.votenet import main

        out = str(tmp_path / "run")
        trainer = main([
            "data.dataset=synthetic", "data.num_scenes=4",
            "data.num_points=1500", "data.batch_size=2", "data.npad0=8192",
            "data.voxel_size=0.05", "net.backbone=sparseconv",
            "net.num_proposal=32", "optimizer.max_epoch=1",
            "eval.eval_every=1", f"misc.out_dir={out}",
            "distributed.num_devices=1",
        ])
        assert trainer.epoch == 1
        assert os.path.exists(os.path.join(out, "weights", "weights.latest"))
