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
