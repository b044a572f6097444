"""Preemption-safe training (the reference's submitit-requeue analog).

Covers: signal flag mechanics, trainer checkpoint-on-preempt, and the full
requeue round trip (preempt -> new trainer resumes at the saved iter).
"""
import os
import signal

import numpy as np
import pytest

from pointcontrast_tpu.data import PadScheme, PairLoader, SyntheticPairDataset
from pointcontrast_tpu.nn.res16unet import Res16UNetBase
from pointcontrast_tpu.nn.resnet_block import BasicBlock
from pointcontrast_tpu.train import PretrainConfig, PretrainTrainer
from pointcontrast_tpu.train.checkpoint import latest_checkpoint
from pointcontrast_tpu.utils import preemption


class TinyUNet(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
    INIT_DIM = 4


def make_loader():
    ds = SyntheticPairDataset(num_pairs=4, points_per_frame=500, seed=0)
    return PairLoader(ds, batch_size=1, scheme=PadScheme(npad0=2048),
                      mode="nce", npos=128, num_workers=1, seed=0)


def test_guard_signal_sets_flag():
    guard = preemption.PreemptionGuard(signals=(signal.SIGUSR1,))
    try:
        assert not guard.preempted
        assert signal.SIGUSR1 in guard.installed_signals
        os.kill(os.getpid(), signal.SIGUSR1)
        # the handler runs synchronously in the main thread on return from
        # the kill syscall
        assert guard.preempted
    finally:
        guard.uninstall()


def test_guard_trigger_and_uninstall():
    guard = preemption.PreemptionGuard(install=False)
    assert guard.installed_signals == ()
    guard.trigger()
    assert guard.preempted
    guard.uninstall()  # no-op, must not raise


def test_requeue_marker_roundtrip(tmp_path):
    p = preemption.write_requeue_marker(str(tmp_path), 42)
    assert os.path.exists(p)
    assert open(p).read().strip() == "42"
    preemption.clear_requeue_marker(str(tmp_path))
    assert not os.path.exists(p)
    preemption.clear_requeue_marker(str(tmp_path))  # idempotent


def test_run_with_requeue_script(tmp_path):
    """The wrapper restarts on the requeue code and passes through others."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "run_with_requeue.sh")
    marker = tmp_path / "ran_once"
    # exits 3 (requeue) on the first run, 0 after restart
    job = tmp_path / "job.sh"
    job.write_text(
        "#!/bin/bash\n"
        f"if [ ! -e {marker} ]; then touch {marker}; exit 3; fi\n"
        "exit 0\n"
    )
    job.chmod(0o755)
    r = subprocess.run(["bash", script, "bash", str(job)],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert "restarting" in r.stderr
    # non-requeue failures pass through untouched
    r2 = subprocess.run(["bash", script, "bash", "-c", "exit 7"],
                        capture_output=True, text=True, timeout=60)
    assert r2.returncode == 7


def test_trainer_preempt_checkpoint_and_resume(tmp_path):
    ckpt_dir = str(tmp_path / "weights")
    cfg = PretrainConfig(mode="nce", npos=128, max_iter=100, stat_freq=1,
                         save_freq=10**6, checkpoint_dir=ckpt_dir, lr=0.05)
    model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)

    guard = preemption.PreemptionGuard(install=False)
    loader = make_loader()
    trainer = PretrainTrainer(model, loader, cfg,
                              preemption_guard=guard)
    guard.trigger()  # preempt before the first step completes the loop
    with pytest.raises(preemption.Preempted) as exc:
        trainer.train(5)
    loader.close()
    step_at_preempt = exc.value.step
    assert step_at_preempt >= 1
    ckpt = latest_checkpoint(ckpt_dir)
    assert ckpt is not None and ckpt.endswith(f"checkpoint_{step_at_preempt}")

    # requeue: a fresh trainer must resume exactly at the saved iter
    loader2 = make_loader()
    trainer2 = PretrainTrainer(model, loader2, cfg)
    assert int(trainer2.state.step) == step_at_preempt
    history = trainer2.train(2)
    loader2.close()
    assert history[-1][0] == step_at_preempt + 2
    assert all(np.isfinite(m["loss"]) for _, m in history)
