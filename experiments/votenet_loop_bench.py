"""VoteNet end-to-end epoch loop vs bare step (VERDICT round-2 item 4).

Round 2 measured 7.12 scenes/s for the bare pointnet2 train step; the epoch
loop then synced the device every iteration (float(metrics["loss"])),
serializing dispatch.  Round 3 accumulates losses on device and syncs once
per epoch — this measures the loop's scenes/s against the bare step.

Run on the real chip:  python experiments/votenet_loop_bench.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
NUM_POINTS = 40000
STEPS = 20


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.apps.votenet import _BatchLoader
    from pointcontrast_tpu.detect.datasets import SyntheticDetectionDataset
    from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
    from pointcontrast_tpu.detect.votenet import VoteNet

    ds = SyntheticDetectionDataset(
        num_scenes=8, num_objects=6, num_points=NUM_POINTS, seed=0
    )
    dc = ds.dc
    loader = _BatchLoader(ds, batch_size=BATCH, seed=0)
    it = loader  # _BatchLoader implements __next__ directly
    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
    )
    cfg = DetectConfig(checkpoint_dir="/tmp/votenet_loop_bench")
    trainer = DetectTrainer(model, dc, cfg, next(it))

    # pre-collate fixed batches so the loop measures step+dispatch, and
    # warm the compile
    batches = [next(it) for _ in range(2)]

    class _Replay:
        def __init__(self, batches):
            self.batches, self.i = batches, 0

        def __next__(self):
            b = self.batches[self.i % len(self.batches)]
            self.i += 1
            return b

    for _ in range(3):
        trainer.state, m = trainer._step(trainer.state, batches[0])
    float(jax.device_get(m["loss"]))

    # bare step
    t0 = time.perf_counter()
    for i in range(STEPS):
        trainer.state, m = trainer._step(trainer.state, batches[i % 2])
    float(jax.device_get(m["loss"]))
    dt_step = (time.perf_counter() - t0) / STEPS

    # epoch loop (device-accumulated losses, one sync at epoch end).
    # First epoch pays the one-time BN-momentum step rebuild (cache
    # deserialize) — warm it, then measure a steady-state epoch.
    trainer.train_epoch(_Replay(batches), num_batches=2)
    t0 = time.perf_counter()
    trainer.train_epoch(_Replay(batches), num_batches=STEPS)
    dt_loop = (time.perf_counter() - t0) / STEPS

    print(f"bare step: {dt_step*1e3:.1f} ms = {BATCH/dt_step:.2f} scenes/s")
    print(f"epoch loop: {dt_loop*1e3:.1f} ms = {BATCH/dt_loop:.2f} scenes/s")
    print(f"loop overhead: {(dt_loop/dt_step - 1)*100:.1f}%")


if __name__ == "__main__":
    main()
