"""VoteNet sparseconv-backbone train step: voxel vs chunked layout.

PERF.md round-2 row: batch 4 x 40k points at 2.5 cm (<= ~160k voxels),
npad0 196608, Res16UNet34C backbone — 567 ms = 7.06 scenes/s/chip in the
flat voxel layout.  The chunked layout won 1.6x on the 262k-row semseg
step (experiments/semseg_step_bench.py); this measures the same lever on
the ~150k-row detection backbone, within one run.

Run on the real chip:  python experiments/votenet_sparseconv_bench.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
NUM_POINTS = 40000
NPAD0 = 196608
ITERS = 15


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.detect.datasets import (
        SyntheticDetectionDataset,
        collate_detection,
    )
    from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
    from pointcontrast_tpu.detect.votenet import VoteNet

    print("devices:", jax.devices(), flush=True)
    ds = SyntheticDetectionDataset(
        num_scenes=BATCH, num_objects=6, num_points=NUM_POINTS, seed=0
    )
    dc = ds.dc
    samples = [ds[i] for i in range(BATCH)]  # __getitem__ is stochastic
    scheme = PadScheme.scannet(npad0=NPAD0)
    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        backbone="sparseconv",
    )

    results = {}
    for layout in ("voxel", "chunked"):
        batch = collate_detection(samples, voxel_size=0.025, scheme=scheme,
                                  layout=layout)
        print(layout, "voxel rows:", batch.voxel_feats.shape[0],
              "live:", int((np.asarray(batch.voxel_feats) == 1)
                           .all(axis=1).sum()), flush=True)
        cfg = DetectConfig(checkpoint_dir="/tmp/votenet_sc_bench")
        trainer = DetectTrainer(model, dc, cfg, batch)
        t0 = time.perf_counter()
        for _ in range(3):
            trainer.state, m = trainer._step(trainer.state, batch)
        l0 = float(jax.device_get(m["loss"]))
        print(f"{layout}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss {l0:.3f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, m = trainer._step(trainer.state, batch)
        _ = float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / ITERS
        results[layout] = dt
        print(f"{layout}: {dt * 1e3:.0f} ms/step = "
              f"{BATCH / dt:.2f} scenes/s/chip", flush=True)

    print(f"chunked/voxel = {results['chunked'] / results['voxel']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
