"""Round-4 probe: fused im2col chunked conv on the VoteNet sparseconv
backbone (within-run; VERDICT r3 item 6).

Same workload as experiments/votenet_sparseconv_bench.py's chunked arm
(batch 4 x 40k points at 2.5 cm, npad0 196608, Res16UNet34C backbone +
voting/proposal), measured with the scan-form chunked conv (group 0) vs the
fused form per group in PC_TPU_PROBE_GROUPS.

Run: python experiments/fused_conv_votenet_probe.py   (real TPU)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 4
NUM_POINTS = 40000
NPAD0 = 196608
ITERS = 15
GROUPS = [
    int(g) for g in os.environ.get("PC_TPU_PROBE_GROUPS", "0,13").split(",")
]


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

    ds = SyntheticDetectionDataset(
        num_scenes=BATCH, num_objects=6, num_points=NUM_POINTS, seed=0
    )
    dc = ds.dc
    samples = [ds[i] for i in range(BATCH)]
    scheme = PadScheme.scannet(npad0=NPAD0)
    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        backbone="sparseconv",
    )
    batch = collate_detection(samples, voxel_size=0.025, scheme=scheme,
                              layout="chunked")

    results = {}
    for g in GROUPS:
        os.environ["PC_TPU_CONV_FUSED_GROUP"] = str(g)
        cfg = DetectConfig(checkpoint_dir="/tmp/votenet_fused_probe")
        trainer = DetectTrainer(model, dc, cfg, batch)
        t0 = time.perf_counter()
        for _ in range(3):
            trainer.state, m = trainer._step(trainer.state, batch)
        l0 = float(jax.device_get(m["loss"]))
        print(f"group {g}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss {l0:.3f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, m = trainer._step(trainer.state, batch)
        _ = float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / ITERS
        results[g] = BATCH / dt
        print(json.dumps({"probe": "fused_conv_votenet", "group": g,
                          "ms_per_step": round(dt * 1e3, 1),
                          "scenes_per_sec": round(BATCH / dt, 3)}),
              flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"probe": "fused_conv_votenet", "best_group": best,
                      "best": round(results[best], 3),
                      "scan_baseline": round(results.get(0, -1.0), 3)}),
          flush=True)


if __name__ == "__main__":
    main()
