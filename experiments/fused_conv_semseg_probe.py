"""Round-4 probe: fused im2col chunked conv at SEMSEG scale (within-run).

Same workload as experiments/semseg_step_bench.py's chunked arm (Res16UNet34C,
20 classes, batch 6 x ~42.6k voxels at 2 cm, npad0 262144), measured with the
scan-form chunked conv (group 0) vs the fused im2col form for each group size
in PC_TPU_PROBE_GROUPS.  The fused col temp is [S, G*C] per chunk
(S=43690, C<=96), so this also validates the memory envelope at the largest
shipped scale before flipping the default.

Run: python experiments/fused_conv_semseg_probe.py   (real TPU)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 6
NPAD0 = 262144
ITERS = 12
WARMUP = 2
GROUPS = [
    int(g) for g in os.environ.get("PC_TPU_PROBE_GROUPS", "0,13").split(",")
]


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.data.pair_dataset import SyntheticPairDataset
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.semseg.dataset import collate_semseg
    from pointcontrast_tpu.semseg.train import (
        SemsegConfig,
        make_semseg_train_step,
    )
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.state import create_train_state

    rng = np.random.RandomState(0)
    ds = SyntheticPairDataset(
        num_pairs=BATCH, points_per_frame=90000, room_size=2.4,
        voxel_size=0.02, seed=0,
    )
    samples = []
    for i in range(BATCH):
        c = np.asarray(ds[i][0], np.int32)
        f = rng.randint(0, 255, (len(c), 3)).astype(np.float32)
        l = rng.randint(0, 20, len(c)).astype(np.int32)
        samples.append((c, f, l))

    scheme = PadScheme.scannet(npad0=NPAD0)
    config = SemsegConfig(lr=0.1, max_iter=1000)
    model = load_model("Res16UNet34C")(in_channels=3, out_channels=20)
    batch = collate_semseg(
        samples, scheme, ignore_label=255, shift_coords=False,
        rng=np.random.RandomState(1), layout="chunked", num_chunks=BATCH,
    )

    results = {}
    for g in GROUPS:
        os.environ["PC_TPU_CONV_FUSED_GROUP"] = str(g)
        schedule = optim.make_scheduler(config.scheduler, config)
        tx = optim.make_optimizer(config.optimizer, config.lr, schedule,
                                  config)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, (batch.feats, batch.pyramid)
        )
        step = jax.jit(make_semseg_train_step(config))
        dev_batch = jax.device_put(batch)
        t0 = time.perf_counter()
        for _ in range(WARMUP):
            state, m = step(state, dev_batch)
        l0 = float(jax.device_get(m["loss"]))
        print(f"group {g}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss {l0:.4f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, dev_batch)
        _ = float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / ITERS
        results[g] = BATCH / dt
        print(json.dumps({"probe": "fused_conv_semseg", "group": g,
                          "ms_per_step": round(dt * 1e3, 1),
                          "scenes_per_sec": round(BATCH / dt, 3)}),
              flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"probe": "fused_conv_semseg", "best_group": best,
                      "best": round(results[best], 3),
                      "scan_baseline": round(results.get(0, -1.0), 3)}),
          flush=True)


if __name__ == "__main__":
    main()
