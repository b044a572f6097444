"""Round-5: bounds-select elimination measured on the SEMSEG step (task 5).

Same within-run design as experiments/gather_mode_probe.py (alternating
arms, each arm lowered+compiled under its own PC_TPU_GATHER_MODE, losses
must match bit-exactly) but on the 2 cm semseg finetune step — the exact
workload `PC_TPU_BENCH_APP=semseg python bench.py` measures (6 scenes,
~257k voxels, Res16UNet34C, 20-class CE).

Run on the TPU: python experiments/gather_mode_semseg_probe.py
Honors PC_TPU_BENCH_DTYPE like bench.py (default bfloat16).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WARM = 3
N_REPS = 3
N_STEPS = 10


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench
    from pointcontrast_tpu.semseg.train import (
        SemsegConfig,
        make_semseg_train_step,
    )

    state, batch, batch_scenes = bench._semseg_state_and_batch()
    config = SemsegConfig(lr=0.1, max_iter=1000)

    def compile_step(mode: str):
        os.environ["PC_TPU_GATHER_MODE"] = mode
        try:
            return jax.jit(
                make_semseg_train_step(config)
            ).lower(state, batch).compile()
        finally:
            os.environ.pop("PC_TPU_GATHER_MODE", None)

    steps = {m: compile_step(m) for m in ("fill", "promise_in_bounds")}

    losses = {}
    for m, step in steps.items():
        s = state
        for _ in range(N_WARM):
            s, metrics = step(s, batch)
        losses[m] = float(jax.device_get(metrics["loss"]))
    print(json.dumps({"probe": "gather_mode_semseg", "warm_losses": losses}),
          flush=True)

    results = {m: [] for m in steps}
    for _ in range(N_REPS):
        for m, step in steps.items():
            s = state
            t0 = time.perf_counter()
            for _ in range(N_STEPS):
                s, metrics = step(s, batch)
            float(jax.device_get(metrics["loss"]))
            dt = (time.perf_counter() - t0) / N_STEPS
            results[m].append(dt)
    out = {"probe": "gather_mode_semseg", "dtype": bench.DTYPE}
    for m, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        out[m] = {
            "ms_per_step": round(med * 1e3, 1),
            "scenes_per_sec": round(batch_scenes / med, 2),
            "reps_ms": [round(t * 1e3, 1) for t in ts],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
