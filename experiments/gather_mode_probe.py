"""Round-5: bounds-select elimination on the hot gathers, measured in-step.

The round-5 HLO trace (experiments/step_trace_profile.py) attributed
~29 ms of reshapes + ~11 ms of copies + part of 43 ms of loop fusions in
the 226 ms device step to jnp.take's default 'fill' mode: every fused
im2col gather is followed by a broadcast_select fusion (out-of-bounds
select against 0) over the full [S*G, Cin] block and a tiled-layout
reshape — two extra HBM passes per gather.  Map indices are in-bounds by
construction (pad-row invariant), so `sparse/ops._take_rows` now defaults
to mode='promise_in_bounds'.

This probe measures the REAL pretrain bench step within-run under
PC_TPU_GATHER_MODE=fill vs promise_in_bounds (the switch is read at trace
time; each arm is lowered+compiled under its own env), alternating arms.

Run on the TPU: python experiments/gather_mode_probe.py
Honors PC_TPU_BENCH_DTYPE / PC_TPU_CONV_FUSED_GROUP like bench.py.
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
    import jax.numpy as jnp
    import numpy as np

    import bench
    from pointcontrast_tpu.data import (
        PadScheme,
        SyntheticPairDataset,
        collate_pair,
    )
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, optim
    from pointcontrast_tpu.train.pretrain import make_train_step
    from pointcontrast_tpu.train.state import create_train_state

    ds = SyntheticPairDataset(
        num_pairs=bench.BATCH_PAIRS * 2,
        points_per_frame=bench.POINTS_PER_FRAME,
        room_size=bench.ROOM_SIZE, seed=0,
    )
    scheme = PadScheme.scannet(npad0=bench.NPAD0)
    batch = collate_pair(
        [ds[i] for i in range(bench.BATCH_PAIRS)], scheme, mode="nce",
        npos=4096, rng=np.random.RandomState(0), fuse_frames=True,
        layout=bench.LAYOUT,
    )
    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True,
        dtype=jnp.dtype(bench.DTYPE),
    )
    config = PretrainConfig(mode="nce", npos=4096)
    schedule = optim.exp_lr(config.exp_gamma, config.lr_update_freq)
    tx = optim.make_optimizer("sgd", config.lr, schedule, config)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0)
    )

    def compile_step(mode: str, col: str):
        os.environ["PC_TPU_GATHER_MODE"] = mode
        os.environ["PC_TPU_CONV_COL"] = col
        try:
            return jax.jit(
                lambda s, b: make_train_step(config)(s, b, axis_name=None)
            ).lower(state, batch).compile()
        finally:
            os.environ.pop("PC_TPU_GATHER_MODE", None)
            os.environ.pop("PC_TPU_CONV_COL", None)

    arms = [
        ("fill", "reshape"),
        ("promise_in_bounds", "reshape"),
        ("promise_in_bounds", "dotg"),
    ]
    steps = {f"{m}+{c}": compile_step(m, c) for m, c in arms}

    # warm + loss-equality check (values must be IDENTICAL: the select only
    # ever touched rows whose product terms are zero)
    losses = {}
    for m, step in steps.items():
        s = state
        for _ in range(N_WARM):
            s, metrics = step(s, batch)
        losses[m] = float(jax.device_get(metrics["loss"]))
    print(json.dumps({"probe": "gather_mode", "warm_losses": losses}),
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
    out = {"probe": "gather_mode", "dtype": bench.DTYPE}
    for m, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        out[m] = {
            "ms_per_step": round(med * 1e3, 1),
            "pairs_per_sec": round(bench.BATCH_PAIRS / med, 2),
            "reps_ms": [round(t * 1e3, 1) for t in ts],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
