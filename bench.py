"""Pretraining throughput benchmark (driver-run, real TPU).

Measures pairs/sec for the flagship config: Res16UNet34C, PointInfoNCE loss,
full training step (fused fwd + loss + bwd + SGD), at a per-chip batch of
``PC_TPU_BENCH_BATCH`` frame pairs (default 4 — the reference's per-GPU
batch, scripts/ddp_local.sh:20 + defaults.yaml batch_size=4) at ScanNet-like
voxel counts.

Workload realism: frames are saturated surface scans (~15.5k voxels each at
2.5 cm, every surface voxel in view occupied) — the statistics of real
depth-frame unprojections (see PERF.md "Workload realism").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs:
  PC_TPU_BENCH_MODE=nce|hardest|both   loss mode(s) to measure ("both"
      prints the headline NCE line first, then a hardest line)
  PC_TPU_BENCH_BATCH=N                 pairs per step (npad0 scales with it)
  PC_TPU_BENCH_LAYOUT=chunked|voxel|brick   sparse row layout.  Default
      chunked (sparse/chunk.py): per-frame slices with frame-local maps,
      measured 14.3 vs 12.4 pairs/s flat in round 3 — gathers read [16k, C]
      sub-tables instead of the [131k, C] batch table.  brick is parked.

vs_baseline: the reference publishes no pairs/sec (BASELINE.md); the divisor
is a documented estimate of the 8x-V100 reference throughput *per GPU*,
derived in PERF.md ("Baseline comparison"): MinkowskiEngine-era Res16UNet34C
pretraining runs ~1.5 iter/s per V100 at batch 4 (two ~15k-voxel frames per
pair) => ~6 pairs/s/GPU.  vs_baseline = (our pairs/sec/chip) / 6.0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC_PER_GPU_EST = 6.0

BATCH_PAIRS = int(os.environ.get("PC_TPU_BENCH_BATCH", "4"))
POINTS_PER_FRAME = 45000  # saturates the visible surfaces at 2.5 cm
ROOM_SIZE = 1.75  # ~15.5k voxels/frame, the reference's assumed frame size
NPAD0 = BATCH_PAIRS * 32768  # both frames fused into one sparse batch
LAYOUT = os.environ.get("PC_TPU_BENCH_LAYOUT", "chunked")
MODE = os.environ.get("PC_TPU_BENCH_MODE", "nce")
DTYPE = os.environ.get("PC_TPU_BENCH_DTYPE", "float32")  # activations dtype
# (params and norm statistics stay f32 either way; bf16 keeps the level-0
# gather table inside the ~8-16 MB fast-gather footprint, see PERF.md)
WARMUP = 3
ITERS = 20


def measure(mode: str) -> float:
    """pairs/sec of the full train step in the given loss mode."""
    import jax

    from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, make_train_step
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.state import create_train_state

    ds = SyntheticPairDataset(
        num_pairs=BATCH_PAIRS * 2, points_per_frame=POINTS_PER_FRAME,
        room_size=ROOM_SIZE, seed=0,
    )
    scheme = PadScheme.scannet(npad0=NPAD0)
    rng = np.random.RandomState(0)
    collate_kw = dict(npos=4096, rng=rng, fuse_frames=True, layout=LAYOUT)
    if mode == "hardest":
        collate_kw.update(num_pos=4096, num_hn=1024)
    batches = [
        collate_pair(
            [ds[(b * BATCH_PAIRS + i) % len(ds)] for i in range(BATCH_PAIRS)],
            scheme, mode=mode, **collate_kw,
        )
        for b in range(2)
    ]

    import jax.numpy as jnp

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True,
        dtype=jnp.dtype(DTYPE),
    )
    config = PretrainConfig(mode=mode, npos=4096, lr=0.1)
    schedule = optim.exp_lr(config.exp_gamma, config.lr_update_freq)
    tx = optim.make_optimizer("sgd", config.lr, schedule, config)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batches[0].feats0, batches[0].pyramid0)
    )

    step_fn = make_train_step(config)
    step = jax.jit(lambda s, b: step_fn(s, b, axis_name=None), donate_argnums=0)

    batches = [jax.device_put(b) for b in batches]
    for i in range(WARMUP):
        state, metrics = step(state, batches[i % len(batches)])
    float(jax.device_get(metrics["loss"]))  # hard sync (block_until_ready is
    # unreliable on the experimental axon platform — it can return before
    # execution finishes; a device_get cannot)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batches[i % len(batches)])
    float(jax.device_get(metrics["loss"]))  # steps chain through state, so
    # materializing the last loss bounds all ITERS executions
    dt = time.perf_counter() - t0
    return BATCH_PAIRS * ITERS / dt


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    modes = ["nce", "hardest"] if MODE == "both" else [MODE]
    for mode in modes:
        pairs_per_sec = measure(mode)
        name = (
            "pretrain_pairs_per_sec_per_chip" if mode == "nce"
            else "pretrain_hardest_pairs_per_sec_per_chip"
        )
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(pairs_per_sec, 3),
                    "unit": "pairs/s",
                    "vs_baseline": round(
                        pairs_per_sec / REFERENCE_PAIRS_PER_SEC_PER_GPU_EST, 3
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
