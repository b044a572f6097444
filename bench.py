"""Pretraining throughput benchmark (driver-run, real TPU).

Measures pairs/sec for the flagship config: Res16UNet34C, PointInfoNCE loss,
per-chip batch of 4 frame pairs at ScanNet-like voxel counts (the reference's
per-GPU batch, scripts/ddp_local.sh:20 + defaults.yaml batch_size=4), full
training step (fused fwd + loss + bwd + SGD).

Workload realism: frames are saturated surface scans (~15.5k voxels each at
2.5 cm, every surface voxel in view occupied) — the statistics of real
depth-frame unprojections.  Round 1 benched diffuse sub-voxel-density point
sprays, which inflate the coarse pyramid levels ~2-3x (level-1 ratio 0.62 vs
the real ~0.26) and understate throughput; level-0 size is unchanged
(~126k fused voxels vs 131072 pad).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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

BATCH_PAIRS = 4
POINTS_PER_FRAME = 45000  # saturates the visible surfaces at 2.5 cm
ROOM_SIZE = 1.75  # ~15.5k voxels/frame, the reference's assumed frame size
NPAD0 = 131072  # both frames fused into one sparse batch (8 frames)
LAYOUT = os.environ.get("PC_TPU_BENCH_LAYOUT", "voxel")
WARMUP = 3
ITERS = 20


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

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
    batches = [
        collate_pair(
            [ds[(b * BATCH_PAIRS + i) % len(ds)] for i in range(BATCH_PAIRS)],
            scheme, mode="nce", npos=4096, rng=rng, fuse_frames=True,
            layout=LAYOUT,
        )
        for b in range(2)
    ]

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True
    )
    config = PretrainConfig(mode="nce", npos=4096, lr=0.1)
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

    pairs_per_sec = BATCH_PAIRS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "pretrain_pairs_per_sec_per_chip",
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
