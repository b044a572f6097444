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
  PC_TPU_BENCH_APP=pretrain|semseg|votenet|semseg_eval   what to bench
      (default pretrain — the headline).  semseg: Res16UNet34C 20-class
      finetune step, batch 6 x ~42.6k voxels at 2 cm (npad0 262144);
      votenet: sparseconv-backbone detection step, batch 4 x 40k points at
      2.5 cm (npad0 196608).  Per-GPU baselines: PERF.md "Baseline
      comparison" (semseg ~4.4 scenes/s/GPU scaled from the pretrain
      estimate; votenet the same row-count scaling, ~5.2).
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
APP = os.environ.get("PC_TPU_BENCH_APP", "pretrain")
# per-GPU reference estimates for the downstream apps (PERF.md "Baseline
# comparison": the 1.5 it/s/GPU pretrain estimate scaled by relative row
# count only — conservative, since it prices the reference's detection head
# at zero — semseg 2 cm runs 2.04x the pretrain rows -> 4.4 scenes/s/GPU;
# votenet's 2.5 cm backbone ~1.15x -> ~5.2 scenes/s/GPU)
REFERENCE_SEMSEG_SCENES_PER_SEC_PER_GPU_EST = 4.4
REFERENCE_VOTENET_SCENES_PER_SEC_PER_GPU_EST = 5.2
DTYPE = os.environ.get("PC_TPU_BENCH_DTYPE", "bfloat16")  # activations dtype
# Default bfloat16 since round 5 (mixed precision: params and norm
# statistics stay f32 either way) — measured +3.6% pretrain / +4.1% semseg /
# +3.0% votenet on the fused conv (PERF.md round 4), contract pinned by
# tests/test_mixed_precision.py.  PC_TPU_BENCH_DTYPE=float32 is the
# reference-exact parity mode.
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


def _semseg_state_and_batch():
    """Shared 2 cm semseg workload: Res16UNet34C train state + one batch of
    6 saturated-surface scenes (~257k voxels), chunked layout."""
    import jax

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.data.pair_dataset import SyntheticPairDataset
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.semseg.dataset import collate_semseg
    from pointcontrast_tpu.semseg.train import SemsegConfig, make_semseg_train_step
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.state import create_train_state

    batch_scenes, npad0 = 6, 262144
    rng = np.random.RandomState(0)
    ds = SyntheticPairDataset(
        num_pairs=batch_scenes, points_per_frame=90000, room_size=2.4,
        voxel_size=0.02, seed=0,
    )
    samples = []
    for i in range(batch_scenes):
        c = np.asarray(ds[i][0], np.int32)
        samples.append((
            c,
            rng.randint(0, 255, (len(c), 3)).astype(np.float32),
            rng.randint(0, 20, len(c)).astype(np.int32),
        ))
    batch = collate_semseg(
        samples, PadScheme.scannet(npad0=npad0), ignore_label=255,
        shift_coords=False, rng=np.random.RandomState(1), layout=LAYOUT,
        num_chunks=batch_scenes if LAYOUT == "chunked" else None,
    )
    import jax.numpy as jnp

    config = SemsegConfig(lr=0.1, max_iter=1000)
    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=20, dtype=jnp.dtype(DTYPE)
    )
    tx = optim.make_optimizer(
        config.optimizer, config.lr,
        optim.make_scheduler(config.scheduler, config), config,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batch.feats, batch.pyramid)
    )
    return state, jax.device_put(batch), batch_scenes


def measure_semseg() -> float:
    """scenes/sec of the 2 cm semseg finetune step (chunked layout)."""
    import time

    import jax

    from pointcontrast_tpu.semseg.train import SemsegConfig, make_semseg_train_step

    state, batch, batch_scenes = _semseg_state_and_batch()
    config = SemsegConfig(lr=0.1, max_iter=1000)
    step = jax.jit(make_semseg_train_step(config))
    for _ in range(WARMUP):
        state, m = step(state, batch)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, batch)
    float(jax.device_get(m["loss"]))
    return batch_scenes * ITERS / (time.perf_counter() - t0)


def measure_semseg_eval() -> float:
    """scenes/sec of semseg INFERENCE (the serving path): eval-mode forward
    + on-device argmax/probs, the exact program ``evaluate_dataset`` jits
    (semseg/train.py::make_eval_step), on the same 2 cm batch the train
    bench uses.  Baseline: the reference's eval iteration is the train step
    minus backward+optimizer (~1/3 of the step at the usual fwd:bwd ratio),
    i.e. ~3x its train rate => 3 x 4.4 = 13.2 scenes/s/GPU estimate."""
    import time

    import jax

    from pointcontrast_tpu.semseg.train import make_eval_step

    state, batch, batch_scenes = _semseg_state_and_batch()
    eval_step = jax.jit(make_eval_step())
    for _ in range(WARMUP):
        pred, _prob = eval_step(state, batch)
    float(jax.device_get(pred[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        pred, _prob = eval_step(state, batch)
    float(jax.device_get(pred[0]))
    return batch_scenes * ITERS / (time.perf_counter() - t0)


def measure_votenet() -> float:
    """scenes/sec of the sparseconv-backbone VoteNet train step.

    VoteNet is the noisiest app cross-session (PERF.md round 4: 7.3-8.1
    scenes/s across sessions), so this reports the MEDIAN of ≥3 within-run
    reps and prints the per-rep rates to stderr so the spread is on record
    (VERDICT r4 item 4)."""
    import sys
    import time

    import jax

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.detect.datasets import (
        SyntheticDetectionDataset,
        collate_detection,
    )
    from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
    from pointcontrast_tpu.detect.votenet import VoteNet

    batch_scenes, npad0 = 4, 196608
    ds = SyntheticDetectionDataset(
        num_scenes=batch_scenes, num_objects=6, num_points=40000, seed=0
    )
    dc = ds.dc
    import jax.numpy as jnp

    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        backbone="sparseconv", dtype=jnp.dtype(DTYPE),
    )
    layout = LAYOUT
    if layout == "brick":
        layout = "voxel"
        print("bench: votenet has no brick collation — benching the voxel "
              "layout instead of the requested brick", file=sys.stderr)
    batch = collate_detection(
        [ds[i] for i in range(batch_scenes)], voxel_size=0.025,
        scheme=PadScheme.scannet(npad0=npad0),
        layout=layout,
    )
    trainer = DetectTrainer(
        model, dc, DetectConfig(checkpoint_dir="/tmp/votenet_bench"), batch
    )
    for _ in range(WARMUP):
        trainer.state, m = trainer._step(trainer.state, batch)
    float(jax.device_get(m["loss"]))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, m = trainer._step(trainer.state, batch)
        float(jax.device_get(m["loss"]))
        rates.append(batch_scenes * ITERS / (time.perf_counter() - t0))
    print(f"bench: votenet reps {[round(r, 2) for r in rates]} scenes/s "
          f"(median reported)", file=sys.stderr)
    return sorted(rates)[1]


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if APP == "semseg":
        v = measure_semseg()
        print(json.dumps({
            "metric": "semseg_scenes_per_sec_per_chip",
            "value": round(v, 3), "unit": "scenes/s",
            "vs_baseline": round(
                v / REFERENCE_SEMSEG_SCENES_PER_SEC_PER_GPU_EST, 3),
        }))
        return
    if APP == "semseg_eval":
        v = measure_semseg_eval()
        print(json.dumps({
            "metric": "semseg_eval_scenes_per_sec_per_chip",
            "value": round(v, 3), "unit": "scenes/s",
            "vs_baseline": round(
                v / (3.0 * REFERENCE_SEMSEG_SCENES_PER_SEC_PER_GPU_EST), 3),
        }))
        return
    if APP == "votenet":
        v = measure_votenet()
        print(json.dumps({
            "metric": "votenet_scenes_per_sec_per_chip",
            "value": round(v, 3), "unit": "scenes/s",
            "vs_baseline": round(
                v / REFERENCE_VOTENET_SCENES_PER_SEC_PER_GPU_EST, 3),
        }))
        return

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
