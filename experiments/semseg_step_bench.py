"""Semseg train-step bench at the shipped 2 cm recipe: voxel vs chunked.

Workload matches PERF.md's semseg row: Res16UNet34C, 20 classes, batch 6
saturated-surface scenes x ~42.6k voxels (2 cm) ~= 256k rows, npad0 262144,
full fused fwd+CE+bwd+SGD step.  Scenes are SyntheticPairDataset frames
(the saturated-surface generator the pretrain bench uses) with random
labels — labels don't affect step time.

The chunked layout (sparse/chunk.py) slices rows per sample and gathers
from [S, C] sub-tables; round-3 probes (experiments/chunked_conv_probe.py)
measured the conv stack 1.6-2.6x faster at this operand scale because
XLA's row-gather cost grows with table size.  This script measures the
REAL train step in both layouts within one run (cross-session microbench
noise is large; only within-run comparisons are valid — PERF.md).

Usage: python experiments/semseg_step_bench.py   (real TPU; first run
compiles both programs remotely, ~10 min each for new shapes).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = 6
NPAD0 = 262144
ITERS = 12
WARMUP = 2


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.data.pair_dataset import SyntheticPairDataset
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.semseg.dataset import SemsegBatch, collate_semseg
    from pointcontrast_tpu.semseg.train import (
        SemsegConfig,
        make_semseg_train_step,
    )
    from pointcontrast_tpu.train.state import create_train_state
    from pointcontrast_tpu.train import optim

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    ds = SyntheticPairDataset(
        num_pairs=BATCH, points_per_frame=90000, room_size=2.4,
        voxel_size=0.02, seed=0,
    )
    # (coords voxel, feats, labels) samples for collate_semseg
    samples = []
    for i in range(BATCH):
        c = np.asarray(ds[i][0], np.int32)
        f = rng.randint(0, 255, (len(c), 3)).astype(np.float32)
        l = rng.randint(0, 20, len(c)).astype(np.int32)
        samples.append((c, f, l))
    print("voxels/scene:", [len(s[0]) for s in samples], flush=True)

    scheme = PadScheme.scannet(npad0=NPAD0)
    config = SemsegConfig(lr=0.1, max_iter=1000)
    model = load_model("Res16UNet34C")(in_channels=3, out_channels=20)

    results = {}
    for layout in ("voxel", "chunked"):
        batch = collate_semseg(
            samples, scheme, ignore_label=255, shift_coords=False,
            rng=np.random.RandomState(1), layout=layout,
            num_chunks=BATCH if layout == "chunked" else None,
        )
        print(layout, "rows:", batch.feats.shape[0],
              "truncated:", float(np.asarray(batch.truncated_voxels)),
              flush=True)
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
        print(f"{layout}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss {l0:.4f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, dev_batch)
        _ = float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / ITERS
        results[layout] = dt
        print(f"{layout}: {dt * 1e3:.0f} ms/step = "
              f"{BATCH / dt:.2f} scenes/s/chip", flush=True)

    print(f"chunked/voxel = {results['chunked'] / results['voxel']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
