"""Round-4 probe: two-level pipelining — what H2D double-buffering buys
(PERF.md "What would beat the floor" item 3; VERDICT r3 item 2).

Within one run, with pre-collated batches (host collation excluded so the
measurement isolates transfer/compute overlap):

  a. pure device step rate (batches resident — the bench.py figure);
  b. H2D transfer time per batch alone (device_put + materialize);
  c. serial loop: device_put -> step -> sync each iteration (no overlap);
  d. prefetched loop: device_prefetch(size=2) over the same batches —
     the trainer's shipped structure (train/pretrain.py:198);
  e. donate audit: step WITHOUT donate_argnums for comparison (donation
     avoids a state-sized device copy per step).

The axon tunnel moves ~20 MB/s, so in THIS harness H2D >> step and overlap
can hide at most step/H2D of the transfer; on a real host (PCIe ~16 GB/s,
~1.5 ms/batch) the same structure hides H2D entirely.  The probe prints all
five numbers so the conclusion is measured, not asserted.

Run: python experiments/pipeline_probe.py   (real TPU)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH_PAIRS = 4
ITERS = 10


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data import (
        PadScheme, SyntheticPairDataset, collate_pair,
    )
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, make_train_step, optim
    from pointcontrast_tpu.train.state import create_train_state
    from pointcontrast_tpu.utils.prefetch import device_prefetch

    ds = SyntheticPairDataset(
        num_pairs=BATCH_PAIRS * 2, points_per_frame=45000, room_size=1.75,
        seed=0,
    )
    scheme = PadScheme.scannet(npad0=BATCH_PAIRS * 32768)
    rng = np.random.RandomState(0)
    host_batches = [
        collate_pair(
            [ds[(b * BATCH_PAIRS + i) % len(ds)] for i in range(BATCH_PAIRS)],
            scheme, mode="nce", npos=4096, rng=rng, fuse_frames=True,
            layout="chunked",
        )
        for b in range(3)
    ]
    nbytes = sum(
        x.nbytes for x in jax.tree.leaves(host_batches[0])
        if hasattr(x, "nbytes")
    )
    print(f"batch payload: {nbytes / 1e6:.1f} MB", flush=True)

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True,
    )
    config = PretrainConfig(mode="nce", npos=4096, lr=0.1)
    tx = optim.make_optimizer(
        "sgd", config.lr,
        optim.exp_lr(config.exp_gamma, config.lr_update_freq), config,
    )

    def fresh_state():
        return create_train_state(
            jax.random.PRNGKey(0), model, tx,
            (host_batches[0].feats0, host_batches[0].pyramid0),
        )

    step_fn = make_train_step(config)
    step_d = jax.jit(lambda s, b: step_fn(s, b, axis_name=None),
                     donate_argnums=0)
    step_nd = jax.jit(lambda s, b: step_fn(s, b, axis_name=None))

    out = {}

    # a. device-resident step rate (donating)
    dev = [jax.device_put(b) for b in host_batches]
    state = fresh_state()
    for i in range(3):
        state, m = step_d(state, dev[i % 3])
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step_d(state, dev[i % 3])
    float(jax.device_get(m["loss"]))
    out["device_step_s"] = (time.perf_counter() - t0) / ITERS

    # e. donate audit: same loop without donation
    cell = fresh_state()
    for i in range(3):
        cell, m = step_nd(cell, dev[i % 3])
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        cell, m = step_nd(cell, dev[i % 3])
    float(jax.device_get(m["loss"]))
    out["device_step_nodonate_s"] = (time.perf_counter() - t0) / ITERS
    del cell, dev

    # b. H2D alone (materialize a leaf each round to bound the transfers)
    t0 = time.perf_counter()
    for i in range(ITERS):
        d = jax.device_put(host_batches[i % 3])
        float(jax.device_get(d.pair_valid[0]))
        del d
    out["h2d_s"] = (time.perf_counter() - t0) / ITERS

    # c. serial loop: put -> step, no overlap
    state = fresh_state()
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step_d(state, jax.device_put(host_batches[i % 3]))
        float(jax.device_get(m["loss"]))
    out["serial_loop_s"] = (time.perf_counter() - t0) / ITERS

    # d. prefetched loop (size 2): the trainer's structure
    def host_iter():
        i = 0
        while True:
            yield host_batches[i % 3]
            i += 1

    feed = device_prefetch(host_iter(), size=2)
    state = fresh_state()
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step_d(state, next(feed))
    float(jax.device_get(m["loss"]))
    out["prefetch_loop_s"] = (time.perf_counter() - t0) / ITERS

    out = {k: round(v, 4) for k, v in out.items()}
    out["probe"] = "pipeline"
    out["overlap_hidden_s"] = round(
        out["serial_loop_s"] - out["prefetch_loop_s"], 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
