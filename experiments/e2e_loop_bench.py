"""In-harness end-to-end pretraining loop (loader + H2D + step).

Measures PretrainTrainer through PairLoader at the bench recipe — the
number that includes host collation and the axon tunnel's ~20 MB/s H2D
(PERF.md "End-to-end loop in THIS harness").  Sweeps loader worker counts
to document how many are needed to keep a 0.32 s step fed.

Run:  python experiments/e2e_loop_bench.py [workers ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
ITERS = 24


def measure(num_workers: int) -> float:
    import jax

    from pointcontrast_tpu.data import PadScheme, PairLoader, SyntheticPairDataset
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, PretrainTrainer

    ds = SyntheticPairDataset(
        num_pairs=24, points_per_frame=45000, room_size=1.75, seed=0,
    )
    scheme = PadScheme.scannet(npad0=131072)
    import os

    loader = PairLoader(
        ds, batch_size=BATCH, scheme=scheme, mode="nce", npos=4096,
        num_workers=num_workers, seed=0, fuse_frames=True,
        layout=os.environ.get("PC_TPU_BENCH_LAYOUT", "chunked"),
    )
    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True
    )
    cfg = PretrainConfig(
        mode="nce", npos=4096, lr=0.1, stat_freq=1000, save_freq=10**9,
        checkpoint_dir="/tmp/e2e_loop_bench", max_iter=10**9,
    )
    trainer = PretrainTrainer(model, loader, cfg)
    trainer.train(4)  # warm compile + pipeline
    t0 = time.perf_counter()
    trainer.train(ITERS)
    dt = time.perf_counter() - t0
    loader.close()
    return BATCH * ITERS / dt


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    workers = [int(w) for w in sys.argv[1:]] or [2, 4]
    for w in workers:
        pps = measure(w)
        print(f"workers={w}: {pps:.2f} pairs/s end-to-end", flush=True)


if __name__ == "__main__":
    main()
