"""Round-5 probe: joint (sub-table size S, gather group G) sweep at the
FUSED im2col conv shapes.

VERDICT r4 weak item 6: the round-3 sub-table sweep (16k/8k/4k flat at
3.45 ns/row; "sub-frame chunking buys nothing") measured the SCAN form; the
fused conv changed the gather shape entirely (s-major [S, G*Cin] col blocks)
and the (S, G) space has only been swept along the G axis at fixed S=16k.
This sweeps both jointly on the real op (``ops._conv_chunk_fused``) with a
chained 4-deep conv stack, fwd + the real custom-VJP backward, at the
pretrain level-0 scale (131k rows, C=32, K=27).

If a smaller S wins, sub-frame chunking (splitting each frame's rows over
multiple chunks in the collator) becomes worth building; if flat, the
per-frame 16k chunk stays the floor and the negative result is recorded.

Run on the TPU:  python experiments/fused_shape_sweep.py
Env: PC_TPU_SWEEP_N (total rows, default 131072), PC_TPU_SWEEP_C (channels,
     default 32), PC_TPU_SWEEP_S / PC_TPU_SWEEP_G (comma lists),
     PC_TPU_BENCH_DTYPE (activations dtype, default bfloat16).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PC_TPU_SWEEP_N", "131072"))
C = int(os.environ.get("PC_TPU_SWEEP_C", "32"))
S_LIST = [int(s) for s in os.environ.get(
    "PC_TPU_SWEEP_S", "32768,16384,8192,4096").split(",")]
G_LIST = [int(g) for g in os.environ.get(
    "PC_TPU_SWEEP_G", "5,9,13,26").split(",")]
DTYPE = os.environ.get("PC_TPU_BENCH_DTYPE", "bfloat16")
K = 27
DEPTH = 4
WARMUP = 2
ITERS = 10


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcontrast_tpu.sparse import ops

    rev = tuple(K - 1 - i for i in range(K))  # center = 13 for the 3^3 kernel
    rng = np.random.RandomState(0)
    x0 = rng.randn(N, C).astype("float32").astype(DTYPE)
    ws = [(rng.randn(K, C, C) * 0.05).astype("float32") for _ in range(DEPTH)]

    results = []
    for s in S_LIST:
        if N % s:
            continue
        b = N // s
        nbr = rng.randint(0, s, (K, b, s)).astype(
            np.uint16 if s <= 65536 else np.int32
        )
        for g in G_LIST:
            def loss(x, ws):
                h = x
                for w in ws:
                    h = ops._conv_chunk_fused(h, nbr, w, rev, g)
                    h = h.astype(x.dtype)
                return jnp.mean(jnp.square(h.astype(jnp.float32)))

            def fwdbwd(x, ws):
                val, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, ws)
                gsum = sum(jnp.sum(t, dtype=jnp.float32)
                           for t in jax.tree.leaves(grads))
                return val + 0.0 * gsum

            fn = jax.jit(fwdbwd)
            for _ in range(WARMUP):
                out = fn(x0, ws)
            float(jax.device_get(out))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x0, ws)
            float(jax.device_get(out))
            dt = (time.perf_counter() - t0) / ITERS
            # fwd gathers (K-1)*N rows per conv; the scatter-free backward
            # re-gathers the same once -> 2*(K-1)*N*DEPTH rows total
            ns_per_row = dt * 1e9 / (2 * (K - 1) * N * DEPTH)
            results.append({"S": s, "G": g, "ms": round(dt * 1e3, 2),
                            "ns_per_row": round(ns_per_row, 3)})
            print(json.dumps({"probe": "fused_shape_sweep", "N": N, "C": C,
                              "dtype": DTYPE, **results[-1]}), flush=True)
    best = min(results, key=lambda r: r["ms"])
    print(json.dumps({"probe": "fused_shape_sweep", "best": best}),
          flush=True)


if __name__ == "__main__":
    main()
