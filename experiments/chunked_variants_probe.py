"""Chunked conv-core variants: scan unroll factor, vmap-batched gathers.

The chunked core (sparse/ops.py::_conv_chunk_core) scans K=27 offsets, each
body doing one einsum + B python-unrolled per-slice takes.  Two untried
micro-variants at the pretrain scale (B=8, S=16384, C=32):

  - lax.scan ``unroll`` 1/3/9: more body copies per iteration can let XLA
    software-pipeline gather k+1 against matmul k across offsets;
  - vmap-form gather: one batched gather (jax.vmap of take over the slice
    axis) instead of B separate takes — fewer ops, but a batch-dim gather
    may lower worse than B small dense gathers.

Fwd+bwd conv stack (custom sym VJP variant per form), within one run.
Usage: python experiments/chunked_variants_probe.py  (real TPU)
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

K = 27
ITERS = 8
B = 8
S = 16384
C = 32
NCONV = 4


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, S, C).astype(np.float32) * 0.1)
    nbr = jnp.asarray(rng.randint(0, S, (K, B, S)).astype(np.int32))
    ws = jnp.asarray(
        rng.randn(NCONV, K, C, C).astype(np.float32) * (0.05 / np.sqrt(K * C))
    )

    def gather_unrolled(y, nbr_k):
        return jnp.stack([jnp.take(y[b], nbr_k[b], axis=0) for b in range(B)])

    def gather_vmap(y, nbr_k):
        return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(y, nbr_k)

    def make_stack(gather, unroll):
        @jax.jit
        def f(feats, nbr, ws):
            def conv(x, w):
                def body(acc, inp):
                    w_k, nbr_k = inp
                    y = jnp.einsum("bsc,cd->bsd", x, w_k,
                                   preferred_element_type=jnp.float32)
                    return acc + gather(y, nbr_k), None

                acc0 = jnp.zeros(x.shape, jnp.float32)
                out, _ = jax.lax.scan(body, acc0, (w, nbr), unroll=unroll)
                return out

            def loss_fn(ws, feats):
                x = feats
                for i in range(NCONV):
                    x = jnp.maximum(conv(x, ws[i]), 0.0) + x
                return jnp.sum(x * x) * 1e-6

            l, (dw, df) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, feats)
            return l, jax.tree.map(lambda a: jnp.sum(jnp.abs(a)), (dw, df))

        return f

    cases = [
        ("unrolled-takes u=1", gather_unrolled, 1),
        ("unrolled-takes u=3", gather_unrolled, 3),
        ("unrolled-takes u=9", gather_unrolled, 9),
        ("vmap-gather    u=1", gather_vmap, 1),
        ("vmap-gather    u=3", gather_vmap, 3),
    ]
    for name, g, u in cases:
        fn = make_stack(g, u)
        t0 = time.perf_counter()
        l, _ = fn(feats, nbr, ws)
        float(jax.device_get(l))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            l, _ = fn(feats, nbr, ws)
        float(jax.device_get(l))
        dt = (time.perf_counter() - t0) / ITERS
        rows = 3 * K * B * S * NCONV
        print(f"{name}  {dt * 1e3:7.1f} ms  {dt / rows * 1e9:5.2f} ns/row"
              f"  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
