"""How does in-step gather cost scale with sub-table size below 16k rows?

The chunked layout won 1.15x at pretraining scale by shrinking the gather
operand from [131k, C] to 8 x [16k, C].  If per-row gather cost keeps
falling below 16k rows, sub-frame chunking (splitting each frame's rows
into H halo-padded blocks) could buy more.  This measures the same
realistic fwd+bwd conv-stack proxy as chunked_conv_probe.py at fixed total
rows (131072) with chunk counts 8/16/32/64 (tables 16k/8k/4k/2k), plus a
one-level-fused variant (all offsets' takes from one [S, C] table inside
one scan body) — within one run only.

Usage: python experiments/gather_table_size_probe.py  (real TPU)
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

K = 27
ITERS = 8
N_TOTAL = 131072
C = 32
NCONV = 4


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    feats0 = rng.randn(N_TOTAL, C).astype(np.float32) * 0.1
    ws = jnp.asarray(
        rng.randn(NCONV, K, C, C).astype(np.float32) * (0.05 / np.sqrt(K * C))
    )

    def make_stack(b_):
        @jax.jit
        def f(feats, nbr, ws):  # feats [B, S, C], nbr [K, B, S]
            def conv(x, w):  # w [K, C, C]
                def body(acc, inp):
                    w_k, nbr_k = inp
                    y = jnp.einsum("bsc,cd->bsd", x, w_k,
                                   preferred_element_type=jnp.float32)
                    g = jnp.stack(
                        [jnp.take(y[b], nbr_k[b], axis=0) for b in range(b_)]
                    )
                    return acc + g, None

                acc0 = jnp.zeros(x.shape, jnp.float32)
                out, _ = jax.lax.scan(body, acc0, (w, nbr))
                return out

            def loss_fn(ws, feats):
                x = feats
                for i in range(NCONV):
                    x = jnp.maximum(conv(x, ws[i]), 0.0) + x
                return jnp.sum(x * x) * 1e-6

            l, (dw, df) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, feats)
            return l, jax.tree.map(lambda a: jnp.sum(jnp.abs(a)), (dw, df))

        return f

    for b_ in (8, 16, 32, 64):
        s_ = N_TOTAL // b_
        nbr = rng.randint(0, s_, (K, b_, s_)).astype(np.int32)
        fn = make_stack(b_)
        args = (jnp.asarray(feats0.reshape(b_, s_, C)), jnp.asarray(nbr), ws)
        t0 = time.perf_counter()
        l, _ = fn(*args)
        float(jax.device_get(l))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            l, _ = fn(*args)
        float(jax.device_get(l))
        dt = (time.perf_counter() - t0) / ITERS
        rows = 3 * K * N_TOTAL * NCONV
        print(f"B={b_:3d} S={s_:6d}  {dt * 1e3:7.1f} ms  "
              f"{dt / rows * 1e9:5.2f} ns/row  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
