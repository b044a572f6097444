"""Probe v4: Mosaic tpu.dynamic_gather at its native (square) shape.

lowering.py:2484 requires input == indices == output shape for lax.gather,
i.e. take_along_axis with indices pre-broadcast along channels.  Same-level
sparse-conv gathers are square (N_out == N_in), so the op maps — at the cost
of shipping a [N, C] int32 index expansion per offset.  This measures
whether the gather itself beats XLA's ~9-10 ns/row at the same shape.

VMEM budget forces C=16 f32 (table 4 + idx 4 + out 4 MB).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 65536
C = 16
K = 27
ITERS = 20


def time_fn(fn, *args):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / ITERS


def make_xla_scan():
    @jax.jit
    def f(table, nbr):
        def body(acc, idx):
            return acc + jnp.take(table, idx, axis=0), None
        out, _ = jax.lax.scan(body, jnp.zeros((N, C), table.dtype), nbr)
        return out
    return f


def make_pl_sq(dtype=jnp.float32):
    def kernel(table_ref, idx_ref, out_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.take_along_axis(table_ref[:], idx_ref[0], axis=0)

    @jax.jit
    def f(table, nbr_exp):                      # nbr_exp: [K, N, C] int32
        return pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((N, C), lambda k: (0, 0)),
                pl.BlockSpec((1, N, C), lambda k: (k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((N, C), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, C), dtype),
        )(table, nbr_exp)
    return f


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    table_np = rng.randn(N, C).astype(np.float32)
    table = jnp.asarray(table_np)
    nbr_np = rng.randint(0, N, size=(K, N)).astype(np.int32)
    expect = table_np[nbr_np].sum(axis=0)
    rows = K * N

    def report(name, fn, args, want):
        try:
            out = np.asarray(jax.device_get(fn(*args))).astype(np.float32)
            ok = np.allclose(out, want, rtol=1e-2, atol=1e-2)
            dt = time_fn(fn, *args)
            print(
                f"{name:12s} ok={ok}  {dt*1e3:8.3f} ms  "
                f"{dt/rows*1e9:6.2f} ns/row  "
                f"({rows*C*4/dt/1e9:6.1f} GB/s payload)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:260]}", flush=True)

    only = sys.argv[1:] or ["xla_scan", "pl_sq"]
    if "xla_scan" in only:
        report("xla_scan", make_xla_scan(), (table, jnp.asarray(nbr_np)),
               expect)
    if "pl_sq" in only:
        nbr_exp = np.broadcast_to(
            nbr_np[:, :, None], (K, N, C)
        ).copy()
        report("pl_sq", make_pl_sq(), (table, jnp.asarray(nbr_exp)), expect)


if __name__ == "__main__":
    main()
