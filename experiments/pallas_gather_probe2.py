"""Probe v2: Pallas VMEM-resident gather-accumulate vs XLA take, amortized.

Mirrors the sparse-conv access pattern: nbr is [K=27, M] random indices into
an [N, C] table; the op is  out = sum_k take(table, nbr[k]).  All timings
amortize K gathers inside ONE jit call (per-call axon dispatch is ~8 ms and
would swamp a single gather — the round-2 PERF.md microbenches amortized the
same way and measured ~3 ns/row for XLA).

Variants:
  xla_scan      — lax.scan of take+accumulate (the shipped conv's form)
  pl_dyngather  — pallas: table resident in VMEM, per-offset
                  jnp.take_along_axis (Mosaic dynamic-gather) + accumulate
  pl_rowloop    — pallas: fori_loop of per-row dynamic slices from VMEM
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 65536          # table rows
C = 32             # channels (128 B rows f32)
M = 65536          # gathered rows per offset
K = 27             # offsets
BM = 2048          # pallas block of output rows
ITERS = 20


def time_fn(fn, *args):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def make_xla_scan():
    @jax.jit
    def f(table, nbr):
        def body(acc, idx):
            return acc + jnp.take(table, idx, axis=0), None
        acc0 = jnp.zeros((M, C), table.dtype)
        out, _ = jax.lax.scan(body, acc0, nbr)
        return out
    return f


def make_pl_dyngather():
    nm = M // BM

    def kernel(table_ref, idx_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = idx_ref[0, :]                      # [BM] int32
        gathered = jnp.take_along_axis(
            table_ref[:], idx[:, None], axis=0
        )                                        # [BM, C] via broadcast
        out_ref[:] += gathered

    @jax.jit
    def f(table, nbr):
        return pl.pallas_call(
            kernel,
            grid=(nm, K),                        # k innermost: out resident
            in_specs=[
                pl.BlockSpec((N, C), lambda m, k: (0, 0)),   # whole table
                pl.BlockSpec((1, BM), lambda m, k: (k, m)),
            ],
            out_specs=pl.BlockSpec((BM, C), lambda m, k: (m, 0)),
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
        )(table, nbr)
    return f


def make_pl_rowloop():
    nm = M // BM

    def kernel(table_ref, idx_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            r = idx_ref[0, i]
            acc_ref[pl.ds(i, 1), :] += table_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, BM, body, 0)

        @pl.when(k == K - 1)
        def _():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(table, nbr):
        return pl.pallas_call(
            kernel,
            grid=(nm, K),
            in_specs=[
                pl.BlockSpec((N, C), lambda m, k: (0, 0)),
                pl.BlockSpec((1, BM), lambda m, k: (k, m)),
            ],
            out_specs=pl.BlockSpec((BM, C), lambda m, k: (m, 0)),
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((BM, C), jnp.float32)],
        )(table, nbr)
    return f


VARIANTS = {
    "xla_scan": make_xla_scan,
    "pl_dyngather": make_pl_dyngather,
    "pl_rowloop": make_pl_rowloop,
}


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N, C).astype(np.float32))
    nbr_np = rng.randint(0, N, size=(K, M)).astype(np.int32)
    nbr = jnp.asarray(nbr_np)
    expect = np.asarray(table)[nbr_np].sum(axis=0)

    rows = K * M
    only = sys.argv[1:] or list(VARIANTS)
    for name in only:
        try:
            fn = VARIANTS[name]()
            out = np.asarray(jax.device_get(fn(table, nbr)))
            ok = np.allclose(out, expect, rtol=1e-4, atol=1e-4)
            dt = time_fn(fn, table, nbr)
            print(
                f"{name:14s} ok={ok}  {dt*1e3:8.3f} ms  "
                f"{dt/rows*1e9:6.2f} ns/row  {rows*C*4/dt/1e9:6.1f} GB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:300]
            print(f"{name:14s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
