"""Probe v3: tiling-legal Pallas gathers + index-locality check.

Fixes from v2: index blocks must have (8,128)-tileable trailing dims, so
nbr is reshaped [K, M/128, 128] and the gather result is produced in the
same [blk, 128, C] layout.  The row-loop variant moves indices to
scalar-prefetch SMEM.  Also measures whether per-offset SORTED indices
(Morton-style locality) change XLA's gather speed (VERDICT round-2 #1b).
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
C = 32
M = 65536
K = 27
BM = 2048            # output rows per pallas block
LANES = 128
SUB = BM // LANES    # 16 sublane groups per block
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
        out, _ = jax.lax.scan(
            body, jnp.zeros((M, C), table.dtype), nbr
        )
        return out
    return f


def make_pl_gather3d():
    """Whole table resident in VMEM; per-(block, offset) step gathers a
    [SUB, 128] tile of indices into a [SUB, 128, C] output tile; offsets are
    the innermost grid dim so the output tile stays resident while K
    accumulates."""
    nm = M // BM

    def kernel(table_ref, idx_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = idx_ref[0]                       # [SUB, 128] int32
        out_ref[:] += jnp.take(table_ref[:], idx, axis=0)

    @jax.jit
    def f(table, nbr3):                        # nbr3: [K, M//128, 128]
        return pl.pallas_call(
            kernel,
            grid=(nm, K),
            in_specs=[
                pl.BlockSpec((N, C), lambda m, k: (0, 0)),
                pl.BlockSpec((1, SUB, LANES), lambda m, k: (k, m, 0)),
            ],
            out_specs=pl.BlockSpec(
                (SUB, LANES, C), lambda m, k: (m, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((M // LANES, LANES, C), table.dtype),
        )(table, nbr3)
    return f


def make_pl_rowloop():
    """Indices via scalar prefetch (SMEM); whole table in VMEM; per-row
    dynamic-slice copies."""
    nm = M // BM

    def kernel(idx_ref, table_ref, out_ref):
        m = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = k * M + m * BM

        def body(i, _):
            r = idx_ref[base + i]
            out_ref[pl.ds(i, 1), :] += table_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, BM, body, 0)

    @jax.jit
    def f(table, nbr):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, K),
            in_specs=[pl.BlockSpec((N, C), lambda m, k, idx: (0, 0))],
            out_specs=pl.BlockSpec((BM, C), lambda m, k, idx: (m, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
        )(nbr.reshape(-1), table)
    return f


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N, C).astype(np.float32))
    nbr_np = rng.randint(0, N, size=(K, M)).astype(np.int32)
    expect = np.asarray(table)[nbr_np].sum(axis=0)
    rows = K * M

    def report(name, fn, args, want):
        try:
            out = np.asarray(jax.device_get(fn(*args))).reshape(M, C)
            ok = np.allclose(out, want, rtol=1e-4, atol=1e-4)
            dt = time_fn(fn, *args)
            print(
                f"{name:16s} ok={ok}  {dt*1e3:8.3f} ms  "
                f"{dt/rows*1e9:6.2f} ns/row  {rows*C*4/dt/1e9:6.1f} GB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:260]}", flush=True)

    only = sys.argv[1:] or ["xla_scan", "xla_sorted", "pl_gather3d",
                            "pl_rowloop"]
    if "xla_scan" in only:
        report("xla_scan", make_xla_scan(), (table, jnp.asarray(nbr_np)),
               expect)
    if "xla_sorted" in only:
        nbr_sorted = np.sort(nbr_np, axis=1)
        want = np.asarray(table)[nbr_sorted].sum(axis=0)
        report("xla_sorted", make_xla_scan(),
               (table, jnp.asarray(nbr_sorted)), want)
    if "pl_gather3d" in only:
        report("pl_gather3d", make_pl_gather3d(),
               (table, jnp.asarray(nbr_np.reshape(K, M // LANES, LANES))),
               expect)
    if "pl_rowloop" in only:
        report("pl_rowloop", make_pl_rowloop(),
               (table, jnp.asarray(nbr_np)), expect)


if __name__ == "__main__":
    main()
