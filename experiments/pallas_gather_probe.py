"""Probe: does this Mosaic toolchain compile TPU Pallas gathers, and how fast?

Round-2 finding (PERF.md): XLA's random row gather costs ~3 ns/row at 128 B
rows — ~43 GB/s, 5% of v5e HBM bandwidth — and that per-row overhead is the
step's floor.  This probe tries the Pallas routes around it:

  A. vmem_take   — whole table resident in VMEM, jnp.take inside the kernel
  B. vmem_loop   — fori_loop of per-row dynamic slices from VMEM
  C. hbm_dma     — per-row async DMA gather HBM->VMEM (double-buffered)
  D. xla_take    — baseline jnp.take for comparison

Run on the real chip:  python experiments/pallas_gather_probe.py
Each variant is compiled and timed independently; compile failures are
caught and reported (that was the round-1/2 blocker).
"""
from __future__ import annotations

import functools
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 65536          # table rows (fits VMEM: 65536*32*4 = 8 MB)
C = 32             # channels (128 B rows f32)
M = 65536          # gathered rows
ITERS = 30


def time_fn(fn, *args):
    out = fn(*args)
    jax.device_get(out)  # sync (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt


# ---------------------------------------------------------------- variants

def make_xla_take():
    @jax.jit
    def f(table, idx):
        return jnp.take(table, idx, axis=0)
    return f


def make_vmem_take():
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:], :]

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        )(idx, table)
    return f


def make_vmem_take_vmemspace():
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)
    return f


def make_vmem_loop(rows_per_block=4096):
    """Grid over output blocks; per-row dynamic-slice loads from a
    VMEM-resident table; indices via scalar prefetch (SMEM)."""
    nblocks = M // rows_per_block

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(i, _):
            r = idx_ref[b * rows_per_block + i]
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, rows_per_block, body, 0)

    @jax.jit
    def f(table, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (rows_per_block, C), lambda b, idx: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
        )(idx, table)
    return f


def make_hbm_dma(rows_per_block=2048, inflight=8):
    """Per-row DMA gather from HBM with a ring of in-flight copies."""
    nblocks = M // rows_per_block

    def kernel(idx_ref, table_ref, out_ref, sems):
        b = pl.program_id(0)

        def start(i):
            r = idx_ref[b * rows_per_block + i]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[i % inflight],
            ).start()

        def wait(i):
            r = idx_ref[b * rows_per_block + i]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[i % inflight],
            ).wait()

        def warm(i, _):
            start(i)
            return 0
        jax.lax.fori_loop(0, inflight, warm, 0)

        def body(i, _):
            wait(i)
            jax.lax.cond(
                i + inflight < rows_per_block,
                lambda: start(i + inflight),
                lambda: None,
            )
            return 0
        jax.lax.fori_loop(0, rows_per_block, body, 0)

    @jax.jit
    def f(table, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (rows_per_block, C), lambda b, idx: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((inflight,))],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, C), table.dtype),
        )(idx, table)
    return f


VARIANTS = {
    "xla_take": make_xla_take,
    "vmem_take_smem_idx": make_vmem_take,
    "vmem_take_vmem_idx": make_vmem_take_vmemspace,
    "vmem_loop": make_vmem_loop,
    "hbm_dma": make_hbm_dma,
}


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx_np = rng.randint(0, N, size=M).astype(np.int32)
    idx = jnp.asarray(idx_np)
    expect = np.asarray(table)[idx_np]

    only = sys.argv[1:] or list(VARIANTS)
    for name in only:
        make = VARIANTS[name]
        try:
            fn = make()
            out = np.asarray(jax.device_get(fn(table, idx)))
            ok = np.allclose(out, expect)
            dt = time_fn(fn, table, idx)
            print(
                f"{name:22s} ok={ok}  {dt*1e3:8.3f} ms  "
                f"{dt/M*1e9:6.2f} ns/row  {M*C*4/dt/1e9:6.1f} GB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).split("\n")[0][:200]
            print(f"{name:22s} FAILED: {type(e).__name__}: {msg}", flush=True)
            if "-v" in sys.argv:
                traceback.print_exc()


if __name__ == "__main__":
    main()
