"""FPS loop-overhead probe: fori_loop unroll + MXU-matvec distance form.

votenet_step_profile (round 4) measures furthest_point_sample(40k -> 1024)
at 51 ms — ~50 us per sequential iteration, far above the ~10 us of real
VPU work per [4, 40000] update, i.e. while-loop trip overhead dominates.
Two candidate cuts, measured within-run on the real chip:

  unroll=U      lax.fori_loop(..., unroll=U): U data-dependent bodies per
                trip — same math, 1/U the loop bookkeeping.
  matvec        d(last, all) = |x|^2 + |last|^2 - 2 x.last with |x|^2
                hoisted out of the loop: the per-iter elementwise 3-coord
                square-dist becomes one [N,3]@[3] matvec (MXU) + add.

Run:  python experiments/fps_unroll_probe.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, N, M = 4, 40000, 1024
ITERS = 30


def fps_unroll(xyz, npoint, unroll):
    import jax
    import jax.numpy as jnp

    b, n, _ = xyz.shape

    def body(i, state):
        idxs, dists, last = state
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d = jnp.sum(jnp.square(xyz - last_xyz), axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return idxs, dists, nxt

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    dists0 = jnp.full((b, n), jnp.inf, jnp.float32)
    last0 = jnp.zeros((b,), jnp.int32)
    idxs, _, _ = jax.lax.fori_loop(
        1, npoint, body, (idxs0, dists0, last0), unroll=unroll
    )
    return idxs


def fps_matvec(xyz, npoint, unroll):
    import jax
    import jax.numpy as jnp

    b, n, _ = xyz.shape
    sq = jnp.sum(jnp.square(xyz), axis=-1)  # [B, N], hoisted

    def body(i, state):
        idxs, dists, last = state
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        last_sq = jnp.take_along_axis(sq, last[:, None], axis=1)
        dot = jnp.einsum("bnc,bc->bn", xyz, last_xyz[:, 0, :],
                         preferred_element_type=jnp.float32)
        d = sq + last_sq - 2.0 * dot
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return idxs, dists, nxt

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    dists0 = jnp.full((b, n), jnp.inf, jnp.float32)
    last0 = jnp.zeros((b,), jnp.int32)
    idxs, _, _ = jax.lax.fori_loop(
        1, npoint, body, (idxs0, dists0, last0), unroll=unroll
    )
    return idxs


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.detect import ops
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6.0)

    def timeit(fn):
        out = fn()
        _ = float(jax.device_get(out[0, -1]))  # compile+sync
        out = fn()
        _ = float(jax.device_get(out[0, -1]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        _ = float(jax.device_get(out[0, -1]))
        return (time.perf_counter() - t0) / ITERS

    ref = jax.jit(lambda x: ops.furthest_point_sample(x, M))
    base_idx = np.asarray(ref(xyz))
    t_base = timeit(lambda: ref(xyz))
    print(f"shipped (unroll=1)      {t_base * 1e3:7.1f} ms", flush=True)

    for u in (2, 4, 8, 16):
        f = jax.jit(lambda x, u=u: fps_unroll(x, M, u))
        idx = np.asarray(f(xyz))
        ok = (idx == base_idx).all()
        t = timeit(lambda: f(xyz))
        print(f"unroll={u:<2}               {t * 1e3:7.1f} ms  "
              f"exact-match={bool(ok)}", flush=True)

    for u in (1, 8):
        f = jax.jit(lambda x, u=u: fps_matvec(x, M, u))
        idx = np.asarray(f(xyz))
        # matvec form reassociates the subtraction: ties may break
        # differently; report mismatch count rather than asserting
        mism = int((idx != base_idx).sum())
        t = timeit(lambda: f(xyz))
        print(f"matvec unroll={u:<2}        {t * 1e3:7.1f} ms  "
              f"idx-mismatches={mism}/{B * M}", flush=True)


if __name__ == "__main__":
    main()
