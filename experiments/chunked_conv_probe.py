"""Realistic in-step probe: global vs per-frame-chunked sparse-conv stacks.

Round-3 microbenches showed isolated gathers slow down with operand size
(~12 ns/row at [131k, 32] vs ~20 at [262k, 32]) and that per-frame chunking
(gathers confined to each sample's [S, C] sub-table) recovers most of it at
262k scale.  The semseg step's measured per-voxel cost is ~1.6x the
pretrain step's, matching that scaling, so chunking could win at semseg
scale — but isolated probes exaggerate in-step costs (gathers overlap the
MXU matmuls).  This probe times a REALISTIC proxy instead: a stack of
same-level convs (scan gather-GEMM form), forward + scatter-free backward,
under jit with a scalar loss — the same op mix as the level-0/1 work that
dominates the semseg step — in both layouts on identical data.

Decision rule (within one run): chunked >= 15% faster on the C=96 stack at
262k rows -> the per-frame topology surgery is worth it; else park it with
these numbers.

Usage: python experiments/chunked_conv_probe.py  (real TPU, ~10 min first
run for remote compiles; compilation cache enabled).
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pointcontrast_tpu.sparse import ops
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, reversal_permutation
from pointcontrast_tpu.utils.cache import enable_compilation_cache

K = 27
ITERS = 8
REV = reversal_permutation(kernel_offsets(3, 3, "hypercube"))


# --------------------------------------------------- chunked conv (+sym VJP)

def _cconv_core(feats, nbr, weights):
    """feats [B, S, C]; nbr [K, B, S] frame-local; weights [K, C, D]."""
    k_, b_, s_ = nbr.shape

    def body(acc, inp):
        w_k, nbr_k = inp
        y = jnp.einsum("bsc,cd->bsd", feats, w_k,
                       preferred_element_type=jnp.float32)
        g = jnp.stack([jnp.take(y[b], nbr_k[b], axis=0) for b in range(b_)])
        return acc + g, None

    acc0 = jnp.zeros((b_, s_, weights.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (weights, nbr))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cconv(feats, nbr, weights, rev):
    return _cconv_core(feats, nbr, weights)


def _cconv_fwd(feats, nbr, weights, rev):
    return _cconv_core(feats, nbr, weights), (feats, nbr, weights)


def _cconv_bwd(rev, res, ct):
    feats, nbr, weights = res
    b_ = nbr.shape[1]
    rev_rows = jnp.take(nbr, jnp.asarray(np.asarray(rev, np.int32)), axis=0)

    def body(acc, inp):
        w_k, nbr_rk = inp
        g = jnp.stack([jnp.take(ct[b], nbr_rk[b], axis=0) for b in range(b_)])
        df = acc + jnp.einsum("bsd,cd->bsc", g, w_k,
                              preferred_element_type=jnp.float32)
        dw = jnp.einsum("bsc,bsd->cd", feats, g,
                        preferred_element_type=jnp.float32)
        return df, dw

    acc0 = jnp.zeros(feats.shape, jnp.float32)
    df, dw = jax.lax.scan(body, acc0, (weights, rev_rows))
    return df, None, dw


cconv.defvjp(_cconv_fwd, _cconv_bwd)


# ------------------------------------------------------------------- stacks

def make_global_stack(nconv):
    @jax.jit
    def f(feats, nbr, ws):
        def loss_fn(ws, feats):
            x = feats
            for i in range(nconv):
                x = jnp.maximum(
                    ops.sparse_conv(x, nbr, ws[i], rev=REV,
                                    valid_out=jnp.ones(x.shape[0],
                                                       jnp.float32)),
                    0.0,
                ) + x
            return jnp.sum(x * x) * 1e-6

        l, (dw, df) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, feats)
        return l, jax.tree.map(lambda a: jnp.sum(jnp.abs(a)), (dw, df))

    return f


def make_chunked_stack(nconv):
    @jax.jit
    def f(feats, nbr, ws):  # feats [B,S,C], nbr [K,B,S]
        def loss_fn(ws, feats):
            x = feats
            for i in range(nconv):
                x = jnp.maximum(cconv(x, nbr, ws[i], REV), 0.0) + x
            return jnp.sum(x * x) * 1e-6

        l, (dw, df) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, feats)
        return l, jax.tree.map(lambda a: jnp.sum(jnp.abs(a)), (dw, df))

    return f


def run(tag, b_, s_, c_, nconv, rng):
    n = b_ * s_
    feats_flat = jnp.asarray(rng.randn(n, c_).astype(np.float32) * 0.1)
    nbr_local = rng.randint(0, s_, (K, b_, s_)).astype(np.int32)
    nbr_global = nbr_local + (np.arange(b_, dtype=np.int32) * s_)[None, :, None]
    ws = jnp.asarray(rng.randn(nconv, K, c_, c_).astype(np.float32)
                     * (0.05 / np.sqrt(K * c_)))

    g = make_global_stack(nconv)
    ch = make_chunked_stack(nconv)
    args_g = (feats_flat, jnp.asarray(nbr_global.reshape(K, n)), ws)
    args_c = (feats_flat.reshape(b_, s_, c_), jnp.asarray(nbr_local), ws)

    res = {}
    for name, fn, args in (("global", g, args_g), ("chunked", ch, args_c)):
        t0 = time.perf_counter()
        l, _ = fn(*args)
        float(jax.device_get(l))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(ITERS):
            l, sums = fn(*args)
            acc += float(jax.device_get(l))
        dt = (time.perf_counter() - t0) / ITERS
        rows = 3 * K * n * nconv  # fwd + 2x bwd gather passes
        print(f"{tag:28s} {name:8s} {dt * 1e3:8.1f} ms  "
              f"{dt / rows * 1e9:5.2f} ns/row  (compile {compile_s:.0f}s, "
              f"loss {l:.4f})", flush=True)
        res[name] = dt
    print(f"{tag:28s} chunked/global = {res['chunked'] / res['global']:.3f}",
          flush=True)
    return res


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    print("devices:", jax.devices(), flush=True)
    # semseg scale: 6 scenes x 43008 = 258048 rows (npad0 262144 recipe)
    run("semseg 258k C=96 x4", 6, 43008, 96, 4, rng)
    run("semseg 258k C=32 x4", 6, 43008, 32, 4, rng)
    # pretrain scale: 8 frames x 16384 = 131072 rows
    run("pretrain 131k C=32 x4", 8, 16384, 32, 4, rng)


if __name__ == "__main__":
    main()
