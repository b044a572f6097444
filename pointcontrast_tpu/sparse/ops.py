"""Device-side sparse ops: gather-GEMM convolutions, pooling, masked moments.

Each op is a pure jittable function over static-shaped arrays produced by
``topology.build_pyramid``.  The convolution is ONE large MXU matmul:

    out = gather(F, nbr)              # [N_out, K*Cin]   (XLA row gather)
          @ W.reshape(K*Cin, Cout)    # [K*Cin, Cout]    (MXU)

Zero-padding invariant: callers keep features of padded rows at zero (see
``mask_rows``), and missing neighbors in ``nbr`` point at a padded row, so
gathered garbage rows contribute exactly zero to the matmul -- no select or
where is needed on the hot path.

Replaces ME.MinkowskiConvolution / MinkowskiConvolutionTranspose /
Minkowski{Avg,Sum}Pooling / MinkowskiGlobalPooling (SURVEY.md section 2.7).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def mask_rows(features: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows. valid: [N] float (1 valid / 0 pad)."""
    return features * valid[:, None].astype(features.dtype)


def _gather_mode() -> str:
    """Bounds mode for the hot-path row gathers (read at TRACE time).

    Every map index is in-bounds BY CONSTRUCTION — missing neighbors point
    at the pad row (collate/chunk invariant), never past the table — so
    jnp.take's default 'fill' mode pays for a redundant out-of-bounds
    select: on TPU the select materializes as a SEPARATE full-bandwidth
    fusion pass over each gathered [S*G, C] block plus a layout copy
    (round-5 trace: broadcast_select fusions + reshapes ≈ 18% of the
    pretrain step device time).  'promise_in_bounds' skips clamp and
    select entirely.  PC_TPU_GATHER_MODE=fill restores the old semantics
    (useful only for debugging corrupt maps)."""
    return os.environ.get("PC_TPU_GATHER_MODE", "promise_in_bounds")


def _take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Hot-path row gather: ``table[idx]`` along axis 0, no bounds select.

    jnp.take only exposes fill/clip/wrap; the true no-check mode needs the
    .at[].get() surface (lax.GatherScatterMode.PROMISE_IN_BOUNDS)."""
    mode = _gather_mode()
    if mode == "fill":
        return jnp.take(table, idx, axis=0)
    return jnp.asarray(table).at[idx].get(mode=mode)


def _center_of(rev) -> int | None:
    """Index of the zero offset in a kernel: the unique fixed point of the
    offset-reversal permutation (rev[k] == k iff offset_k == -offset_k == 0).
    Derived statically from the (tuple) rev, so the conv cores can skip the
    center's gather entirely — for same-level maps the center map is the
    identity by construction (offset-0 neighbor of a voxel is itself; pad
    rows differ only in gathering another pad row, and pad features are
    exactly zero either way)."""
    if rev is None:
        return None
    for i, r in enumerate(rev):
        if r == i:
            return i
    return None


def _conv_core(features, nbr, weights, center: int | None = None):
    """Scan-form gather-GEMM conv (no bias/mask): the shared fwd kernel.

    The gathered table ``y`` is kept in the COMPUTE dtype (not widened to
    f32): XLA's row gather collapses once its operand exceeds the ~8-16 MB
    VMEM footprint (measured round 3: 9.2 ns/row at 8 MB, 19.7 at 33 MB,
    63.7 at 33 MB wide rows — experiments/ probes), so a bf16 activation
    table at level-0 scale stays on the fast path where an f32 one does
    not.  Accumulation stays f32.

    center: static index of the identity (zero) offset for same-level maps;
    its contribution is F @ W_center directly — no gather (saves 1/K of the
    conv's row traffic; valid because nbr[center] is the identity on valid
    rows and pad-row features are exactly zero).  The split-scan form keeps
    the accumulation ORDER (and the compute-dtype cast chain) identical to
    the dense scan, so results are bit-compatible with the no-skip path —
    train-mode BN amplifies even summation-order noise (see
    tests/test_dense_oracle.py train-mode docstring)."""
    k, n_out = nbr.shape
    cout = weights.shape[-1]

    def body(acc, inputs):
        w_k, nbr_k = inputs
        y = jnp.dot(
            features, w_k, preferred_element_type=jnp.float32
        ).astype(features.dtype)
        return acc + _take_rows(y, nbr_k).astype(jnp.float32), None

    def seg(acc, w_seg, nbr_seg):
        if w_seg.shape[0] == 0:
            return acc
        out, _ = jax.lax.scan(body, acc, (w_seg, nbr_seg))
        return out

    acc = jnp.zeros((n_out, cout), jnp.float32)
    if center is None:
        out = seg(acc, weights, nbr)
    else:
        acc = seg(acc, weights[:center], nbr[:center])
        y_c = jnp.dot(
            features, weights[center], preferred_element_type=jnp.float32
        ).astype(features.dtype)
        acc = acc + y_c.astype(jnp.float32)
        out = seg(acc, weights[center + 1:], nbr[center + 1:])
    return out.astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_sym(features, nbr, weights, rev):
    return _conv_core(features, nbr, weights, center=_center_of(rev))


def _conv_sym_fwd(features, nbr, weights, rev):
    return (
        _conv_core(features, nbr, weights, center=_center_of(rev)),
        (features, nbr, weights),
    )


def _conv_sym_bwd(rev, res, ct):
    """Scatter-free backward for centrally-symmetric same-level maps.

    The adjoint of gathering neighbor +o is gathering neighbor -o (missing
    neighbors land on the pad row whose cotangent is zero because every
    consumer masks pad rows), so

        dF   = sum_k take(ct, nbr[rev[k]]) @ W_k^T
        dW_k = F^T @ take(ct, nbr[rev[k]])        (same gathers, shared)

    -- the backward costs one gather + two matmuls per offset, the same row
    traffic as the forward, instead of autodiff's per-step scatter-adds and
    stacked scan residuals (measured 3-4x slower and OOM-prone).  The center
    (zero) offset skips its gather like the forward: take(ct, nbr[center])
    == ct up to pad rows whose product terms are zero anyway."""
    features, nbr, weights = res
    cin = features.shape[-1]
    f32 = jnp.float32
    center = _center_of(rev)

    def body(acc, inputs):
        w_k, nbr_rk = inputs
        g = _take_rows(ct, nbr_rk)  # [N_in, cout]
        df = acc + jnp.dot(g, w_k.T.astype(g.dtype),
                           preferred_element_type=f32)
        dw_k = jnp.dot(features.astype(f32).T, g.astype(f32),
                       preferred_element_type=f32)
        return df, dw_k

    rev_idx = np.asarray(rev, np.int32)

    def seg(acc, lo, hi):
        if lo == hi:
            return acc, jnp.zeros((0, cin, weights.shape[-1]), f32)
        rows = jnp.take(nbr, jnp.asarray(rev_idx[lo:hi]), axis=0)
        return jax.lax.scan(body, acc, (weights[lo:hi], rows))

    acc = jnp.zeros((features.shape[0], cin), f32)
    if center is None:
        df, dw = seg(acc, 0, len(rev))
    else:
        df, dw_a = seg(acc, 0, center)
        w_c = weights[center]
        df = df + jnp.dot(ct, w_c.T.astype(ct.dtype),
                          preferred_element_type=f32)
        dw_c = jnp.dot(features.astype(f32).T, ct.astype(f32),
                       preferred_element_type=f32)
        df, dw_b = seg(df, center + 1, len(rev))
        dw = jnp.concatenate([dw_a, dw_c[None], dw_b], axis=0)
    return df.astype(features.dtype), None, dw.astype(weights.dtype)


_conv_sym.defvjp(_conv_sym_fwd, _conv_sym_bwd)


# --------------------------------------------------------------------------
# Chunked (per-frame) layout: rows are [B * S] with each sample confined to
# its own S-row slice and maps stored frame-LOCAL as [K, B, S].  Gathers then
# read [S, C] sub-tables instead of one [B*S, C] table — XLA's row-gather
# cost grows with operand size (measured round 3: ~6.4 ns/row at a 258k-row
# f32x96 operand vs ~3.7 chunked in a realistic fwd+bwd conv stack,
# experiments/chunked_conv_probe.py), so at ScanNet batch scales the chunked
# form is 1.6-2.6x faster for the same math.  Each sample's slice ends with
# its own pad rows (local index S-1), preserving the zero-row invariant
# per-slice.  Built by sparse.chunk.build_chunked_pyramid.


def _chunk_view(features, num_chunks):
    n, c = features.shape
    return features.reshape(num_chunks, n // num_chunks, c)


def _conv_chunk_core(features, nbr, weights, center: int | None = None):
    """Chunked scan-form conv: per offset, one big matmul over [B, S, C]
    followed by B per-slice gathers (unrolled; each reads an [S, C]
    operand).  Flat [N, C] in / flat [N_out, C] out like _conv_core.

    center: static identity-offset index (see _conv_core) — contributes
    F @ W_center with no gather."""
    k, b_, s_out = nbr.shape
    cout = weights.shape[-1]
    f3 = _chunk_view(features, b_)

    def body(acc, inputs):
        w_k, nbr_k = inputs
        y = jnp.einsum(
            "bsc,cd->bsd", f3, w_k, preferred_element_type=jnp.float32
        ).astype(features.dtype)
        g = jnp.stack(
            [_take_rows(y[b], nbr_k[b]) for b in range(b_)]
        )
        return acc + g.astype(jnp.float32), None

    def seg(acc, w_seg, nbr_seg):
        if w_seg.shape[0] == 0:
            return acc
        out, _ = jax.lax.scan(body, acc, (w_seg, nbr_seg))
        return out

    acc = jnp.zeros((b_, s_out, cout), jnp.float32)
    if center is None:
        out = seg(acc, weights, nbr)
    else:
        acc = seg(acc, weights[:center], nbr[:center])
        y_c = jnp.einsum(
            "bsc,cd->bsd", f3, weights[center],
            preferred_element_type=jnp.float32,
        ).astype(features.dtype)
        acc = acc + y_c.astype(jnp.float32)
        out = seg(acc, weights[center + 1:], nbr[center + 1:])
    return out.reshape(b_ * s_out, cout).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_chunk_sym(features, nbr, weights, rev):
    return _conv_chunk_core(features, nbr, weights, center=_center_of(rev))


def _conv_chunk_sym_fwd(features, nbr, weights, rev):
    return (
        _conv_chunk_core(features, nbr, weights, center=_center_of(rev)),
        (features, nbr, weights),
    )


def _conv_chunk_sym_bwd(rev, res, ct):
    """Scatter-free chunked backward (same identity as _conv_sym_bwd, per
    slice; center offset skips its gather like the forward)."""
    features, nbr, weights = res
    k, b_, s_ = nbr.shape
    f3 = _chunk_view(features, b_)
    ct3 = _chunk_view(ct, b_)
    f32 = jnp.float32
    center = _center_of(rev)

    def body(acc, inputs):
        w_k, nbr_rk = inputs
        g = jnp.stack(
            [_take_rows(ct3[b], nbr_rk[b]) for b in range(b_)]
        )  # [B, S, cout]
        df = acc + jnp.einsum(
            "bsd,cd->bsc", g, w_k.astype(g.dtype), preferred_element_type=f32
        )
        dw_k = jnp.einsum(
            "bsc,bsd->cd", f3.astype(f32), g.astype(f32),
            preferred_element_type=f32,
        )
        return df, dw_k

    rev_idx = np.asarray(rev, np.int32)
    cin = f3.shape[-1]

    def seg(acc, lo, hi):
        if lo == hi:
            return acc, jnp.zeros((0, cin, weights.shape[-1]), f32)
        rows = jnp.take(nbr, jnp.asarray(rev_idx[lo:hi]), axis=0)
        return jax.lax.scan(body, acc, (weights[lo:hi], rows))

    acc = jnp.zeros(f3.shape, f32)
    if center is None:
        df, dw = seg(acc, 0, len(rev))
    else:
        df, dw_a = seg(acc, 0, center)
        w_c = weights[center]
        df = df + jnp.einsum(
            "bsd,cd->bsc", ct3, w_c.astype(ct3.dtype),
            preferred_element_type=f32,
        )
        dw_c = jnp.einsum(
            "bsc,bsd->cd", f3.astype(f32), ct3.astype(f32),
            preferred_element_type=f32,
        )
        df, dw_b = seg(df, center + 1, len(rev))
        dw = jnp.concatenate([dw_a, dw_c[None], dw_b], axis=0)
    return (
        df.reshape(features.shape).astype(features.dtype),
        None,
        dw.astype(weights.dtype),
    )


_conv_chunk_sym.defvjp(_conv_chunk_sym_fwd, _conv_chunk_sym_bwd)


# --------------------------------------------------------------------------
# Fused (im2col-per-chunk) same-level conv.  Instead of the K-step scan
# (one [S, Cin] @ [Cin, Cout] matmul + B gathers per offset), each chunk does
# ONE row gather of all non-center offsets in s-major order
# ([S, G] index block -> col [S, G*Cin]) followed by ONE MXU matmul
# [S, G*Cin] @ [G*Cin, Cout].  Rationale (round 4):
#   - op count drops from K matmuls + K*B takes to B takes + ~B matmuls;
#   - the matmul contraction grows from Cin (32..96 — wasting a 128-wide MXU
#     systolic row) to G*Cin (832+ at G=26, Cin=32), restoring MXU
#     utilization exactly like dense im2col convs;
#   - gathered row traffic is unchanged (same K*S rows, same [S, C] operand).
# The global (unchunked) im2col was rejected in round 1 for OOM at
# [N, K*C] scale; per-chunk the temp is [S, G*Cin] (e.g. 54 MB at S=16k,
# Cin=32, G=26) and ``group`` caps it.  The backward is the same
# offset-reversal gather identity as _conv_sym_bwd, also in fused form:
# one gather of ct rows per chunk + two matmuls.
#
# PC_TPU_CONV_FUSED_GROUP sets the offsets-per-fused-gather (0 = scan
# form).  Default 13: measured on-chip (round 4, experiments/
# fused_conv_probe.py + fused_conv_semseg_probe.py) — pretrain 16.57 vs
# 14.42 pairs/s scan (+15%, plateau over groups 9-13), semseg 11.35 vs
# 9.11 scenes/s (+25%); group also caps the per-chunk col temp
# [S, G*Cin].


def _col_mode() -> str:
    """How the fused im2col column block feeds the MXU (read at TRACE time).

    'reshape' (default): gather [S*G, Cin] s-major, physical reshape to
    [S, G*Cin], one 2-D matmul.  The reshape is a tiled-layout relayout on
    TPU — a separate full-bandwidth HBM pass per gather (round-5 trace:
    ~29 ms of reshapes in the 226 ms pretrain step).
    'dotg': gather [S, G, Cin] directly (2-D index matrix) and contract
    over (g, c) in ONE dot_general — no explicit relayout; XLA chooses how
    to feed the MXU.  Measured within-run by
    experiments/gather_mode_probe.py --cols."""
    return os.environ.get("PC_TPU_CONV_COL", "reshape")


def _fused_group() -> int:
    raw = os.environ.get("PC_TPU_CONV_FUSED_GROUP")
    if not raw:
        return 13
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"PC_TPU_CONV_FUSED_GROUP={raw!r} is not an integer "
            f"(offsets per fused gather; 0 selects the scan form)"
        ) from None


def _offset_groups(k: int, center: int | None, group: int):
    """Static non-center offset order, split into gather groups."""
    order = [i for i in range(k) if i != center]
    group = max(1, min(group, len(order))) if order else 1
    return [order[i:i + group] for i in range(0, len(order), group)]


def _conv_chunk_fused_core(features, nbr, weights, rev, group):
    k, b_, s_ = nbr.shape
    cout = weights.shape[-1]
    center = _center_of(rev)
    groups = _offset_groups(k, center, group)
    f3 = _chunk_view(features, b_)
    f32 = jnp.float32
    dotg = _col_mode() == "dotg"
    # Pre-reshape the per-group weight blocks once (shared across chunks).
    w_blocks = [
        weights[np.asarray(ga, np.int32)]
        if dotg else
        weights[np.asarray(ga, np.int32)]
        .reshape(len(ga) * weights.shape[1], cout)
        for ga in groups
    ]
    outs = []
    for b in range(b_):
        fb = f3[b]
        if center is not None:
            # cast like the grouped blocks (w_g.astype below) so the center
            # tap runs at the same effective precision under bf16
            acc = jnp.dot(
                fb, weights[center].astype(fb.dtype),
                preferred_element_type=f32,
            )
        else:
            acc = jnp.zeros((s_, cout), f32)
        for ga, w_g in zip(groups, w_blocks):
            if dotg:
                idx2 = jnp.transpose(
                    nbr[np.asarray(ga, np.int32), b, :]
                )  # [S, G]
                col3 = _take_rows(fb, idx2)  # [S, G, Cin]
                acc = acc + jnp.einsum(
                    "sgc,gcd->sd", col3, w_g.astype(col3.dtype),
                    preferred_element_type=f32,
                )
                continue
            idx = jnp.transpose(
                nbr[np.asarray(ga, np.int32), b, :]
            ).reshape(-1)  # s-major: row s holds its G neighbor rows
            col = _take_rows(fb, idx).reshape(
                s_, len(ga) * fb.shape[-1]
            )
            acc = acc + jnp.dot(
                col, w_g.astype(col.dtype), preferred_element_type=f32
            )
        outs.append(acc)
    return jnp.stack(outs).reshape(b_ * s_, cout).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_chunk_fused(features, nbr, weights, rev, group):
    return _conv_chunk_fused_core(features, nbr, weights, rev, group)


def _conv_chunk_fused_fwd(features, nbr, weights, rev, group):
    return (
        _conv_chunk_fused_core(features, nbr, weights, rev, group),
        (features, nbr, weights),
    )


def _conv_chunk_fused_bwd(rev, group, res, ct):
    """Fused scatter-free backward: per chunk, ONE gather of the cotangent
    rows through the offset-reversal permutation (colc [S, G*Cout]) then
    dF += colc @ [W_k^T]_stacked and dW += (F^T @ colc) reshaped — the same
    gather identity as _conv_sym_bwd with all K offsets in one take."""
    features, nbr, weights = res
    k, b_, s_ = nbr.shape
    cin, cout = weights.shape[1], weights.shape[2]
    center = _center_of(rev)
    groups = _offset_groups(k, center, group)
    rev_np = np.asarray(rev, np.int32)
    f3 = _chunk_view(features, b_)
    ct3 = _chunk_view(ct, b_)
    f32 = jnp.float32
    dotg = _col_mode() == "dotg"
    # [W_k^T] stacked per group: [G*Cout, Cin] (or [G, Cout, Cin] for dotg)
    wt_blocks = [
        weights[np.asarray(ga, np.int32)].transpose(0, 2, 1)
        if dotg else
        weights[np.asarray(ga, np.int32)]
        .transpose(0, 2, 1)
        .reshape(len(ga) * cout, cin)
        for ga in groups
    ]
    dfs = []
    dw = jnp.zeros((k, cin, cout), f32)
    for b in range(b_):
        fb, ctb = f3[b], ct3[b]
        if center is not None:
            df = jnp.dot(
                ctb, weights[center].T.astype(ctb.dtype),
                preferred_element_type=f32,
            )
            dw = dw.at[center].add(
                jnp.dot(fb.astype(f32).T, ctb.astype(f32),
                        preferred_element_type=f32)
            )
        else:
            df = jnp.zeros((s_, cin), f32)
        for ga, wt_g in zip(groups, wt_blocks):
            g_n = len(ga)
            if dotg:
                idx2 = jnp.transpose(
                    nbr[rev_np[np.asarray(ga, np.int32)], b, :]
                )  # [S, G]
                colc3 = _take_rows(ctb, idx2)  # [S, G, Cout]
                df = df + jnp.einsum(
                    "sgd,gdc->sc", colc3, wt_g.astype(colc3.dtype),
                    preferred_element_type=f32,
                )
                dw = dw.at[np.asarray(ga, np.int32)].add(
                    jnp.einsum(
                        "sc,sgd->gcd", fb.astype(f32), colc3.astype(f32),
                        preferred_element_type=f32,
                    )
                )
                continue
            idx = jnp.transpose(
                nbr[rev_np[np.asarray(ga, np.int32)], b, :]
            ).reshape(-1)
            colc = _take_rows(ctb, idx).reshape(s_, g_n * cout)
            df = df + jnp.dot(
                colc, wt_g.astype(colc.dtype), preferred_element_type=f32
            )
            dw_g = jnp.dot(
                fb.astype(f32).T, colc.astype(f32),
                preferred_element_type=f32,
            )  # [Cin, G*Cout]
            dw = dw.at[np.asarray(ga, np.int32)].add(
                dw_g.reshape(cin, g_n, cout).transpose(1, 0, 2)
            )
        dfs.append(df)
    df_all = (
        jnp.stack(dfs).reshape(features.shape).astype(features.dtype)
    )
    return df_all, None, dw.astype(weights.dtype)


_conv_chunk_fused.defvjp(_conv_chunk_fused_fwd, _conv_chunk_fused_bwd)


# --------------------------------------------------------------------------
# Fused chunked DOWN conv (stride-2: nbr [K, B, S_out] gathers from the finer
# level's [S_in, C] sub-tables, no offset symmetry).  The scan form's
# autodiff backward pays K scatter-adds per chunk AND stacks per-step scan
# residuals ([K, B, S_in, Cout] — 134 MB per level-0 down conv at semseg
# scale); this custom VJP is residual-lean (saves only the inputs):
#   fwd: col = take(F_b, idx)[S_out, K*Cin]; out = col @ W.reshape(K*Cin, Co)
#   bwd: dcol = ct @ [W_k^T]stacked;  dF = ONE scatter-add of the
#        [S_out*K, Cin] rows at idx;  dW = re-take(col)^T @ ct
# Missing children point at the fine pad row; its accumulated cotangent is
# harmless because pad rows are re-masked by every consumer downstream and
# the pad row's FEATURES are zero (dW sees zero contributions from it via
# col, and dF at the pad row is discarded by the next op's mask).


def _down_col(features_b, nbr, b, ga):
    """col [S_out, G*Cin] for chunk b over offset group ga (s-major)."""
    idx = jnp.transpose(nbr[np.asarray(ga, np.int32), b, :]).reshape(-1)
    return _take_rows(features_b, idx).reshape(
        nbr.shape[2], len(ga) * features_b.shape[-1]
    ), idx


def _conv_chunk_down_fused_core(features, nbr, weights, group):
    k, b_, s_out = nbr.shape
    cin, cout = weights.shape[1], weights.shape[2]
    f3 = _chunk_view(features, b_)
    groups = _offset_groups(k, None, group)
    f32 = jnp.float32
    w_blocks = [
        weights[np.asarray(ga, np.int32)].reshape(len(ga) * cin, cout)
        for ga in groups
    ]
    outs = []
    for b in range(b_):
        acc = jnp.zeros((s_out, cout), f32)
        for ga, w_g in zip(groups, w_blocks):
            col, _ = _down_col(f3[b], nbr, b, ga)
            acc = acc + jnp.dot(
                col, w_g.astype(col.dtype), preferred_element_type=f32
            )
        outs.append(acc)
    return jnp.stack(outs).reshape(b_ * s_out, cout).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_chunk_down_fused(features, nbr, weights, group):
    return _conv_chunk_down_fused_core(features, nbr, weights, group)


def _conv_chunk_down_fused_fwd(features, nbr, weights, group):
    return (
        _conv_chunk_down_fused_core(features, nbr, weights, group),
        (features, nbr, weights),
    )


def _conv_chunk_down_fused_bwd(group, res, ct):
    features, nbr, weights = res
    k, b_, s_out = nbr.shape
    cin, cout = weights.shape[1], weights.shape[2]
    s_in = features.shape[0] // b_
    f3 = _chunk_view(features, b_)
    ct3 = ct.reshape(b_, s_out, cout)
    groups = _offset_groups(k, None, group)
    f32 = jnp.float32
    wt_blocks = [
        weights[np.asarray(ga, np.int32)]
        .transpose(0, 2, 1)
        .reshape(len(ga), cout, cin)
        for ga in groups
    ]
    dfs = []
    dw = jnp.zeros((k, cin, cout), f32)
    for b in range(b_):
        ctb = ct3[b]
        df = jnp.zeros((s_in, cin), f32)
        for ga, wt_g in zip(groups, wt_blocks):
            g_n = len(ga)
            col, idx = _down_col(f3[b], nbr, b, ga)
            # dW over this group: col^T @ ct, reshaped to per-offset blocks
            dw_g = jnp.dot(col.astype(f32).T, ctb.astype(f32),
                           preferred_element_type=f32)
            dw = dw.at[np.asarray(ga, np.int32)].add(
                dw_g.reshape(g_n, cin, cout)
            )
            # dcol rows [S_out, G, Cin] -> ONE scatter-add at idx
            dcol = jnp.einsum(
                "sd,gdc->sgc", ctb.astype(f32), wt_g.astype(f32),
                preferred_element_type=f32,
            ).reshape(s_out * g_n, cin)
            df = df.at[idx].add(dcol)
        dfs.append(df)
    df_all = jnp.stack(dfs).reshape(features.shape).astype(features.dtype)
    return df_all, None, dw.astype(weights.dtype)


_conv_chunk_down_fused.defvjp(
    _conv_chunk_down_fused_fwd, _conv_chunk_down_fused_bwd
)


# --------------------------------------------------------------------------
# Fully scatter-free chunked k2s2 down conv.  For kernel-2 stride-2 maps the
# child→(parent, offset) relation is FUNCTIONAL (each fine voxel appears in
# exactly one (k, j) slot of the down map — topology.py:17-19), so the
# backward collapses to a single term:
#
#     dF[i] = ct[up_parent[i]] @ W_{up_offset[i]}^T
#
# which is gatherable from the stacked per-offset table
# [stack_k(ct @ W_k^T)] exactly like the fused transpose-conv FORWARD
# (_conv_tr_chunk_core) — no scatter anywhere.  (k3s2 maps overlap, children
# have multiple parents; those use _conv_chunk_down_fused's scatter form.)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _conv_chunk_down2(features, nbr, up_parent, up_offset, weights, group):
    return _conv_chunk_down_fused_core(features, nbr, weights, group)


def _conv_chunk_down2_fwd(features, nbr, up_parent, up_offset, weights,
                          group):
    return (
        _conv_chunk_down_fused_core(features, nbr, weights, group),
        (features, nbr, up_parent, up_offset, weights),
    )


def _conv_chunk_down2_bwd(group, res, ct):
    features, nbr, up_parent, up_offset, weights = res
    k, b_, s_out = nbr.shape
    cin, cout = weights.shape[1], weights.shape[2]
    f3 = _chunk_view(features, b_)
    ct3 = ct.reshape(b_, s_out, cout)
    groups = _offset_groups(k, None, group)
    f32 = jnp.float32
    # dF: one gather per chunk from the stacked [K*S_out, Cin] table.
    # Coarse pad rows carry zero cotangent (mask_rows' adjoint), so the pad
    # fine rows' (offset 0, pad parent) entry reads a zero row.  The fine
    # PAD row's dF differs from the scan core's (which sums every
    # missing-child slot into it) — both are garbage-by-design there: the
    # upstream producer masks (bn) or has zero-gradient at the zero pad
    # activation (relu), so pad cotangents die one op earlier either way.
    tables = jnp.einsum(
        "bsd,kdc->bksc", ct3, weights.transpose(0, 2, 1).astype(ct3.dtype),
        preferred_element_type=f32,
    ).reshape(b_, k * s_out, cin)
    idx = up_offset.astype(jnp.int32) * s_out + up_parent.astype(jnp.int32)
    df = jnp.stack(
        [_take_rows(tables[b], idx[b]) for b in range(b_)]
    ).reshape(features.shape).astype(features.dtype)
    # dW: re-take the im2col block per group (residual-lean), col^T @ ct
    dw = jnp.zeros((k, cin, cout), f32)
    for b in range(b_):
        ctb = ct3[b]
        for ga in groups:
            col, _ = _down_col(f3[b], nbr, b, ga)
            dw_g = jnp.dot(col.astype(f32).T, ctb.astype(f32),
                           preferred_element_type=f32)
            dw = dw.at[np.asarray(ga, np.int32)].add(
                dw_g.reshape(len(ga), cin, cout)
            )
    return df, None, None, None, dw.astype(weights.dtype)


_conv_chunk_down2.defvjp(_conv_chunk_down2_fwd, _conv_chunk_down2_bwd)


def sparse_conv(
    features: jnp.ndarray,  # [N_in, Cin], padded rows zero
    nbr: jnp.ndarray,  # [K, N_out] gather indices into N_in (pad row for missing)
    weights: jnp.ndarray,  # [K, Cin, Cout]
    bias: jnp.ndarray | None = None,  # [Cout]
    valid_out: jnp.ndarray | None = None,  # [N_out] float mask
    rev: tuple | None = None,  # offset-reversal perm (same-level maps only)
    up: tuple | None = None,  # (up_parent, up_offset) for k2s2 down maps:
    # enables the fully scatter-free fused backward (_conv_chunk_down2)
) -> jnp.ndarray:
    """Generalized sparse convolution as K accumulated matmul+gather steps.

    Uses the identity gather(F, nbr_k) @ W_k == gather(F @ W_k, nbr_k): each
    scan step is one large MXU matmul [N_in, Cin] @ [Cin, Cout] followed by a
    row gather and accumulate.  Peak temp is [N, Cout] instead of the
    [N, K*Cin] a materialized im2col gather would need (27x smaller — the
    all-at-once form OOMs a 16 GB chip on ScanNet-sized batches).

    Covers stride-1 convs (nbr = same-level map, N_out == N_in) and stride-2
    downsampling convs (nbr = down map, N_out = coarse level size).

    rev: ``kernel_map.reversal_permutation`` of the kernel's offsets.  Only
    valid for same-level maps (N_out == N_in) with ``valid_out`` masking;
    enables the scatter-free custom backward (see ``_conv_sym_bwd``).
    """
    if nbr.ndim == 3:  # chunked layout: nbr [K, B, S] frame-local
        k, b_, s_out = nbr.shape
        if (
            rev is not None
            and b_ * s_out == features.shape[0]
            and valid_out is not None
        ):
            g = _fused_group()
            if g:
                out = _conv_chunk_fused(
                    features, nbr, weights, tuple(rev), g
                )
            else:
                out = _conv_chunk_sym(features, nbr, weights, tuple(rev))
        else:
            g = _fused_group()
            # up is only passed for k2s2 transitions (caller contract):
            # the functional child->(parent, offset) identity needs it
            if g and up is not None and getattr(up[0], "ndim", 0) == 2:
                out = _conv_chunk_down2(
                    features, nbr, up[0], up[1], weights, g
                )
            elif g:
                out = _conv_chunk_down_fused(features, nbr, weights, g)
            else:
                out = _conv_chunk_core(features, nbr, weights)
        if bias is not None:
            out = out + bias
        if valid_out is not None:
            out = mask_rows(out, valid_out)
        return out

    k, n_out = nbr.shape
    cout = weights.shape[-1]

    if k == 1:
        y = jnp.dot(features, weights[0], preferred_element_type=jnp.float32)
        out = _take_rows(y, nbr[0]).astype(features.dtype)
    elif (
        rev is not None
        and n_out == features.shape[0]
        and valid_out is not None
    ):
        out = _conv_sym(features, nbr, weights, tuple(rev))
    else:
        out = _conv_core(features, nbr, weights)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def _conv_tr_chunk_core(features, up_parent, up_offset, weights):
    """Fused chunked transposed conv: ONE gather per slice from the stacked
    per-offset table instead of K gathers + select masks.

    Each fine voxel has exactly one (parent, offset) pair (topology.py:17-19),
    so with ys[b] = stack_k(F_b @ W_k) reshaped to [K*S_c, Cout], the output
    row i is ys[b][up_offset[i] * S_c + up_parent[i]] — K (=8) times fewer
    gathered rows than the scan-over-offsets form, and no [B, S_fine, Cout]
    select-mask temporaries.  Pad fine rows index (offset 0, coarse pad row),
    whose table row is zero because pad features are zero."""
    k, cin, cout = weights.shape
    b_, s_fine = up_parent.shape
    f3 = _chunk_view(features, b_)  # [B, S_c, Cin]
    s_c = f3.shape[1]
    ys = jnp.einsum(
        "bsc,kcd->bksd", f3, weights, preferred_element_type=jnp.float32
    ).astype(features.dtype)
    ys = ys.reshape(b_, k * s_c, cout)
    idx = up_offset.astype(jnp.int32) * s_c + up_parent.astype(jnp.int32)
    g = jnp.stack([_take_rows(ys[b], idx[b]) for b in range(b_)])
    return g.reshape(b_ * s_fine, cout)


@jax.custom_vjp
def _conv_tr_chunk(features, up_parent, up_offset, weights):
    return _conv_tr_chunk_core(features, up_parent, up_offset, weights)


def _conv_tr_chunk_fwd(features, up_parent, up_offset, weights):
    return (
        _conv_tr_chunk_core(features, up_parent, up_offset, weights),
        (features, up_parent, up_offset, weights),
    )


def _conv_tr_chunk_bwd(res, ct):
    """Input-residual backward: ONE scatter-add of the S_fine cotangent rows
    into the stacked [K*S_c, Cout] table per slice (the (offset, parent)
    pairs of a sample's valid rows are unique, and pad rows -- which all
    alias (0, pad) -- carry zero cotangent because consumers mask), then two
    einsums.  Autodiff of the scan form instead pays K scatter-adds plus a
    [K, B, S_c, Cout] residual stack held across the whole backward."""
    features, up_parent, up_offset, weights = res
    k, cin, cout = weights.shape
    b_, s_fine = up_parent.shape
    f3 = _chunk_view(features, b_)
    s_c = f3.shape[1]
    f32 = jnp.float32
    ct3 = ct.reshape(b_, s_fine, cout)
    idx = up_offset.astype(jnp.int32) * s_c + up_parent.astype(jnp.int32)
    dy = jnp.stack(
        [
            jnp.zeros((k * s_c, cout), f32).at[idx[b]].add(
                ct3[b].astype(f32)
            )
            for b in range(b_)
        ]
    ).reshape(b_, k, s_c, cout)
    df = jnp.einsum(
        "bksd,kcd->bsc", dy, weights.astype(f32), preferred_element_type=f32
    )
    dw = jnp.einsum(
        "bsc,bksd->kcd", f3.astype(f32), dy, preferred_element_type=f32
    )
    return (
        df.reshape(features.shape).astype(features.dtype),
        None,
        None,
        dw.astype(weights.dtype),
    )


_conv_tr_chunk.defvjp(_conv_tr_chunk_fwd, _conv_tr_chunk_bwd)


def sparse_conv_transpose(
    features: jnp.ndarray,  # [N_coarse, Cin], padded rows zero
    up_parent: jnp.ndarray,  # [N_fine] index of each fine voxel's coarse parent
    up_offset: jnp.ndarray,  # [N_fine] kernel offset id in [0, K)
    weights: jnp.ndarray,  # [K, Cin, Cout]
    bias: jnp.ndarray | None = None,
    valid_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stride-2 kernel-2 transposed conv producing the (reused) finer-level
    coordinate set, as in ME's decoder convs (res16unet.py:263-266 via
    coords_key reuse).  Each fine output has exactly one coarse parent and one
    kernel offset, so this is: per-parent matmul against all K kernel slices
    followed by a per-row offset select.

    Memory-lean scan form (like ``sparse_conv``): per offset k, compute
    F @ W_k once on the coarse level, gather parents, and keep only rows
    whose offset id is k — peak temp [N_fine, Cout] instead of
    [N_fine, K*Cout].

    Chunked layout: ``up_parent``/``up_offset`` arrive as [B, S_fine] with
    frame-local parent slots; the fused form (_conv_tr_chunk) gathers ONE
    row per fine voxel from the stacked [K*S_coarse, Cout] per-offset table
    and differentiates through a single-scatter custom VJP."""
    k, cin, cout = weights.shape

    if up_parent.ndim == 2:  # chunked layout
        out = _conv_tr_chunk(features, up_parent, up_offset, weights)
        if bias is not None:
            out = out + bias
        if valid_out is not None:
            out = mask_rows(out, valid_out)
        return out

    n_fine = up_parent.shape[0]

    def body(acc, inputs):
        w_k, k_idx = inputs
        y = jnp.dot(features, w_k, preferred_element_type=jnp.float32)
        g = _take_rows(y, up_parent)  # [N_fine, Cout]
        sel = (up_offset == k_idx).astype(jnp.float32)[:, None]
        return acc + g * sel, None

    acc0 = jnp.zeros((n_fine, cout), jnp.float32)
    out, _ = jax.lax.scan(
        body, acc0, (weights, jnp.arange(k, dtype=up_offset.dtype))
    )
    out = out.astype(features.dtype)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def _chunk_take(features, idx):
    """Per-slice row gather: features [N, C] viewed as [B, S_in, C], idx
    [B, S_out] frame-local -> [B * S_out, C]."""
    b_ = idx.shape[0]
    f3 = _chunk_view(features, b_)
    out = jnp.stack([_take_rows(f3[b], idx[b]) for b in range(b_)])
    return out.reshape(b_ * idx.shape[1], features.shape[-1])


def sparse_sum_pool(
    features: jnp.ndarray, down_nbr: jnp.ndarray, valid_out: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Kernel-2 stride-2 sum pooling (ME.MinkowskiSumPooling equivalent)."""
    if down_nbr.ndim == 3:  # chunked: [K, B, S_out]
        k = down_nbr.shape[0]
        out = sum(_chunk_take(features, down_nbr[i]) for i in range(k))
    else:
        k, n_out = down_nbr.shape
        g = _take_rows(features, down_nbr.reshape(-1))
        out = g.reshape(k, n_out, -1).sum(axis=0)
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def sparse_avg_pool(
    features: jnp.ndarray,
    down_nbr: jnp.ndarray,
    valid_in: jnp.ndarray,
    valid_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Kernel-2 stride-2 average pooling over *present* children, matching
    ME.MinkowskiAvgPooling's divide-by-kernel-occupancy semantics."""
    if down_nbr.ndim == 3:  # chunked: [K, B, S_out]
        k = down_nbr.shape[0]
        total = sum(_chunk_take(features, down_nbr[i]) for i in range(k))
        cnt = sum(
            _chunk_take(valid_in[:, None], down_nbr[i]) for i in range(k)
        )
        out = total / jnp.maximum(cnt, 1.0).astype(total.dtype)
        if valid_out is not None:
            out = mask_rows(out, valid_out)
        return out
    k, n_out = down_nbr.shape
    g = _take_rows(features, down_nbr.reshape(-1)).reshape(k, n_out, -1)
    cnt = _take_rows(valid_in, down_nbr.reshape(-1)).reshape(k, n_out)
    total = g.sum(axis=0)
    denom = jnp.maximum(cnt.sum(axis=0), 1.0)[:, None]
    out = total / denom.astype(total.dtype)
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def sparse_avg_unpool(
    features: jnp.ndarray,  # [N_coarse, C]
    up_parent: jnp.ndarray,  # [N_fine] (chunked: [B, S_fine] frame-local)
    valid_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Kernel-2 stride-2 average unpooling: broadcast the parent value to each
    child (ME.MinkowskiAvgUnpooling equivalent for the reused coord set)."""
    if up_parent.ndim == 2:  # chunked layout
        out = _chunk_take(features, up_parent)
    else:
        out = _take_rows(features, up_parent)
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def global_pool(
    features: jnp.ndarray,  # [N, C], padded rows zero
    batch: jnp.ndarray,  # [N] int sample ids (padding rows -> num_batch)
    num_batch: int,
    average: bool = True,
) -> jnp.ndarray:
    """Per-sample global pooling (ME.MinkowskiGlobalPooling equivalent).

    Returns [num_batch, C]; the padding segment is dropped."""
    sums = jax.ops.segment_sum(features, batch, num_segments=num_batch + 1)
    sums = sums[:num_batch]
    if average:
        ones = (batch < num_batch).astype(features.dtype)
        counts = jax.ops.segment_sum(ones, batch, num_segments=num_batch + 1)[
            :num_batch
        ]
        sums = sums / jnp.maximum(counts, 1.0)[:, None]
    return sums


def broadcast_to_points(
    per_sample: jnp.ndarray,  # [num_batch, C]
    batch: jnp.ndarray,  # [N]
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Broadcast per-sample values back to voxels (ME.MinkowskiBroadcast*)."""
    num_batch = per_sample.shape[0]
    idx = jnp.minimum(batch, num_batch - 1)
    out = jnp.take(per_sample, idx, axis=0)
    if valid is not None:
        out = mask_rows(out, valid)
    return out


def masked_moments(features: jnp.ndarray, valid: jnp.ndarray):
    """Mean/variance over valid rows only (padding-aware BatchNorm stats).

    Returns (mean[C], var[C] biased, n scalar)."""
    v = valid.astype(jnp.float32)[:, None]
    n = jnp.maximum(v.sum(), 1.0)
    f = features.astype(jnp.float32)
    mean = (f * v).sum(axis=0) / n
    var = (jnp.square(f - mean) * v).sum(axis=0) / n
    return mean, var, n
