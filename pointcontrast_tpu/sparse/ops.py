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

import jax
import jax.numpy as jnp


def mask_rows(features: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows. valid: [N] float (1 valid / 0 pad)."""
    return features * valid[:, None].astype(features.dtype)


def sparse_conv(
    features: jnp.ndarray,  # [N_in, Cin], padded rows zero
    nbr: jnp.ndarray,  # [K, N_out] gather indices into N_in (pad row for missing)
    weights: jnp.ndarray,  # [K, Cin, Cout]
    bias: jnp.ndarray | None = None,  # [Cout]
    valid_out: jnp.ndarray | None = None,  # [N_out] float mask
) -> jnp.ndarray:
    """Generalized sparse convolution as K accumulated matmul+gather steps.

    Uses the identity gather(F, nbr_k) @ W_k == gather(F @ W_k, nbr_k): each
    scan step is one large MXU matmul [N_in, Cin] @ [Cin, Cout] followed by a
    row gather and accumulate.  Peak temp is [N, Cout] instead of the
    [N, K*Cin] a materialized im2col gather would need (27x smaller — the
    all-at-once form OOMs a 16 GB chip on ScanNet-sized batches).

    Covers stride-1 convs (nbr = same-level map, N_out == N_in) and stride-2
    downsampling convs (nbr = down map, N_out = coarse level size).
    """
    k, n_out = nbr.shape
    cin = features.shape[-1]
    cout = weights.shape[-1]

    if k == 1:
        y = jnp.dot(features, weights[0], preferred_element_type=jnp.float32)
        out = jnp.take(y, nbr[0], axis=0)
    else:
        def body(acc, inputs):
            w_k, nbr_k = inputs
            y = jnp.dot(features, w_k, preferred_element_type=jnp.float32)
            return acc + jnp.take(y, nbr_k, axis=0), None

        acc0 = jnp.zeros((n_out, cout), jnp.float32)
        out, _ = jax.lax.scan(body, acc0, (weights, nbr))
    out = out.astype(features.dtype)
    if bias is not None:
        out = out + bias
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


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
    [N_fine, K*Cout]."""
    k, cin, cout = weights.shape
    n_fine = up_parent.shape[0]

    def body(acc, inputs):
        w_k, k_idx = inputs
        y = jnp.dot(features, w_k, preferred_element_type=jnp.float32)
        g = jnp.take(y, up_parent, axis=0)  # [N_fine, Cout]
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


def sparse_sum_pool(
    features: jnp.ndarray, down_nbr: jnp.ndarray, valid_out: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Kernel-2 stride-2 sum pooling (ME.MinkowskiSumPooling equivalent)."""
    k, n_out = down_nbr.shape
    g = jnp.take(features, down_nbr.reshape(-1), axis=0)
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
    k, n_out = down_nbr.shape
    g = jnp.take(features, down_nbr.reshape(-1), axis=0).reshape(k, n_out, -1)
    cnt = jnp.take(valid_in, down_nbr.reshape(-1), axis=0).reshape(k, n_out)
    total = g.sum(axis=0)
    denom = jnp.maximum(cnt.sum(axis=0), 1.0)[:, None]
    out = total / denom.astype(total.dtype)
    if valid_out is not None:
        out = mask_rows(out, valid_out)
    return out


def sparse_avg_unpool(
    features: jnp.ndarray,  # [N_coarse, C]
    up_parent: jnp.ndarray,  # [N_fine]
    valid_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Kernel-2 stride-2 average unpooling: broadcast the parent value to each
    child (ME.MinkowskiAvgUnpooling equivalent for the reused coord set)."""
    out = jnp.take(features, up_parent, axis=0)
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
