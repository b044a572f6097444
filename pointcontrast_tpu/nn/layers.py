"""Core sparse layers as flax.linen modules.

Replaces the MinkowskiEngine layer surface used by the reference
(ME.MinkowskiConvolution / ConvolutionTranspose / BatchNorm / InstanceNorm /
ReLU / GlobalPooling / Broadcast*, SURVEY.md section 2.7; built at
/root/reference/pretrain/pointcontrast/model/modules/common.py:117-167 and
/root/reference/downstream/semseg/lib/layers.py:12-90).

Conventions:
  - features are [Npad, C]; padded rows are kept at exactly zero
    (ops that break this -- bias, norm -- re-mask their output).
  - norms keep statistics in float32 regardless of compute dtype.
  - BatchNorm follows torch semantics: running = (1-m)*running + m*batch,
    with the unbiased batch variance entering the running average
    (bn_momentum = 0.05 in the reference pretrain config, defaults.yaml:55).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcontrast_tpu.sparse import brick, ops


def kernel_init(key, shape, dtype=jnp.float32):
    """He/fan-in normal over the full receptive field (K * Cin)."""
    if len(shape) == 3:
        fan_in = shape[0] * shape[1]
    else:
        fan_in = shape[0]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """Generalized sparse convolution: one gather + one MXU matmul.

    ``nbr`` decides the geometry: a same-level map gives a stride-1 conv, a
    down map gives a strided conv (output on the coarser level)."""

    out_channels: int
    kernel_volume: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, nbr, valid_out, rev=None, up=None):
        cin = features.shape[-1]
        w = self.param(
            "kernel", kernel_init, (self.kernel_volume, cin, self.out_channels)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        w = w.astype(self.dtype)
        b = None if b is None else b.astype(self.dtype)
        f = features.astype(self.dtype)
        # The map object decides the layout: same weights, same semantics.
        if isinstance(nbr, brick.BrickMap):
            # brick_conv differentiates through a scatter-free custom VJP
            # whose only residuals are its inputs -- no remat needed (plain
            # autodiff would save all 27 gathered brick-row tensors per conv
            # and OOM the backward at ScanNet scale).
            return brick.brick_conv(f, nbr.nbr, w, nbr.plan, bias=b,
                                    valid_out=valid_out)
        if isinstance(nbr, brick.BrickDownMap):
            return brick.brick_down_conv(f, nbr.place, w, bias=b,
                                         valid_out=valid_out)
        return ops.sparse_conv(f, nbr, w, bias=b, valid_out=valid_out,
                               rev=rev, up=up)


class SparseConvTranspose(nn.Module):
    """Stride-2 kernel-2 transposed conv onto the reused finer level."""

    out_channels: int
    kernel_volume: int = 8
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, up_parent, up_offset, valid_out):
        cin = features.shape[-1]
        w = self.param(
            "kernel", kernel_init, (self.kernel_volume, cin, self.out_channels)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        if up_offset is None:  # brick layout: up_parent is the flat up-gather
            return brick.brick_up_conv(
                features.astype(self.dtype),
                up_parent,
                w.astype(self.dtype),
                bias=None if b is None else b.astype(self.dtype),
                valid_out=valid_out,
            )
        return ops.sparse_conv_transpose(
            features.astype(self.dtype),
            up_parent,
            up_offset,
            w.astype(self.dtype),
            bias=None if b is None else b.astype(self.dtype),
            valid_out=valid_out,
        )


class SparseLinear(nn.Module):
    """1x1 conv == per-voxel linear map (no gather)."""

    out_channels: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, valid):
        cin = features.shape[-1]
        w = self.param("kernel", kernel_init, (cin, self.out_channels))
        out = jnp.dot(
            features.astype(self.dtype),
            w.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b.astype(self.dtype)
        return ops.mask_rows(out, valid)


class MaskedBatchNorm(nn.Module):
    """Padding-aware BatchNorm with torch running-stat semantics.

    The reference wraps DDP with broadcast_buffers=False
    (ddp_trainer.py:101), i.e. per-replica BN; under shard_map each device
    normalizes over its own shard, which matches that exactly."""

    momentum: float = 0.05
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, valid, train: bool = True):
        c = features.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )

        if train:
            mean, var, n = ops.masked_moments(features, valid)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (features.astype(jnp.float32) - mean) * inv
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return ops.mask_rows(out.astype(self.dtype), valid)


class SparseInstanceNorm(nn.Module):
    """Per-sample (per point cloud) normalization, built from global pooling
    + broadcast like the reference's MinkowskiInstanceNorm
    (/root/reference/downstream/semseg/lib/layers.py:49-90)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, valid, batch, num_batch: int):
        c = features.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        f = features.astype(jnp.float32)
        mean = ops.global_pool(f, batch, num_batch, average=True)
        mean_b = ops.broadcast_to_points(mean, batch)
        centered = ops.mask_rows(f - mean_b, valid)
        var = ops.global_pool(jnp.square(centered), batch, num_batch, average=True)
        inv = ops.broadcast_to_points(jax.lax.rsqrt(var + self.epsilon), batch)
        out = centered * inv * scale + bias
        return ops.mask_rows(out.astype(self.dtype), valid)


class SparseLayerNorm(nn.Module):
    """Global (per batch-sample) layer norm over voxels, matching the
    reference's MinkowskiLayerNorm (semseg lib/layers.py:12-46)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, valid, batch, num_batch: int):
        # The reference normalizes per sample with SCALAR moments over all
        # voxels and channels jointly: mean = glob_mean(x).mean(-1),
        # var = glob_mean((x - mean)^2).mean(-1), out = (x - mean) /
        # sqrt(var + eps) * w + b (lib/layers.py:41-51).
        c = features.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        f = features.astype(jnp.float32)
        mean = ops.global_pool(f, batch, num_batch, average=True)  # [B, C]
        mean = mean.mean(-1, keepdims=True)  # [B, 1] scalar per sample
        centered = ops.mask_rows(
            f - ops.broadcast_to_points(
                jnp.broadcast_to(mean, (num_batch, c)), batch),
            valid,
        )
        var = ops.global_pool(
            centered * centered, batch, num_batch, average=True
        ).mean(-1, keepdims=True)  # [B, 1]
        instd = 1.0 / jnp.sqrt(var + self.epsilon)
        out = centered * ops.broadcast_to_points(
            jnp.broadcast_to(instd, (num_batch, c)), batch
        ) * scale + bias
        return ops.mask_rows(out.astype(self.dtype), valid)


def relu(features):
    """ReLU preserves the zero-padding invariant; no re-mask needed."""
    return jax.nn.relu(features)


def l2_normalize_rows(features, valid, eps: float = 1e-12):
    """Row-wise L2 normalization with a guard so padded (all-zero) rows stay
    zero (the reference divides by the raw norm, res16unet.py:262-266).

    Implemented as x * rsqrt(max(sum x^2, eps)) — sqrt's gradient at exactly
    zero is NaN, and even a masked-out NaN poisons the backward pass
    (0 * NaN = NaN), so the clamp must happen *inside* the sqrt."""
    sq = jnp.sum(jnp.square(features.astype(jnp.float32)), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, eps))
    out = features * inv.astype(features.dtype)
    return ops.mask_rows(out, valid)
