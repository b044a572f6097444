"""Squeeze-and-Excitation sparse blocks.

Mirrors /root/reference/downstream/votenet_det_new/models/backbone/
sparseconv/models/modules/senet_block.py:14-80: SELayer = per-sample global
average pool -> FC bottleneck -> sigmoid gate -> broadcast multiply;
SEBasicBlock applies the gate after norm2.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from pointcontrast_tpu.nn.layers import MaskedBatchNorm, SparseConv, SparseLinear, relu
from pointcontrast_tpu.sparse import ops


class SELayer(nn.Module):
    channel: int
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid, batch, num_batch: int):
        dtype = self.dtype or x.dtype
        y = ops.global_pool(x, batch, num_batch, average=True)  # [B, C]
        y = nn.Dense(max(self.channel // self.reduction, 1), name="fc1",
                     dtype=dtype)(y)
        y = relu(y)
        y = nn.Dense(self.channel, name="fc2", dtype=dtype)(y)
        y = jax.nn.sigmoid(y)
        gate = ops.broadcast_to_points(y, batch, valid)
        return x * gate


class SEBasicBlock(nn.Module):
    planes: int
    kernel_volume: int = 27
    bn_momentum: float = 0.05
    reduction: int = 16
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool = True, batch=None,
                 num_batch: int = 1, rev=None):
        dtype = self.dtype or x.dtype
        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(x, nbr, valid, rev)
        out = MaskedBatchNorm(self.bn_momentum, dtype=dtype)(out, valid, train)
        out = relu(out)
        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(out, nbr, valid, rev)
        out = MaskedBatchNorm(self.bn_momentum, dtype=dtype)(out, valid, train)
        out = SELayer(self.planes, self.reduction, dtype=dtype, name="se")(
            out, valid, batch, num_batch
        )
        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseLinear(
                self.planes * self.expansion, use_bias=False, dtype=dtype,
                name="downsample_conv",
            )(x, valid)
            residual = MaskedBatchNorm(
                self.bn_momentum, dtype=dtype, name="downsample_norm"
            )(residual, valid, train)
        else:
            residual = x
        return relu(out + residual)


class SEBottleneck(nn.Module):
    planes: int
    kernel_volume: int = 27
    bn_momentum: float = 0.05
    reduction: int = 16
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool = True, batch=None,
                 num_batch: int = 1, rev=None):
        dtype = self.dtype or x.dtype

        def bn(name):
            return MaskedBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        out = SparseLinear(self.planes, use_bias=False, dtype=dtype)(x, valid)
        out = relu(bn("norm1")(out, valid, train))
        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(out, nbr, valid, rev)
        out = relu(bn("norm2")(out, valid, train))
        out = SparseLinear(self.planes * self.expansion, use_bias=False, dtype=dtype)(
            out, valid
        )
        out = bn("norm3")(out, valid, train)
        out = SELayer(
            self.planes * self.expansion, self.reduction, dtype=dtype, name="se"
        )(out, valid, batch, num_batch)
        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseLinear(
                self.planes * self.expansion, use_bias=False, dtype=dtype,
                name="downsample_conv",
            )(x, valid)
            residual = bn("downsample_norm")(residual, valid, train)
        else:
            residual = x
        return relu(out + residual)
