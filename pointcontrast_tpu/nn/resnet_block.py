"""Residual blocks for sparse U-Nets.

Mirrors /root/reference/pretrain/pointcontrast/model/modules/resnet_block.py
(BasicBlock: two k=3 convs, expansion 1; Bottleneck: 1-3-1, expansion 4),
with the same downsample rule as ResNetBase._make_layer (resnet.py:99-140):
a 1x1 conv + norm shortcut whenever the channel count changes."""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from pointcontrast_tpu.nn.layers import (
    MaskedBatchNorm,
    SparseConv,
    SparseInstanceNorm,
    SparseLinear,
    relu,
)


class InstanceBatchNorm(nn.Module):
    """InstanceNorm followed by BatchNorm (reference NormType
    INSTANCE_BATCH_NORM, downstream/semseg/models/modules/common.py:24-27)."""

    momentum: float = 0.05
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid, train=True, batch=None, num_batch=1):
        x = SparseInstanceNorm(dtype=self.dtype, name="inorm")(
            x, valid, batch, num_batch
        )
        return MaskedBatchNorm(self.momentum, dtype=self.dtype, name="bnorm")(
            x, valid, train
        )


class BasicBlock(nn.Module):
    planes: int
    kernel_volume: int = 27
    bn_momentum: float = 0.05
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


class Bottleneck(nn.Module):
    planes: int
    kernel_volume: int = 27
    bn_momentum: float = 0.05
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool = True, batch=None,
                 num_batch: int = 1, rev=None):
        dtype = self.dtype or x.dtype
        out = SparseLinear(self.planes, use_bias=False, dtype=dtype)(x, valid)
        out = MaskedBatchNorm(self.bn_momentum, dtype=dtype)(out, valid, train)
        out = relu(out)
        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(out, nbr, valid, rev)
        out = MaskedBatchNorm(self.bn_momentum, dtype=dtype)(out, valid, train)
        out = relu(out)
        out = SparseLinear(self.planes * self.expansion, use_bias=False, dtype=dtype)(
            out, valid
        )
        out = MaskedBatchNorm(self.bn_momentum, dtype=dtype)(out, valid, train)

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


class BasicBlockINBN(nn.Module):
    """BasicBlock with InstanceNorm+BatchNorm (reference resnet_block.py
    BasicBlockINBN, NormType.INSTANCE_BATCH_NORM)."""

    planes: int
    kernel_volume: int = 27
    bn_momentum: float = 0.05
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool = True, batch=None,
                 num_batch: int = 1, rev=None):
        dtype = self.dtype or x.dtype

        def norm(name):
            return InstanceBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(x, nbr, valid, rev)
        out = norm("norm1")(out, valid, train, batch, num_batch)
        out = relu(out)
        out = SparseConv(self.planes, self.kernel_volume, dtype=dtype)(out, nbr, valid, rev)
        out = norm("norm2")(out, valid, train, batch, num_batch)
        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseLinear(
                self.planes * self.expansion, use_bias=False, dtype=dtype,
                name="downsample_conv",
            )(x, valid)
            residual = norm("downsample_norm")(
                residual, valid, train, batch, num_batch
            )
        else:
            residual = x
        return relu(out + residual)
