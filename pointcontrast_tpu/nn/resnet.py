"""ResNet family: strided sparse residual classifiers/encoders.

Mirrors /root/reference/downstream/semseg/models/resnet.py:15-170: stem conv
-> BN -> ReLU -> k2s2 sum pool -> 4 stride-2 residual layers -> 1x1 head at
pixel-dist 32.  The stride-2 first block of each layer uses a kernel-3
stride-2 conv (down_nbr3 map) with a 1x1 stride-2 shortcut (the center child
row of the k2s2 map), exactly ResNetBase._make_layer's downsample rule
(resnet.py:99-130).

Needs ``build_pyramid(num_levels>=6, build_down3=True)``.
"""
from __future__ import annotations

from typing import Any, ClassVar

from flax import linen as nn

from pointcontrast_tpu.nn.resnet_block import BasicBlock, Bottleneck
from pointcontrast_tpu.nn.layers import (
    MaskedBatchNorm,
    SparseConv,
    SparseLinear,
    relu,
)
from pointcontrast_tpu.sparse import ops

NUM_LEVELS = 6  # strides 1, 2, 4, 8, 16, 32


class _StridedBlock(nn.Module):
    """First block of a stride-2 layer (BasicBlock or Bottleneck shape)."""

    planes: int
    bottleneck: bool
    bn_momentum: float = 0.05
    dtype: Any = None

    @nn.compact
    def __call__(self, x, down_nbr3, down_center, nbr_out, valid_in,
                 valid_out, train):
        dtype = self.dtype or x.dtype
        exp = 4 if self.bottleneck else 1

        def bn(name):
            return MaskedBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        if self.bottleneck:
            # 1x1 s1 (fine level) -> 3x3 s2 (down_nbr3) -> 1x1: conv2
            # carries the stride, matching the reference BottleneckBase
            # (semseg models/modules/resnet_block.py:89-105).
            out = SparseLinear(self.planes, use_bias=False, dtype=dtype,
                               name="conv1")(x, valid_in)
            out = relu(bn("norm1")(out, valid_in, train))
            out = SparseConv(
                self.planes, down_nbr3.shape[0], dtype=dtype, name="conv2"
            )(out, down_nbr3, valid_out)
            out = relu(bn("norm2")(out, valid_out, train))
            out = SparseLinear(self.planes * exp, use_bias=False, dtype=dtype,
                               name="conv3")(out, valid_out)
            out = bn("norm3")(out, valid_out, train)
        else:
            # 3x3 s2 -> 3x3 s1
            out = SparseConv(
                self.planes, down_nbr3.shape[0], dtype=dtype, name="conv1"
            )(x, down_nbr3, valid_out)
            out = relu(bn("norm1")(out, valid_out, train))
            out = SparseConv(self.planes, nbr_out.shape[0], dtype=dtype, name="conv2")(
                out, nbr_out, valid_out
            )
            out = bn("norm2")(out, valid_out, train)

        residual = SparseConv(
            self.planes * exp, 1, dtype=dtype, name="downsample_conv"
        )(x, down_center, valid_out)
        residual = bn("downsample_norm")(residual, valid_out, train)
        return relu(out + residual)


class ResNetBase(nn.Module):
    in_channels: int
    out_channels: int
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.05
    dtype: Any = None
    dimension: int = 3

    BLOCK: ClassVar = None  # BasicBlock or Bottleneck (stride-1 blocks)
    LAYERS = ()
    INIT_DIM = 64
    PLANES = (64, 128, 256, 512)
    OUT_PIXEL_DIST = 32

    @nn.compact
    def __call__(self, features, pyramid, train: bool = True):
        dtype = self.dtype or features.dtype
        lv = pyramid.levels
        assert len(lv) >= NUM_LEVELS, "ResNet needs a 6-level pyramid"
        assert lv[1].down_nbr3 is not None, (
            "ResNet needs build_pyramid(build_down3=True)"
        )
        bottleneck = self.BLOCK is Bottleneck

        assert self.conv1_kernel_size == 3 or lv[0].nbr0 is not None, (
            f"conv1_kernel_size={self.conv1_kernel_size} requires a pyramid "
            "built with the same conv0_kernel_size (got no nbr0 map)"
        )
        nbr0 = lv[0].nbr0 if lv[0].nbr0 is not None else lv[0].nbr
        out = SparseConv(self.INIT_DIM, nbr0.shape[0], dtype=dtype, name="conv1")(
            features.astype(dtype), nbr0, lv[0].valid,
            getattr(lv[0], "rev0", None) if lv[0].nbr0 is not None
            else getattr(lv[0], "rev", None),
        )
        out = relu(
            MaskedBatchNorm(self.bn_momentum, dtype=dtype, name="bn1")(
                out, lv[0].valid, train
            )
        )
        # k2s2 sum pool to level 1 (resnet.py:54,136)
        out = ops.sparse_sum_pool(out, lv[0].down_nbr, lv[1].valid)

        for i in range(4):
            src, dst = lv[1 + i], lv[2 + i]
            out = _StridedBlock(
                planes=self.PLANES[i],
                bottleneck=bottleneck,
                bn_momentum=self.bn_momentum,
                dtype=dtype,
                name=f"layer{i + 1}_0",
            )(
                out, src.down_nbr3, src.down_nbr[0:1], dst.nbr,
                src.valid, dst.valid, train,
            )
            for b in range(1, self.LAYERS[i]):
                out = self.BLOCK(
                    planes=self.PLANES[i],
                    kernel_volume=dst.nbr.shape[0],
                    bn_momentum=self.bn_momentum,
                    dtype=dtype,
                    name=f"layer{i + 1}_{b}",
                )(out, dst.nbr, dst.valid, train, rev=getattr(dst, "rev", None))

        return SparseLinear(
            self.out_channels, use_bias=True, dtype=dtype, name="final"
        )(out, lv[5].valid)


class ResNet14(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (3, 4, 6, 3)


class ResNet50(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 6, 3)


class ResNet101(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 23, 3)


# --- 4D spatio-temporal variants (semseg models/resnet.py:172-220):
#     pyramids built with dimension=4, region='hybrid' (or 'hypercube' for
#     the Tesseract variants) and stride_axes=(1,1,1,0). ---


class STResNetBase(ResNetBase):
    dimension: int = 4


class STResNet14(STResNetBase, ResNet14):
    pass


class STResNet18(STResNetBase, ResNet18):
    pass


class STResNet34(STResNetBase, ResNet34):
    pass


class STResNet50(STResNetBase, ResNet50):
    pass


class STResNet101(STResNetBase, ResNet101):
    pass


class STResTesseractNetBase(STResNetBase):
    """Full 4D hypercube kernels."""


class STResTesseractNet14(STResTesseractNetBase, STResNet14):
    pass


class STResTesseractNet18(STResTesseractNetBase, STResNet18):
    pass


class STResTesseractNet34(STResTesseractNetBase, STResNet34):
    pass


class STResTesseractNet50(STResTesseractNetBase, STResNet50):
    pass


class STResTesseractNet101(STResTesseractNetBase, STResNet101):
    pass
