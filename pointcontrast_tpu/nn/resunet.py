"""MinkUNet / ResUNet family: 6-stage sparse U-Net over a 4-level pyramid.

Mirrors /root/reference/downstream/semseg/models/resunet.py:17-272
(MinkUNetBase: stem conv -> 3x [k2s2 conv + BN + ReLU + residual stage]
encoder -> 3x [k2s2 transpose conv + BN + ReLU + skip-concat (+ stage)]
decoder -> 1x1x512-BN-ReLU -> 1x1 head).  Note the reference applies block5/6
*before* the next transpose conv and the last skip concat feeds the final MLP
directly (resunet.py:175-221).

TPU-native: same gather-GEMM execution as res16unet; needs
``build_pyramid(num_levels>=4)``.
"""
from __future__ import annotations

from typing import Any, ClassVar

import jax.numpy as jnp
from flax import linen as nn

from pointcontrast_tpu.nn.layers import (
    MaskedBatchNorm,
    SparseConv,
    SparseConvTranspose,
    SparseLinear,
    relu,
)
from pointcontrast_tpu.nn.resnet_block import BasicBlock, Bottleneck

NUM_LEVELS = 4  # strides 1, 2, 4, 8


class MinkUNetBase(nn.Module):
    in_channels: int
    out_channels: int
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.05
    dtype: Any = None
    dimension: int = 3

    BLOCK: ClassVar = None
    PLANES = (64, 128, 256, 512, 256, 128, 128)
    LAYERS = (2, 2, 2, 2, 2, 2)
    INIT_DIM = 64

    def _stage(self, x, nbr, valid, planes, blocks, train, name):
        kv = nbr.shape[0]
        for i in range(blocks):
            x = self.BLOCK(
                planes=planes,
                kernel_volume=kv,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"{name}_{i}",
            )(x, nbr, valid, train)
        return x

    @nn.compact
    def __call__(self, features, pyramid, train: bool = True):
        dtype = self.dtype or features.dtype
        lv = pyramid.levels
        assert len(lv) >= NUM_LEVELS, "MinkUNet needs a 4-level pyramid"
        k_up = 2 ** self.dimension
        exp = self.BLOCK.expansion

        def bn(name):
            return MaskedBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        nbr0 = lv[0].nbr0 if lv[0].nbr0 is not None else lv[0].nbr
        out = SparseConv(self.INIT_DIM, nbr0.shape[0], dtype=dtype, name="conv1p1s1")(
            features.astype(dtype), nbr0, lv[0].valid
        )
        out = relu(bn("bn1")(out, lv[0].valid, train))
        skips = [self._stage(out, lv[0].nbr, lv[0].valid, self.PLANES[0],
                             self.LAYERS[0], train, "block1")]

        # encoder levels 1..3
        out = skips[0]
        for s in range(3):
            out = SparseConv(
                out.shape[-1], k_up, dtype=dtype,
                name=f"conv{s + 2}p{2**s}s2",
            )(out, lv[s].down_nbr, lv[s + 1].valid)
            out = relu(bn(f"bn{s + 2}")(out, lv[s + 1].valid, train))
            out = self._stage(
                out, lv[s + 1].nbr, lv[s + 1].valid, self.PLANES[s + 1],
                self.LAYERS[s + 1], train, f"block{s + 2}",
            )
            if s < 2:
                skips.append(out)

        # decoder
        for d in range(3):
            lvl = 2 - d
            out = SparseConvTranspose(
                self.PLANES[4 + d], k_up, dtype=dtype,
                name=f"convtr{4 + d}p{2 ** (3 - d)}s2",
            )(out, lv[lvl].up_parent, lv[lvl].up_offset, lv[lvl].valid)
            out = relu(bn(f"bntr{4 + d}")(out, lv[lvl].valid, train))
            out = jnp.concatenate([out, skips[lvl]], axis=1)
            if d < 2:
                out = self._stage(
                    out, lv[lvl].nbr, lv[lvl].valid, self.PLANES[4 + d],
                    self.LAYERS[4 + d], train, f"block{5 + d}",
                )

        # final MLP: 1x1 -> 512 BN ReLU -> 1x1 head (resunet.py:165-173)
        out = SparseLinear(512, use_bias=False, dtype=dtype, name="final_fc")(
            out, lv[0].valid
        )
        out = relu(
            MaskedBatchNorm(0.1, dtype=dtype, name="final_bn")(out, lv[0].valid, train)
        )
        return SparseLinear(
            self.out_channels, use_bias=True, dtype=dtype, name="final"
        )(out, lv[0].valid)


class ResUNet14(MinkUNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1)


class ResUNet18(MinkUNetBase):
    BLOCK = BasicBlock
    LAYERS = (2, 2, 2, 2, 2, 2)


class ResUNet34(MinkUNetBase):
    BLOCK = BasicBlock
    LAYERS = (3, 4, 6, 3, 2, 2)


class ResUNet50(MinkUNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 6, 3, 2, 2)


class ResUNet101(MinkUNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 23, 3, 2, 2)


class ResUNet14D(ResUNet14):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet18D(ResUNet18):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34D(ResUNet34):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34E(ResUNet34):
    INIT_DIM = 32
    PLANES = (32, 64, 128, 256, 128, 64, 64)


class ResUNet34F(ResUNet34):
    INIT_DIM = 32
    PLANES = (32, 64, 128, 256, 128, 64, 32)
