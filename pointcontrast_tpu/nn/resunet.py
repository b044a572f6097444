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
from pointcontrast_tpu.nn.resnet_block import BasicBlock, BasicBlockINBN, Bottleneck
from pointcontrast_tpu.sparse import ops

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

    def _stage(self, x, lv, planes, blocks, train, name, num_batch=1):
        kv = lv.nbr.shape[0]
        for i in range(blocks):
            x = self.BLOCK(
                planes=planes,
                kernel_volume=kv,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"{name}_{i}",
            )(x, lv.nbr, lv.valid, train, batch=lv.batch, num_batch=num_batch,
              rev=getattr(lv, "rev", None))
        return x

    @nn.compact
    def __call__(self, features, pyramid, train: bool = True):
        dtype = self.dtype or features.dtype
        lv = pyramid.levels
        assert len(lv) >= NUM_LEVELS, "MinkUNet needs a 4-level pyramid"
        k_up = lv[0].down_nbr.shape[0]
        nb = pyramid.num_batch

        def bn(name):
            return MaskedBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        assert self.conv1_kernel_size == 3 or lv[0].nbr0 is not None, (
            f"conv1_kernel_size={self.conv1_kernel_size} requires a pyramid "
            "built with the same conv0_kernel_size (got no nbr0 map)"
        )
        nbr0 = lv[0].nbr0 if lv[0].nbr0 is not None else lv[0].nbr
        out = SparseConv(self.INIT_DIM, nbr0.shape[0], dtype=dtype, name="conv1p1s1")(
            features.astype(dtype), nbr0, lv[0].valid,
            getattr(lv[0], "rev0", None) if lv[0].nbr0 is not None
            else getattr(lv[0], "rev", None),
        )
        out = relu(bn("bn1")(out, lv[0].valid, train))
        skips = [self._stage(out, lv[0], self.PLANES[0],
                             self.LAYERS[0], train, "block1", nb)]

        # encoder levels 1..3
        out = skips[0]
        for s in range(3):
            out = SparseConv(
                out.shape[-1], k_up, dtype=dtype,
                name=f"conv{s + 2}p{2**s}s2",
            )(out, lv[s].down_nbr, lv[s + 1].valid,
              up=(lv[s].up_parent, lv[s].up_offset))
            out = relu(bn(f"bn{s + 2}")(out, lv[s + 1].valid, train))
            out = self._stage(
                out, lv[s + 1], self.PLANES[s + 1], self.LAYERS[s + 1],
                train, f"block{s + 2}", nb,
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
                    out, lv[lvl], self.PLANES[4 + d], self.LAYERS[4 + d],
                    train, f"block{5 + d}", nb,
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


class ResUNet18INBN(ResUNet18):
    BLOCK = BasicBlockINBN


class MinkUNetHyper(MinkUNetBase):
    """Hypercolumn variant (resunet.py:275-486): decoder stages additionally
    pooling-transpose their features to level 0 and the final MLP consumes
    the concatenation [out, b1, up(out6), up(out5)]."""

    @nn.compact
    def __call__(self, features, pyramid, train: bool = True):
        dtype = self.dtype or features.dtype
        lv = pyramid.levels
        assert len(lv) >= NUM_LEVELS, "MinkUNetHyper needs a 4-level pyramid"
        k_up = lv[0].down_nbr.shape[0]
        nb = pyramid.num_batch

        def bn(name):
            return MaskedBatchNorm(self.bn_momentum, dtype=dtype, name=name)

        from pointcontrast_tpu.sparse.brick import BrickMap

        assert not any(isinstance(l.nbr, BrickMap) for l in lv), (
            "MinkUNetHyper's chained pooling-transposes need per-fine-row "
            "up_parent maps, which brick levels don't carry — build the "
            "pyramid with layout='voxel'"
        )

        def unpool_to_level0(x, from_level):
            # chained kernel-2 pooling transpose (MinkowskiPoolingTranspose
            # with stride 2^L == L successive parent broadcasts)
            for l in range(from_level - 1, -1, -1):
                x = ops.sparse_avg_unpool(x, lv[l].up_parent, lv[l].valid)
            return x

        assert self.conv1_kernel_size == 3 or lv[0].nbr0 is not None, (
            f"conv1_kernel_size={self.conv1_kernel_size} requires a pyramid "
            "built with the same conv0_kernel_size (got no nbr0 map)"
        )
        nbr0 = lv[0].nbr0 if lv[0].nbr0 is not None else lv[0].nbr
        out = SparseConv(self.INIT_DIM, nbr0.shape[0], dtype=dtype, name="conv1p1s1")(
            features.astype(dtype), nbr0, lv[0].valid,
            getattr(lv[0], "rev0", None) if lv[0].nbr0 is not None
            else getattr(lv[0], "rev", None),
        )
        out = relu(bn("bn1")(out, lv[0].valid, train))
        skips = [self._stage(out, lv[0], self.PLANES[0],
                             self.LAYERS[0], train, "block1", nb)]
        out = skips[0]
        for s in range(3):
            out = SparseConv(
                out.shape[-1], k_up, dtype=dtype, name=f"conv{s + 2}p{2**s}s2"
            )(out, lv[s].down_nbr, lv[s + 1].valid,
              up=(lv[s].up_parent, lv[s].up_offset))
            out = relu(bn(f"bn{s + 2}")(out, lv[s + 1].valid, train))
            out = self._stage(
                out, lv[s + 1], self.PLANES[s + 1], self.LAYERS[s + 1],
                train, f"block{s + 2}", nb,
            )
            if s < 2:
                skips.append(out)

        hyper = []
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
                    out, lv[lvl], self.PLANES[4 + d], self.LAYERS[4 + d],
                    train, f"block{5 + d}", nb,
                )
                hyper.append(unpool_to_level0(out, lvl))

        out = jnp.concatenate([out] + hyper[::-1], axis=1)
        out = SparseLinear(512, use_bias=False, dtype=dtype, name="final_fc")(
            out, lv[0].valid
        )
        out = relu(
            MaskedBatchNorm(0.1, dtype=dtype, name="final_bn")(out, lv[0].valid, train)
        )
        return SparseLinear(
            self.out_channels, use_bias=True, dtype=dtype, name="final"
        )(out, lv[0].valid)


class MinkUNetHyper14INBN(MinkUNetHyper):
    BLOCK = BasicBlockINBN
    LAYERS = (1, 1, 1, 1, 1, 1)


# --- 4D spatio-temporal variants (resunet.py:493-541) ---


class STMinkUNetBase(MinkUNetBase):
    dimension: int = 4


class STResUNet14(STMinkUNetBase, ResUNet14):
    pass


class STResUNet18(STMinkUNetBase, ResUNet18):
    pass


class STResUNet34(STMinkUNetBase, ResUNet34):
    pass


class STResUNet50(STMinkUNetBase, ResUNet50):
    pass


class STResUNet101(STMinkUNetBase, ResUNet101):
    pass


class STResTesseractUNetBase(STMinkUNetBase):
    """Full 4D hypercube kernels."""


class STResTesseractUNet14(STResTesseractUNetBase, ResUNet14):
    pass


class STResTesseractUNet18(STResTesseractUNetBase, ResUNet18):
    pass


class STResTesseractUNet34(STResTesseractUNetBase, ResUNet34):
    pass


class STResTesseractUNet50(STResTesseractUNetBase, ResUNet50):
    pass


class STResTesseractUNet101(STResTesseractUNetBase, ResUNet101):
    pass
