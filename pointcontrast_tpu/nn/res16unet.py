"""Res16UNet family: 8-stage sparse U-Net over a 5-level pyramid.

Architecture mirrors /root/reference/pretrain/pointcontrast/model/res16unet.py
(and the superset of variants in /root/reference/downstream/semseg/models/
res16unet.py:263-337): stem conv -> 4x [stride-2 conv + BN + ReLU + residual
stage] encoder -> 4x [transpose conv + BN + ReLU + skip-concat + residual
stage] decoder -> 1x1 head, optional L2-normalized output features.

TPU-native execution: the whole forward is gathers + MXU matmuls over the
precomputed pyramid; every level's arrays are statically padded, so the
network jits into a single fused XLA program.
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
    l2_normalize_rows,
    relu,
)
from pointcontrast_tpu.nn.resnet_block import BasicBlock, Bottleneck

NUM_LEVELS = 5  # strides 1, 2, 4, 8, 16


class Res16UNetBase(nn.Module):
    """Base 8-stage sparse U-Net (see class attrs of subclasses)."""

    in_channels: int
    out_channels: int
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.05
    normalize_feature: bool = False
    dtype: Any = None
    dimension: int = 3

    BLOCK: ClassVar = None
    PLANES = (32, 64, 128, 256, 256, 256, 256, 256)
    DILATIONS = (1, 1, 1, 1, 1, 1, 1, 1)
    LAYERS = (2, 2, 2, 2, 2, 2, 2, 2)
    INIT_DIM = 32

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
        """features: [Npad0, in_channels] (padded rows zero).
        pyramid: sparse.topology.Pyramid with NUM_LEVELS levels."""
        dtype = self.dtype or features.dtype
        lv = pyramid.levels
        assert len(lv) >= NUM_LEVELS, "Res16UNet needs a 5-level pyramid"
        k_up = lv[0].down_nbr.shape[0]  # 2^(num strided axes)
        nb = pyramid.num_batch
        bnm = self.bn_momentum

        def bn(name):
            return MaskedBatchNorm(bnm, dtype=dtype, name=name)

        # --- stem (conv0p1s1) ---
        assert self.conv1_kernel_size == 3 or lv[0].nbr0 is not None, (
            f"conv1_kernel_size={self.conv1_kernel_size} requires a pyramid "
            "built with the same conv0_kernel_size (got no nbr0 map)"
        )
        nbr0 = lv[0].nbr0 if lv[0].nbr0 is not None else lv[0].nbr
        rev0 = (
            getattr(lv[0], "rev0", None)
            if lv[0].nbr0 is not None else getattr(lv[0], "rev", None)
        )
        out = SparseConv(self.INIT_DIM, nbr0.shape[0], dtype=dtype, name="conv0p1s1")(
            features.astype(dtype), nbr0, lv[0].valid, rev0
        )
        out_p1 = relu(bn("bn0")(out, lv[0].valid, train))

        # --- encoder ---
        skips = [out_p1]
        out = out_p1
        for s in range(4):
            out = SparseConv(
                out.shape[-1], k_up, dtype=dtype, name=f"conv{s + 1}p{2**s}s2"
            )(out, lv[s].down_nbr, lv[s + 1].valid,
              up=(lv[s].up_parent, lv[s].up_offset))
            out = relu(bn(f"bn{s + 1}")(out, lv[s + 1].valid, train))
            out = self._stage(
                out, lv[s + 1], self.PLANES[s], self.LAYERS[s], train,
                f"block{s + 1}", nb,
            )
            if s < 3:
                skips.append(out)

        # --- decoder ---
        for d in range(4):
            lvl = 3 - d  # producing level index
            out = SparseConvTranspose(
                self.PLANES[4 + d], k_up, dtype=dtype,
                name=f"convtr{4 + d}p{2 ** (4 - d)}s2",
            )(out, lv[lvl].up_parent, lv[lvl].up_offset, lv[lvl].valid)
            out = relu(bn(f"bntr{4 + d}")(out, lv[lvl].valid, train))
            out = jnp.concatenate([out, skips[lvl]], axis=1)
            out = self._stage(
                out, lv[lvl], self.PLANES[4 + d], self.LAYERS[4 + d], train,
                f"block{5 + d}", nb,
            )

        out = SparseLinear(self.out_channels, use_bias=True, dtype=dtype, name="final")(
            out, lv[0].valid
        )
        if self.normalize_feature:
            out = l2_normalize_rows(out, lv[0].valid)
        return out


# --- variants (mirroring semseg models/res16unet.py:263-337 and the pretrain
#     subset at pretrain model/res16unet.py:270-275) ---


class Res16UNet14(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)


class Res16UNet18(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet34(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet50(Res16UNetBase):
    BLOCK = Bottleneck
    LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet101(Res16UNetBase):
    BLOCK = Bottleneck
    LAYERS = (2, 3, 4, 23, 2, 2, 2, 2)


class Res16UNet14A(Res16UNet14):
    PLANES = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet14A2(Res16UNet14A):
    LAYERS = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B(Res16UNet14):
    PLANES = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet14B2(Res16UNet14B):
    LAYERS = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B3(Res16UNet14B):
    LAYERS = (2, 2, 2, 2, 1, 1, 1, 1)


class Res16UNet14C(Res16UNet14):
    PLANES = (32, 64, 128, 256, 192, 192, 128, 128)


class Res16UNet14D(Res16UNet14):
    PLANES = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet18A(Res16UNet18):
    PLANES = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet18B(Res16UNet18):
    PLANES = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet18D(Res16UNet18):
    PLANES = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet34A(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 64, 64)


class Res16UNet34B(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 64, 32)


class Res16UNet34C(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 96, 96)


# --- 4D spatio-temporal variants (semseg models/res16unet.py:340-380):
#     dimension=4; pyramids built with region='hybrid' (cube space x cross
#     time) and stride_axes=(1,1,1,0). ---


class STRes16UNetBase(Res16UNetBase):
    dimension: int = 4


class STRes16UNet14(STRes16UNetBase, Res16UNet14):
    pass


class STRes16UNet14A(STRes16UNetBase, Res16UNet14A):
    pass


class STRes16UNet18(STRes16UNetBase, Res16UNet18):
    pass


class STRes16UNet34(STRes16UNetBase, Res16UNet34):
    pass


class STRes16UNet50(STRes16UNetBase, Res16UNet50):
    pass


class STRes16UNet101(STRes16UNetBase, Res16UNet101):
    pass


class STRes16UNet18A(STRes16UNet18):
    PLANES = (32, 64, 128, 256, 128, 128, 96, 96)


class STResTesseract16UNetBase(STRes16UNetBase):
    """Full 4D hypercube kernels (pyramid built with region='hypercube')."""


class STResTesseract16UNet18A(STRes16UNet18A, STResTesseract16UNetBase):
    pass
