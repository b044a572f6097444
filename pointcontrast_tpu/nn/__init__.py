"""Sparse neural network modules (flax.linen) over the gather-GEMM engine.

Mirrors the reference model zoo (Res16UNet family, MinkUNet family, ResNet
family; see /root/reference/downstream/semseg/models/) with TPU-native
internals: every conv is a single MXU matmul over statically padded gathers,
batch norm is padding-aware, and the whole forward jits into one XLA program.
"""

from pointcontrast_tpu.nn.layers import (
    SparseConv,
    SparseConvTranspose,
    SparseLinear,
    MaskedBatchNorm,
    SparseInstanceNorm,
    SparseLayerNorm,
)
from pointcontrast_tpu.nn.registry import load_model, MODELS
