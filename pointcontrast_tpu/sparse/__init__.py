"""Sparse voxel engine: the TPU-native replacement for the MinkowskiEngine
surface used by the reference (see SURVEY.md section 2.7).

Host side (numpy, runs in the input pipeline):
  - ``quantize``: sparse_quantize equivalents (plain / label-aware).
  - ``hashing``: collision-free int64 packing of (batch, x, y, z) coords.
  - ``kernel_map``: kernel offset enumeration (hypercube / hypercross).
  - ``topology``: per-batch coordinate pyramid + gather index maps for every
    conv in a sparse U-Net, padded to static bucket shapes.

Device side (jax, runs under jit):
  - ``ops``: gather-GEMM sparse conv / transpose conv / pooling / masked norm.
"""

from pointcontrast_tpu.sparse.hashing import hash_coords, HashSpec
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import (
    Pyramid,
    PyramidMeta,
    build_pyramid,
    bucket_size,
)
