"""pointcontrast_tpu: a TPU-native framework with the capabilities of
facebookresearch/PointContrast.

Replaces the reference's three external engines with TPU-first equivalents:

- MinkowskiEngine (C++/CUDA sparse conv)  -> ``pointcontrast_tpu.sparse``:
  host-side voxel hashing + kernel-map construction feeding gather-GEMM
  sparse convolutions that run as single large MXU matmuls under ``jax.jit``
  (with optional Pallas fused kernels).
- PyTorch DDP / NCCL                      -> ``pointcontrast_tpu.parallel``:
  single-controller GSPMD data parallelism over a ``jax.sharding.Mesh``.
- PointNet++ CUDA extension               -> ``pointcontrast_tpu.detect.ops``:
  FPS / ball-query / grouping / interpolation as jitted XLA programs.
"""

__version__ = "0.1.0"
