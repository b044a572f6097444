"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); set the XLA flags *before* jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA CPU's default matmul runs at reduced precision; numeric oracle tests
# need exact f32. (On TPU the library keeps the hardware default: bf16 MXU.)
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
