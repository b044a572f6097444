"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); set the XLA flags *before* jax is imported anywhere.
"""
import os
import sys

# Force CPU even when the environment presets a TPU platform (e.g. the axon
# tunnel): per-op eager dispatch over the tunnel makes tests pathologically
# slow, and the multi-device tests need the 8-way virtual CPU mesh anyway.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA CPU's default matmul runs at reduced precision; numeric oracle tests
# need exact f32. (On TPU the library keeps the hardware default: bf16 MXU.)
import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding JAX_PLATFORMS; force it back so tests run on the local
# 8-device virtual CPU mesh, not over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the train-step programs are large (8-stage
# U-Nets, fwd+bwd) and dominate test wall-time; caching makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_pc_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
