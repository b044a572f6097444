"""Multi-host initialization.

Replaces the reference's SLURM/env init-method inference + NCCL process
groups (/root/reference/downstream/semseg/lib/distributed_utils.py:22-98,
pretrain lib/distributed.py:143-168) with JAX's single call: every host runs
the same program, ``jax.distributed.initialize`` wires the DCN mesh, and the
data loaders shard by (process_index, process_count).
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize multi-host JAX. With no args, reads the standard cluster
    env (JAX handles GKE/SLURM autodetection, the analogue of the
    reference's infer_init_method)."""
    import jax

    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    log.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index(), jax.process_count()


def shard_info():
    """(shard_id, num_shards) for data-loader sharding; (0, 1) single-host."""
    import jax

    return jax.process_index(), jax.process_count()
