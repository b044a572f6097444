"""Distributed execution: GSPMD data parallelism over a device mesh.

Replaces the reference's process-per-GPU NCCL stack
(/root/reference/pretrain/pointcontrast/lib/{distributed,multiprocessing,
error_handler}.py and downstream distributed_utils.py copies) with
single-controller JAX: one process drives all chips, the batch is sharded
over the ``data`` mesh axis, gradients/metrics are reduced with
``jax.lax.pmean`` over ICI, and multi-host initialization is one call to
``jax.distributed.initialize``.  There is no pickled-object collective —
logging is host-local, exactly what the reference's gathers reduced to.
"""

from pointcontrast_tpu.parallel.mesh import (
    make_mesh,
    data_parallel_step,
    replicate,
    shard_batch,
)
