"""Device mesh helpers and the data-parallel step transform.

Design (mirrors DDP semantics exactly, see SURVEY.md section 2.5):
  - each device owns one *per-device batch* (its own coordinate pyramid);
    batches are stacked on a leading ``data`` axis by the loader;
  - the step function runs per-device under ``shard_map``; gradients and
    scalar metrics are ``pmean``-reduced over the axis — DDP's all-reduce;
  - batch norm stays per-replica (the reference runs DDP with
    broadcast_buffers=False, ddp_trainer.py:101, i.e. unsynced BN).  Running
    stats therefore diverge across replicas; checkpoints materialize
    device 0's copy — exactly the reference's rank-0 torch.save semantics
    (ddp_trainer.py:151-153).  check_rep=False below acknowledges this
    intentional divergence of the replicated-state invariant.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a leading-axis-stacked batch with dim 0 split over the mesh."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return x

    return jax.tree.map(put, batch)


def data_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    donate_state: bool = True,
) -> Callable:
    """Lift ``step_fn(state, batch) -> (state, metrics)`` (written for ONE
    device batch, with grads already computed inside) to run data-parallel.

    ``step_fn`` must accept an ``axis_name`` kwarg and pmean its grads and
    metrics over it; here it is wrapped in shard_map + jit with the state
    replicated and the batch split on its leading axis.
    """
    # jax.shard_map is the supported API; fall back to the experimental
    # module on older JAX (same semantics, check_vma was called check_rep).
    try:
        shard_map = jax.shard_map
        rep_kw = {"check_vma": False}
    except AttributeError:
        from jax.experimental.shard_map import shard_map

        rep_kw = {"check_rep": False}

    def per_device(state, batch):
        # strip the per-device leading axis of size 1
        local = jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") else x, batch)
        return step_fn(state, local, axis_name=axis)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        **rep_kw,
    )
    donate = (0,) if donate_state else ()
    return jax.jit(sharded, donate_argnums=donate)


def pmean_if_parallel(tree, axis_name: str | None):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)
