"""Train state pytree: params + batch stats + optimizer state + step.

The checkpointed contents mirror the reference's
``{curr_iter, state_dict, optimizer, scheduler}`` torch checkpoint
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py:151-169); the
scheduler needs no state here because the LR factor is a pure function of
``step``.
"""
from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
        )


def create_train_state(rng, model, tx, example_inputs: tuple) -> TrainState:
    """Initialize model variables on the example batch and wrap in a state.

    init runs under jit: eager init would compile every op separately
    (minutes); one traced program initializes in seconds."""
    import functools

    init = jax.jit(functools.partial(model.init, train=False))
    variables = init(rng, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
