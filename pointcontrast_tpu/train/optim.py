"""Optimizers and LR schedules with torch-matching semantics.

The reference uses torch SGD(momentum, weight_decay) / Adam
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py:108-113,
 /root/reference/downstream/semseg/lib/solvers.py:12-49) and four schedulers
(StepLR / PolyLR / SquaredLR / ExpLR, solvers.py:52-83).  optax's built-ins
differ from torch in exactly the ways that break checkpoint parity (optax
sgd's trace vs torch's buf update order; adam bias correction is the same),
so SGD is implemented to match torch's update rule bit-for-bit:

    g = g + wd * p
    buf = momentum * buf + (1 - dampening) * g     (buf = g on first step)
    p -= lr * buf
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGDState(NamedTuple):
    momentum_buf: optax.Params
    initialized: jnp.ndarray  # bool scalar


def sgd(
    learning_rate,
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.SGD-equivalent (see torch docs pseudo-code)."""

    def init_fn(params):
        return SGDState(
            momentum_buf=jax.tree.map(jnp.zeros_like, params),
            initialized=jnp.asarray(False),
        )

    def update_fn(grads, state, params):
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        if momentum:
            def upd(buf, g):
                return jnp.where(
                    state.initialized, momentum * buf + (1.0 - dampening) * g, g
                )

            buf = jax.tree.map(upd, state.momentum_buf, grads)
            if nesterov:
                grads = jax.tree.map(lambda g, b: g + momentum * b, grads, buf)
            else:
                grads = buf
            state = SGDState(momentum_buf=buf, initialized=jnp.asarray(True))
        lr = learning_rate
        updates = jax.tree.map(lambda g: -lr * g, grads)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (L2-coupled weight decay, not AdamW)."""
    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-learning_rate)]
    return optax.chain(*tx)


# --- schedulers: return multiplicative LR factor for a given step ---------


def exp_lr(gamma: float, update_freq: int = 1, stepped: bool = False):
    """The reference has TWO ExpLR cadences:

    - semseg (``stepped=False``): ``gamma ** (s / step_size)`` with FLOAT
      division, stepped every iteration (solvers.py:40-47).
    - pretrain (``stepped=True``): torch ExponentialLR advanced by the loop
      ``if curr_iter % freq == 0 or curr_iter == 1: scheduler.step()``
      (ddp_trainer.py:258-260), always AFTER the iteration trained with the
      current LR.  With optax's 0-indexed update count ``s`` (iteration
      ``s+1``) the exponent is 0 at s=0 and ``s//freq + 1`` after (the +1
      is the extra step() fired at curr_iter==1).
    """

    def factor(step):
        import jax.numpy as jnp

        if stepped:
            return jnp.where(
                step == 0, 1.0, gamma ** (step // update_freq + 1)
            )
        return gamma ** (step / update_freq)

    return factor


def poly_lr(max_iter: int, power: float = 0.9, last_step: int = -1):
    """PolyLR: (1 - s / (max_iter + 1)) ** power (solvers.py:59-66)."""

    def factor(step):
        return (1.0 - step / (max_iter + 1)) ** power

    return factor


def step_lr(step_size: int, gamma: float = 0.1):
    def factor(step):
        return gamma ** (step // step_size)

    return factor


def squared_lr(max_iter: int):
    """SquaredLR: (1 - s / (max_iter + 1)) ** 2 (solvers.py:69-75)."""
    return poly_lr(max_iter, power=2.0)


def make_scheduler(name: str, config) -> "callable":
    """Build a step -> factor schedule from a config namespace mirroring the
    reference's opt group (solvers.py:52-83)."""
    name = name.lower()
    if name == "explr":
        return exp_lr(
            config.exp_gamma, getattr(config, "exp_step_size", 1),
            stepped=getattr(config, "pretrain_step_cadence", False),
        )
    if name == "polylr":
        return poly_lr(config.max_iter, getattr(config, "poly_power", 0.9))
    if name == "steplr":
        return step_lr(config.step_size, getattr(config, "step_gamma", 0.1))
    if name == "squaredlr":
        return squared_lr(config.max_iter)
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(name: str, base_lr: float, schedule, config,
                   param_lr_scales: dict | None = None) -> optax.GradientTransformation:
    """Optimizer whose LR is base_lr * schedule(step), tracked via
    optax.inject_hyperparams-free manual scaling (schedule applied inside).

    param_lr_scales: {top-level param key: multiplier} applies a per-module
    LR ratio (e.g. the CRF wrapper's ``wrapper_lr``, a knob the reference
    declares in config/default.yaml:12 for its filter params)."""
    name = name.lower()

    def lr_from_count(count):
        return base_lr * schedule(count)

    if name == "sgd":
        inner = sgd(
            1.0,
            momentum=getattr(config, "momentum", 0.9),
            dampening=getattr(config, "sgd_dampening", 0.0),
            weight_decay=getattr(config, "weight_decay", 0.0),
        )
    elif name == "adam":
        inner = adam(
            1.0,
            b1=getattr(config, "adam_beta1", 0.9),
            b2=getattr(config, "adam_beta2", 0.999),
            weight_decay=getattr(config, "weight_decay", 0.0),
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    chain = [inner, optax.scale_by_schedule(lambda count: lr_from_count(count))]
    for key, scale in (param_lr_scales or {}).items():
        def mask_fn(params, key=key):
            return {
                k: jax.tree.map(lambda _: k == key, v) for k, v in params.items()
            }

        chain.append(optax.masked(optax.scale(scale), mask_fn))
    return optax.chain(*chain)
