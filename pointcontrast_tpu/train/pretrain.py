"""Contrastive pretraining: jitted train step + driver loop.

Replaces the reference's HardestContrastiveLossTrainer / PointNCELossTrainer
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py:171-441).  One
jitted step runs: forward frame0 -> forward frame1 -> loss -> grads ->
(optional pmean over the data axis) -> SGD update, with zero host syncs; all
index sampling already happened in the collator (see data/collate.py).
"""
from __future__ import annotations

import dataclasses
import logging
import time

import jax
import numpy as np

from pointcontrast_tpu.data.collate import PairBatch
from pointcontrast_tpu.losses.contrastive import (
    hardest_contrastive_loss,
    point_info_nce_loss,
)
from pointcontrast_tpu.parallel.mesh import pmean_if_parallel
from pointcontrast_tpu.train import optim
from pointcontrast_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from pointcontrast_tpu.train.state import TrainState, create_train_state
from pointcontrast_tpu.utils.timer import AverageMeter, Timer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PretrainConfig:
    """Mirrors the reference's trainer/opt config groups
    (pretrain/pointcontrast/config/defaults.yaml)."""

    mode: str = "nce"  # 'nce' (PointNCELossTrainer) | 'hardest'
    # loss
    nce_t: float = 0.4  # scripts/ddp_launch.sh:22 (yaml default 0.07)
    npos: int = 4096
    num_pos_per_batch: int = 1024
    num_hn_samples_per_batch: int = 256
    pos_thresh: float = 0.1
    neg_thresh: float = 1.4
    # optimizer (opt group)
    optimizer: str = "sgd"
    lr: float = 0.1
    momentum: float = 0.8
    weight_decay: float = 1e-4
    exp_gamma: float = 0.99
    scheduler: str = "explr"
    max_iter: int = 60000
    # cadence
    lr_update_freq: int = 1000
    stat_freq: int = 40
    checkpoint_dir: str = "weights"
    save_freq: int = 1000


def make_train_step(config: PretrainConfig):
    """Build ``step(state, batch, axis_name=None) -> (state, metrics)``."""

    def step(state: TrainState, batch: PairBatch, axis_name: str | None = None):
        def loss_fn(params):
            v0 = {"params": params, "batch_stats": state.batch_stats}
            f0, mut0 = state.apply_fn(
                v0, batch.feats0, batch.pyramid0, train=True,
                mutable=["batch_stats"],
            )
            if batch.feats1 is None:
                # fused-frame batch: one forward over all 2B frames; the
                # sampled indices already point into the combined table.
                f1, mut1 = f0, mut0
            else:
                v1 = {"params": params, "batch_stats": mut0["batch_stats"]}
                f1, mut1 = state.apply_fn(
                    v1, batch.feats1, batch.pyramid1, train=True,
                    mutable=["batch_stats"],
                )
            if config.mode == "nce":
                loss = point_info_nce_loss(
                    f0, f1, batch.q_idx, batch.k_idx, batch.pair_valid,
                    temperature=config.nce_t,
                )
                metrics = {"loss": loss}
            else:
                pos_loss, neg_loss = hardest_contrastive_loss(
                    f0, f1,
                    batch.pos0_idx, batch.pos1_idx, batch.pos_valid,
                    batch.cand0_idx, batch.cand0_valid,
                    batch.cand1_idx, batch.cand1_valid,
                    batch.collide0, batch.collide1,
                    pos_thresh=config.pos_thresh,
                    neg_thresh=config.neg_thresh,
                )
                loss = pos_loss + neg_loss
                metrics = {"loss": loss, "pos_loss": pos_loss, "neg_loss": neg_loss}
            if batch.truncated_voxels is not None:
                metrics["truncated_voxels"] = batch.truncated_voxels
            return loss, (mut1["batch_stats"], metrics)

        (_, (batch_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = pmean_if_parallel(grads, axis_name)
        metrics = pmean_if_parallel(metrics, axis_name)
        new_state = state.apply_gradients(grads, new_batch_stats=batch_stats)
        return new_state, metrics

    return step


class PretrainTrainer:
    """Driver loop: loader -> jitted step -> periodic LR/checkpoint/logs.

    Single-device by default; pass a mesh for data parallelism (the loader
    must then stack ``num_device_batches == mesh size`` device batches)."""

    def __init__(self, model, loader, config: PretrainConfig, mesh=None, rng=None,
                 preemption_guard=None):
        self.config = config
        self.loader = loader
        self.mesh = mesh
        self.preemption_guard = preemption_guard
        schedule = optim.make_scheduler(
            config.scheduler,
            _NS(exp_gamma=config.exp_gamma, max_iter=config.max_iter,
                exp_step_size=config.lr_update_freq,
                pretrain_step_cadence=True),
        )
        tx = optim.make_optimizer(config.optimizer, config.lr, schedule, config)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        example = next(iter(loader))
        if mesh is not None:
            local = jax.tree.map(
                lambda x: x[0] if hasattr(x, "ndim") else x, example
            )
        else:
            local = example
        self.state = create_train_state(
            rng, model, tx, (local.feats0, local.pyramid0)
        )
        self._first_batch = example

        step = make_train_step(config)
        if mesh is not None:
            from pointcontrast_tpu.parallel.mesh import data_parallel_step

            self._step = data_parallel_step(step, mesh)
        else:
            self._step = jax.jit(
                lambda s, b: step(s, b, axis_name=None), donate_argnums=0
            )

        ckpt = latest_checkpoint(config.checkpoint_dir)
        if ckpt is not None:
            # Restore against a template: a template-free orbax restore
            # sorts dict keys, which misorders NamedTuple opt-state leaves.
            template = {
                "curr_iter": np.asarray(0),
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "opt_state": jax.device_get(self.state.opt_state),
            }
            payload = load_checkpoint(ckpt, template=template)
            self.state = self.state.replace(
                step=int(payload["curr_iter"]),
                params=payload["params"],
                batch_stats=payload["batch_stats"],
                opt_state=payload["opt_state"],
            )
            log.info("resumed from %s at iter %d", ckpt, int(payload["curr_iter"]))

    def train(self, num_iters: int | None = None):
        from pointcontrast_tpu.utils.metrics import MetricsLogger

        cfg = self.config
        target = min(
            cfg.max_iter,
            int(self.state.step) + (num_iters or cfg.max_iter),
        )
        data_meter, step_timer = AverageMeter(), Timer()
        batch = self._first_batch
        self._first_batch = None
        history = []
        writer = MetricsLogger(cfg.checkpoint_dir)
        from pointcontrast_tpu.utils.prefetch import device_prefetch

        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        feed = device_prefetch(self.loader, sharding=sharding)
        # Host-side iteration counter: int(self.state.step) would block on
        # the in-flight device step every iteration, serializing dispatch.
        # Step time is therefore accounted per stat window (wall - data),
        # the only honest per-step figure once dispatch is pipelined.
        curr = int(self.state.step)
        win_t0, win_data, win_iters = time.perf_counter(), 0.0, 0
        while curr < target:
            t0 = time.perf_counter()
            if batch is None:
                batch = next(feed)
            dt = time.perf_counter() - t0
            data_meter.update(dt)
            win_data += dt
            self.state, metrics = self._step(self.state, batch)
            batch = None
            curr += 1
            win_iters += 1
            if curr % cfg.stat_freq == 0 or curr == target:
                metrics = jax.device_get(metrics)  # syncs the window
                step_timer.avg = (
                    time.perf_counter() - win_t0 - win_data
                ) / win_iters
                win_t0, win_data, win_iters = time.perf_counter(), 0.0, 0
                scalars = {k: float(v) for k, v in metrics.items()}
                history.append((curr, scalars))
                writer.add_scalars(scalars, curr, prefix="train/")
                writer.add_scalar("train/data_time", data_meter.avg, curr)
                writer.add_scalar("train/step_time", step_timer.avg, curr)
                log.info(
                    "iter %d loss %.4f (data %.3fs step %.3fs)",
                    curr, scalars["loss"], data_meter.avg, step_timer.avg,
                )
                if scalars.get("truncated_voxels", 0) > 0:
                    log.warning(
                        "iter %d: pyramid truncation dropped %.0f voxels "
                        "this batch — PadScheme level ratios too tight",
                        curr, scalars["truncated_voxels"],
                    )
            if curr % cfg.save_freq == 0 or curr == target:
                save_checkpoint(cfg.checkpoint_dir, curr, self.state)
            if self.preemption_guard is not None and self.preemption_guard.preempted:
                from pointcontrast_tpu.utils.preemption import Preempted

                save_checkpoint(cfg.checkpoint_dir, curr, self.state)
                writer.close()
                log.warning("preempted at iter %d: checkpoint saved, requeue", curr)
                raise Preempted(curr)
        writer.close()
        return history


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)
