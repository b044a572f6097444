"""Semseg finetune training loop.

Mirrors /root/reference/downstream/semseg/lib/train.py:46-233: per-iter
gradient accumulation (iter_size), CE loss with ignore 255, PolyLR stepped
per iteration, periodic validation with best-mIoU checkpoint tracking, and
lenient (shape-matched) pretrain-weight transfer (ddp_main.py:150-176).

TPU-first: the random coordinate shift and color normalization live in the
collator (they change the voxel lattice / are pure host math), so the jitted
step is one fused fwd+bwd+update program.
"""
from __future__ import annotations

import dataclasses
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcontrast_tpu.losses.semseg import (
    cross_entropy_ignore,
    fast_hist,
    per_class_iu,
)
from pointcontrast_tpu.parallel.mesh import pmean_if_parallel
from pointcontrast_tpu.semseg.dataset import SemsegBatch
from pointcontrast_tpu.train import optim
from pointcontrast_tpu.train.checkpoint import (
    latest_checkpoint,
    lenient_filter,
    load_checkpoint,
    save_checkpoint,
)
from pointcontrast_tpu.train.state import TrainState, create_train_state
from pointcontrast_tpu.utils.timer import AverageMeter, Timer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SemsegConfig:
    """Mirrors the reference optimizer/train config groups
    (downstream/semseg/config/default.yaml)."""

    optimizer: str = "sgd"
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    scheduler: str = "polylr"
    poly_power: float = 0.9
    max_iter: int = 60000
    iter_size: int = 1
    ignore_label: int = 255
    # cadence
    stat_freq: int = 40
    val_freq: int = 1000
    save_freq: int = 1000
    checkpoint_dir: str = "weights_semseg"
    # CRF wrapper filter LR ratio (reference config/default.yaml:12
    # wrapper_lr — declared there for the filter param group); None = base lr
    wrapper_lr: float | None = None


def make_semseg_train_step(config: SemsegConfig, wrapper: bool = False,
                           apply_filter: bool = True):
    """One optimizer step. With ``iter_size > 1`` the batch arrives stacked
    [iter_size, ...] and gradients are accumulated over a ``lax.scan`` of
    forwards before one update, loss scaled by 1/iter_size — the reference's
    inner accumulation loop (lib/train.py:96-157).

    wrapper: the model is a CRF Wrapper taking (feats, pyramid, crf_nbr);
    apply_filter toggles the mean-field filter (the reference skips it with
    p=0.5 during training, models/wrapper.py:29-31 — callers flip between
    the two compiled variants)."""

    def grads_of(params, batch_stats, batch, apply_fn):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            if wrapper:
                logits, mut = apply_fn(
                    variables, batch.feats, batch.pyramid, batch.crf_nbr,
                    train=True, apply_filter=apply_filter,
                    mutable=["batch_stats"],
                )
            else:
                logits, mut = apply_fn(
                    variables, batch.feats, batch.pyramid, train=True,
                    mutable=["batch_stats"],
                )
            loss = cross_entropy_ignore(
                logits, batch.labels, ignore_label=config.ignore_label
            )
            pred = jnp.argmax(logits, axis=-1)
            valid = batch.labels != config.ignore_label
            acc = (
                jnp.where(valid, pred == batch.labels, False).sum()
                / jnp.maximum(valid.sum(), 1)
            )
            metrics = {"loss": loss, "acc": acc}
            if batch.truncated_voxels is not None:
                metrics["truncated_voxels"] = batch.truncated_voxels
            return loss, (mut["batch_stats"], metrics)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, aux

    def step(state: TrainState, batch: SemsegBatch, axis_name: str | None = None):
        stacked = config.iter_size > 1
        if stacked:
            def body(carry, sub):
                bs, gacc, macc = carry
                grads, (new_bs, metrics) = grads_of(
                    state.params, bs, sub, state.apply_fn
                )
                gacc = jax.tree.map(jnp.add, gacc, grads)
                macc = jax.tree.map(jnp.add, macc, metrics)
                return (new_bs, gacc, macc), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            zeros_m = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
            if batch.truncated_voxels is not None:
                zeros_m["truncated_voxels"] = jnp.zeros(())
            (bs, grads, metrics), _ = jax.lax.scan(
                body, (state.batch_stats, zeros_g, zeros_m), batch
            )
            inv = 1.0 / config.iter_size
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = jax.tree.map(lambda m: m * inv, metrics)
        else:
            grads, (bs, metrics) = grads_of(
                state.params, state.batch_stats, batch, state.apply_fn
            )
        grads = pmean_if_parallel(grads, axis_name)
        metrics = pmean_if_parallel(metrics, axis_name)
        new_state = state.apply_gradients(grads, new_batch_stats=bs)
        return new_state, metrics

    return step


def make_eval_step(wrapper: bool = False):
    def step(state: TrainState, batch: SemsegBatch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if wrapper:  # eval always applies the filter (wrapper.py:29)
            logits = state.apply_fn(
                variables, batch.feats, batch.pyramid, batch.crf_nbr,
                train=False)
        else:
            logits = state.apply_fn(
                variables, batch.feats, batch.pyramid, train=False)
        return jnp.argmax(logits, axis=-1), jax.nn.softmax(logits, axis=-1)

    return step


def _accumulate(hist, correct, total, pred, labels, ignore_label, num_classes):
    mask = labels != ignore_label
    hist += fast_hist(pred[mask], labels[mask], num_classes)
    return correct + (pred[mask] == labels[mask]).sum(), total + mask.sum()


def _finish(hist, correct, total):
    ious = per_class_iu(hist) * 100
    return float(np.nanmean(ious)), ious, 100.0 * correct / max(total, 1)


def evaluate(state, loader, num_classes: int, num_batches: int,
             ignore_label: int = 255, eval_step=None):
    """Sampled validation pass -> (mIoU %, per-class IoU, accuracy %): a
    fixed number of batches from an (infinite) loader.  For best-model
    tracking prefer ``evaluate_dataset`` — the reference validates the whole
    split (lib/train.py:200-207)."""
    eval_step = eval_step or jax.jit(make_eval_step())
    hist = np.zeros((num_classes, num_classes))
    correct = total = 0
    for _ in range(num_batches):
        batch = next(loader)
        pred, _prob = jax.device_get(eval_step(state, batch))
        labels = np.asarray(batch.labels)
        correct, total = _accumulate(
            hist, correct, total, pred, labels, ignore_label, num_classes)
    return _finish(hist, correct, total)


def evaluate_dataset(state, dataset, scheme, num_classes: int,
                     batch_size: int = 1, ignore_label: int = 255,
                     eval_step=None, num_levels=None, conv0_kernel_size=3,
                     layout: str = "voxel", crf: dict | None = None):
    """Whole-split validation: every scene of ``dataset`` exactly once, in
    order, with deterministic (index-seeded) per-scene rng and no train-time
    augmentation — the reference's validate() semantics
    (downstream/semseg/lib/train.py:200-207, lib/test.py:95).

    Returns (mIoU %, per-class IoU, acc %, scenes_evaluated).  When a batch
    exceeds the PadScheme budget the collator keeps a prefix; the remainder
    is re-collated so no scene is silently skipped."""
    from pointcontrast_tpu.semseg.dataset import collate_semseg

    eval_step = eval_step or jax.jit(make_eval_step(wrapper=crf is not None))
    hist = np.zeros((num_classes, num_classes))
    correct = total = scenes = 0
    pending = list(range(len(dataset)))
    while pending:
        take = pending[:batch_size]
        samples = [
            dataset.__getitem__(i, rng=np.random.RandomState(i)) for i in take
        ]
        batch = collate_semseg(
            samples, scheme, ignore_label=ignore_label, shift_coords=False,
            rng=np.random.RandomState(0), num_levels=num_levels,
            conv0_kernel_size=conv0_kernel_size, layout=layout, crf=crf,
            num_chunks=batch_size,
        )
        consumed = batch.num_samples
        pending = pending[consumed:]
        scenes += consumed
        pred, _prob = jax.device_get(eval_step(state, batch))
        labels = np.asarray(batch.labels)
        correct, total = _accumulate(
            hist, correct, total, pred, labels, ignore_label, num_classes)
    miou, ious, acc = _finish(hist, correct, total)
    return miou, ious, acc, scenes


class SemsegTrainer:
    def __init__(
        self,
        model,
        train_loader,
        val_loader,
        config: SemsegConfig,
        num_classes: int,
        pretrained_params=None,
        mesh=None,
        rng=None,
        val_dataset=None,
        val_scheme=None,
        val_batch_size: int = 1,
        conv0_kernel_size: int = 3,
        layout: str = "voxel",
        crf: dict | None = None,
        preemption_guard=None,
    ):
        """Validation source: pass ``val_dataset`` (+ ``val_scheme``) for
        whole-split validation each val_freq (the reference's semantics,
        lib/train.py:200-207); ``val_loader`` keeps the sampled-batches mode
        for quick runs."""
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_dataset = val_dataset
        self.val_scheme = val_scheme
        self.val_batch_size = val_batch_size
        self.conv0_kernel_size = conv0_kernel_size
        self.layout = layout
        self.crf = crf
        self.num_classes = num_classes
        self.mesh = mesh
        self.preemption_guard = preemption_guard
        schedule = optim.make_scheduler(config.scheduler, config)
        lr_scales = (
            {"filter": config.wrapper_lr / config.lr}
            if crf is not None and config.wrapper_lr else None
        )
        tx = optim.make_optimizer(config.optimizer, config.lr, schedule,
                                  config, param_lr_scales=lr_scales)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        example = next(iter(train_loader))
        local = (
            jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") else x, example)
            if mesh is not None
            else example
        )
        wrapper = crf is not None
        if wrapper and local.crf_nbr is None:
            raise ValueError("CRF wrapper needs a loader collating crf maps")
        inputs = (
            (local.feats, local.pyramid, local.crf_nbr)
            if wrapper else (local.feats, local.pyramid)
        )
        self.state = create_train_state(rng, model, tx, inputs)
        self._first_batch = example

        if pretrained_params is not None:
            merged, loaded, skipped = lenient_filter(
                self.state.params, pretrained_params
            )
            self.state = self.state.replace(params=merged)
            log.info(
                "lenient transfer: %d loaded, %d skipped (%s)",
                len(loaded), len(skipped), skipped[:4],
            )

        def finalize(step):
            if mesh is not None:
                from pointcontrast_tpu.parallel.mesh import data_parallel_step

                return data_parallel_step(step, mesh)
            return jax.jit(
                lambda s, b: step(s, b, axis_name=None), donate_argnums=0
            )

        self._step = finalize(make_semseg_train_step(config, wrapper=wrapper))
        # the reference skips the CRF filter with p=0.5 during training
        # (wrapper.py:29-31): a second compiled variant, host coin flip
        self._step_nofilter = (
            finalize(make_semseg_train_step(config, wrapper=True,
                                            apply_filter=False))
            if wrapper else None
        )
        self._coin = np.random.RandomState(0)
        self._eval_step = jax.jit(make_eval_step(wrapper=wrapper))

        self.best_miou = -1.0
        ckpt = latest_checkpoint(config.checkpoint_dir)
        if ckpt is not None:
            # template restore keeps NamedTuple opt-state leaf order intact
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
            self._load_best_score()
            log.info("resumed from %s (best mIoU %.2f)", ckpt, self.best_miou)

    def _save_best(self, step: int):
        """Copy the current state into a pruning-exempt best/ subdirectory
        with the mIoU recorded (the reference keeps a separate
        best_val_checkpoint, lib/utils.py:78-114)."""
        import json
        import os

        best_dir = os.path.join(self.config.checkpoint_dir, "best")
        save_checkpoint(best_dir, step, self.state)
        with open(os.path.join(best_dir, "best.json"), "w") as f:
            json.dump({"step": step, "miou": self.best_miou}, f)

    def _load_best_score(self):
        import json
        import os

        path = os.path.join(self.config.checkpoint_dir, "best", "best.json")
        if os.path.exists(path):
            with open(path) as f:
                self.best_miou = json.load(f)["miou"]

    def train(self, num_iters: int | None = None, val_batches: int = 10):
        from pointcontrast_tpu.utils.metrics import MetricsLogger

        cfg = self.config
        target = min(cfg.max_iter, int(self.state.step) + (num_iters or cfg.max_iter))
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
        if cfg.iter_size > 1:
            # gradient accumulation: stack iter_size loader batches along a
            # leading scan axis (after the device axis when data-parallel)
            src = self.train_loader
            axis = 1 if self.mesh is not None else 0
            batch = None  # the single init batch can't seed a stacked step

            def stacked():
                while True:
                    parts = [next(src) for _ in range(cfg.iter_size)]
                    yield jax.tree.map(
                        lambda *xs: np.stack(xs, axis=axis), *parts
                    )

            feed = device_prefetch(stacked(), sharding=sharding)
        else:
            feed = device_prefetch(self.train_loader, sharding=sharding)
        # Host-side iteration counter: int(self.state.step) would block on
        # the in-flight device step every iteration, serializing dispatch.
        # Step time is accounted per stat window (wall - data), the only
        # honest per-step figure once dispatch is pipelined.
        curr = int(self.state.step)
        win_t0, win_data, win_iters = time.perf_counter(), 0.0, 0
        while curr < target:
            t0 = time.perf_counter()
            if batch is None:
                batch = next(feed)
            dt = time.perf_counter() - t0
            data_meter.update(dt)
            win_data += dt
            step_fn = self._step
            if self._step_nofilter is not None and self._coin.rand() >= 0.5:
                step_fn = self._step_nofilter
            self.state, metrics = step_fn(self.state, batch)
            batch = None
            curr += 1
            win_iters += 1
            if curr % cfg.stat_freq == 0 or curr == target:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                step_timer.avg = (
                    time.perf_counter() - win_t0 - win_data
                ) / win_iters
                win_t0, win_data, win_iters = time.perf_counter(), 0.0, 0
                history.append((curr, m))
                writer.add_scalars(m, curr, prefix="train/")
                log.info(
                    "iter %d loss %.4f acc %.3f (data %.3fs step %.3fs)",
                    curr, m["loss"], m["acc"], data_meter.avg, step_timer.avg,
                )
                if m.get("truncated_voxels", 0) > 0:
                    log.warning(
                        "iter %d: pyramid truncation dropped %.0f voxels "
                        "this batch — PadScheme level ratios too tight",
                        curr, m["truncated_voxels"],
                    )
            if (self.val_dataset is not None or self.val_loader is not None) and (
                curr % cfg.val_freq == 0 or curr == target
            ):
                if self.val_dataset is not None:
                    miou, ious, acc, scenes = evaluate_dataset(
                        self.state, self.val_dataset, self.val_scheme,
                        self.num_classes, self.val_batch_size,
                        cfg.ignore_label, self._eval_step,
                        conv0_kernel_size=self.conv0_kernel_size,
                        layout=self.layout, crf=self.crf,
                    )
                    log.info("val iter %d: full split (%d scenes)", curr, scenes)
                else:
                    miou, ious, acc = evaluate(
                        self.state, self.val_loader, self.num_classes,
                        val_batches, cfg.ignore_label, self._eval_step,
                    )
                log.info("val iter %d mIoU %.2f acc %.2f", curr, miou, acc)
                writer.add_scalar("val/miou", miou, curr)
                writer.add_scalar("val/acc", acc, curr)
                if miou > self.best_miou:
                    self.best_miou = miou
                    self._save_best(curr)
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
