"""VoteNet training/eval loops.

Mirrors /root/reference/downstream/votenet_det_new/lib/train.py:44-217 and
lib/test.py:24-95: Adam with epoch-milestone LR decay, BN-momentum decay
(0.5 halved every ``bn_decay_step`` epochs, floored at 0.001 — applied by
rebuilding the jitted step; the persistent compilation cache makes each
momentum value a one-time cost), eval every N epochs with APCalculator at
IoU 0.25/0.5.
"""
from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcontrast_tpu.detect.ap_helper import (
    APCalculator,
    parse_groundtruths,
    parse_predictions,
)
from pointcontrast_tpu.detect.loss import get_loss
from pointcontrast_tpu.train.checkpoint import save_checkpoint
from pointcontrast_tpu.train.state import TrainState, create_train_state

log = logging.getLogger(__name__)


@dataclasses.dataclass
class DetectConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    lr_decay_steps: tuple = (80, 120, 160)  # epochs
    lr_decay_rates: tuple = (0.1, 0.1, 0.1)
    bn_decay_step: int = 20
    bn_decay_rate: float = 0.5
    bn_momentum_init: float = 0.5
    bn_momentum_min: float = 0.001
    max_epoch: int = 180
    eval_every: int = 5
    checkpoint_dir: str = "weights_votenet"
    # AP config (reference lib/test.py:33-42)
    ap_iou_thresholds: tuple = (0.25, 0.5)
    use_3d_nms: bool = True
    cls_nms: bool = True
    nms_iou: float = 0.25
    use_old_type_nms: bool = False
    per_class_proposal: bool = True
    conf_thresh: float = 0.05
    remove_empty_box: bool = False


def get_current_lr(epoch: int, config: DetectConfig) -> float:
    lr = config.learning_rate
    for step, rate in zip(config.lr_decay_steps, config.lr_decay_rates):
        if epoch >= step:
            lr *= rate
    return lr


def get_bn_momentum(epoch: int, config: DetectConfig) -> float:
    m = config.bn_momentum_init * (
        config.bn_decay_rate ** (epoch // config.bn_decay_step)
    )
    return max(m, config.bn_momentum_min)


def make_detect_train_step(model, dataset_config, lr_schedule=None):
    """step(state, batch_dict) -> (state, metrics); Adam via optax (the LR
    is set per epoch through inject_hyperparams, see DetectTrainer.set_lr).

    BoxNet (``use_voting=False``) has no vote branch: it trains with
    ``get_loss_boxnet`` (reference loss_helper_boxnet.py), selected here
    from the model flag."""
    from pointcontrast_tpu.detect.loss import get_loss_boxnet

    voting = getattr(model, "use_voting", True)
    loss_of = get_loss if voting else get_loss_boxnet
    metric_keys = (
        "loss", "vote_loss", "objectness_loss", "box_loss",
        "sem_cls_loss", "obj_acc", "pos_ratio", "neg_ratio",
    )  # get_loss_boxnet reports vote_loss = 0

    def step(state: TrainState, batch, axis_name: str | None = None):
        from pointcontrast_tpu.parallel.mesh import pmean_if_parallel

        inputs = _batch_to_inputs(batch)
        labels = _batch_to_labels(batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            end_points, mut = state.apply_fn(
                variables, inputs, train=True, mutable=["batch_stats"]
            )
            end_points.update(labels)
            loss, end_points = loss_of(end_points, dataset_config)
            metrics = {k: end_points[k] for k in metric_keys}
            return loss, (mut["batch_stats"], metrics)

        (_, (bs, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = pmean_if_parallel(grads, axis_name)
        metrics = pmean_if_parallel(metrics, axis_name)
        new_state = state.apply_gradients(grads, new_batch_stats=bs)
        return new_state, metrics

    return step


def _batch_to_inputs(batch) -> dict:
    inputs = {"point_clouds": batch.point_clouds}
    if batch.voxel_feats is not None:
        inputs.update(
            voxel_feats=batch.voxel_feats,
            voxel_pyramid=batch.voxel_pyramid,
            point_voxel_idx=batch.point_voxel_idx,
        )
    return inputs


def _batch_to_labels(batch) -> dict:
    return {
        "center_label": batch.center_label,
        "heading_class_label": batch.heading_class_label,
        "heading_residual_label": batch.heading_residual_label,
        "size_class_label": batch.size_class_label,
        "size_residual_label": batch.size_residual_label,
        "sem_cls_label": batch.sem_cls_label,
        "box_label_mask": batch.box_label_mask,
        "vote_label": batch.vote_label,
        "vote_label_mask": batch.vote_label_mask,
    }


class DetectTrainer:
    """Single-device by default; pass ``mesh`` for data parallelism (the
    loader must then stack ``num_device_batches == mesh size`` device
    batches on a leading axis — the reference trains VoteNet under DDP,
    ddp_main.py)."""

    def __init__(self, model, dataset_config, config: DetectConfig,
                 example_batch, rng=None, mesh=None):
        self.model = model
        self.dc = dataset_config
        self.config = config
        self.mesh = mesh
        self._lr = optax.inject_hyperparams(optax.adam)(
            learning_rate=config.learning_rate
        )
        tx = self._lr
        if config.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(config.weight_decay), tx
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if mesh is not None:
            example_batch = jax.tree.map(
                lambda x: x[0] if hasattr(x, "ndim") else x, example_batch
            )
        inputs = _batch_to_inputs(example_batch)
        self.state = create_train_state(rng, model, tx, (inputs,))
        self._compile_step(model)
        self.epoch = 0
        self.preemption_guard = None  # see utils/preemption.py

        from pointcontrast_tpu.train.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
        )

        ckpt = latest_checkpoint(config.checkpoint_dir)
        if ckpt is not None:
            template = {
                "curr_iter": np.asarray(0),
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "opt_state": jax.device_get(self.state.opt_state),
            }
            payload = load_checkpoint(ckpt, template=template)
            self.epoch = int(payload["curr_iter"])
            self.state = self.state.replace(
                step=self.epoch,
                params=payload["params"],
                batch_stats=payload["batch_stats"],
                opt_state=payload["opt_state"],
            )
            log.info("resumed from %s at epoch %d", ckpt, self.epoch)

    def _compile_step(self, model):
        step = make_detect_train_step(model, self.dc, None)
        if self.mesh is not None:
            from pointcontrast_tpu.parallel.mesh import data_parallel_step

            self._step = data_parallel_step(step, self.mesh)
        else:
            self._step = jax.jit(
                lambda s, b: step(s, b, axis_name=None), donate_argnums=0
            )
        self._eval_apply = jax.jit(
            lambda params, bs, inputs: model.apply(
                {"params": params, "batch_stats": bs}, inputs, train=False
            )
        )

    def set_lr(self, lr: float):
        # inject_hyperparams exposes the lr inside opt_state. NOTE: the
        # inject state is itself a NamedTuple (so `isinstance(x, tuple)` is
        # true) — check for .hyperparams FIRST, then recurse into chain
        # tuples.
        def update(tree):
            if hasattr(tree, "hyperparams"):
                tree.hyperparams["learning_rate"] = jnp.asarray(lr)
                return True
            if isinstance(tree, tuple):
                return any(update(o) for o in tree)
            return False

        if not update(self.state.opt_state):
            raise RuntimeError("no inject_hyperparams state found to set lr")

    def set_bn_momentum(self, momentum: float):
        """Rebuild the jitted step with the decayed BN momentum (reference
        BNMomentumScheduler, pytorch_utils.py:271-298).  Parameters and
        optimizer state carry over; one recompile per decay step (cached)."""
        if getattr(self, "_bn_momentum", None) == momentum:
            return
        self._bn_momentum = momentum
        model = self.model.clone(bn_momentum=momentum)
        self.state = self.state.replace(apply_fn=model.apply)
        self._compile_step(model)

    def train_epoch(self, loader, num_batches: int):
        cfg = self.config
        self.set_lr(get_current_lr(self.epoch, cfg))
        self.set_bn_momentum(get_bn_momentum(self.epoch, cfg))
        # Keep the loss on device per step and materialize once at epoch
        # end: a per-step float() blocks on the in-flight step and
        # serializes dispatch (same pipelining fix as PretrainTrainer's
        # host-counter loop — reference lib/train.py:57-99 accumulates on
        # host because torch is eager; under jit the sync is pure overhead).
        losses = []
        for _ in range(num_batches):
            batch = next(loader)
            self.state, metrics = self._step(self.state, batch)
            losses.append(metrics["loss"])
            if self.preemption_guard is not None and self.preemption_guard.preempted:
                from pointcontrast_tpu.utils.preemption import Preempted

                self.save(self.epoch)
                raise Preempted(self.epoch)
        self.epoch += 1
        return float(np.mean(jax.device_get(losses)))

    def evaluate(self, loader, num_batches: int | None = None):
        """AP over ``num_batches`` draws from an infinite loader, or — with
        ``num_batches=None`` — over a finite iterator drained to exhaustion
        (pass ``_BatchLoader.epoch()`` for a deterministic full val pass)."""
        cfg = self.config
        calcs = {
            t: APCalculator(t, self.dc.class2type) for t in cfg.ap_iou_thresholds
        }
        config_dict = {
            "dataset_config": self.dc,
            "remove_empty_box": cfg.remove_empty_box,
            "use_3d_nms": cfg.use_3d_nms,
            "cls_nms": cfg.cls_nms,
            "nms_iou": cfg.nms_iou,
            "use_old_type_nms": cfg.use_old_type_nms,
            "per_class_proposal": cfg.per_class_proposal,
            "conf_thresh": cfg.conf_thresh,
        }
        if num_batches is None:
            batches = iter(loader)
        else:
            batches = (next(loader) for _ in range(num_batches))
        for batch in batches:
            inputs = _batch_to_inputs(batch)
            end_points = self._eval_apply(
                self.state.params, self.state.batch_stats, inputs
            )
            end_points = {k: np.asarray(v) for k, v in end_points.items()}
            end_points.update(
                {k: np.asarray(v) for k, v in _batch_to_labels(batch).items()}
            )
            end_points["point_clouds"] = np.asarray(batch.point_clouds)
            pred = parse_predictions(end_points, config_dict)
            gt = parse_groundtruths(end_points, config_dict)
            for calc in calcs.values():
                calc.step(pred, gt)
        return {t: c.compute_metrics() for t, c in calcs.items()}

    def save(self, step: int | None = None):
        save_checkpoint(
            self.config.checkpoint_dir, step or self.epoch, self.state
        )
