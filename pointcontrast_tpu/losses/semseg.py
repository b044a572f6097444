"""Semantic segmentation loss + metrics.

Mirrors the reference semseg training loss (CrossEntropy with ignore label
255, /root/reference/downstream/semseg/lib/train.py:63-66,129) and eval
metrics (fast_hist / per_class_iu, lib/utils.py:117-138), jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy_ignore(
    logits: jnp.ndarray,  # [N, num_classes]
    labels: jnp.ndarray,  # [N] int, ignore entries == ignore_label
    ignore_label: int = 255,
    weights: jnp.ndarray | None = None,  # [num_classes] class weights
):
    """Mean softmax cross-entropy over non-ignored rows."""
    num_classes = logits.shape[-1]
    valid = (labels != ignore_label) & (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    w = jnp.ones_like(nll)
    if weights is not None:
        w = jnp.take(weights, safe)
    w = w * valid.astype(nll.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def precision_at_one(pred, target, ignore_label: int = 255):
    """Reference lib/utils.py:123-128."""
    valid = target != ignore_label
    correct = (pred == target) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1) * 100.0


def fast_hist(pred, label, n: int):
    """Confusion matrix accumulate; numpy mirror of lib/utils.py:131-134."""
    pred = np.asarray(pred).ravel()
    label = np.asarray(label).ravel()
    k = (label >= 0) & (label < n)
    return np.bincount(
        n * label[k].astype(int) + pred[k], minlength=n**2
    ).reshape(n, n)


def per_class_iu(hist: np.ndarray) -> np.ndarray:
    """Reference lib/utils.py:137-138."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
