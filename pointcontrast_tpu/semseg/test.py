"""Semseg test/inference: per-scene eval, prediction export, full-cloud eval.

Mirrors /root/reference/downstream/semseg/lib/test.py:62-197: no-grad pass
per scene, fast_hist confusion -> per-class IoU, average precision, optional
prediction export in the reference's ``pred_%04d_%02d.npy`` format (rows
[x y z raw_label] in ORIGINAL coordinates via the stored inverse voxel
transform, lib/utils.py:304-349), then the dataset's full-pointcloud
nearest-voxel transfer (``test_pointcloud``).
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

from pointcontrast_tpu.data.collate import PadScheme
from pointcontrast_tpu.losses.semseg import fast_hist, per_class_iu
from pointcontrast_tpu.semseg.dataset import collate_semseg

log = logging.getLogger(__name__)


def average_precision(probs: np.ndarray, labels: np.ndarray,
                      num_classes: int) -> np.ndarray:
    """Per-class AP over per-voxel scores (the reference uses sklearn's
    average_precision_score with micro averaging per class,
    lib/test.py:143-149); classes absent from labels give nan."""
    aps = np.full(num_classes, np.nan)
    for c in range(num_classes):
        y = labels == c
        if not y.any():
            continue
        s = probs[:, c]
        order = np.argsort(-s)
        y = y[order]
        tp = np.cumsum(y)
        precision = tp / np.arange(1, len(y) + 1)
        aps[c] = float((precision * y).sum() / max(y.sum(), 1))
    return aps


def test_model(  # noqa: the reference names this "test" (lib/test.py:62)
    state,
    dataset,
    num_classes: int,
    scheme: PadScheme,
    ignore_label: int = 255,
    save_pred_dir: str | None = None,
    max_scenes: int | None = None,
    eval_step=None,
):
    """Evaluate scene-by-scene (batch 1, no augmentation).

    Returns dict(miou, per_class_iou, acc, ap, map); when ``save_pred_dir``
    is set, writes pred_%04d_%02d.npy files usable by
    ``dataset.test_pointcloud``.
    """
    from pointcontrast_tpu.semseg.train import make_eval_step

    eval_step = eval_step or jax.jit(make_eval_step())
    want_transform = save_pred_dir is not None
    if want_transform:
        os.makedirs(save_pred_dir, exist_ok=True)
        prev = dataset.return_transformation
        dataset.return_transformation = True

    hist = np.zeros((num_classes, num_classes))
    all_probs, all_labels = [], []
    n = len(dataset) if max_scenes is None else min(max_scenes, len(dataset))
    for i in range(n):
        sample = dataset[i]
        coords, feats, labels = sample[:3]
        transformation = sample[3] if want_transform else None
        sc = scheme
        if len(coords) > scheme.npads[0] - 1:
            # Inference must keep EVERY point (the exported rows are joined
            # 1:1 against the original cloud): upsize to the next pad bucket
            # instead of letting the collator subsample.  Bucketing keeps
            # the number of distinct compiled programs O(log N).
            import dataclasses as _dc

            from pointcontrast_tpu.sparse.topology import bucket_size

            sc = _dc.replace(scheme, npad0=bucket_size(len(coords)))
            log.info(
                "scene %d: %d voxels exceed npad0 %d, padding to %d",
                i, len(coords), scheme.npads[0], sc.npad0,
            )
        batch = collate_semseg(
            [(coords, feats, labels)], sc, ignore_label=ignore_label,
            shift_coords=False,
        )
        pred, prob = jax.device_get(eval_step(state, batch))
        nvalid = int(batch.pyramid.levels[0].valid.sum())
        pred = pred[:nvalid]
        prob = prob[:nvalid]
        lab = np.asarray(batch.labels[:nvalid])
        mask = lab != ignore_label
        hist += fast_hist(pred[mask], lab[mask], num_classes)
        all_probs.append(prob[mask])
        all_labels.append(lab[mask])

        if want_transform:
            # back to original coordinates: coords are voxel ints; the
            # stored 4x4 maps original -> voxel space (lib/utils.py:304-349)
            t = np.linalg.inv(transformation.reshape(4, 4))
            homo = np.hstack([coords + 0.5, np.ones((len(coords), 1))])
            orig = (homo @ t.T)[:, :3]
            inv_label_map = {v: k for k, v in dataset.label_map.items()}
            raw = np.array([inv_label_map.get(int(p), p) for p in pred])
            np.save(
                os.path.join(save_pred_dir, "pred_%04d_%02d.npy" % (i, 0)),
                np.hstack([orig, raw[:, None]]),
            )

    if want_transform:
        dataset.return_transformation = prev

    ious = per_class_iu(hist) * 100
    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    aps = average_precision(probs, labels, num_classes)
    acc = 100.0 * np.diag(hist).sum() / max(hist.sum(), 1)
    return {
        "miou": float(np.nanmean(ious)),
        "per_class_iou": ious,
        "acc": float(acc),
        "ap": aps,
        "map": float(np.nanmean(aps)),
    }


test_model.__test__ = False  # keep pytest from collecting the API function
