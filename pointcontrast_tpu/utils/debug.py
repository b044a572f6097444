"""Debug & validation utilities.

SURVEY §5.2: the reference's only sanitizer is torch's global autograd
anomaly mode (pretrain lib/ddp_trainer.py:36).  TPU-native equivalents:

  - ``validate_batch``: host-side invariant checks on collated batches
    (index ranges, zero padding, mask consistency) — cheap enough to run in
    the loader when ``PC_TPU_VALIDATE=1``.
  - ``checkify_step``: wrap a jitted step with ``jax.experimental.checkify``
    to surface NaNs and out-of-bounds indices from inside the compiled
    program (the anomaly-mode analogue).
"""
from __future__ import annotations

import numpy as np


def _check_level(lv, npad, prev_npad=None):
    nbr = np.asarray(lv.nbr)
    assert nbr.shape[1] == npad, f"nbr pad {nbr.shape[1]} != {npad}"
    assert nbr.min() >= 0 and nbr.max() < npad, "nbr index out of range"
    valid = np.asarray(lv.valid)
    n = int(valid.sum())
    assert (valid[:n] == 1).all() and (valid[n:] == 0).all(), (
        "valid mask must be a prefix"
    )
    assert nbr[:, n:].min() == npad - 1 if n < npad else True


def _is_flat_level(lv):
    """Brick levels carry BrickMap/BrickDownMap wrappers whose indices live
    one level up — only flat int-array levels are index-checkable here."""
    return isinstance(getattr(lv, "nbr", None), np.ndarray) or (
        hasattr(getattr(lv, "nbr", None), "dtype")
    )


def validate_pyramid(pyramid):
    """Invariant checks over a sparse.topology.Pyramid (flat levels only:
    brick levels' maps are validated transitively through the coarse flat
    level they index into)."""
    levels = pyramid.levels
    for i, lv in enumerate(levels):
        if not _is_flat_level(lv):
            continue
        npad = np.asarray(lv.nbr).shape[1]
        _check_level(lv, npad)
        if lv.down_nbr is not None and _is_flat_level(levels[i + 1]):
            dn = getattr(lv.down_nbr, "nbr", lv.down_nbr)
            if not (isinstance(dn, np.ndarray) or hasattr(dn, "dtype")):
                continue
            next_pad = np.asarray(levels[i + 1].nbr).shape[1]
            dn = np.asarray(dn)
            if dn.shape[1] != next_pad:
                continue  # brick down map indexing a packed layout
            assert dn.min() >= 0 and dn.max() < npad
            up = np.asarray(lv.up_parent)
            assert up.shape[0] == npad
            assert up.min() >= 0 and up.max() < next_pad
            uo = np.asarray(lv.up_offset)
            assert uo.min() >= 0 and uo.max() < dn.shape[0]


def validate_batch(batch):
    """Invariant checks for PairBatch / SemsegBatch / DetectionBatch."""
    if hasattr(batch, "pyramid0"):  # PairBatch
        validate_pyramid(batch.pyramid0)
        if batch.pyramid1 is not None:
            validate_pyramid(batch.pyramid1)
        npad0 = np.asarray(batch.feats0).shape[0]
        lv0 = batch.pyramid0.levels[0]
        valid0 = np.asarray(lv0.valid)
        if _is_flat_level(lv0):
            n0 = int(valid0.sum())
            assert np.all(np.asarray(batch.feats0)[n0:] == 0), "pad rows not zero"
        else:  # brick rows: empty slots (valid == 0) must hold zeros
            assert np.all(np.asarray(batch.feats0)[valid0 == 0] == 0), (
                "pad rows not zero"
            )
        for name in ("q_idx", "k_idx", "pos0_idx", "pos1_idx",
                     "cand0_idx", "cand1_idx"):
            arr = getattr(batch, name)
            if arr is not None:
                a = np.asarray(arr)
                assert a.min() >= 0 and a.max() < npad0, f"{name} out of range"
    elif hasattr(batch, "pyramid"):  # SemsegBatch
        validate_pyramid(batch.pyramid)
        lv0 = batch.pyramid.levels[0]
        valid0 = np.asarray(lv0.valid)
        feats = np.asarray(batch.feats)
        labels = np.asarray(batch.labels)
        if _is_flat_level(lv0):
            n = int(valid0.sum())
            assert np.all(feats[n:] == 0), "pad feature rows not zero"
            assert np.all(labels[n:] == 255) or labels[n:].size == 0
        else:
            assert np.all(feats[valid0 == 0] == 0), "pad feature rows not zero"
    elif hasattr(batch, "point_clouds"):  # DetectionBatch
        if batch.voxel_pyramid is not None:
            validate_pyramid(batch.voxel_pyramid)
            npad0 = np.asarray(batch.voxel_feats).shape[0]
            pvi = np.asarray(batch.point_voxel_idx)
            assert pvi.min() >= 0 and pvi.max() < npad0
    return True


def checkify_step(step_fn):
    """Wrap ``step(state, batch) -> (state, metrics)`` with checkify NaN and
    index checks; the returned function raises on the first error."""
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks
    )
    jitted = jax.jit(checked)

    def run(state, batch):
        err, out = jitted(state, batch)
        err.throw()
        return out

    return run
