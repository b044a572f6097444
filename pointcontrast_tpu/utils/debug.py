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


def validate_pyramid(pyramid):
    """Invariant checks over a sparse.topology.Pyramid."""
    levels = pyramid.levels
    for i, lv in enumerate(levels):
        npad = np.asarray(lv.nbr).shape[1]
        _check_level(lv, npad)
        if lv.down_nbr is not None:
            next_pad = np.asarray(levels[i + 1].nbr).shape[1]
            dn = np.asarray(lv.down_nbr)
            assert dn.shape[1] == next_pad
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
        n0 = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
        assert np.all(np.asarray(batch.feats0)[n0:] == 0), "pad rows not zero"
        for name in ("q_idx", "k_idx", "pos0_idx", "pos1_idx",
                     "cand0_idx", "cand1_idx"):
            arr = getattr(batch, name)
            if arr is not None:
                a = np.asarray(arr)
                assert a.min() >= 0 and a.max() < npad0, f"{name} out of range"
    elif hasattr(batch, "pyramid"):  # SemsegBatch
        validate_pyramid(batch.pyramid)
        n = int(np.asarray(batch.pyramid.levels[0].valid).sum())
        feats = np.asarray(batch.feats)
        labels = np.asarray(batch.labels)
        assert np.all(feats[n:] == 0), "pad feature rows not zero"
        assert np.all(labels[n:] == 255) or labels[n:].size == 0
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
