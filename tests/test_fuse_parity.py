"""Quantify the fused-frame BN delta against per-frame parity mode.

``fuse_frames=True`` (the benched default) runs ONE forward over both frames
of each pair, so train-mode BatchNorm normalizes the frames jointly; the
reference runs two sequential forwards (ddp_trainer.py:290-297) which
``fuse_frames=False`` reproduces.  These tests pin down the delta:

- eval mode (running stats): the two modes are numerically IDENTICAL per
  point — fusion is pure batching, not an approximation.
- train mode: the only divergence is BN batch statistics.  Joint vs
  per-frame moments are different (equally valid) estimators: the measured
  loss drift is ~3% relative on this deliberately tiny config (4-ch model,
  ~1.2k voxels/frame; the moment noise scales as 1/sqrt(rows) — production
  batches run ~126k).  Per-step gradients through the moment coupling can
  differ substantially at random init, so the meaningful equivalence is the
  TRAJECTORY: short SGD runs in both modes must descend to matching losses.
  Recorded in PARITY.md "Known deltas".
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset
from pointcontrast_tpu.data.collate import collate_pair
from pointcontrast_tpu.losses.contrastive import point_info_nce_loss
from pointcontrast_tpu.nn.res16unet import Res16UNetBase
from pointcontrast_tpu.nn.resnet_block import BasicBlock
from pointcontrast_tpu.train.state import create_train_state


class TinyUNet(Res16UNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
    INIT_DIM = 4


NPOS = 192


@pytest.fixture(scope="module")
def batches():
    ds = SyntheticPairDataset(num_pairs=2, points_per_frame=600, seed=3)
    samples = [ds[0], ds[1]]
    # flat ratios: diffuse synthetic clouds barely shrink under coarsening,
    # and the fused pyramid holds both frames — leave full headroom so no
    # level truncates (truncation is measured separately in test_data.py)
    scheme = PadScheme(npad0=4096, level_ratios=(1, 1, 1, 1, 1))
    fused = collate_pair(
        list(samples), scheme, mode="nce", npos=NPOS,
        rng=np.random.RandomState(0), fuse_frames=True,
    )
    split = collate_pair(
        list(samples), scheme, mode="nce", npos=NPOS,
        rng=np.random.RandomState(0), fuse_frames=False,
    )
    return fused, split


@pytest.fixture(scope="module")
def model_state(batches):
    _, split = batches
    model = TinyUNet(in_channels=3, out_channels=8, normalize_feature=True)
    state = create_train_state(
        jax.random.PRNGKey(0), model, optax.sgd(0.1),
        (split.feats0, split.pyramid0),
    )
    return model, state


def _pair_feats(model, state, batch, train):
    """(f_q[npos, C], f_k[npos, C], valid) for either collate mode."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    kw = dict(mutable=["batch_stats"]) if train else {}
    out0 = model.apply(variables, batch.feats0, batch.pyramid0, train=train, **kw)
    f0 = out0[0] if train else out0
    if batch.feats1 is None:
        f1 = f0
    else:
        out1 = model.apply(variables, batch.feats1, batch.pyramid1, train=train, **kw)
        f1 = out1[0] if train else out1
    return f0[batch.q_idx], f1[batch.k_idx], batch.pair_valid


def test_eval_mode_fusion_is_exact(batches, model_state):
    """With running-stat BN there is no cross-row coupling: the fused
    combined table must contain the exact per-frame features."""
    fused, split = batches
    model, state = model_state
    qf, kf, vf = _pair_feats(model, state, fused, train=False)
    qs, ks, vs = _pair_feats(model, state, split, train=False)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vs))
    m = np.asarray(vf, bool)
    np.testing.assert_allclose(
        np.asarray(qf)[m], np.asarray(qs)[m], rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kf)[m], np.asarray(ks)[m], rtol=0, atol=1e-5
    )


def _nce_from_feats(q, k, v):
    # same masked-CE math as losses.contrastive.point_info_nce_loss but on
    # pre-gathered rows (both collate modes gather identically)
    logits = (q @ k.T) / 0.4
    mask = v.astype(jnp.float32)
    logits = jnp.where(v[None, :], logits, -1e9)
    labels = jnp.arange(q.shape[0])
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)


def test_train_mode_bn_drift_is_small(batches, model_state):
    """Same-params loss drift is bounded, and short SGD trajectories in the
    two modes descend to matching losses."""
    fused, split = batches
    model, state = model_state

    def make_sgd(batch):
        @jax.jit
        def step(params):
            def fn(p):
                st = state.replace(params=p)
                q, k, v = _pair_feats(model, st, batch, train=True)
                return _nce_from_feats(q, k, v)
            loss, grads = jax.value_and_grad(fn)(params)
            new = jax.tree.map(lambda p, g: p - 0.3 * g, params, grads)
            return new, loss
        return step

    step_f, step_s = make_sgd(fused), make_sgd(split)
    pf = ps = state.params
    loss_f0 = loss_s0 = None
    for i in range(12):
        pf, lf = step_f(pf)
        ps, ls = step_s(ps)
        if i == 0:
            loss_f0, loss_s0 = float(lf), float(ls)
    loss_f0, loss_s0 = float(loss_f0), float(loss_s0)
    lf, ls = float(step_f(pf)[1]), float(step_s(ps)[1])

    # same-params loss drift (step 0): bounded BN-moment noise
    rel0 = abs(loss_f0 - loss_s0) / max(abs(loss_s0), 1e-8)
    assert rel0 < 0.06, f"fused-BN loss drift {rel0:.4f} exceeds 6%"

    # both estimators descend, to comparable losses
    assert lf < loss_f0 - 0.25, f"fused mode failed to descend: {loss_f0}->{lf}"
    assert ls < loss_s0 - 0.25, f"split mode failed to descend: {loss_s0}->{ls}"
    assert abs(lf - ls) / max(ls, 1e-8) < 0.25, (
        f"trajectories diverged: fused {lf:.4f} vs split {ls:.4f}"
    )
