"""Custom sparse norms vs numpy oracles of the reference math
(downstream/semseg/lib/layers.py MinkowskiLayerNorm / MinkowskiInstanceNorm)."""
import numpy as np
import jax
import jax.numpy as jnp

from pointcontrast_tpu.nn.layers import SparseInstanceNorm, SparseLayerNorm


def make_batch(seed=0, npad=64, c=5, num_batch=2):
    rng = np.random.RandomState(seed)
    n = npad - 10
    batch = np.concatenate([
        np.sort(rng.randint(0, num_batch, n)),
        np.full(10, num_batch),
    ]).astype(np.int32)
    valid = (batch < num_batch).astype(np.float32)
    feats = rng.randn(npad, c).astype(np.float32) * 3 + 1.5
    feats *= valid[:, None]
    return feats, valid, batch


def reference_layer_norm(feats, valid, batch, num_batch, eps=1e-5):
    """lib/layers.py:41-51: scalar per-sample moments over voxels+channels."""
    out = np.zeros_like(feats)
    for b in range(num_batch):
        rows = (batch == b) & (valid > 0)
        x = feats[rows]
        mean = x.mean()  # glob_mean(x).mean(-1): scalar
        var = ((x - mean) ** 2).mean()
        out[rows] = (x - mean) / np.sqrt(var + eps)
    return out


def test_sparse_layer_norm_matches_reference_math():
    feats, valid, batch, = make_batch()
    num_batch = 2
    m = SparseLayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(valid),
               jnp.asarray(batch), num_batch)
    out = m.apply(v, jnp.asarray(feats), jnp.asarray(valid),
                  jnp.asarray(batch), num_batch)
    ref = reference_layer_norm(feats, valid, batch, num_batch)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # pad rows stay exactly zero (scale=1, bias=0 at init)
    assert np.abs(np.asarray(out)[valid == 0]).max() == 0.0


def test_sparse_instance_norm_normalizes_per_sample():
    feats, valid, batch = make_batch(seed=1)
    num_batch = 2
    m = SparseInstanceNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(valid),
               jnp.asarray(batch), num_batch)
    out = np.asarray(m.apply(v, jnp.asarray(feats), jnp.asarray(valid),
                             jnp.asarray(batch), num_batch))
    for b in range(num_batch):
        rows = (batch == b) & (valid > 0)
        np.testing.assert_allclose(out[rows].mean(0), 0.0, atol=1e-4)
