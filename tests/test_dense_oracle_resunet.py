"""Full-network dense oracle for the MinkUNet/ResUNet family.

Same method as test_dense_oracle.py (an independent dense twin run with
identical weights), covering what the Res16UNet oracle does not:

  - the 4-level MinkUNetBase topology with a residual stage at LEVEL 0
    (reference resunet.py:175-221 runs block1 before any striding);
  - the final MLP head (1x1 -> 512, BN momentum 0.1, ReLU, 1x1 head,
    resunet.py:165-173);
  - the hypercolumn variant's chained pooling-transposes to level 0 and
    the [out, up(out6), up(out5)] concat (MinkUNetHyper, resunet.py:275-486);
  - BasicBlockINBN's InstanceNorm+BatchNorm normalization (reference
    resnet_block.py BasicBlockINBN + semseg lib/layers.py:49-90).

Helpers are shared with test_dense_oracle (pytest prepends tests/ to
sys.path for rootdir test modules).
"""
import jax
import jax.numpy as jnp
import numpy as np

from test_dense_oracle import (
    OFFS3,
    _randomize_stats,
    d_bn,
    d_block,
    d_conv,
    d_conv_down,
    d_conv_up,
    d_linear,
    mask_of,
    read_at,
    to_dense,
)

from pointcontrast_tpu.nn.registry import load_model
from pointcontrast_tpu.sparse.topology import build_pyramid

G0 = 16  # levels 16, 8, 4, 2
NUM_LEVELS = 4
NPADS = [384, 384, 192, 48]


def d_inorm(x, mask, p):
    """Per-sample masked instance norm (SparseInstanceNorm twin)."""
    n = jnp.maximum(mask.sum(axis=(1, 2, 3), keepdims=True), 1.0)
    mean = (x * mask).sum(axis=(1, 2, 3), keepdims=True) / n
    centered = (x - mean) * mask
    var = jnp.square(centered).sum(axis=(1, 2, 3), keepdims=True) / n
    out = centered * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return out * mask


def d_inbn(x, mask, p, s):
    """InstanceBatchNorm twin: instance norm then eval-mode BN."""
    x = d_inorm(x, mask, p["inorm"])
    return d_bn(x, mask, p["bnorm"], s["bnorm"], train=False)


def d_block_inbn(x, mask, p, s):
    """BasicBlockINBN twin."""
    out = d_conv(x, p["SparseConv_0"]["kernel"], OFFS3) * mask
    out = d_inbn(out, mask, p["norm1"], s["norm1"])
    out = jax.nn.relu(out)
    out = d_conv(out, p["SparseConv_1"]["kernel"], OFFS3) * mask
    out = d_inbn(out, mask, p["norm2"], s["norm2"])
    if "downsample_conv" in p:
        residual = d_linear(x, mask, p["downsample_conv"])
        residual = d_inbn(residual, mask, p["downsample_norm"],
                          s["downsample_norm"])
    else:
        residual = x
    return jax.nn.relu(out + residual)


def d_stage(x, mask, p, s, name):
    i = 0
    while f"{name}_{i}" in p:
        blk_p, blk_s = p[f"{name}_{i}"], s[f"{name}_{i}"]
        if "norm1" in blk_p:  # INBN block
            x = d_block_inbn(x, mask, blk_p, blk_s)
        else:
            x = d_block(x, mask, blk_p, blk_s, train=False)
        i += 1
    return x


def d_unpool_to0(x, from_level, mask0):
    """Chained kernel-2 pooling transpose: nearest-parent upsampling, one
    spatial doubling per level (sparse_avg_unpool twin; a level-0 voxel's
    parent chain always exists by pyramid construction)."""
    for _ in range(from_level):
        for ax in (1, 2, 3):
            x = jnp.repeat(x, 2, axis=ax)
    return x * mask0


def dense_forward_resunet(variables, grid0, masks, hyper=False):
    p, s = variables["params"], variables["batch_stats"]

    out = d_conv(grid0, p["conv1p1s1"]["kernel"], OFFS3) * masks[0]
    out = jax.nn.relu(d_bn(out, masks[0], p["bn1"], s["bn1"], train=False))
    out = d_stage(out, masks[0], p, s, "block1")

    skips = [out]
    for st in range(3):
        name = f"conv{st + 2}p{2 ** st}s2"
        out = d_conv_down(out, p[name]["kernel"]) * masks[st + 1]
        out = jax.nn.relu(
            d_bn(out, masks[st + 1], p[f"bn{st + 2}"], s[f"bn{st + 2}"],
                 train=False)
        )
        out = d_stage(out, masks[st + 1], p, s, f"block{st + 2}")
        if st < 2:
            skips.append(out)

    hyps = []
    for d in range(3):
        lvl = 2 - d
        name = f"convtr{4 + d}p{2 ** (3 - d)}s2"
        out = d_conv_up(out, p[name]["kernel"]) * masks[lvl]
        out = jax.nn.relu(
            d_bn(out, masks[lvl], p[f"bntr{4 + d}"], s[f"bntr{4 + d}"],
                 train=False)
        )
        out = jnp.concatenate([out, skips[lvl]], axis=-1)
        if d < 2:
            out = d_stage(out, masks[lvl], p, s, f"block{5 + d}")
            if hyper:
                hyps.append(d_unpool_to0(out, lvl, masks[0]))

    if hyper:
        out = jnp.concatenate([out] + hyps[::-1], axis=-1)
    out = d_linear(out, masks[0], p["final_fc"])
    out = jax.nn.relu(
        d_bn(out, masks[0], p["final_bn"], s["final_bn"], train=False)
    )
    return d_linear(out, masks[0], p["final"])


def _build(model_name, rng):
    model = load_model(model_name)(in_channels=3, out_channels=6)
    coords = []
    for b in range(2):
        flat = rng.choice(G0 ** 3, 120, replace=False)
        xyz = np.stack(np.unravel_index(flat, (G0,) * 3), axis=1)
        coords.append(np.concatenate([np.full((120, 1), b), xyz], axis=1))
    coords = np.concatenate(coords).astype(np.int32)
    pyr, meta = build_pyramid(
        coords, NUM_LEVELS, npads=NPADS, allow_truncate=False,
    )
    feats_rows = rng.randn(len(coords), 3).astype(np.float32)
    feats = np.zeros((NPADS[0], 3), np.float32)
    feats[: len(coords)] = feats_rows
    variables = jax.jit(
        lambda r, f, p: model.init(r, f, p, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(feats), pyr)
    variables = _randomize_stats(variables, rng)
    grid0 = to_dense(coords, feats_rows, G0, 3, 2)
    masks = [
        jnp.asarray(mask_of(meta.coords[l], G0 >> l, 2))
        for l in range(NUM_LEVELS)
    ]
    return model, pyr, meta, jnp.asarray(feats), variables, grid0, masks


class TestResUNetDenseOracle:
    def test_resunet14_forward_parity(self):
        rng = np.random.RandomState(17)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "ResUNet14", rng
        )
        sparse_out = model.apply(variables, feats, pyr, train=False)
        dense_out = dense_forward_resunet(
            variables, jnp.asarray(grid0), masks
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4,
        )
        assert np.all(np.asarray(sparse_out)[meta.counts[0]:] == 0)

    def test_minkunethyper14inbn_forward_parity(self):
        """Hypercolumn unpool path + InstanceNorm-BatchNorm blocks."""
        rng = np.random.RandomState(19)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "MinkUNetHyper14INBN", rng
        )
        sparse_out = model.apply(variables, feats, pyr, train=False)
        dense_out = dense_forward_resunet(
            variables, jnp.asarray(grid0), masks, hyper=True
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4,
        )
