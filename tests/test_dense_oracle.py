"""Full-network dense oracle for the Res16UNet family.

Builds an independent DENSE twin of the sparse U-Net — `lax.conv_general_
dilated` stem/block convs, slice-arithmetic stride-2 and transpose convs,
mask-aware batch norm on a [B, G, G, G, C] grid — runs it with the SAME
weights, and asserts forward parity at matched voxel coordinates.  This
catches composition bugs (kernel-offset order, stride alignment, skip
indexing, transpose parentage, mask propagation) that the per-op oracles in
test_sparse_ops.py cannot (VERDICT round-2 item 2; reference surface
pretrain/pointcontrast/model/res16unet.py:206-268 + modules/common.py:117-167).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcontrast_tpu.nn.registry import load_model
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import build_pyramid

G0 = 16  # level-0 grid; levels are 16, 8, 4, 2, 1
NPADS = [384, 384, 128, 32, 4]
NUM_LEVELS = 5

OFFS3 = kernel_offsets(3, 3, "hypercube")
OFFS2 = kernel_offsets((2, 2, 2), 3, "hypercube")


# ------------------------------------------------------------ dense helpers

def to_dense(coords, values, g, c, num_batch):
    """[N, 1+3] int coords + [N, C] rows -> [B, g, g, g, C]."""
    out = np.zeros((num_batch, g, g, g, c), np.float32)
    b, x, y, z = coords.T
    out[b, x, y, z] = values
    return out


def mask_of(coords, g, num_batch):
    m = np.zeros((num_batch, g, g, g, 1), np.float32)
    b, x, y, z = coords.T
    m[b, x, y, z, 0] = 1.0
    return m


def read_at(dense, coords):
    b, x, y, z = coords.T
    return np.asarray(dense)[b, x, y, z]


def d_conv(x, w, offsets):
    """Same-level conv via XLA's dense convolution (independent path).
    w: [K, Cin, Cout] in our kernel-offset order; offsets: [K, 3]."""
    k = int(offsets.max() - offsets.min()) + 1
    ctr = k // 2
    kern = np.zeros((k, k, k, w.shape[1], w.shape[2]), np.float32)
    for i, o in enumerate(np.asarray(offsets)):
        kern[o[0] + ctr, o[1] + ctr, o[2] + ctr] = w[i]
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kern), window_strides=(1, 1, 1),
        padding=[(ctr, ctr)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def d_conv_down(x, w):
    """Stride-2 kernel-2 conv: out[p] = sum_o W_o x[2p + o], offsets in the
    OFFS2 enumeration order."""
    return d_conv_strided(x, w, OFFS2, pad=0)


def d_conv_strided(x, w, offsets, pad):
    """General stride-2 conv: out[p] = sum_o W_o x[2p + o] for offsets in
    [-pad, ..]; covers k=2 (pad 0, OFFS2) and k=3 (pad 1, OFFS3 — the
    down_nbr3 maps of the ResNet family's strided residual blocks)."""
    g2 = x.shape[1] // 2
    if pad:
        x = jnp.pad(x, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)])
    out = 0.0
    for i, o in enumerate(np.asarray(offsets)):
        sl = x[:, o[0] + pad::2, o[1] + pad::2, o[2] + pad::2, :]
        out = out + jnp.einsum(
            "bxyzc,cd->bxyzd", sl[:, :g2, :g2, :g2, :], w[i]
        )
    return out


def d_sum_pool2(x):
    """Kernel-2 stride-2 sum pool (ops.sparse_sum_pool twin): empty cells
    hold zero so a plain sum matches the present-children sum."""
    g2 = x.shape[1] // 2
    out = 0.0
    for o in np.asarray(OFFS2):
        sl = x[:, o[0]::2, o[1]::2, o[2]::2, :][:, :g2, :g2, :g2, :]
        out = out + sl
    return out


def d_conv_up(x, w):
    """Stride-2 kernel-2 transpose conv: out[2p + o] += W_o x[p]."""
    g = x.shape[1] * 2
    out = jnp.zeros((x.shape[0], g, g, g, w.shape[2]), jnp.float32)
    for i, o in enumerate(np.asarray(OFFS2)):
        out = out.at[:, o[0]::2, o[1]::2, o[2]::2, :].add(
            jnp.einsum("bxyzc,cd->bxyzd", x, w[i])
        )
    return out


def d_bn(x, mask, p, s, train, moments=None, name=None):
    if train:
        n = jnp.maximum(mask.sum(), 1.0)
        mean = (x * mask).sum(axis=(0, 1, 2, 3)) / n
        var = (jnp.square(x - mean) * mask).sum(axis=(0, 1, 2, 3)) / n
        if moments is not None and name is not None:
            moments[name] = (mean, var, n)
    else:
        mean, var = s["mean"], s["var"]
    inv = jax.lax.rsqrt(var + 1e-5)
    return ((x - mean) * inv * p["scale"] + p["bias"]) * mask


def d_linear(x, mask, p):
    out = jnp.einsum("bxyzc,cd->bxyzd", x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out * mask


def d_block(x, mask, p, s, train):
    """BasicBlock twin (resnet_block.py:39-66) or Bottleneck twin
    (:69-101), keyed on the submodule names present."""
    if "SparseLinear_0" in p:  # Bottleneck: 1-3-1
        out = d_linear(x, mask, p["SparseLinear_0"])
        out = d_bn(out, mask, p["MaskedBatchNorm_0"],
                   s["MaskedBatchNorm_0"], train)
        out = jax.nn.relu(out)
        out = d_conv(out, p["SparseConv_0"]["kernel"], OFFS3) * mask
        out = d_bn(out, mask, p["MaskedBatchNorm_1"],
                   s["MaskedBatchNorm_1"], train)
        out = jax.nn.relu(out)
        out = d_linear(out, mask, p["SparseLinear_1"])
        out = d_bn(out, mask, p["MaskedBatchNorm_2"],
                   s["MaskedBatchNorm_2"], train)
    else:
        out = d_conv(x, p["SparseConv_0"]["kernel"], OFFS3) * mask
        out = d_bn(out, mask, p["MaskedBatchNorm_0"],
                   s["MaskedBatchNorm_0"], train)
        out = jax.nn.relu(out)
        out = d_conv(out, p["SparseConv_1"]["kernel"], OFFS3) * mask
        out = d_bn(out, mask, p["MaskedBatchNorm_1"],
                   s["MaskedBatchNorm_1"], train)
    if "downsample_conv" in p:
        residual = d_linear(x, mask, p["downsample_conv"])
        residual = d_bn(residual, mask, p["downsample_norm"],
                        s["downsample_norm"], train)
    else:
        residual = x
    return jax.nn.relu(out + residual)


def dense_forward(variables, grid0, masks, model, conv1_ks, train=False,
                  moments=None):
    """Dense twin of Res16UNetBase.__call__ (res16unet.py here).

    moments: optional dict collecting each top-level BN's train-mode batch
    (mean, var, n) for running-stat parity checks."""
    p, s = variables["params"], variables["batch_stats"]
    offs0 = kernel_offsets(conv1_ks, 3, "hypercube")
    inter = {}

    out = d_conv(grid0, p["conv0p1s1"]["kernel"], offs0) * masks[0]
    inter["conv0p1s1"] = out
    out = jax.nn.relu(
        d_bn(out, masks[0], p["bn0"], s["bn0"], train, moments, "bn0")
    )

    skips = [out]
    for st in range(4):
        name = f"conv{st + 1}p{2 ** st}s2"
        out = d_conv_down(out, p[name]["kernel"]) * masks[st + 1]
        inter[name] = out
        out = jax.nn.relu(
            d_bn(out, masks[st + 1], p[f"bn{st + 1}"], s[f"bn{st + 1}"],
                 train, moments, f"bn{st + 1}")
        )
        i = 0
        while f"block{st + 1}_{i}" in p:
            out = d_block(out, masks[st + 1], p[f"block{st + 1}_{i}"],
                          s[f"block{st + 1}_{i}"], train)
            i += 1
        if st < 3:
            skips.append(out)

    for d in range(4):
        lvl = 3 - d
        name = f"convtr{4 + d}p{2 ** (4 - d)}s2"
        out = d_conv_up(out, p[name]["kernel"]) * masks[lvl]
        inter[name] = out
        out = jax.nn.relu(
            d_bn(out, masks[lvl], p[f"bntr{4 + d}"], s[f"bntr{4 + d}"], train)
        )
        out = jnp.concatenate([out, skips[lvl]], axis=-1)
        i = 0
        while f"block{5 + d}_{i}" in p:
            out = d_block(out, masks[lvl], p[f"block{5 + d}_{i}"],
                          s[f"block{5 + d}_{i}"], train)
            i += 1

    out = d_linear(out, masks[0], p["final"])
    if getattr(model, "normalize_feature", False):
        sq = jnp.sum(jnp.square(out), axis=-1, keepdims=True)
        out = out * jax.lax.rsqrt(jnp.maximum(sq, 1e-12)) * masks[0]
    return out, inter


def dense_resnet_forward(variables, grid0, masks, model, train=False):
    """Dense twin of ResNetBase.__call__ (nn/resnet.py): stem -> k2s2 sum
    pool -> 4 stride-2 residual layers (k3s2 first block + 1x1-center-child
    shortcut) -> 1x1 head at level 5."""
    p, s = variables["params"], variables["batch_stats"]

    out = d_conv(grid0, p["conv1"]["kernel"], OFFS3) * masks[0]
    out = jax.nn.relu(d_bn(out, masks[0], p["bn1"], s["bn1"], train))
    out = d_sum_pool2(out) * masks[1]

    for i in range(4):
        blk = p[f"layer{i + 1}_0"]
        sblk = s[f"layer{i + 1}_0"]
        m_out = masks[2 + i]
        # BasicBlock-shaped strided block (resnet.py _StridedBlock)
        y = d_conv_strided(out, blk["conv1"]["kernel"], OFFS3, pad=1) * m_out
        y = jax.nn.relu(d_bn(y, m_out, blk["norm1"], sblk["norm1"], train))
        y = d_conv(y, blk["conv2"]["kernel"], OFFS3) * m_out
        y = d_bn(y, m_out, blk["norm2"], sblk["norm2"], train)
        # 1x1 stride-2 shortcut: center child x[2p] (down_nbr[0])
        g2 = out.shape[1] // 2
        center = out[:, ::2, ::2, ::2, :][:, :g2, :g2, :g2, :]
        res = jnp.einsum(
            "bxyzc,cd->bxyzd", center, blk["downsample_conv"]["kernel"][0]
        ) * m_out
        res = d_bn(res, m_out, blk["downsample_norm"],
                   sblk["downsample_norm"], train)
        out = jax.nn.relu(y + res)
        b = 1
        while f"layer{i + 1}_{b}" in p:
            out = d_block(out, m_out, p[f"layer{i + 1}_{b}"],
                          s[f"layer{i + 1}_{b}"], train)
            b += 1

    return d_linear(out, masks[5], p["final"])


# ----------------------------------------------------------------- fixtures

def _random_scene(rng, num_batch=2, n_per=110):
    coords = []
    for b in range(num_batch):
        flat = rng.choice(G0 ** 3, n_per, replace=False)
        xyz = np.stack(np.unravel_index(flat, (G0, G0, G0)), axis=1)
        coords.append(np.concatenate(
            [np.full((n_per, 1), b), xyz], axis=1))
    return np.concatenate(coords).astype(np.int32)


def _randomize_stats(variables, rng):
    """Non-trivial running stats so eval-mode BN is a real transform."""
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])

    def rnd(leaf, is_var):
        if is_var:
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0, 0.2, leaf.shape), jnp.float32)

    flat = jax.tree_util.tree_flatten_with_path(stats)
    leaves = [
        rnd(leaf, str(kp[-1].key if hasattr(kp[-1], "key") else kp[-1]) == "var")
        for kp, leaf in flat[0]
    ]
    return {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_unflatten(flat[1], leaves),
    }


def _build(model_name, conv1_ks, rng):
    model = load_model(model_name)(
        in_channels=3, out_channels=16, conv1_kernel_size=conv1_ks,
        normalize_feature=True,
    )
    coords = _random_scene(rng)
    n = len(coords)
    pyr, meta = build_pyramid(
        coords, NUM_LEVELS, conv0_kernel_size=conv1_ks, npads=NPADS,
        allow_truncate=False,
    )
    feats_rows = rng.randn(n, 3).astype(np.float32)
    feats = np.zeros((NPADS[0], 3), np.float32)
    feats[:n] = feats_rows
    variables = jax.jit(
        lambda r, f, p: model.init(r, f, p, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(feats), pyr)
    variables = _randomize_stats(variables, rng)
    grid0 = to_dense(coords, feats_rows, G0, 3, 2)
    masks = [
        mask_of(meta.coords[l], G0 >> l, 2) for l in range(NUM_LEVELS)
    ]
    return model, pyr, meta, jnp.asarray(feats), variables, grid0, masks


class TestDenseOracle:
    @pytest.mark.parametrize("conv1_ks", [3, 5])
    def test_res16unet34c_forward_parity(self, conv1_ks):
        rng = np.random.RandomState(42 + conv1_ks)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "Res16UNet34C", conv1_ks, rng
        )
        sparse_out, state = model.apply(
            variables, feats, pyr, train=False,
            capture_intermediates=True, mutable=["intermediates"],
        )
        dense_out, dense_inter = dense_forward(
            variables, jnp.asarray(grid0), [jnp.asarray(m) for m in masks],
            model, conv1_ks,
        )
        inter = state["intermediates"]

        # stem conv output (level 0)
        np.testing.assert_allclose(
            np.asarray(inter["conv0p1s1"]["__call__"][0])[: meta.counts[0]],
            read_at(dense_inter["conv0p1s1"], meta.coords[0]),
            rtol=1e-4, atol=1e-4, err_msg="stem conv",
        )
        # every strided conv output (levels 1-4)
        for st in range(4):
            name = f"conv{st + 1}p{2 ** st}s2"
            np.testing.assert_allclose(
                np.asarray(inter[name]["__call__"][0])[: meta.counts[st + 1]],
                read_at(dense_inter[name], meta.coords[st + 1]),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )
        # every transpose conv output (levels 3-0)
        for d in range(4):
            name = f"convtr{4 + d}p{2 ** (4 - d)}s2"
            np.testing.assert_allclose(
                np.asarray(inter[name]["__call__"][0])[: meta.counts[3 - d]],
                read_at(dense_inter[name], meta.coords[3 - d]),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )
        # full-network output
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4, err_msg="final output",
        )
        # padded rows stayed zero
        assert np.all(np.asarray(sparse_out)[meta.counts[0]:] == 0)

    def test_res16unet34c_train_mode_batch_stats(self):
        """Train-mode parity.  Two tiers:

        - TIGHT on every encoder BN's running-stat update (bn0-bn4):
          running = 0.95*old + 0.05*batch_moment with the dense twin's
          mask-weighted moments (unbiased var for the running average,
          MaskedBatchNorm torch semantics).  Moment comparisons dodge the
          rsqrt amplification below.
        - LOOSE on the final output: with random weights, dead-ReLU
          channels give near-zero batch variance, so train-mode BN's
          rsqrt(var+1e-5) multiplies fp summation-order noise by up to
          ~300x per BN; through 18 BNs the twins drift to ~1e-2 even with
          identical math (diagnosed round 3: drift enters at a level-2
          block, not the tiny level-4 population)."""
        rng = np.random.RandomState(7)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "Res16UNet34C", 3, rng
        )
        sparse_out, mut = model.apply(
            variables, feats, pyr, train=True, mutable=["batch_stats"]
        )
        moments = {}
        dense_out, _ = dense_forward(
            variables, jnp.asarray(grid0), [jnp.asarray(m) for m in masks],
            model, 3, train=True, moments=moments,
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=0.05, atol=0.05,
        )
        for name in ("bn0", "bn1", "bn2", "bn3", "bn4"):
            mean_d, var_d, n = (np.asarray(x) for x in moments[name])
            unbiased = var_d * n / max(n - 1.0, 1.0)
            old_m = np.asarray(variables["batch_stats"][name]["mean"])
            old_v = np.asarray(variables["batch_stats"][name]["var"])
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][name]["mean"]),
                0.95 * old_m + 0.05 * mean_d,
                rtol=1e-4, atol=1e-5, err_msg=f"{name} running mean",
            )
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][name]["var"]),
                0.95 * old_v + 0.05 * unbiased,
                rtol=1e-4, atol=1e-5, err_msg=f"{name} running var",
            )

    def test_res16unet50_bottleneck_forward_parity(self):
        """Bottleneck family (1-3-1 blocks, expansion 4) through the same
        oracle (reference res16unet.py Res16UNet50)."""
        rng = np.random.RandomState(11)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "Res16UNet50", 3, rng
        )
        sparse_out = model.apply(variables, feats, pyr, train=False)
        dense_out, _ = dense_forward(
            variables, jnp.asarray(grid0), [jnp.asarray(m) for m in masks],
            model, 3,
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4,
        )

    def test_resnet18_forward_parity(self):
        """ResNet family twin: exercises the k3-stride-2 down_nbr3 maps,
        the k2s2 sum pool, and the center-child 1x1 strided shortcut —
        none of which the Res16UNet oracle touches (reference
        downstream/semseg/models/resnet.py:15-170)."""
        rng = np.random.RandomState(5)
        g0 = 32  # 6 levels: 32 .. 1
        model = load_model("ResNet18")(in_channels=3, out_channels=13)
        coords = []
        for b in range(2):
            flat = rng.choice(g0 ** 3, 400, replace=False)
            xyz = np.stack(np.unravel_index(flat, (g0,) * 3), axis=1)
            coords.append(np.concatenate(
                [np.full((400, 1), b), xyz], axis=1))
        coords = np.concatenate(coords).astype(np.int32)
        pyr, meta = build_pyramid(
            coords, 6, npads=[1024, 1024, 768, 192, 40, 8],
            allow_truncate=False, build_down3=True,
        )
        feats_rows = rng.randn(len(coords), 3).astype(np.float32)
        feats = np.zeros((1024, 3), np.float32)
        feats[: len(coords)] = feats_rows
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), jnp.asarray(feats), pyr)
        variables = _randomize_stats(variables, rng)

        sparse_out = model.apply(variables, jnp.asarray(feats), pyr,
                                 train=False)
        grid0 = to_dense(coords, feats_rows, g0, 3, 2)
        masks = [
            jnp.asarray(mask_of(meta.coords[l], g0 >> l, 2)) for l in range(6)
        ]
        dense_out = dense_resnet_forward(
            variables, jnp.asarray(grid0), masks, model
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[5]],
            read_at(dense_out, meta.coords[5]),
            rtol=1e-4, atol=1e-4,
        )
        assert np.all(np.asarray(sparse_out)[meta.counts[5]:] == 0)

    def test_res16unet14_forward_parity(self):
        """A second family member (1-block stages) through the same oracle."""
        rng = np.random.RandomState(3)
        model, pyr, meta, feats, variables, grid0, masks = _build(
            "Res16UNet14", 3, rng
        )
        sparse_out = model.apply(variables, feats, pyr, train=False)
        dense_out, _ = dense_forward(
            variables, jnp.asarray(grid0), [jnp.asarray(m) for m in masks],
            model, 3,
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4,
        )
