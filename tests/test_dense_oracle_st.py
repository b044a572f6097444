"""Full-network dense oracle for the 4D spatio-temporal (ST) family.

Independent dense twin of STRes16UNet14 on a [B, X, Y, Z, T, C] grid:
shift-and-accumulate convolutions (no gather maps, no lax.conv — pure
jnp.pad/slice arithmetic), mask-aware BN, slice-stride down/up convs over
the SPATIAL axes only.  Validates the pieces no 3D oracle touches:

  - the HYBRID kernel region (cube over space x cross over time, 27 + 2
    offsets — ME's union semantics, reference modules/common.py:111-117,
    fixed round 3 from the incorrect 81-offset product);
  - the (3, 3, 3, 1) spatial-hypercube stem (nbr0 with stride_axes);
  - (2, 2, 2, 1) strided down/transpose convs that halve space but
    never time (stride_axes=(1,1,1,0), reference space_n_time_m(2, 1),
    res16unet.py:58-59).

Reference surface: downstream/semseg/models/res16unet.py:340-380
(STRes16UNet*) with conv types from models/modules/common.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pointcontrast_tpu.nn.registry import load_model
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import build_pyramid

G0 = 16  # spatial extent at level 0; levels 16, 8, 4, 2, 1
T = 3  # temporal extent (never strided)
NUM_LEVELS = 5
NPADS = [384, 384, 400, 64, 8]
AXIS_TYPES = ("hypercube",) * 3 + ("hypercross",)

OFFS_HYBRID = kernel_offsets(3, 4, "hybrid", axis_types=AXIS_TYPES)  # 29
OFFS_STEM = kernel_offsets((3, 3, 3, 1), 4, "hypercube")  # 27, t pinned 0
OFFS2 = kernel_offsets((2, 2, 2, 1), 4, "hypercube")  # 8 spatial children


# ------------------------------------------------------------ dense helpers

def to_dense(coords, values, g, c, num_batch):
    out = np.zeros((num_batch, g, g, g, T, c), np.float32)
    b, x, y, z, t = coords.T
    out[b, x, y, z, t] = values
    return out


def mask_of(coords, g, num_batch):
    m = np.zeros((num_batch, g, g, g, T, 1), np.float32)
    b, x, y, z, t = coords.T
    m[b, x, y, z, t, 0] = 1.0
    return m


def read_at(dense, coords):
    b, x, y, z, t = coords.T
    return np.asarray(dense)[b, x, y, z, t]


def d_conv(x, w, offsets):
    """Same-level 4D conv by shift-and-accumulate: out[p] = sum_i W_i x[p+o_i]."""
    offsets = np.asarray(offsets)
    pads = np.abs(offsets).max(axis=0)
    xp = jnp.pad(x, [(0, 0)] + [(int(p), int(p)) for p in pads] + [(0, 0)])
    dims = x.shape[1:5]
    out = 0.0
    for i, o in enumerate(offsets):
        sl = xp[
            :,
            pads[0] + o[0]: pads[0] + o[0] + dims[0],
            pads[1] + o[1]: pads[1] + o[1] + dims[1],
            pads[2] + o[2]: pads[2] + o[2] + dims[2],
            pads[3] + o[3]: pads[3] + o[3] + dims[3],
            :,
        ]
        out = out + jnp.einsum("...c,cd->...d", sl, w[i])
    return out


def d_conv_down(x, w):
    """(2,2,2,1)-kernel spatial-stride-2 conv: out[p, t] = sum W_o x[2p+o, t]."""
    g2 = x.shape[1] // 2
    out = 0.0
    for i, o in enumerate(np.asarray(OFFS2)):
        sl = x[:, o[0]::2, o[1]::2, o[2]::2, :, :][:, :g2, :g2, :g2]
        out = out + jnp.einsum("...c,cd->...d", sl, w[i])
    return out


def d_conv_up(x, w):
    """Spatial-stride-2 transpose conv: out[2p + o, t] += W_o x[p, t]."""
    b, gc = x.shape[0], x.shape[1]
    g = gc * 2
    out = jnp.zeros((b, g, g, g, T, w.shape[2]), jnp.float32)
    for i, o in enumerate(np.asarray(OFFS2)):
        out = out.at[:, o[0]::2, o[1]::2, o[2]::2, :, :].add(
            jnp.einsum("...c,cd->...d", x, w[i])
        )
    return out


def d_bn(x, mask, p, s):
    inv = jax.lax.rsqrt(s["var"] + 1e-5)
    return ((x - s["mean"]) * inv * p["scale"] + p["bias"]) * mask


def d_linear(x, mask, p):
    out = jnp.einsum("...c,cd->...d", x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out * mask


def d_block(x, mask, p, s):
    """BasicBlock twin with 29-offset hybrid convs."""
    out = d_conv(x, p["SparseConv_0"]["kernel"], OFFS_HYBRID) * mask
    out = d_bn(out, mask, p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"])
    out = jax.nn.relu(out)
    out = d_conv(out, p["SparseConv_1"]["kernel"], OFFS_HYBRID) * mask
    out = d_bn(out, mask, p["MaskedBatchNorm_1"], s["MaskedBatchNorm_1"])
    if "downsample_conv" in p:
        residual = d_linear(x, mask, p["downsample_conv"])
        residual = d_bn(residual, mask, p["downsample_norm"],
                        s["downsample_norm"])
    else:
        residual = x
    return jax.nn.relu(out + residual)


def dense_forward(variables, grid0, masks, model):
    p, s = variables["params"], variables["batch_stats"]
    inter = {}

    out = d_conv(grid0, p["conv0p1s1"]["kernel"], OFFS_STEM) * masks[0]
    inter["conv0p1s1"] = out
    out = jax.nn.relu(d_bn(out, masks[0], p["bn0"], s["bn0"]))

    skips = [out]
    for st in range(4):
        name = f"conv{st + 1}p{2 ** st}s2"
        out = d_conv_down(out, p[name]["kernel"]) * masks[st + 1]
        inter[name] = out
        out = jax.nn.relu(
            d_bn(out, masks[st + 1], p[f"bn{st + 1}"], s[f"bn{st + 1}"])
        )
        i = 0
        while f"block{st + 1}_{i}" in p:
            out = d_block(out, masks[st + 1], p[f"block{st + 1}_{i}"],
                          s[f"block{st + 1}_{i}"])
            i += 1
        if st < 3:
            skips.append(out)

    for d in range(4):
        lvl = 3 - d
        name = f"convtr{4 + d}p{2 ** (4 - d)}s2"
        out = d_conv_up(out, p[name]["kernel"]) * masks[lvl]
        inter[name] = out
        out = jax.nn.relu(d_bn(out, masks[lvl], p[f"bntr{4 + d}"],
                               s[f"bntr{4 + d}"]))
        out = jnp.concatenate([out, skips[lvl]], axis=-1)
        i = 0
        while f"block{5 + d}_{i}" in p:
            out = d_block(out, masks[lvl], p[f"block{5 + d}_{i}"],
                          s[f"block{5 + d}_{i}"])
            i += 1

    out = d_linear(out, masks[0], p["final"])
    if getattr(model, "normalize_feature", False):
        sq = jnp.sum(jnp.square(out), axis=-1, keepdims=True)
        out = out * jax.lax.rsqrt(jnp.maximum(sq, 1e-12)) * masks[0]
    return out, inter


# ----------------------------------------------------------------- fixtures

def _random_scene(rng, num_batch=2, n_per=150):
    coords = []
    for b in range(num_batch):
        flat = rng.choice(G0 ** 3 * T, n_per, replace=False)
        xyzt = np.stack(np.unravel_index(flat, (G0, G0, G0, T)), axis=1)
        coords.append(np.concatenate([np.full((n_per, 1), b), xyzt], axis=1))
    return np.concatenate(coords).astype(np.int32)


def _randomize_stats(variables, rng):
    flat = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])

    def rnd(leaf, is_var):
        if is_var:
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0, 0.2, leaf.shape), jnp.float32)

    leaves = [
        rnd(leaf, str(kp[-1].key if hasattr(kp[-1], "key") else kp[-1]) == "var")
        for kp, leaf in flat[0]
    ]
    return {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_unflatten(flat[1], leaves),
    }


class TestSTDenseOracle:
    def test_stres16unet14_forward_parity(self):
        rng = np.random.RandomState(21)
        model = load_model("STRes16UNet14")(
            in_channels=3, out_channels=8, dimension=4,
            normalize_feature=True,
        )
        coords = _random_scene(rng)
        n = len(coords)
        pyr, meta = build_pyramid(
            coords, NUM_LEVELS, dimension=4, region="hybrid",
            axis_types=AXIS_TYPES, stride_axes=(True, True, True, False),
            npads=NPADS, allow_truncate=False,
        )
        assert pyr.levels[0].nbr.shape[0] == 29  # ME hybrid volume, not 81
        assert pyr.levels[0].nbr0.shape[0] == 27  # (3,3,3,1) stem

        feats_rows = rng.randn(n, 3).astype(np.float32)
        feats = np.zeros((NPADS[0], 3), np.float32)
        feats[:n] = feats_rows
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), jnp.asarray(feats), pyr)
        variables = _randomize_stats(variables, rng)

        sparse_out, state = model.apply(
            variables, jnp.asarray(feats), pyr, train=False,
            capture_intermediates=True, mutable=["intermediates"],
        )
        grid0 = to_dense(coords, feats_rows, G0, 3, 2)
        masks = [
            jnp.asarray(mask_of(meta.coords[l], G0 >> l, 2))
            for l in range(NUM_LEVELS)
        ]
        dense_out, dense_inter = dense_forward(
            variables, jnp.asarray(grid0), masks, model
        )
        inter = state["intermediates"]

        np.testing.assert_allclose(
            np.asarray(inter["conv0p1s1"]["__call__"][0])[: meta.counts[0]],
            read_at(dense_inter["conv0p1s1"], meta.coords[0]),
            rtol=1e-4, atol=1e-4, err_msg="stem conv",
        )
        for st in range(4):
            name = f"conv{st + 1}p{2 ** st}s2"
            np.testing.assert_allclose(
                np.asarray(inter[name]["__call__"][0])[: meta.counts[st + 1]],
                read_at(dense_inter[name], meta.coords[st + 1]),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )
        for d in range(4):
            name = f"convtr{4 + d}p{2 ** (4 - d)}s2"
            np.testing.assert_allclose(
                np.asarray(inter[name]["__call__"][0])[: meta.counts[3 - d]],
                read_at(dense_inter[name], meta.coords[3 - d]),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )
        np.testing.assert_allclose(
            np.asarray(sparse_out)[: meta.counts[0]],
            read_at(dense_out, meta.coords[0]),
            rtol=1e-4, atol=1e-4, err_msg="final output",
        )
        assert np.all(np.asarray(sparse_out)[meta.counts[0]:] == 0)
