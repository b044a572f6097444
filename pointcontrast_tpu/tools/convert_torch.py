"""Convert reference PyTorch/MinkowskiEngine checkpoints to our params.

The released PointContrast checkpoints (hardest-contrastive.pth / nce.pth,
README.md:76-78) store a torch ``state_dict`` of the ME Res16UNet (names
like ``conv0p1s1.kernel``, ``bn0.bn.weight``, ``block1.0.conv1.kernel``,
``block1.0.downsample.0.kernel``; see
/root/reference/pretrain/pointcontrast/model/res16unet.py:17-120 and
modules/resnet_block.py:13-60).  ME convolution kernels are already
``[K, Cin, Cout]`` (``[Cin, Cout]`` for 1x1), the same layout as ours.

Conversion is renaming plus ONE row permutation: the reference builds its
non-block convs (stem/strided/transpose) with ConvType.SPATIAL_HYPERCUBE —
ME's C++ HYPERCUBE region iterator, x-fastest offsets, our enumeration —
but every *residual-block* conv with ConvType.SPATIAL_HYPERCUBE_TEMPORAL_
HYPERCROSS (model/resnet.py:26 + _make_layer:127-137), which ME's
KernelGenerator routes through the Python HYBRID region construction
(ME 0.4.x Common.py::convert_region_type).  That list is built axis by
axis with each new axis expanded in the innermost loop, so LATER axes vary
fastest — in 3D the 27 block-conv kernel rows are stored in the base-3
digit-reversed order of the C++ iterator.  ``block_kernel_permutation``
reorders those rows (and only those) on the way in; ``export_state_dict``
applies the inverse on the way out.  4D hybrid kernels (29 rows) are
already built in ME's order by ``kernel_offsets(region='hybrid')``, so
they pass through unchanged.

The renaming map:

  conv0p1s1.kernel                      -> params/conv0p1s1/kernel
  bn0.bn.{weight,bias}                  -> params/bn0/{scale,bias}
  bn0.bn.running_{mean,var}             -> batch_stats/bn0/{mean,var}
  blockS.I.convJ.kernel                 -> params/blockS_I/SparseConv_{J-1}/kernel
    (Bottleneck blocks — detected by the presence of conv3 — map
     conv1 -> SparseLinear_0, conv2 -> SparseConv_0, conv3 -> SparseLinear_1)
  blockS.I.normJ.bn.*                   -> params|batch_stats/blockS_I/MaskedBatchNorm_{J-1}/*
  blockS.I.downsample.0.kernel [1,i,o]  -> params/blockS_I/downsample_conv/kernel [i,o]
  blockS.I.downsample.1.bn.*            -> blockS_I/downsample_norm/*
  convtrDpSs2.kernel                    -> params/convtrDpSs2/kernel
  final.kernel [i,o], final.bias        -> params/final/{kernel,bias}

Use ``load_torch_state_dict`` on a ``.pth`` file (torch CPU load) or
``convert_state_dict`` on an already-loaded {name: ndarray} mapping.
"""
from __future__ import annotations

import functools
import re
from typing import Mapping

import numpy as np


@functools.lru_cache(maxsize=None)
def block_kernel_permutation(k_rows: int, dimension: int = 3):
    """Row permutation taking an ME block-conv kernel to our enumeration.

    ours[i] = me[perm[i]].  Returns None when the enumerations agree (1x1
    kernels; 4D hybrid kernels, whose 29-row order our ``kernel_offsets``
    already reproduces).  The ME-side order is computed structurally — our
    hybrid enumerator with all-cube axis types IS ME's Python HYBRID list
    construction — so this stays correct for any odd kernel size.  If a
    real released checkpoint ever shows residual deltas, parity_check.py's
    --probe-permutation flag empirically searches order mismatches; this
    function is the single place to adjust."""
    from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, offset_index

    if k_rows <= 1:
        return None
    k = round(k_rows ** (1.0 / dimension))
    if k ** dimension != k_rows:  # not a cube volume (e.g. 4D hybrid 29)
        return None
    ours = kernel_offsets(k, dimension, "hypercube")
    me = kernel_offsets(
        k, dimension, "hybrid", axis_types=("hypercube",) * dimension
    )
    idx = offset_index(me)
    perm = np.array([idx[tuple(int(v) for v in o)] for o in ours], np.int64)
    if np.array_equal(perm, np.arange(k_rows)):
        return None
    return perm


def load_torch_state_dict(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("state_dict", state)
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.|encoder\.)", "", k)
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(sd: Mapping[str, np.ndarray]):
    """-> (params, batch_stats) nested dicts for Res16UNet-family models."""
    params: dict = {}
    stats: dict = {}
    unmatched = []

    # Bottleneck blocks (Res16UNet50/101 etc.) have conv3; their flax module
    # orders submodules SparseLinear_0 (conv1 1x1), SparseConv_0 (conv2),
    # SparseLinear_1 (conv3) — different from BasicBlock's SparseConv_{0,1}.
    bottleneck_mods = {
        (p[0], p[1])
        for p in (n.split(".") for n in sd)
        if len(p) > 2 and re.match(r"^block\d+$", p[0]) and p[2] == "conv3"
    }

    def block_path(stage: str, idx: str, rest: list[str]):
        mod = f"{stage}_{idx}"
        head = rest[0]
        bottleneck = (stage, idx) in bottleneck_mods
        if head in ("conv1", "conv2", "conv3"):
            if bottleneck:
                sub = {"conv1": "SparseLinear_0", "conv2": "SparseConv_0",
                       "conv3": "SparseLinear_1"}[head]
            else:
                sub = f"SparseConv_{int(head[-1]) - 1}"
            return [mod, sub, "kernel"], "params"
        if head in ("norm1", "norm2", "norm3"):
            sub = f"MaskedBatchNorm_{int(head[-1]) - 1}"
            return [mod, sub], "bn"
        if head == "downsample":
            if rest[1] == "0":
                return [mod, "downsample_conv", "kernel"], "params"
            return [mod, "downsample_norm"], "bn"
        return None, None

    for name, value in sd.items():
        parts = name.split(".")
        m = re.match(r"^block(\d+)$", parts[0])
        dest = None
        kind = None
        if m:
            dest, kind = block_path(parts[0], parts[1], parts[2:])
            bn_field = parts[-1]
        elif re.match(r"^(conv|convtr)\w*$", parts[0]) and parts[-1] == "kernel":
            dest, kind = [parts[0], "kernel"], "params"
        elif parts[0].startswith("bn"):
            dest, kind = [parts[0]], "bn"
            bn_field = parts[-1]
        elif parts[0] == "final":
            dest, kind = ["final", parts[-1]], "params"

        if dest is None:
            unmatched.append(name)
            continue

        if kind == "params":
            v = value
            # ME stores 1x1 convs as [Cin, Cout] and K-volume convs as
            # [K, Cin, Cout]; downsample shortcut may come as [1, i, o].
            if dest[-2:] == ["downsample_conv", "kernel"] and v.ndim == 3:
                v = v[0]
            # Block convs were built through ME's Python HYBRID region, whose
            # 3D row order is the digit reversal of our x-fastest enumeration
            # (see module docstring).
            if (
                len(dest) == 3
                and dest[1].startswith("SparseConv_")
                and v.ndim == 3
            ):
                perm = block_kernel_permutation(v.shape[0])
                if perm is not None:
                    v = np.asarray(v)[perm]
            _set(params, dest, np.asarray(v))
        else:  # bn
            field = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("stats", "mean"),
                "running_var": ("stats", "var"),
            }.get(bn_field)
            if field is None:  # num_batches_tracked etc.
                continue
            tree = params if field[0] == "params" else stats
            _set(tree, dest + [field[1]], np.asarray(value))

    return params, stats, unmatched


def convert_checkpoint(pth_path: str):
    """.pth -> (params, batch_stats, unmatched names)."""
    return convert_state_dict(load_torch_state_dict(pth_path))


def export_state_dict(params, batch_stats) -> dict:
    """Inverse of ``convert_state_dict``: our Res16UNet-family param /
    batch-stats trees -> a reference-naming torch-style state dict (numpy
    values).  Lets reference users round-trip checkpoints both ways and
    backs the end-to-end parity-check test with a fabricated .pth."""
    import jax

    sd: dict = {}
    bottleneck_mods = {
        str(mod)
        for mod, sub in dict(params).items()
        if re.match(r"^block\d+_\d+$", str(mod))
        and "SparseLinear_0" in dict(sub)
    }

    def emit(tree, is_stats: bool):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = [str(getattr(k, "key", k)) for k in kp]
            name = _export_name(keys, is_stats, bottleneck_mods)
            if name is None:
                raise ValueError(f"no reference name for leaf {keys}")
            v = np.asarray(leaf)
            # Inverse of convert_state_dict's block-conv row permutation:
            # ME stores block kernels in its Python HYBRID order.
            if (
                len(keys) == 3
                and keys[1].startswith("SparseConv_")
                and v.ndim == 3
            ):
                perm = block_kernel_permutation(v.shape[0])
                if perm is not None:
                    inv = np.empty_like(perm)
                    inv[perm] = np.arange(len(perm))
                    v = v[inv]
            sd[name] = v

    emit(params, False)
    emit(batch_stats, True)
    return sd


def _export_name(keys: list[str], is_stats: bool, bottleneck_mods=frozenset()):
    bn_field = (
        {"mean": "running_mean", "var": "running_var"}
        if is_stats else {"scale": "weight", "bias": "bias"}
    )
    if keys[0].startswith(("conv", "convtr")) and keys[-1] == "kernel":
        return f"{keys[0]}.kernel"
    if keys[0].startswith("bn"):
        return f"{keys[0]}.bn.{bn_field[keys[-1]]}"
    if keys[0] == "final":
        return f"final.{keys[-1]}"
    if re.match(r"block\d+_\d+", keys[0]):
        stage, idx = keys[0].rsplit("_", 1)
        sub = keys[1]
        if sub.startswith("SparseLinear_"):  # Bottleneck 1x1 convs
            conv = {"SparseLinear_0": "conv1", "SparseLinear_1": "conv3"}[sub]
            return f"{stage}.{idx}.{conv}.kernel"
        if sub.startswith("SparseConv_"):
            if keys[0] in bottleneck_mods:
                return f"{stage}.{idx}.conv2.kernel"
            return f"{stage}.{idx}.conv{int(sub.split('_')[1]) + 1}.kernel"
        if sub.startswith("MaskedBatchNorm_"):
            j = int(sub.split("_")[1]) + 1
            return f"{stage}.{idx}.norm{j}.bn.{bn_field[keys[-1]]}"
        if sub == "downsample_conv":
            return f"{stage}.{idx}.downsample.0.kernel"
        if sub == "downsample_norm":
            return f"{stage}.{idx}.downsample.1.bn.{bn_field[keys[-1]]}"
    return None
