"""Generator for the committed ME-offset-order parity fixture.

Simulates the failure mode the ``parity_check --probe-permutation`` flow
exists for (PARITY.md "blocked" row): a reference ME build whose C++ kernel
iterator enumerates the 27 hypercube offsets in a DIFFERENT axis order than
``sparse/kernel_map.py`` assumes.  The fixture is:

  inputs.npz   exact voxel coords+feats the harness forwards
               (what ``parity_check --dump-inputs`` writes)
  acts.npz     "reference" activations produced by the SAME fabricated
               checkpoint but with every 27-offset kernel permuted by
               ``axis_permutations(offsets)[PERM_INDEX]`` — i.e. what an ME
               host with that enumeration would dump via
               ``tools/make_reference_acts.py``

The checkpoint itself is regenerated deterministically from PINNED seeds at
test time (committing a 150 MB .pth would be absurd); this file is both the
generator (``python make_fixture.py``) and the library the test imports for
the fabrication recipe.  tests/test_tools.py::test_probe_permutation_
recovers_me_order runs the real CLI against the committed npz files and
asserts the probe names PERM_INDEX.
"""
from __future__ import annotations

import os
import sys

import numpy as np

PERM_INDEX = 7  # arbitrary non-identity entry of axis_permutations
POINTS = 400
NPAD = 1024
SEED_PARAMS = 2

FIXTURE_DIR = os.path.dirname(os.path.abspath(__file__))


def build_batch():
    from pointcontrast_tpu.data import (
        PadScheme,
        SyntheticPairDataset,
        collate_pair,
    )

    ds = SyntheticPairDataset(
        num_pairs=1, points_per_frame=POINTS, random_rotation=False, seed=0
    )
    batch = collate_pair(
        [ds[0]], PadScheme(npad0=NPAD), mode="nce", npos=256,
        rng=np.random.RandomState(0),
    )
    return ds, batch


def fabricate_variables(batch):
    """Deterministic random-but-sane Res16UNet34C variables (the recipe of
    tests/test_tools.py::test_cli_on_fabricated_checkpoint, pinned here so
    the committed acts stay reproducible)."""
    import jax

    from pointcontrast_tpu.nn.registry import load_model

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True
    )
    variables = jax.jit(lambda r, f, p: model.init(r, f, p, train=False))(
        jax.random.PRNGKey(0), batch.feats0, batch.pyramid0
    )
    rng = np.random.RandomState(SEED_PARAMS)
    params = jax.tree.map(
        lambda x: rng.randn(*x.shape).astype(np.float32) * 0.05,
        jax.device_get(variables["params"]),
    )
    stats = jax.tree_util.tree_map_with_path(
        lambda kp, x: (np.abs(rng.randn(*x.shape)) + 0.5).astype(np.float32)
        if str(getattr(kp[-1], "key", "")) == "var"
        else rng.randn(*x.shape).astype(np.float32) * 0.05,
        jax.device_get(variables["batch_stats"]),
    )
    return model, params, stats


def write_checkpoint(params, stats, path):
    import torch

    from pointcontrast_tpu.tools.convert_torch import export_state_dict

    sd = export_state_dict(params, stats)
    torch.save(
        {"state_dict": {f"module.{k}": torch.from_numpy(np.array(v))
                        for k, v in sd.items()}},
        path,
    )


def main():
    import jax

    from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
    from pointcontrast_tpu.tools.parity_check import axis_permutations

    ds, batch = build_batch()
    model, params, stats = fabricate_variables(batch)

    nv = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
    c0 = np.asarray(ds[0][2], np.int32)
    assert len(c0) == nv, (len(c0), nv)
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "inputs.npz"),
        coords=np.concatenate([np.zeros((nv, 1), np.int32), c0], axis=1),
        feats=np.asarray(batch.feats0[:nv], np.float32),
    )

    # the "wrong-enumeration ME host": permute every 27-offset kernel
    offs = kernel_offsets(3, 3, "hypercube")
    perm = axis_permutations(offs)[PERM_INDEX]
    permuted = jax.tree.map(
        lambda x: x[np.asarray(perm)]
        if hasattr(x, "ndim") and x.ndim == 3 and x.shape[0] == len(offs)
        else x,
        params,
    )
    out = np.asarray(
        jax.jit(
            lambda p, f, pyr: model.apply(
                {"params": p, "batch_stats": stats}, f, pyr, train=False
            )
        )(permuted, batch.feats0, batch.pyramid0)
    )
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "acts.npz"),
        coords=np.concatenate([np.zeros((nv, 1), np.int32), c0], axis=1),
        feats=out[:nv],
    )
    print(f"wrote fixture ({nv} rows, perm #{PERM_INDEX}) to {FIXTURE_DIR}")


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(FIXTURE_DIR)))
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    main()
