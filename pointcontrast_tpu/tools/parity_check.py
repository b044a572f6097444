"""Checkpoint parity harness.

Usage:
  python -m pointcontrast_tpu.tools.parity_check <checkpoint.pth> \
      [--pairs pairs.txt --root data_dir] [--reference-acts acts.npz]

Loads a released reference checkpoint (hardest-contrastive.pth / nce.pth,
reference README.md:76-78), converts it with ``tools/convert_torch``, runs
the Res16UNet34C forward on pair data (real pairs when given, otherwise the
synthetic dataset), and reports:

  - conversion coverage (unmatched torch entries / unfilled JAX leaves);
  - forward statistics (feature norms — the pretrain head L2-normalizes, so
    valid rows must have norm 1);
  - when ``--reference-acts`` is given (an npz of {coords, feats} produced
    by running the torch+ME model offline), max |delta| against our forward
    on identical voxel coordinates.

Offset-order caveat: ME's C++ HYPERCUBE iterator enumerates offsets in the
same x-fastest order as ``sparse/kernel_map.py``, and the reference's
*block* convs — built through ME's Python HYBRID region, later-axes-fastest
— are reordered by ``convert_torch.block_kernel_permutation`` during
conversion.  If a converted checkpoint still shows large forward deltas
with matched coordinates, pass ``--probe-permutation`` to search the 48
axis-symmetry permutations of the 27-offset kernel and report the best
match.
"""
from __future__ import annotations

import argparse
import itertools
import sys

import numpy as np


def build_forward(params, batch_stats, conv1_kernel_size=3):
    import jax

    from pointcontrast_tpu.nn.registry import load_model

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, conv1_kernel_size=conv1_kernel_size,
        normalize_feature=True,
    )

    @jax.jit
    def forward(feats, pyramid):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, pyramid, train=False,
        )

    return model, forward


def axis_permutations(offsets: np.ndarray):
    """All 48 signed axis permutations of a [K, 3] offset set -> offset-row
    permutations (for diagnosing a kernel-order mismatch)."""
    from pointcontrast_tpu.sparse.kernel_map import offset_index

    idx = offset_index(offsets)
    perms = []
    for axes in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            mapped = offsets[:, axes] * np.asarray(signs)
            perms.append(
                np.array([idx[tuple(o)] for o in map(tuple, mapped)], np.int32)
            )
    return perms


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--pairs", default=None)
    p.add_argument("--root", default=None)
    p.add_argument("--reference-acts", default=None)
    p.add_argument("--probe-permutation", action="store_true")
    p.add_argument("--dump-inputs", default=None, metavar="NPZ",
                   help="write the exact voxel coords+feats this harness "
                        "forwards, for make_reference_acts on an ME host")
    p.add_argument("--points", type=int, default=4000,
                   help="synthetic points per frame")
    p.add_argument("--npad", type=int, default=16384)
    args = p.parse_args(argv)

    import jax

    from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
    from pointcontrast_tpu.data.pair_dataset import ScanNetMatchPairDataset
    from pointcontrast_tpu.tools.convert_torch import convert_checkpoint
    from pointcontrast_tpu.train.checkpoint import lenient_filter

    params, stats, unmatched = convert_checkpoint(args.checkpoint)
    print(f"converted; unmatched torch entries: {len(unmatched)}")
    for u in unmatched[:10]:
        print("  unmatched:", u)

    if args.pairs:
        ds = ScanNetMatchPairDataset(args.root, args.pairs, random_rotation=False)
    else:
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=args.points,
                                  random_rotation=False, seed=0)
    batch = collate_pair(
        [ds[0]], PadScheme(npad0=args.npad), mode="nce", npos=256,
        rng=np.random.RandomState(0),
    )
    if args.dump_inputs:
        # the exact rows the forward consumes: the flat voxel layout packs
        # the sample's (already-quantized) voxels at the front in input
        # order, so sample coords + the batch column reproduce them
        nv = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
        c0 = np.asarray(ds[0][2], np.int32)
        assert len(c0) == nv, (len(c0), nv)
        coords = np.concatenate(
            [np.zeros((nv, 1), np.int32), c0], axis=1)
        np.savez_compressed(
            args.dump_inputs, coords=coords,
            feats=np.asarray(batch.feats0[:nv], np.float32),
        )
        print(f"dumped {nv} input rows to {args.dump_inputs}")

    # template init to get the full tree, then overlay converted leaves
    from pointcontrast_tpu.nn.registry import load_model

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True
    )
    variables = jax.jit(lambda r, f, p: model.init(r, f, p, train=False))(
        jax.random.PRNGKey(0), batch.feats0, batch.pyramid0
    )
    merged_p, loaded_p, skipped_p = lenient_filter(variables["params"], params)
    merged_s, loaded_s, skipped_s = lenient_filter(variables["batch_stats"], stats)
    print(f"params: {len(loaded_p)} loaded, {len(skipped_p)} skipped")
    print(f"batch_stats: {len(loaded_s)} loaded, {len(skipped_s)} skipped")
    for s in skipped_p[:10]:
        print("  skipped:", s)

    _, forward = build_forward(merged_p, merged_s)
    out = np.asarray(forward(batch.feats0, batch.pyramid0))
    nvalid = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
    norms = np.linalg.norm(out[:nvalid], axis=1)
    print(
        f"forward: {nvalid} voxels, feature-norm mean {norms.mean():.4f} "
        f"(expect 1.0), std {norms.std():.2e}, finite={np.isfinite(out).all()}"
    )

    if args.reference_acts:
        ref = np.load(args.reference_acts)
        ref_feats = ref["feats"]
        if len(ref_feats) != nvalid:
            print(
                f"WARNING: reference has {len(ref_feats)} rows vs our {nvalid}"
            )
        n = min(len(ref_feats), nvalid)
        delta = np.abs(out[:n] - ref_feats[:n]).max()
        print(f"max |delta| vs reference activations: {delta:.2e}")
        if delta > 1e-3 and args.probe_permutation:
            # Apply each of the 48 signed-axis-permutations to EVERY
            # 27-offset kernel (conv + convtr share the enumeration) and
            # re-run the forward; a clear winner diagnoses an offset-order
            # mismatch and names the permutation to bake into conversion.
            from pointcontrast_tpu.sparse.kernel_map import kernel_offsets

            offs = kernel_offsets(3, 3, "hypercube")
            fwd_p = jax.jit(
                lambda p, f, pyr: model.apply(
                    {"params": p, "batch_stats": merged_s}, f, pyr,
                    train=False,
                )
            )
            k = len(offs)
            best_d, best_i = delta, None
            for pi, perm in enumerate(axis_permutations(offs)):
                permuted = jax.tree.map(
                    lambda x: x[np.asarray(perm)]
                    if hasattr(x, "ndim") and x.ndim == 3 and x.shape[0] == k
                    else x,
                    merged_p,
                )
                out_p = np.asarray(fwd_p(permuted, batch.feats0, batch.pyramid0))
                d = float(np.abs(out_p[:n] - ref_feats[:n]).max())
                if d < best_d:
                    best_d, best_i = d, pi
            if best_i is None:
                print("probe: no offset permutation improves the delta — "
                      "kernel order mismatch is unlikely; suspect data or "
                      "normalization differences")
            else:
                print(f"probe: permutation #{best_i} reduces max |delta| to "
                      f"{best_d:.2e} — bake it into conversion "
                      f"(axis_permutations(offsets)[{best_i}])")
    return 0


if __name__ == "__main__":
    sys.exit(main())
