"""OFFLINE golden-activation dumper for released-checkpoint parity.

This script does NOT run in the TPU environment (torch+MinkowskiEngine and
the released .pth files are absent here — PARITY.md "blocked" row).  Run it
on any GPU/CPU host that has:

  - torch + MinkowskiEngine (the reference's stack),
  - the reference repo (facebookresearch/PointContrast) on PYTHONPATH so its
    Res16UNet34C class is importable (pretrain/pointcontrast/model),
  - a released checkpoint (hardest-contrastive.pth / nce.pth — reference
    README.md:76-78).

Protocol (one command on each side):

  TPU side:   python -m pointcontrast_tpu.tools.parity_check ckpt.pth \
                  --dump-inputs inputs.npz
  ME host:    python -m pointcontrast_tpu.tools.make_reference_acts \
                  ckpt.pth inputs.npz acts.npz
  TPU side:   python -m pointcontrast_tpu.tools.parity_check ckpt.pth \
                  --reference-acts acts.npz [--probe-permutation]

The acts are re-aligned to the INPUT coordinate order by exact coordinate
matching (ME may reorder rows during SparseTensor construction), so the TPU
side can compare row-for-row.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _coord_keys(coords: np.ndarray) -> np.ndarray:
    """Collision-free int64 key per (batch, x, y, z) row for exact joins."""
    c = coords.astype(np.int64)
    lo = c.min(axis=0)
    c = c - lo
    span = c.max(axis=0) + 1
    key = np.zeros(len(c), np.int64)
    for d in range(c.shape[1]):
        key = key * int(span[d]) + c[:, d]
    return key


def align_to_inputs(in_coords: np.ndarray, out_coords: np.ndarray,
                    out_feats: np.ndarray) -> np.ndarray:
    """Reorder ME's output rows to the input coordinate order."""
    in_keys = _coord_keys(np.concatenate([in_coords, out_coords]))
    out_keys = in_keys[len(in_coords):]
    in_keys = in_keys[: len(in_coords)]
    lut = {int(k): i for i, k in enumerate(out_keys)}
    idx = np.array([lut[int(k)] for k in in_keys], np.int64)
    return out_feats[idx]


def normalize_batch_column(out_c: np.ndarray, in_coords: np.ndarray
                           ) -> np.ndarray:
    """Return ME output coords with the batch index in column 0.

    Recent ME versions put the batch index FIRST; 0.4.x put it LAST.  The
    convention is decided by structural invariants, never guessed: a valid
    batch column must have values in [0, B) with EXACTLY the input's
    per-batch row histogram (a same-resolution U-Net output has the input's
    coordinate set row-for-row).  If both the first and last column satisfy
    that (coordinates can collide with the batch-index range), the exact
    coordinate join against the inputs disambiguates; if neither — or the
    join fails both ways — this raises instead of writing misaligned acts.
    """
    if out_c.shape != in_coords.shape:
        raise ValueError(
            f"ME output coords {out_c.shape} != input coords "
            f"{in_coords.shape}: the model output is not at input "
            f"resolution — wrong model or stride"
        )
    batch_vals = in_coords[:, 0]
    nb = int(batch_vals.max()) + 1
    counts = np.bincount(batch_vals, minlength=nb)

    def _histogram_fits(col: int) -> bool:
        vals = out_c[:, col]
        if vals.min() < 0 or vals.max() >= nb:
            return False
        return np.array_equal(np.bincount(vals, minlength=nb), counts)

    def _join_fits(candidate: np.ndarray) -> bool:
        try:
            align_to_inputs(in_coords, candidate,
                            np.zeros((len(candidate), 1), np.float32))
            return True
        except KeyError:
            return False

    as_first = out_c
    as_last = np.concatenate([out_c[:, -1:], out_c[:, :-1]], axis=1)
    fits_first, fits_last = _histogram_fits(0), _histogram_fits(-1)
    if fits_first and fits_last:
        fits_first, fits_last = _join_fits(as_first), _join_fits(as_last)
        if fits_first and fits_last:
            raise ValueError(
                "ME output coords join the inputs under BOTH batch-column "
                "conventions — cannot disambiguate; dump with a batch whose "
                "coordinate range does not overlap [0, num_batches)"
            )
    if fits_first == fits_last:  # both False
        raise ValueError(
            "neither the first nor the last ME output coord column matches "
            "the input batch histogram — coords are not a reordering of the "
            "inputs (wrong checkpoint/model or lossy quantization)"
        )
    return as_first if fits_first else as_last


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="released .pth (nce / hardest)")
    p.add_argument("inputs", help="inputs.npz from parity_check --dump-inputs")
    p.add_argument("output", help="acts npz to write ({coords, feats})")
    p.add_argument("--model", default="Res16UNet34C")
    p.add_argument("--device", default="cuda")
    args = p.parse_args(argv)

    try:
        import torch
        import MinkowskiEngine as ME
    except ImportError as e:  # pragma: no cover - offline-host only
        print(f"this script needs torch + MinkowskiEngine ({e}); run it on "
              f"an ME host, not the TPU environment", file=sys.stderr)
        return 2
    try:
        # the reference repo's model zoo (PYTHONPATH must include
        # <reference>/pretrain/pointcontrast)
        from model import load_model  # type: ignore
    except ImportError:
        print("put the reference repo's pretrain/pointcontrast on "
              "PYTHONPATH (its `model` package provides load_model)",
              file=sys.stderr)
        return 2

    blob = np.load(args.inputs)
    coords = blob["coords"].astype(np.int32)  # [N, 1+3], batch first
    feats = blob["feats"].astype(np.float32)  # [N, 3]

    state = torch.load(args.checkpoint, map_location="cpu")
    weights = state.get("state_dict", state)

    net = load_model(args.model)(3, 32, config=None, D=3)
    net.load_state_dict({k.replace("module.", ""): v
                         for k, v in weights.items()})
    net = net.to(args.device).eval()

    # ME's batched coordinate convention puts batch FIRST in recent
    # versions; older 0.4.x used batch LAST — handle both.
    me_coords = torch.from_numpy(coords)
    try:
        stensor = ME.SparseTensor(
            torch.from_numpy(feats).to(args.device),
            me_coords.to(args.device),
        )
    except Exception:
        me_coords = torch.from_numpy(
            np.concatenate([coords[:, 1:], coords[:, :1]], axis=1))
        stensor = ME.SparseTensor(
            torch.from_numpy(feats), me_coords, device=args.device
        )
    with torch.no_grad():
        out = net(stensor)
    out_c = normalize_batch_column(out.C.cpu().numpy(), coords)
    acts = align_to_inputs(coords, out_c, out.F.cpu().numpy())

    np.savez_compressed(args.output, coords=coords, feats=acts)
    print(f"wrote {args.output}: {len(acts)} rows, dim {acts.shape[1]}")
    return 0


if __name__ == "__main__":  # pragma: no cover - offline-host entry
    sys.exit(main())
