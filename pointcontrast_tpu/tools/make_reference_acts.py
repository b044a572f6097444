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
    out_c = out.C.cpu().numpy()
    if out_c.shape[1] == 4 and not np.array_equal(out_c[:, 0], out_c[:, 0]):
        pass
    # normalize coord column order back to batch-first if ME gave batch-last
    if not set(np.unique(out_c[:, 0])).issubset(set(np.unique(coords[:, 0]))):
        out_c = np.concatenate([out_c[:, -1:], out_c[:, :-1]], axis=1)
    acts = align_to_inputs(coords, out_c, out.F.cpu().numpy())

    np.savez_compressed(args.output, coords=coords, feats=acts)
    print(f"wrote {args.output}: {len(acts)} rows, dim {acts.shape[1]}")
    return 0


if __name__ == "__main__":  # pragma: no cover - offline-host entry
    sys.exit(main())
