"""Measure the valid-neighbor fraction of the bench workload's kernel maps.

The conv core gathers K*S rows per same-level conv regardless of how many
(row, offset) slots actually have an occupied neighbor; missing slots point
at the pad row.  If the valid fraction f is well below 0.5, a compact
gather+scatter form (process only valid pairs: f*K*S gathers + f*K*S
scatter-adds) could beat the dense K*S gather form, since scatter-add
measured ~= gather cost in round 2.  This probe reports f per level plus the
center-offset identity share, on the exact bench batch (host-only, CPU).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair

BATCH_PAIRS = 4
NPAD0 = BATCH_PAIRS * 32768

ds = SyntheticPairDataset(
    num_pairs=BATCH_PAIRS * 2, points_per_frame=45000, room_size=1.75, seed=0
)
scheme = PadScheme.scannet(npad0=NPAD0)
rng = np.random.RandomState(0)
batch = collate_pair(
    [ds[i] for i in range(BATCH_PAIRS)], scheme, mode="nce",
    npos=4096, rng=rng, fuse_frames=True, layout="chunked",
)

pyr = batch.pyramid0
for lvl, topo in enumerate(pyr.levels):
    nbr = np.asarray(topo.nbr)  # [K, B, S] frame-local, pad = S-1
    k, b, s = nbr.shape
    pad = s - 1
    valid_rows = np.asarray(topo.valid).reshape(b, s)  # [B, S]
    occ = valid_rows.sum() / (b * s)
    # fraction of gathered entries that point at a real (non-pad) row
    f_all = (nbr != pad).mean()
    # same, restricted to output rows that are themselves valid
    f_occ = (nbr != pad)[:, valid_rows > 0].mean()
    # center offset: how often is it the identity?
    center = k // 2
    ar = np.arange(s)[None, :].repeat(b, axis=0)
    center_ident = (nbr[center] == ar)[valid_rows > 0].mean()
    per_off = (nbr != pad).reshape(k, -1).mean(axis=1)
    print(
        f"L{lvl}: K={k} S={s} occ={occ:.3f} f_all={f_all:.3f} "
        f"f_occ={f_occ:.3f} center_ident={center_ident:.3f} "
        f"per-offset f range [{per_off.min():.3f}, {per_off.max():.3f}]"
    )
    if topo.down_nbr is not None:
        dn = np.asarray(topo.down_nbr)
        print(f"    down: K={dn.shape[0]} f_all={(dn != pad).mean():.3f}")
