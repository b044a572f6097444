"""Host-collation cost guard (VERDICT r3 item 10).

The round-3 chunked collation win (0.47 s/batch vs 1.54 voxel at bench
scale on this 1-core harness, PERF.md) is load-bearing for real-host
end-to-end throughput: with one core per loader worker, two workers cover a
~0.5 s collation against the ~0.3 s device step; at 1.5 s they cannot.
This pins chunked collation under a generous multiple of the measured cost
so a host-side regression (e.g. losing the native kernel-map builder or the
per-sample hash-join structure) fails loudly instead of silently halving
end-to-end throughput.
"""
import os
import time

import numpy as np
import pytest

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair

# Wall-clock assertions flake on heavily contended hosts no matter the
# headroom; PC_TPU_SKIP_PERF_TESTS=1 opts such a CI host out (the functional
# collation coverage lives in test_chunked / test_collate).
pytestmark = pytest.mark.skipif(
    os.environ.get("PC_TPU_SKIP_PERF_TESTS") == "1",
    reason="wall-clock perf guard disabled by PC_TPU_SKIP_PERF_TESTS=1",
)

# Measured on the 1-core round-3/4 harness: ~0.47 s/batch chunked at full
# bench scale (4 pairs x 45k pts).  This guard runs HALF the bench batch
# (2 pairs) to keep test wall time down; measured ~0.25 s there.  Budget 4x
# headroom for slower/contended hosts — a regression to the voxel-layout
# cost structure (3.3x) still trips it.
BUDGET_SECONDS = 1.0
PAIRS = 2


def test_chunked_collation_stays_under_budget():
    ds = SyntheticPairDataset(
        num_pairs=PAIRS, points_per_frame=45000, room_size=1.75, seed=0
    )
    scheme = PadScheme.scannet(npad0=PAIRS * 32768)
    rng = np.random.RandomState(0)
    samples = [ds[i] for i in range(PAIRS)]

    def one():
        t0 = time.perf_counter()
        collate_pair(
            samples, scheme, mode="nce", npos=4096, rng=rng,
            fuse_frames=True, layout="chunked",
        )
        return time.perf_counter() - t0

    one()  # warm the native builder (first call may compile/load it)
    best = min(one() for _ in range(3))
    assert best < BUDGET_SECONDS, (
        f"chunked collation took {best:.2f}s/batch (budget "
        f"{BUDGET_SECONDS}s at {PAIRS} pairs) — the host pipeline win "
        f"regressed; see PERF.md round 3 'Host collation, chunked'"
    )
