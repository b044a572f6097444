"""Ground the bench workload's occupancy pyramid in depth-frame statistics.

Renders a fabricated ScanNet-like depth frame (640x480, the ScanNet depth
intrinsics fx=fy=577, raycast against a furnished room), unprojects it with
the SAME production code the offline pipeline uses
(`tools.pair_pipeline.unproject_depth`), voxelizes at 2.5 cm, and prints the
per-level pyramid occupancy ratios next to the bench's
`SyntheticPairDataset` frame ratios (VERDICT round-2 item 6: the bench
pyramid should be justified by extracted numbers, not an argument).

Run (CPU is fine — topology is host-side):
  JAX_PLATFORMS=cpu python experiments/frame_pyramid_stats.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

W, H = 640, 480
FX = FY = 577.590698  # ScanNet intrinsic_depth.txt values
CX, CY = 318.905426, 242.683609
VOXEL = 0.025


def render_room_depth(seed: int = 0) -> np.ndarray:
    """Raycast depth of a furnished room from a camera inside it.

    Room: interior of an AABB; furniture: random AABBs.  Depth is z-depth in
    millimeters like a ScanNet frame (uint16)."""
    rng = np.random.RandomState(seed)
    # camera at origin looking +z; room extends around/ahead of it
    room_lo = np.array([-2.2, -1.4, -0.5])
    room_hi = np.array([2.2, 1.4, 4.5])

    u, v = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack(
        [(u - CX) / FX, (v - CY) / FY, np.ones_like(u, np.float64)], axis=-1
    )  # [H, W, 3], dz == 1 so t == z-depth

    # interior walls: for each axis/side, t where ray exits the room
    t_room = np.full((H, W), np.inf)
    for ax in range(3):
        for bound in (room_lo[ax], room_hi[ax]):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = bound / d[..., ax]
            t = np.where(t > 1e-6, t, np.inf)
            # hit point must lie within the other two axes' bounds
            ok = np.ones((H, W), bool)
            for other in range(3):
                if other == ax:
                    continue
                p = t * d[..., other]
                ok &= (p >= room_lo[other] - 1e-9) & (p <= room_hi[other] + 1e-9)
            t_room = np.minimum(t_room, np.where(ok, t, np.inf))

    # furniture AABBs (slab test)
    t_best = t_room
    for _ in range(9):
        size = 0.25 + rng.rand(3) * np.array([0.9, 0.9, 0.7])
        center = np.array([
            rng.uniform(room_lo[0] + 0.5, room_hi[0] - 0.5),
            rng.uniform(room_lo[1] + 0.3, room_hi[1] - 0.3),
            rng.uniform(1.0, room_hi[2] - 0.5),
        ])
        lo, hi = center - size / 2, center + size / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = lo[None, None, :] / d
            t2 = hi[None, None, :] / d
        tmin = np.minimum(t1, t2).max(axis=-1)
        tmax = np.maximum(t1, t2).min(axis=-1)
        hit = (tmax >= tmin) & (tmin > 1e-6)
        t_best = np.where(hit & (tmin < t_best), tmin, t_best)

    depth_m = np.where(np.isfinite(t_best), t_best, 0.0)
    # sensor range clamp + quantization to millimeters
    depth_m[depth_m > 8.0] = 0.0
    return (depth_m * 1000.0).astype(np.uint16)


def pyramid_ratios(coords: np.ndarray, levels: int = 5) -> list[float]:
    """Occupancy of each level relative to level 0 (floor-div pyramid)."""
    from pointcontrast_tpu.sparse.quantize import sparse_quantize

    counts = []
    cur = np.unique(coords, axis=0)
    for _ in range(levels):
        counts.append(len(cur))
        cur = np.unique(cur // 2, axis=0)
    return [c / counts[0] for c in counts], counts[0]


def frame_coords(depth_mm: np.ndarray) -> np.ndarray:
    from pointcontrast_tpu.tools.pair_pipeline import unproject_depth

    intr = np.eye(4)
    intr[0, 0], intr[1, 1] = FX, FY
    intr[0, 2], intr[1, 2] = CX, CY
    pts = unproject_depth(depth_mm, intr, np.eye(4))
    return np.floor(pts / VOXEL).astype(np.int64)


def bench_frame_coords(seed: int = 0) -> np.ndarray:
    from pointcontrast_tpu.data.pair_dataset import SyntheticPairDataset

    ds = SyntheticPairDataset(
        num_pairs=8, points_per_frame=45000, room_size=1.75, seed=0,
    )
    xyz0, _, c0, _, _, _, _, _ = ds[seed]
    return np.floor(xyz0 / VOXEL).astype(np.int64)


def main():
    rows = []
    for seed in range(4):
        ratios, n0 = pyramid_ratios(frame_coords(render_room_depth(seed)))
        rows.append((f"rendered frame {seed}", n0, ratios))
    for seed in range(4):
        ratios, n0 = pyramid_ratios(bench_frame_coords(seed))
        rows.append((f"bench frame {seed}", n0, ratios))
    print(f"{'source':20s} {'voxels':>7s}  L0     L1     L2     L3     L4")
    for name, n0, ratios in rows:
        print(f"{name:20s} {n0:7d}  " + "  ".join(f"{r:.3f}" for r in ratios))
    rend = np.mean([r for n, _, r in rows[:4]], axis=0)
    bench = np.mean([r for n, _, r in rows[4:]], axis=0)
    print("mean rendered:", np.round(rend, 3))
    print("mean bench:   ", np.round(bench, 3))


if __name__ == "__main__":
    main()
