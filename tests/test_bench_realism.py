"""The bench workload's occupancy pyramid must track depth-frame statistics.

Renders a fabricated ScanNet-geometry depth frame (640x480, real ScanNet
depth intrinsics, raycast room) through the production unprojection code and
asserts the bench `SyntheticPairDataset` reproduces its per-level occupancy
ratios (VERDICT round-2 item 6).  Measured round 3: rendered mean
[1, .265, .072, .020, .007] vs bench [1, .253, .061, .015, .004].
"""
import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "frame_pyramid_stats",
    os.path.join(os.path.dirname(__file__), "..", "experiments",
                 "frame_pyramid_stats.py"),
)
fps = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fps)


class TestBenchPyramidRealism:
    def test_bench_ratios_track_rendered_frame(self):
        rendered, n0_r = fps.pyramid_ratios(
            fps.frame_coords(fps.render_room_depth(0))
        )
        bench, n0_b = fps.pyramid_ratios(fps.bench_frame_coords(0))
        assert n0_r > 15000 and n0_b > 12000  # both real frame scale
        for lvl in range(1, 5):
            assert abs(rendered[lvl] - bench[lvl]) < 0.05, (
                f"level {lvl}: rendered {rendered[lvl]:.3f} vs "
                f"bench {bench[lvl]:.3f}"
            )
        # the level-1 ratio is the load-bearing one (~2/3 of off-level-0
        # conv rows); it must sit near the rendered ~0.26, far from the
        # round-1 spray's 0.62
        assert 0.2 < bench[1] < 0.33

    def test_pads_cover_rendered_pyramid(self):
        """PadScheme.scannet per-level pad ratios exceed the rendered
        frame's occupancy ratios (no truncation on real-statistics data)."""
        from pointcontrast_tpu.data import PadScheme

        scheme = PadScheme.scannet(npad0=131072)
        pad_ratios = [n / scheme.npads[0] for n in scheme.npads]
        rendered, _ = fps.pyramid_ratios(
            fps.frame_coords(fps.render_room_depth(1))
        )
        # bench occupancy: ~126k of 131072 level-0 rows
        occupancy0 = 0.96
        for lvl in range(1, 5):
            assert pad_ratios[lvl] > rendered[lvl] * occupancy0, (
                f"level {lvl} pad ratio {pad_ratios[lvl]:.3f} below "
                f"rendered occupancy {rendered[lvl]:.3f}"
            )
