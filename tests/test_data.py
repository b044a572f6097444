"""Data pipeline tests: matching oracle, sampling, collation invariants."""
import numpy as np
import pytest

from pointcontrast_tpu.data import (
    PadScheme,
    SyntheticPairDataset,
    collate_pair,
    radius_matches,
)
from pointcontrast_tpu.data.collate import (
    _collision_bitmap,
    sample_hardest_contrastive,
    sample_nce_pairs,
)
from pointcontrast_tpu.data.sampler import DistributedInfSampler, InfSampler


class TestRadiusMatches:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        a = rng.randn(300, 3)
        b = rng.randn(400, 3)
        r = 0.4
        got = radius_matches(a, b, r)
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        want = np.argwhere(d2 <= r * r)
        got_set = {tuple(p) for p in got}
        want_set = {tuple(p) for p in want}
        assert got_set == want_set

    def test_with_transform(self):
        rng = np.random.RandomState(1)
        a = rng.randn(100, 3)
        t = np.eye(4)
        t[:3, 3] = [5.0, 0, 0]
        got = radius_matches(a, a + [5.0, 0, 0], 1e-6, trans=t)
        assert len(got) == 100
        assert (got[:, 0] == got[:, 1]).all()

    def test_empty(self):
        assert radius_matches(np.zeros((0, 3)), np.zeros((5, 3)), 1.0).shape == (0, 2)


class TestCollisionBitmap:
    def test_matches_set_membership(self):
        rng = np.random.RandomState(0)
        m, n0, n1 = 500, 300, 280
        matches = np.stack(
            [rng.randint(0, n0, m), rng.randint(0, n1, m)], 1
        ).astype(np.int64)
        anchors = rng.randint(0, n0, 64)
        cands = np.zeros(48, np.int32)
        hv = 40
        cands[:hv] = rng.choice(n1, hv, replace=False)
        got = _collision_bitmap(matches[:, 0], matches[:, 1], anchors, cands, hv, n1)
        pairs = {(int(a), int(b)) for a, b in matches}
        for i, a in enumerate(anchors):
            for j in range(hv):
                assert got[i, j] == ((int(a), int(cands[j])) in pairs)
        assert not got[:, hv:].any()


class TestSampling:
    def test_nce_unique_anchors(self):
        rng = np.random.RandomState(0)
        matches = np.array(
            [[0, 1], [0, 2], [1, 3], [2, 4], [2, 5], [2, 6]], dtype=np.int64
        )
        q, k, v = sample_nce_pairs(matches, npos=8, rng=rng)
        n = int(v.sum())
        assert n == 3  # three unique anchors
        assert sorted(q[:n]) == [0, 1, 2]
        pairs = {(int(a), int(b)) for a, b in matches}
        for i in range(n):
            assert (q[i], k[i]) in pairs

    def test_nce_subsample(self):
        rng = np.random.RandomState(0)
        matches = np.stack([np.arange(100), np.arange(100)], 1).astype(np.int64)
        q, k, v = sample_nce_pairs(matches, npos=10, rng=rng)
        assert v.sum() == 10
        assert (q[:10] == k[:10]).all()

    def test_hardest_shapes(self):
        rng = np.random.RandomState(0)
        matches = np.stack([np.arange(50), np.arange(50)], 1).astype(np.int64)
        d = sample_hardest_contrastive(matches, 200, 220, 64, 32, rng)
        assert d["pos_valid"].sum() == 50
        assert d["cand0_valid"].sum() == 32
        assert d["collide0"].shape == (64, 4)  # 32 cands bit-packed to 4 B
        assert d["collide0"].dtype == np.uint8


class TestCollate:
    def test_shapes_and_padding(self):
        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=1500, seed=0)
        scheme = PadScheme(npad0=8192, num_levels=5)
        batch = collate_pair(
            [ds[0], ds[1]], scheme, mode="nce", npos=256,
            rng=np.random.RandomState(0),
        )
        assert batch.feats0.shape == (scheme.npads[0], 3)
        for lvl, pad in zip(batch.pyramid0.levels, scheme.npads):
            assert lvl.nbr.shape[1] == pad
            n = int(lvl.valid.sum())
            assert 0 < n < pad
            # padded rows of feats are zero
        n0 = int(batch.pyramid0.levels[0].valid.sum())
        assert np.all(batch.feats0[n0:] == 0)
        # nce indices point at valid voxels
        nv = int(batch.pair_valid.sum())
        assert (batch.q_idx[:nv] < n0).all()

    def test_batch_index_column(self):
        ds = SyntheticPairDataset(num_pairs=3, points_per_frame=1000, seed=1)
        scheme = PadScheme(npad0=8192)
        batch = collate_pair(
            [ds[i] for i in range(3)], scheme, mode="nce",
            rng=np.random.RandomState(0),
        )
        lvl0 = batch.pyramid0.levels[0]
        n = int(lvl0.valid.sum())
        b = np.asarray(lvl0.batch)
        assert set(np.unique(b[:n])) == {0, 1, 2}
        assert (b[n:] == 3).all()  # padding segment

    def test_overflow_subsamples(self):
        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=4000, seed=2)
        tiny = PadScheme(npad0=2048)
        batch = collate_pair(
            [ds[0], ds[1]], tiny, mode="nce", rng=np.random.RandomState(0)
        )
        assert int(batch.pyramid0.levels[0].valid.sum()) < 2048

    def test_truncation_is_counted(self):
        """Over-dense input at a too-tight coarse pad must surface a nonzero
        truncated_voxels count instead of dropping voxels silently."""
        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=3000, seed=3)
        # level-1+ pads far below the ~no-merge level-1 count of surface data
        tight = PadScheme(npad0=8192, level_ratios=(1.0, 0.05, 0.02, 0.01, 0.01))
        batch = collate_pair(
            [ds[0]], tight, mode="nce", rng=np.random.RandomState(0)
        )
        assert float(batch.truncated_voxels) > 0

    def test_scannet_scheme_fits_bench_density(self):
        """PadScheme.scannet's level ratios must hold (zero truncation) at
        the density they are tuned for: saturated surface scans (every
        surface voxel in view occupied, like real depth-frame unprojections
        — the bench generator config).  At sparser sub-voxel sampling the
        per-stride merge is weaker and the ratios are NOT guaranteed —
        truncated_voxels exists to surface exactly that."""
        ds = SyntheticPairDataset(
            num_pairs=4, points_per_frame=45000, room_size=1.75, seed=4)
        samples = [ds[i] for i in range(4)]
        scheme = PadScheme.scannet(npad0=131072)
        for layout in ("voxel", "brick"):
            batch = collate_pair(
                samples, scheme, mode="nce",
                rng=np.random.RandomState(0), fuse_frames=True, layout=layout,
            )
            assert float(batch.truncated_voxels) == 0, layout
        counts = [int(l.valid.sum()) for l in batch.pyramid0.levels]
        npads = scheme.npads_for(scheme.num_levels + 1)
        for lvl, (count, pad) in enumerate(zip(counts, npads[1:])):
            assert count < pad * 8, f"brick level {lvl}: {count} >= {pad * 8}"


class TestSamplers:
    def test_inf_sampler_covers_epoch(self):
        s = InfSampler(10, shuffle=True, seed=0)
        seen = sorted(next(s) for _ in range(10))
        assert seen == list(range(10))

    def test_distributed_disjoint(self):
        a = DistributedInfSampler(8, num_shards=2, shard_id=0, shuffle=False)
        b = DistributedInfSampler(8, num_shards=2, shard_id=1, shuffle=False)
        got_a = {next(a) for _ in range(4)}
        got_b = {next(b) for _ in range(4)}
        assert got_a | got_b == set(range(8))
        assert not (got_a & got_b)
