"""Unit tests for the sparse voxel engine (hashing, quantize, kernel maps,
topology) against brute-force oracles."""
import numpy as np
import pytest

from pointcontrast_tpu.sparse.hashing import HashSpec, hash_coords
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, offset_index
from pointcontrast_tpu.sparse.topology import build_pyramid, bucket_size


def random_coords(n, num_batch=2, extent=20, seed=0, dimension=3):
    rng = np.random.RandomState(seed)
    coords = rng.randint(-extent, extent, size=(n * 2, dimension + 1))
    coords[:, 0] = rng.randint(0, num_batch, size=n * 2)
    coords = np.unique(coords, axis=0)[:n]
    return coords.astype(np.int32)


class TestHashing:
    def test_roundtrip_unique(self):
        coords = random_coords(500, seed=1)
        keys, spec = hash_coords(coords)
        assert len(np.unique(keys)) == len(np.unique(coords, axis=0))

    def test_margin_allows_offsets(self):
        coords = random_coords(100, seed=2)
        spec = HashSpec.from_coords(coords, margin=3)
        shifted = coords.copy()
        shifted[:, 1:] += 3
        keys = spec.encode(shifted)  # must not collide with unshifted keys
        both = np.concatenate([spec.encode(coords), keys])
        uniq = np.unique(
            np.concatenate([coords, shifted]), axis=0
        )
        assert len(np.unique(both)) == len(uniq)

    def test_too_large_raises(self):
        coords = np.array([[0, 0], [2**40, 2**40]], dtype=np.int64)
        with pytest.raises(ValueError):
            HashSpec.from_coords(coords)


class TestQuantize:
    def test_return_index_first_occurrence(self):
        xyz = np.array([[0.1, 0.2, 0.3], [0.9, 0.2, 0.3], [1.2, 0.0, 0.0]])
        sel = sparse_quantize(xyz, return_index=True)
        # first two land in voxel (0,0,0): keep index 0, plus index 2
        assert list(sel) == [0, 2]

    def test_label_conflict_ignored(self):
        coords = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0]])
        feats = np.arange(8, dtype=np.float32).reshape(4, 2)
        labels = np.array([1, 2, 3, 3])
        uc, uf, ul = sparse_quantize(coords, feats, labels, ignore_label=255)
        assert uc.shape == (2, 3)
        np.testing.assert_array_equal(ul, [255, 3])
        np.testing.assert_array_equal(uf, feats[[0, 2]])

    def test_float_floor(self):
        xyz = np.array([[-0.5, 0.0, 0.0], [-1.0, 0.0, 0.0]])
        sel = sparse_quantize(xyz, return_index=True)
        assert len(sel) == 1  # both floor to voxel -1


class TestKernelOffsets:
    def test_cube3(self):
        offs = kernel_offsets(3, 3, "hypercube")
        assert offs.shape == (27, 3)
        assert offs.min() == -1 and offs.max() == 1
        assert len(np.unique(offs, axis=0)) == 27
        # x-fastest: second element differs from first in x only
        np.testing.assert_array_equal(offs[1] - offs[0], [1, 0, 0])

    def test_cube2_even(self):
        offs = kernel_offsets(2, 3, "hypercube")
        assert offs.shape == (8, 3)
        assert offs.min() == 0 and offs.max() == 1

    def test_cross3(self):
        offs = kernel_offsets(3, 3, "hypercross")
        assert offs.shape == (7, 3)
        np.testing.assert_array_equal(offs[0], [0, 0, 0])
        assert np.abs(offs).sum(axis=1).max() == 1

    def test_hybrid_4d(self):
        offs = kernel_offsets(
            (3, 3, 3, 3), 4, "hybrid",
            axis_types=("hypercube",) * 3 + ("hypercross",),
        )
        # ME HYBRID volume: prod(cube ks) + sum(cross ks - 1) = 27 + 2,
        # NOT the 81-offset cube x cross product (ME 0.4.x Common.py
        # convert_region_type, reached via reference modules/common.py:111).
        assert offs.shape == (29, 4)
        assert len(np.unique(offs, axis=0)) == 29
        # cube part: cross axis pinned at 0, later cube axes vary fastest
        assert np.all(offs[:27, 3] == 0)
        np.testing.assert_array_equal(offs[0], [-1, -1, -1, 0])
        np.testing.assert_array_equal(offs[1], [-1, -1, 0, 0])
        np.testing.assert_array_equal(offs[3], [-1, 0, -1, 0])
        np.testing.assert_array_equal(offs[9], [0, -1, -1, 0])
        np.testing.assert_array_equal(offs[13], [0, 0, 0, 0])
        # cross deviations appended last, ascending
        np.testing.assert_array_equal(offs[27], [0, 0, 0, -1])
        np.testing.assert_array_equal(offs[28], [0, 0, 0, 1])

    def test_dilation(self):
        offs = kernel_offsets(3, 3, "hypercube", dilation=2)
        assert set(np.unique(offs)) == {-2, 0, 2}


class TestBucket:
    def test_strictly_greater(self):
        for n in [0, 1, 255, 256, 257, 1000, 5000, 123456]:
            b = bucket_size(n)
            assert b > n
        assert bucket_size(256) == 384
        assert bucket_size(384) == 512

    def test_few_distinct_buckets(self):
        sizes = {bucket_size(n) for n in range(1, 100000, 37)}
        assert len(sizes) < 20


class TestTopology:
    def test_same_level_map_bruteforce(self):
        coords = random_coords(300, seed=3)
        pyr, meta = build_pyramid(coords, num_levels=1)
        nbr = np.asarray(pyr.levels[0].nbr)
        offs = kernel_offsets(3, 3, "hypercube")
        lookup = {tuple(c): i for i, c in enumerate(coords)}
        n = len(coords)
        pad = meta.npads[0] - 1
        for k in range(27):
            for j in range(n):
                q = coords[j].copy()
                q[1:] += offs[k]
                expect = lookup.get(tuple(q), pad)
                assert nbr[k, j] == expect, (k, j)
        # padded columns all point at pad row
        assert (nbr[:, n:] == pad).all()

    def test_pyramid_levels_shrink_and_parent_consistency(self):
        coords = random_coords(1000, num_batch=3, extent=30, seed=4)
        pyr, meta = build_pyramid(coords, num_levels=4)
        offs2 = kernel_offsets(2, 3, "hypercube")
        for lvl in range(3):
            fine = meta.coords[lvl]
            coarse = meta.coords[lvl + 1]
            assert len(coarse) <= len(fine)
            up_parent = np.asarray(pyr.levels[lvl].up_parent)[: len(fine)]
            up_offset = np.asarray(pyr.levels[lvl].up_offset)[: len(fine)]
            # parent coords must be floor(fine/2), offset must reconstruct fine
            for f in range(len(fine)):
                p = coarse[up_parent[f]]
                assert p[0] == fine[f][0]  # same sample
                np.testing.assert_array_equal(p[1:], fine[f][1:] // 2)
                np.testing.assert_array_equal(
                    2 * p[1:] + offs2[up_offset[f]][1:] if False else
                    2 * p[1:] + offs2[up_offset[f]], fine[f][1:]
                )

    def test_down_nbr_matches_children(self):
        coords = random_coords(500, seed=5)
        pyr, meta = build_pyramid(coords, num_levels=2)
        fine, coarse = meta.coords[0], meta.coords[1]
        down = np.asarray(pyr.levels[0].down_nbr)
        offs2 = kernel_offsets(2, 3, "hypercube")
        lookup = {tuple(c): i for i, c in enumerate(fine)}
        pad = meta.npads[0] - 1
        for j, c in enumerate(coarse):
            for k in range(8):
                q = c.copy()
                q[1:] = 2 * q[1:] + offs2[k]
                assert down[k, j] == lookup.get(tuple(q), pad)

    def test_batch_isolation(self):
        # voxels from different samples at identical spatial coords never mix
        coords = np.array([[0, 1, 1, 1], [1, 1, 1, 1], [0, 1, 1, 2]], dtype=np.int32)
        pyr, meta = build_pyramid(coords, num_levels=2)
        nbr = np.asarray(pyr.levels[0].nbr)
        offs = kernel_offsets(3, 3, "hypercube")
        center = int(np.where((offs == 0).all(axis=1))[0][0])
        # center offset maps to self
        np.testing.assert_array_equal(nbr[center, :3], [0, 1, 2])
        kz = int(np.where((offs == [0, 0, 1]).all(axis=1))[0][0])
        assert nbr[kz, 0] == 2  # same-sample neighbor found
        assert nbr[kz, 1] == meta.npads[0] - 1  # other sample: no neighbor
        # level-1: (0,0,0,0), (1,0,0,0), (0,0,0,1) -- samples stay separate
        assert meta.counts[1] == 3

    def test_conv0_extra_map(self):
        coords = random_coords(200, seed=6)
        pyr, meta = build_pyramid(coords, num_levels=1, conv0_kernel_size=5)
        assert pyr.levels[0].nbr0 is not None
        assert np.asarray(pyr.levels[0].nbr0).shape == (125, meta.npads[0])
