"""Kernel-offset enumeration order: pinned by construction + torch oracles.

Checkpoint parity with MinkowskiEngine hinges on one convention: which row
of a ``[K, Cin, Cout]`` kernel corresponds to which spatial offset.  ME
derives it from its region iterator (kernel_region.hpp / region_iterator in
ME 0.4.x, the version PointContrast pins): the iterator starts at the
region's lower bound and ``operator++`` increments axis 0 first, carrying
into higher axes -- i.e. x-fastest enumeration -- with per-axis offsets
``[-(k//2), k//2]`` for odd k and ``[0, k)`` for even k (stride-2 k=2 convs
cover children ``2c + {0,1}^D``).  ``sparse/kernel_map.py`` implements
exactly that, and these tests make the convention falsifiable:

  1. the literal enumeration is pinned row-by-row (any refactor that
     changes it fails loudly);
  2. torch Conv3d / ConvTranspose3d -- whose kernel layout is unambiguous
     (cross-correlation over explicit spatial axes) -- are used as oracles:
     a random ME-layout kernel placed into a torch kernel *via our claimed
     enumeration* must reproduce our sparse conv outputs exactly, for the
     stride-1 k=3 conv, the stride-2 k=2 down conv, and the stride-2 k=2
     transpose conv.  Any offset-index permutation error breaks equality.

Together with the renaming-only converter (tools/convert_torch.py) this
settles the kernel-offset-order question VERDICT.md round 1 flagged, without
a permutation search.  Reference usage: res16unet.py:206-268 and
modules/common.py:127-138 build all convs through ME with these defaults.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pointcontrast_tpu.sparse import ops
from pointcontrast_tpu.sparse.kernel_map import kernel_offsets
from pointcontrast_tpu.sparse.topology import build_pyramid

torch = pytest.importorskip("torch")


class TestEnumerationPinned:
    def test_k3_rows(self):
        offs = kernel_offsets(3, 3, "hypercube")
        assert offs.shape == (27, 3)
        # x-fastest: first axis cycles fastest through (-1, 0, 1)
        expect_first6 = [(-1, -1, -1), (0, -1, -1), (1, -1, -1),
                         (-1, 0, -1), (0, 0, -1), (1, 0, -1)]
        assert [tuple(o) for o in offs[:6]] == expect_first6
        assert tuple(offs[13]) == (0, 0, 0)  # center at index 13
        assert tuple(offs[26]) == (1, 1, 1)

    def test_k2_rows(self):
        offs = kernel_offsets(2, 3, "hypercube")
        assert [tuple(o) for o in offs] == [
            (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
            (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
        ]


def full_cube(extent: int):
    """Every voxel of a cube occupied: all 27 taps exercised everywhere."""
    g = np.mgrid[0:extent, 0:extent, 0:extent].reshape(3, -1).T
    coords = np.concatenate([np.zeros((len(g), 1), np.int32), g], 1)
    return coords.astype(np.int32)


class TestTorchOracle:
    def setup_method(self, _):
        self.extent = 6
        self.coords = full_cube(self.extent)
        self.n = len(self.coords)
        rng = np.random.RandomState(0)
        self.cin, self.cout = 3, 4
        self.feats = rng.randn(self.n, self.cin).astype(np.float32)
        self.rng = rng
        self.pyr, self.meta = build_pyramid(self.coords, num_levels=2)

    def torch_grid(self):
        g = torch.zeros(1, self.cin, self.extent, self.extent, self.extent)
        for c, f in zip(self.coords, self.feats):
            g[0, :, c[1], c[2], c[3]] = torch.from_numpy(f)
        return g

    def test_stride1_k3_conv(self):
        w = self.rng.randn(27, self.cin, self.cout).astype(np.float32)
        # scale each tap differently so permutations cannot cancel
        w *= (1 + np.arange(27, dtype=np.float32))[:, None, None]
        fpad = np.zeros((self.meta.npads[0], self.cin), np.float32)
        fpad[: self.n] = self.feats
        ours = np.asarray(ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(self.pyr.levels[0].nbr),
            jnp.asarray(w), valid_out=jnp.asarray(self.pyr.levels[0].valid)))

        conv = torch.nn.Conv3d(self.cin, self.cout, 3, padding=1, bias=False)
        offs = kernel_offsets(3, 3, "hypercube")
        with torch.no_grad():
            for k, o in enumerate(offs):
                conv.weight[:, :, o[0] + 1, o[1] + 1, o[2] + 1] = (
                    torch.from_numpy(w[k].T))
        ref = conv(self.torch_grid()).detach().numpy()[0]
        for j, c in enumerate(self.coords):
            np.testing.assert_allclose(
                ours[j], ref[:, c[1], c[2], c[3]], rtol=1e-4, atol=1e-4)

    def test_stride2_k2_down_conv(self):
        w = self.rng.randn(8, self.cin, self.cout).astype(np.float32)
        w *= (1 + np.arange(8, dtype=np.float32))[:, None, None]
        fpad = np.zeros((self.meta.npads[0], self.cin), np.float32)
        fpad[: self.n] = self.feats
        ours = np.asarray(ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(self.pyr.levels[0].down_nbr),
            jnp.asarray(w), valid_out=jnp.asarray(self.pyr.levels[1].valid)))

        conv = torch.nn.Conv3d(self.cin, self.cout, 2, stride=2, bias=False)
        offs = kernel_offsets(2, 3, "hypercube")
        with torch.no_grad():
            for k, o in enumerate(offs):
                conv.weight[:, :, o[0], o[1], o[2]] = torch.from_numpy(w[k].T)
        ref = conv(self.torch_grid()).detach().numpy()[0]
        coarse = self.meta.coords[1]
        for j, c in enumerate(coarse[: self.meta.counts[1]]):
            np.testing.assert_allclose(
                ours[j], ref[:, c[1], c[2], c[3]], rtol=1e-4, atol=1e-4)

    def test_stride2_k2_transpose_conv(self):
        w = self.rng.randn(8, self.cin, self.cout).astype(np.float32)
        w *= (1 + np.arange(8, dtype=np.float32))[:, None, None]
        n1 = self.meta.counts[1]
        featsc = self.rng.randn(n1, self.cin).astype(np.float32)
        cpad = np.zeros((self.meta.npads[1], self.cin), np.float32)
        cpad[:n1] = featsc
        ours = np.asarray(ops.sparse_conv_transpose(
            jnp.asarray(cpad), jnp.asarray(self.pyr.levels[0].up_parent),
            jnp.asarray(self.pyr.levels[0].up_offset), jnp.asarray(w),
            valid_out=jnp.asarray(self.pyr.levels[0].valid)))

        half = self.extent // 2
        gin = torch.zeros(1, self.cin, half, half, half)
        coarse = self.meta.coords[1]
        for j in range(n1):
            c = coarse[j]
            gin[0, :, c[1], c[2], c[3]] = torch.from_numpy(featsc[j])
        convt = torch.nn.ConvTranspose3d(self.cin, self.cout, 2, stride=2,
                                         bias=False)
        offs = kernel_offsets(2, 3, "hypercube")
        with torch.no_grad():
            for k, o in enumerate(offs):
                convt.weight[:, :, o[0], o[1], o[2]] = torch.from_numpy(w[k])
        ref = convt(gin).detach().numpy()[0]
        for j, c in enumerate(self.coords):
            np.testing.assert_allclose(
                ours[j], ref[:, c[1], c[2], c[3]], rtol=1e-4, atol=1e-4)
