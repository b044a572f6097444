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


class TestBlockKernelOrder:
    """The reference's residual-block convs are built with
    ConvType.SPATIAL_HYPERCUBE_TEMPORAL_HYPERCROSS (model/resnet.py:26,
    _make_layer:127-137), which ME's KernelGenerator routes through the
    Python HYBRID region construction instead of the C++ HYPERCUBE
    iterator.  That list expands each new axis in the innermost loop, so in
    3D the 27 block-kernel rows are stored base-3 digit-REVERSED relative
    to the x-fastest order of every non-block conv.  Conversion must undo
    exactly that, for block convs only."""

    def test_permutation_is_digit_reversal(self):
        from pointcontrast_tpu.tools.convert_torch import (
            block_kernel_permutation,
        )

        perm = block_kernel_permutation(27)
        for i in range(27):
            ix, iy, iz = i % 3, (i // 3) % 3, i // 9
            assert perm[i] == iz + 3 * iy + 9 * ix
        # 1x1 kernels and 4D hybrid (29-row) kernels pass through unchanged
        assert block_kernel_permutation(1) is None
        assert block_kernel_permutation(29, 4) is None

    def test_convert_reorders_block_convs_only(self):
        from pointcontrast_tpu.tools.convert_torch import convert_state_dict

        me_hybrid = kernel_offsets(
            3, 3, "hybrid", axis_types=("hypercube",) * 3
        )
        ours = kernel_offsets(3, 3, "hypercube")
        # row j of the fabricated ME kernels encodes ME's offset j
        block_kern = np.zeros((27, 1, 3), np.float32)
        block_kern[:, 0, :] = me_hybrid
        stem_kern = np.zeros((27, 1, 3), np.float32)
        stem_kern[:, 0, :] = ours  # C++ iterator order
        sd = {
            "block1.0.conv1.kernel": block_kern,
            "conv0p1s1.kernel": stem_kern,
        }
        params, _, unmatched = convert_state_dict(sd)
        assert not unmatched
        # after conversion, row i of BOTH kernels encodes OUR offset i
        np.testing.assert_array_equal(
            params["block1_0"]["SparseConv_0"]["kernel"][:, 0, :], ours
        )
        np.testing.assert_array_equal(
            params["conv0p1s1"]["kernel"][:, 0, :], ours
        )

    def test_export_round_trip(self):
        from pointcontrast_tpu.tools.convert_torch import (
            convert_state_dict,
            export_state_dict,
        )

        rng = np.random.RandomState(0)
        params = {
            "block1_0": {
                "SparseConv_0": {
                    "kernel": rng.randn(27, 2, 2).astype(np.float32)
                },
            },
        }
        sd = export_state_dict(params, {})
        back, _, unmatched = convert_state_dict(sd)
        assert not unmatched
        np.testing.assert_array_equal(
            back["block1_0"]["SparseConv_0"]["kernel"],
            params["block1_0"]["SparseConv_0"]["kernel"],
        )
        # the exported (ME-side) kernel really is in a different row order
        assert not np.array_equal(
            sd["block1.0.conv1.kernel"],
            params["block1_0"]["SparseConv_0"]["kernel"],
        )
