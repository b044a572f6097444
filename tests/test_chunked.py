"""Chunked (per-frame) layout: parity with the flat voxel layout + VJP.

The chunked layout is a pure re-arrangement (per-sample slices, frame-local
maps) of the same conv geometry, so every op and the whole network must
produce identical values at mapped rows.  See sparse/chunk.py and the
round-3 probe (experiments/chunked_conv_probe.py) for why it exists.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
from pointcontrast_tpu.nn.registry import load_model
from pointcontrast_tpu.sparse import ops
from pointcontrast_tpu.sparse.chunk import build_chunked_pyramid, level_rows
from pointcontrast_tpu.sparse.topology import build_pyramid


def _coords(rng, num_batch=3, n_per=(150, 90, 120), extent=24):
    out = []
    for b in range(num_batch):
        flat = rng.choice(extent ** 3, n_per[b], replace=False)
        xyz = np.stack(np.unravel_index(flat, (extent,) * 3), axis=1)
        out.append(np.concatenate([np.full((n_per[b], 1), b), xyz], axis=1))
    return np.concatenate(out).astype(np.int32)


def _globalize(idx_local, s_in):
    """[K, B, S_out] frame-local -> [K, B*S_out] flat-layout indices."""
    k, b, s_out = idx_local.shape
    off = (np.arange(b, dtype=np.int64) * s_in)[None, :, None]
    return (idx_local.astype(np.int64) + off).reshape(k, b * s_out)


class TestChunkedOps:
    """Op-level equality: identical features, chunked vs globalized maps."""

    def setup_method(self, _):
        rng = np.random.RandomState(0)
        self.coords = _coords(rng)
        self.npads = [512, 512, 480, 96, 30]
        self.pyr, self.meta, self.rows, self.orphan = build_chunked_pyramid(
            self.coords, 5, self.npads, num_batch=3
        )
        assert not self.orphan.any()
        self.rng = rng
        n0 = self.pyr.levels[0].valid.shape[0]
        f = np.zeros((n0, 6), np.float32)
        f[self.rows] = rng.randn(len(self.coords), 6)
        self.feats = jnp.asarray(f)

    def test_same_level_conv_matches_global(self):
        lv = self.pyr.levels[0]
        s = lv.valid.shape[0] // 3
        w = jnp.asarray(self.rng.randn(27, 6, 5).astype(np.float32))
        out_c = ops.sparse_conv(
            self.feats, jnp.asarray(np.asarray(lv.nbr)), w,
            valid_out=jnp.asarray(lv.valid), rev=lv.rev,
        )
        nbr_g = _globalize(np.asarray(lv.nbr), s)
        out_g = ops.sparse_conv(
            self.feats, jnp.asarray(nbr_g.astype(np.int32)), w,
            valid_out=jnp.asarray(lv.valid), rev=lv.rev,
        )
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_g),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("group", [26, 13, 9, 5])
    def test_fused_conv_matches_scan(self, group):
        """Fused im2col form == scan form (values AND grads), any grouping."""
        lv = self.pyr.levels[0]
        w = jnp.asarray(self.rng.randn(27, 6, 5).astype(np.float32))
        nbr = jnp.asarray(np.asarray(lv.nbr))
        rev = tuple(lv.rev)

        def loss_scan(f, w):
            out = ops._conv_chunk_sym(f, nbr, w, rev)
            return jnp.sum(out * out), out

        def loss_fused(f, w):
            out = ops._conv_chunk_fused(f, nbr, w, rev, group)
            return jnp.sum(out * out), out

        (l_s, out_s), g_s = jax.value_and_grad(
            loss_scan, argnums=(0, 1), has_aux=True)(self.feats, w)
        (l_f, out_f), g_f = jax.value_and_grad(
            loss_fused, argnums=(0, 1), has_aux=True)(self.feats, w)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(g_f, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("group", [8, 5, 3])
    def test_fused_down_conv_matches_scan(self, group):
        """Fused down-conv custom VJP == scan-core autodiff (values+grads)."""
        lv = self.pyr.levels[0]
        down = jnp.asarray(np.asarray(lv.down_nbr))
        w = jnp.asarray(self.rng.randn(8, 6, 5).astype(np.float32))

        def loss_scan(f, w):
            out = ops._conv_chunk_core(f, down, w)
            return jnp.sum(out * out), out

        def loss_fused(f, w):
            out = ops._conv_chunk_down_fused(f, down, w, group)
            return jnp.sum(out * out), out

        (l_s, out_s), g_s = jax.value_and_grad(
            loss_scan, argnums=(0, 1), has_aux=True)(self.feats, w)
        (l_f, out_f), g_f = jax.value_and_grad(
            loss_fused, argnums=(0, 1), has_aux=True)(self.feats, w)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(g_f, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("group", [8, 3])
    def test_scatter_free_down2_matches_scan(self, group):
        """k2s2 fused down conv with the transpose-trick backward (dF
        gathered via the functional child->(parent, offset) identity) ==
        scan-core autodiff, values and grads.  The coarse cotangent is
        masked first, as in the real network (pad rows carry zero ct)."""
        lv = self.pyr.levels[0]
        lv1 = self.pyr.levels[1]
        down = jnp.asarray(np.asarray(lv.down_nbr))
        upp = jnp.asarray(np.asarray(lv.up_parent))
        upo = jnp.asarray(np.asarray(lv.up_offset))
        v1 = jnp.asarray(lv1.valid)
        w = jnp.asarray(self.rng.randn(8, 6, 5).astype(np.float32))

        def loss_scan(f, w):
            out = ops.mask_rows(ops._conv_chunk_core(f, down, w), v1)
            return jnp.sum(out * out), out

        def loss_fused(f, w):
            out = ops.mask_rows(
                ops._conv_chunk_down2(f, down, upp, upo, w, group), v1)
            return jnp.sum(out * out), out

        (l_s, out_s), g_s = jax.value_and_grad(
            loss_scan, argnums=(0, 1), has_aux=True)(self.feats, w)
        (l_f, out_f), g_f = jax.value_and_grad(
            loss_fused, argnums=(0, 1), has_aux=True)(self.feats, w)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        # dF only at VALID input rows: pad-row dF is garbage-by-design in
        # BOTH forms (the scan core sums every missing-child slot into the
        # pad row; the real network's mask adjoint zeroes it before use)
        v0 = np.asarray(self.pyr.levels[0].valid)[:, None]
        np.testing.assert_allclose(np.asarray(g_f[0]) * v0,
                                   np.asarray(g_s[0]) * v0,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_s[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_env_selection(self, monkeypatch):
        """PC_TPU_CONV_FUSED_GROUP routes sparse_conv to the fused kernel."""
        lv = self.pyr.levels[0]
        w = jnp.asarray(self.rng.randn(27, 6, 5).astype(np.float32))
        nbr = jnp.asarray(np.asarray(lv.nbr))
        base = ops.sparse_conv(self.feats, nbr, w,
                               valid_out=jnp.asarray(lv.valid), rev=lv.rev)
        monkeypatch.setenv("PC_TPU_CONV_FUSED_GROUP", "26")
        fused = ops.sparse_conv(self.feats, nbr, w,
                                valid_out=jnp.asarray(lv.valid), rev=lv.rev)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_down_conv_and_pools_match_global(self):
        lv = self.pyr.levels[0]
        s_in = lv.valid.shape[0] // 3
        w = jnp.asarray(self.rng.randn(8, 6, 4).astype(np.float32))
        v1 = jnp.asarray(self.pyr.levels[1].valid)
        down_l = np.asarray(lv.down_nbr)
        down_g = jnp.asarray(_globalize(down_l, s_in).astype(np.int32))
        out_c = ops.sparse_conv(self.feats, jnp.asarray(down_l), w,
                                valid_out=v1)
        out_g = ops.sparse_conv(self.feats, down_g, w, valid_out=v1)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_g),
                                   rtol=1e-5, atol=1e-5)

        for fn in (ops.sparse_sum_pool,
                   lambda f, m, valid_out: ops.sparse_avg_pool(
                       f, m, jnp.asarray(lv.valid), valid_out=valid_out)):
            p_c = fn(self.feats, jnp.asarray(down_l), valid_out=v1)
            p_g = fn(self.feats, down_g, valid_out=v1)
            np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_g),
                                       rtol=1e-5, atol=1e-5)

    def test_transpose_conv_matches_global(self):
        lv0, lv1 = self.pyr.levels[0], self.pyr.levels[1]
        s1 = lv1.valid.shape[0] // 3
        n1 = lv1.valid.shape[0]
        fc = np.zeros((n1, 5), np.float32)
        fc[np.asarray(lv1.valid) > 0] = self.rng.randn(
            int(np.asarray(lv1.valid).sum()), 5
        )
        w = jnp.asarray(self.rng.randn(8, 5, 3).astype(np.float32))
        up_l = np.asarray(lv0.up_parent)  # [B, S0] local
        up_g = (up_l.astype(np.int64)
                + (np.arange(3) * s1)[:, None]).reshape(-1)
        off_l = np.asarray(lv0.up_offset)
        out_c = ops.sparse_conv_transpose(
            jnp.asarray(fc), jnp.asarray(up_l), jnp.asarray(off_l), w,
            valid_out=jnp.asarray(lv0.valid),
        )
        out_g = ops.sparse_conv_transpose(
            jnp.asarray(fc), jnp.asarray(up_g.astype(np.int32)),
            jnp.asarray(off_l.reshape(-1)), w,
            valid_out=jnp.asarray(lv0.valid),
        )
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_g),
                                   rtol=1e-5, atol=1e-5)
        un_c = ops.sparse_avg_unpool(jnp.asarray(fc), jnp.asarray(up_l),
                                     jnp.asarray(lv0.valid))
        un_g = ops.sparse_avg_unpool(jnp.asarray(fc),
                                     jnp.asarray(up_g.astype(np.int32)),
                                     jnp.asarray(lv0.valid))
        np.testing.assert_allclose(np.asarray(un_c), np.asarray(un_g),
                                   rtol=1e-6, atol=1e-6)

    def test_sym_vjp_matches_autodiff_of_core(self):
        """The scatter-free chunked backward equals plain autodiff through
        the chunked core at valid rows.  Pad rows legitimately differ:
        autodiff scatters every missing-neighbor cotangent into the pad
        row's feature gradient, the symmetric rule zeroes it — and every
        producer masks pad rows anyway (same contract as the flat layout,
        tests/test_brick.py::TestCustomVJP)."""
        lv = self.pyr.levels[0]
        nbr = jnp.asarray(np.asarray(lv.nbr))
        w = jnp.asarray(self.rng.randn(27, 6, 4).astype(np.float32) * 0.2)
        valid = jnp.asarray(lv.valid)

        def loss_sym(f, w):
            out = ops.sparse_conv(f, nbr, w, valid_out=valid, rev=lv.rev)
            return jnp.sum(jnp.sin(out) * jnp.arange(4))

        def loss_core(f, w):
            out = ops.mask_rows(ops._conv_chunk_core(f, nbr, w), valid)
            return jnp.sum(jnp.sin(out) * jnp.arange(4))

        gf_s, gw_s = jax.grad(loss_sym, argnums=(0, 1))(self.feats, w)
        gf_c, gw_c = jax.grad(loss_core, argnums=(0, 1))(self.feats, w)
        ok = np.asarray(valid) > 0
        np.testing.assert_allclose(np.asarray(gf_s)[ok], np.asarray(gf_c)[ok],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_c),
                                   rtol=1e-4, atol=1e-4)


class TestChunkedNetwork:
    @pytest.mark.parametrize("train", [False, True])
    def test_res16unet_forward_parity_vs_voxel(self, train):
        rng = np.random.RandomState(3)
        coords = _coords(rng)
        npads = [512, 512, 480, 96, 30]
        pyr_v, meta_v = build_pyramid(coords, 5, npads=npads, num_batch=3)
        pyr_c, meta_c, rows, orphan = build_chunked_pyramid(
            coords, 5, npads, num_batch=3
        )
        assert not orphan.any()
        # frame-local maps fit uint16 even when the global ones would not
        assert np.asarray(pyr_c.levels[0].nbr).dtype == np.uint16

        n = len(coords)
        fr = rng.randn(n, 3).astype(np.float32)
        fv = np.zeros((npads[0], 3), np.float32)
        fv[:n] = fr
        fc = np.zeros((pyr_c.levels[0].valid.shape[0], 3), np.float32)
        fc[rows] = fr

        model = load_model("Res16UNet14")(in_channels=3, out_channels=8,
                                          normalize_feature=True)
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), jnp.asarray(fv), pyr_v)

        if train:
            out_v, mut_v = model.apply(variables, jnp.asarray(fv), pyr_v,
                                       train=True, mutable=["batch_stats"])
            out_c, mut_c = model.apply(variables, jnp.asarray(fc), pyr_c,
                                       train=True, mutable=["batch_stats"])
            # identical batch statistics (same valid rows feed the moments)
            for a, b in zip(jax.tree.leaves(mut_v), jax.tree.leaves(mut_c)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)
        else:
            out_v = model.apply(variables, jnp.asarray(fv), pyr_v,
                                train=False)
            out_c = model.apply(variables, jnp.asarray(fc), pyr_c,
                                train=False)
        np.testing.assert_allclose(
            np.asarray(out_c)[rows], np.asarray(out_v)[:n],
            rtol=2e-4, atol=2e-4,
        )
        # padded rows of every slice stay exactly zero
        mask = np.ones(len(np.asarray(out_c)), bool)
        mask[rows] = False
        assert np.all(np.asarray(out_c)[mask] == 0)

    def test_level_rows_mapping(self):
        rng = np.random.RandomState(5)
        coords = _coords(rng)
        pyr, meta, rows, _ = build_chunked_pyramid(
            coords, 3, [512, 512, 256], num_batch=3
        )
        r0 = level_rows(meta, 0, 3)
        np.testing.assert_array_equal(r0, rows)
        r1 = level_rows(meta, 1, 3)
        valid1 = np.asarray(pyr.levels[1].valid)
        assert np.all(valid1[r1] == 1.0)
        assert valid1.sum() == len(r1)


class TestChunkedCollate:
    def test_pair_loss_invariant_across_layouts(self):
        """collate_pair in 'chunked' vs 'voxel' layout: identical sampling
        (same rng) must give the same NCE loss and the same hardest-mode
        tensors at remapped indices."""
        from pointcontrast_tpu.losses.contrastive import point_info_nce_loss

        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=400, seed=0)
        samples = [ds[0], ds[1]]
        # Flat ratios: the synthetic spray barely shrinks under stride-2,
        # and the chunked layout budgets per SAMPLE (npads[l] / B) instead
        # of pooling slack across the batch — the default scheme's deep
        # levels would truncate chunked but not flat, which is the layout
        # difference documented in sparse/chunk.py, not a bug.  Loss
        # invariance is only claimed in the no-truncation regime.
        scheme = PadScheme(npad0=4096, level_ratios=(1.0,) * 5)
        b_v = collate_pair(samples, scheme, mode="nce", npos=128,
                           rng=np.random.RandomState(7), fuse_frames=True)
        b_c = collate_pair(samples, scheme, mode="nce", npos=128,
                           rng=np.random.RandomState(7), fuse_frames=True,
                           layout="chunked")
        assert float(np.asarray(b_c.truncated_voxels)) == 0

        model = load_model("Res16UNet14")(in_channels=3, out_channels=8,
                                          normalize_feature=True)
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), b_v.feats0, b_v.pyramid0)
        out_v = model.apply(variables, b_v.feats0, b_v.pyramid0, train=False)
        out_c = model.apply(variables, b_c.feats0, b_c.pyramid0, train=False)
        l_v = point_info_nce_loss(out_v, out_v, b_v.q_idx, b_v.k_idx,
                                  b_v.pair_valid, temperature=0.4)
        l_c = point_info_nce_loss(out_c, out_c, b_c.q_idx, b_c.k_idx,
                                  b_c.pair_valid, temperature=0.4)
        np.testing.assert_allclose(float(l_v), float(l_c), rtol=1e-4)

    def test_hardest_mode_loss_invariant_across_layouts(self):
        """Hardest-contrastive tensors (pos/cand indices + packed collision
        bitmaps) survive the chunked row remap: same rng -> same loss."""
        from pointcontrast_tpu.losses.contrastive import (
            hardest_contrastive_loss,
        )

        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=400, seed=0)
        samples = [ds[0], ds[1]]
        scheme = PadScheme(npad0=4096, level_ratios=(1.0,) * 5)
        kw = dict(mode="hardest", npos=64, num_pos=64, num_hn=32,
                  fuse_frames=True)
        b_v = collate_pair(samples, scheme, rng=np.random.RandomState(7), **kw)
        b_c = collate_pair(samples, scheme, rng=np.random.RandomState(7),
                           layout="chunked", **kw)
        assert float(np.asarray(b_c.truncated_voxels)) == 0

        model = load_model("Res16UNet14")(in_channels=3, out_channels=8,
                                          normalize_feature=True)
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), b_v.feats0, b_v.pyramid0)

        def loss_of(b):
            out = model.apply(variables, b.feats0, b.pyramid0, train=False)
            return hardest_contrastive_loss(
                out, out, b.pos0_idx, b.pos1_idx, b.pos_valid,
                b.cand0_idx, b.cand0_valid, b.cand1_idx, b.cand1_valid,
                b.collide0, b.collide1,
            )
        (pos_v, neg_v), (pos_c, neg_c) = loss_of(b_v), loss_of(b_c)
        np.testing.assert_allclose(float(pos_v), float(pos_c), rtol=1e-4)
        np.testing.assert_allclose(float(neg_v), float(neg_c), rtol=1e-4)

    def test_semseg_collate_parity_and_fixed_chunks(self):
        """collate_semseg layout='chunked': label-aligned logits match the
        voxel layout, and num_chunks pins shapes for short batches."""
        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.semseg.dataset import collate_semseg
        from pointcontrast_tpu.semseg.datasets.synthetic import (
            SyntheticSemsegDataset,
        )

        ds = SyntheticSemsegDataset(num_scenes=2, points=1200, seed=0)
        scheme = PadScheme(npad0=4096, level_ratios=(1.0,) * 5)
        samples = [ds[0], ds[1]]
        kw = dict(ignore_label=255, shift_coords=False,
                  rng=np.random.RandomState(3))
        b_v = collate_semseg(samples, scheme, **kw)
        kw["rng"] = np.random.RandomState(3)
        b_c = collate_semseg(samples, scheme, layout="chunked", **kw)
        assert float(np.asarray(b_c.truncated_voxels)) == 0
        # same multiset of (label) rows feed the loss
        lv, lc = np.asarray(b_v.labels), np.asarray(b_c.labels)
        assert (lv != 255).sum() == (lc != 255).sum()

        model = load_model("Res16UNet14")(in_channels=3,
                                          out_channels=ds.num_classes)
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), jnp.asarray(b_v.feats), b_v.pyramid)
        out_v = model.apply(variables, jnp.asarray(b_v.feats), b_v.pyramid,
                            train=False)
        out_c = model.apply(variables, jnp.asarray(b_c.feats), b_c.pyramid,
                            train=False)
        # per-class mean logit over labeled rows is layout-invariant
        for cls in range(ds.num_classes):
            mv = np.asarray(out_v)[lv == cls]
            mc = np.asarray(out_c)[lc == cls]
            if len(mv):
                np.testing.assert_allclose(
                    np.sort(mv, axis=0), np.sort(mc, axis=0),
                    rtol=2e-4, atol=2e-4,
                )

        # a short batch with num_chunks=2 keeps the 2-chunk shapes
        b_short = collate_semseg([ds[0]], scheme, layout="chunked",
                                 num_chunks=2, ignore_label=255,
                                 rng=np.random.RandomState(3))
        assert (b_short.pyramid.levels[0].valid.shape
                == b_c.pyramid.levels[0].valid.shape)
        assert np.asarray(b_short.pyramid.levels[0].nbr).shape[1] == 2

    def test_semseg_finetune_slice_chunked(self, tmp_path):
        """Chunked-layout semseg finetune: loss decreases, full-split val
        (mirrors tests/test_semseg.py::test_finetune_slice_brick)."""
        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import BasicBlock
        from pointcontrast_tpu.semseg.dataset import SemsegLoader
        from pointcontrast_tpu.semseg.datasets.synthetic import (
            SyntheticSemsegDataset,
        )
        from pointcontrast_tpu.semseg.train import SemsegConfig, SemsegTrainer

        class TinyUNet(Res16UNetBase):
            BLOCK = BasicBlock
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        ds = SyntheticSemsegDataset(num_scenes=4, points=1500, seed=0)
        val_ds = SyntheticSemsegDataset(num_scenes=3, points=1500, seed=1)
        scheme = PadScheme(npad0=4096, level_ratios=(1.0, 1.0, 0.5, 0.5, 0.5))
        train_loader = SemsegLoader(
            ds, batch_size=2, scheme=scheme, augment_shift=True,
            num_workers=1, seed=0, layout="chunked",
        )
        model = TinyUNet(in_channels=3, out_channels=ds.num_classes)
        cfg = SemsegConfig(
            lr=0.3, max_iter=8, stat_freq=2, val_freq=8, save_freq=100,
            checkpoint_dir=str(tmp_path),
        )
        trainer = SemsegTrainer(
            model, train_loader, None, cfg, num_classes=ds.num_classes,
            val_dataset=val_ds, val_scheme=scheme, layout="chunked",
            val_batch_size=2,  # 3 scenes -> one full + one short batch
        )
        history = trainer.train(8)
        train_loader.close()
        losses = [m["loss"] for _, m in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
        assert trainer.best_miou > 0

    def test_detection_collate_chunked_point_features_match(self):
        """collate_detection layout='chunked': per-point gathered backbone
        features equal the flat-voxel layout's (the exact consumption path,
        detect/votenet.py:103-105), and orphaned points read zero rows."""
        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.detect.datasets import (
            SyntheticDetectionDataset,
            collate_detection,
        )

        ds = SyntheticDetectionDataset(num_scenes=2, num_objects=4,
                                       num_points=3000, seed=0)
        scheme = PadScheme(npad0=8192, level_ratios=(1.0, 1.0, 0.5, 0.25, 0.12))
        samples = [ds[0], ds[1]]  # __getitem__ subsamples stochastically
        b_v = collate_detection(samples, voxel_size=0.05, scheme=scheme)
        b_c = collate_detection(samples, voxel_size=0.05, scheme=scheme,
                                layout="chunked")
        model = load_model("Res16UNet14")(in_channels=3, out_channels=8)
        variables = jax.jit(
            lambda r, f, p: model.init(r, f, p, train=False)
        )(jax.random.PRNGKey(0), jnp.asarray(b_v.voxel_feats),
          b_v.voxel_pyramid)
        out_v = model.apply(variables, jnp.asarray(b_v.voxel_feats),
                            b_v.voxel_pyramid, train=False)
        out_c = model.apply(variables, jnp.asarray(b_c.voxel_feats),
                            b_c.voxel_pyramid, train=False)
        pf_v = np.asarray(out_v)[np.asarray(b_v.point_voxel_idx)]
        pf_c = np.asarray(out_c)[np.asarray(b_c.point_voxel_idx)]
        np.testing.assert_allclose(pf_c, pf_v, rtol=2e-4, atol=2e-4)

    def test_detection_collate_chunked_overflow_valve(self):
        """Oversized scenes subsample; dropped/orphaned points read their
        own slice's zero pad row (chunked analogue of
        tests/test_robustness.py::TestDetectionCollateOverflow)."""
        from pointcontrast_tpu.data.collate import PadScheme
        from pointcontrast_tpu.detect.datasets import (
            SyntheticDetectionDataset,
            collate_detection,
        )

        ds = SyntheticDetectionDataset(num_scenes=2, num_objects=4,
                                       num_points=6000, seed=0)
        scheme = PadScheme(npad0=2048)
        batch = collate_detection([ds[0], ds[1]], voxel_size=0.02,
                                  scheme=scheme, layout="chunked")
        nrows = batch.voxel_feats.shape[0]
        s0 = nrows // 2
        pvi = np.asarray(batch.point_voxel_idx)
        assert pvi.shape == (2, 6000)
        # each sample's points stay inside its own slice
        assert (pvi[0] < s0).all() and (pvi[1] >= s0).all()
        # dropped points landed on a zero row; live points on one-feature rows
        feats = np.asarray(batch.voxel_feats)
        pad_rows = {s0 - 1, 2 * s0 - 1}
        live = np.asarray([r for r in pvi.reshape(-1) if r not in pad_rows])
        assert (feats[live] == 1.0).all()
        assert (feats[list(pad_rows)] == 0.0).all()
        assert any(r in pad_rows for r in pvi.reshape(-1))

    def test_oversized_sample_orphans_gracefully(self):
        rng = np.random.RandomState(1)
        # sample 0 has 3x the rows of sample 1: per-sample chunks truncate
        # only sample 0
        coords = _coords(rng, num_batch=2, n_per=(400, 100))
        pyr, meta, rows, orphan = build_chunked_pyramid(
            coords, 3, [512, 512, 256], num_batch=2
        )
        assert orphan.sum() == 400 - (256 - 1)
        assert not orphan[400:].any()
        valid = np.asarray(pyr.levels[0].valid)
        assert valid[: 255].all() and valid[255] == 0
