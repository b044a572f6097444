"""Brick-layout engine vs the flat voxel oracle (sparse.ops is itself
oracle-tested against dense lax.conv, so voxel-path equality transitively
pins brick outputs to dense-conv semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from pointcontrast_tpu.sparse import brick, ops
from pointcontrast_tpu.sparse.topology import build_pyramid


def test_parse_layout_contract():
    """'brick:N' really selects N brick levels and junk strings raise
    (regression: a dead branch once collapsed every non-voxel string to
    brick:2 silently)."""
    from pointcontrast_tpu.data.collate import parse_layout

    assert parse_layout("voxel") == ("voxel", 0)
    assert parse_layout("brick") == ("brick", 2)
    for n in (1, 2, 3, 5):
        assert parse_layout(f"brick:{n}") == ("brick", n)
    for junk in ("voxl", "bricks", "brick2", ""):
        with np.testing.assert_raises(ValueError):
            parse_layout(junk)


def test_semseg_collate_honors_brick_depth():
    """collate_semseg passes brick:N through to the pyramid builder
    (regression: it once bricked ALL levels for any non-voxel string)."""
    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.semseg.dataset import collate_semseg
    from pointcontrast_tpu.semseg.datasets.synthetic import SyntheticSemsegDataset
    from pointcontrast_tpu.sparse.brick import BrickMap

    ds = SyntheticSemsegDataset(num_scenes=1, points=800)
    s = ds.__getitem__(0, rng=np.random.RandomState(0))
    scheme = PadScheme(npad0=2048)
    for n in (1, 2):
        b = collate_semseg([s], scheme, rng=np.random.RandomState(0),
                           layout=f"brick:{n}")
        depth = sum(isinstance(l.nbr, BrickMap) for l in b.pyramid.levels)
        assert depth == n, (n, depth)


def make_coords(n=400, extent=16, num_batch=2, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.randint(0, extent, size=(n * 2, 4))
    coords[:, 0] = rng.randint(0, num_batch, size=n * 2)
    coords = np.unique(coords, axis=0)[:n].astype(np.int32)
    return coords, rng


def dual_pyramids(coords, num_levels=3, num_batch=2, conv0_kernel_size=3):
    """Same coords through both layouts with non-truncating pads."""
    npads = [len(coords) + 97]
    cur = coords
    for _ in range(num_levels):
        cur = np.unique(np.concatenate(
            [cur[:, :1], np.floor_divide(cur[:, 1:], 2)], 1), axis=0)
        npads.append(len(cur) + 63)
    vox, vmeta = build_pyramid(
        coords, num_levels=num_levels, npads=npads[:num_levels],
        num_batch=num_batch, conv0_kernel_size=conv0_kernel_size)
    brk, bmeta, rows0, orphan0 = brick.build_brick_pyramid(
        coords, num_levels=num_levels, npads=npads[:num_levels + 1],
        num_batch=num_batch, conv0_kernel_size=conv0_kernel_size)
    assert not orphan0.any() and not vmeta.truncated and not bmeta.truncated
    return vox, vmeta, brk, rows0


class TestBrickOps:
    def test_same_level_conv_matches_voxel(self):
        coords, rng = make_coords()
        n, cin, cout = len(coords), 5, 7
        vox, vmeta, brk, rows0 = dual_pyramids(coords)
        feats = rng.randn(n, cin).astype(np.float32)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

        fpad = np.zeros((vmeta.npads[0], cin), np.float32)
        fpad[:n] = feats
        ref = ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(vox.levels[0].nbr), jnp.asarray(w),
            valid_out=jnp.asarray(vox.levels[0].valid))

        bl = brk.levels[0]
        table = np.zeros((bl.valid.shape[0], cin), np.float32)
        table[rows0] = feats
        got = brick.brick_conv(
            jnp.asarray(table), jnp.asarray(bl.nbr.nbr), jnp.asarray(w),
            bl.nbr.plan, valid_out=jnp.asarray(bl.valid))
        np.testing.assert_allclose(
            np.asarray(got)[rows0], np.asarray(ref)[:n], rtol=1e-5, atol=1e-5)
        # empty slots and pad bricks stay exactly zero
        mask = np.ones(bl.valid.shape[0], bool)
        mask[rows0] = False
        assert np.all(np.asarray(got)[mask] == 0)

    def test_stem_k5_conv_matches_voxel(self):
        coords, rng = make_coords(seed=3)
        n, cin, cout = len(coords), 4, 6
        vox, vmeta, brk, rows0 = dual_pyramids(coords, conv0_kernel_size=5)
        feats = rng.randn(n, cin).astype(np.float32)
        w = rng.randn(125, cin, cout).astype(np.float32) * 0.1
        fpad = np.zeros((vmeta.npads[0], cin), np.float32)
        fpad[:n] = feats
        ref = ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(vox.levels[0].nbr0), jnp.asarray(w),
            valid_out=jnp.asarray(vox.levels[0].valid))
        bl = brk.levels[0]
        table = np.zeros((bl.valid.shape[0], cin), np.float32)
        table[rows0] = feats
        got = brick.brick_conv(
            jnp.asarray(table), jnp.asarray(bl.nbr0.nbr), jnp.asarray(w),
            bl.nbr0.plan, valid_out=jnp.asarray(bl.valid))
        np.testing.assert_allclose(
            np.asarray(got)[rows0], np.asarray(ref)[:n], rtol=1e-5, atol=1e-5)

    def test_down_and_up_conv_match_voxel(self):
        coords, rng = make_coords(seed=1)
        n, cin, cout = len(coords), 6, 5
        vox, vmeta, brk, rows0 = dual_pyramids(coords)
        n1 = vmeta.counts[1]
        rows1 = (np.asarray(brk.levels[1].nbr.nbr, np.int64) * 0)  # placeholder
        # level-1 brick rows via the level-1 voxel -> (parent, offset) map of
        # the underlying 4-level build: recover from the brick level itself.
        up1 = np.asarray(brk.levels[0].up_parent)  # level-1 voxel -> brick row
        feats = rng.randn(n, cin).astype(np.float32)
        w8 = rng.randn(8, cin, cout).astype(np.float32) * 0.1

        fpad = np.zeros((vmeta.npads[0], cin), np.float32)
        fpad[:n] = feats
        ref_down = ops.sparse_conv(
            jnp.asarray(fpad), jnp.asarray(vox.levels[0].down_nbr),
            jnp.asarray(w8), valid_out=jnp.asarray(vox.levels[1].valid))

        bl0, bl1 = brk.levels[0], brk.levels[1]
        table = np.zeros((bl0.valid.shape[0], cin), np.float32)
        table[rows0] = feats
        got_down = brick.brick_down_conv(
            jnp.asarray(table), jnp.asarray(bl0.down_nbr.place),
            jnp.asarray(w8), valid_out=jnp.asarray(bl1.valid))
        np.testing.assert_allclose(
            np.asarray(got_down)[up1[:n1]], np.asarray(ref_down)[:n1],
            rtol=1e-5, atol=1e-5)

        # transpose conv back down: coarse level-1 features -> level 0
        featsc = rng.randn(n1, cin).astype(np.float32)
        cpad = np.zeros((vmeta.npads[1], cin), np.float32)
        cpad[:n1] = featsc
        ref_up = ops.sparse_conv_transpose(
            jnp.asarray(cpad), jnp.asarray(vox.levels[0].up_parent),
            jnp.asarray(vox.levels[0].up_offset), jnp.asarray(w8),
            valid_out=jnp.asarray(vox.levels[0].valid))
        ctable = np.zeros((bl1.valid.shape[0], cin), np.float32)
        ctable[up1[:n1]] = featsc
        got_up = brick.brick_up_conv(
            jnp.asarray(ctable), jnp.asarray(up1), jnp.asarray(w8),
            valid_out=jnp.asarray(bl0.valid))
        np.testing.assert_allclose(
            np.asarray(got_up)[rows0], np.asarray(ref_up)[:n],
            rtol=1e-5, atol=1e-5)


class TestBrickModel:
    def test_res16unet_brick_equals_voxel(self):
        """Full flagship forward: identical params, both layouts."""
        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.registry import load_model

        ds = SyntheticPairDataset(num_pairs=1, points_per_frame=2500, seed=0)
        scheme = PadScheme(npad0=8192)
        kw = dict(mode="nce", npos=128, fuse_frames=True)
        sample = ds[0]  # one draw: the dataset's rng advances per access
        bv = collate_pair([sample], scheme, rng=np.random.RandomState(7), **kw)

        model = load_model("Res16UNet14A")(in_channels=3, out_channels=16,
                                           normalize_feature=True)
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), bv.feats0, bv.pyramid0, train=False)
        out_v = jax.jit(model.apply, static_argnames=("train",))(
            params, bv.feats0, bv.pyramid0, train=False)
        qv = np.asarray(out_v)[np.asarray(bv.q_idx)]
        assert float(np.sum(bv.pair_valid)) > 0

        # hybrid boundaries at every depth, same params
        for layout in ("brick:1", "brick:2", "brick:3", "brick:5"):
            bb = collate_pair([sample], scheme, rng=np.random.RandomState(7),
                              layout=layout, **kw)
            out_b = jax.jit(model.apply, static_argnames=("train",))(
                params, bb.feats0, bb.pyramid0, train=False)
            assert np.allclose(bv.pair_valid, bb.pair_valid), layout
            qb = np.asarray(out_b)[np.asarray(bb.q_idx)]
            sel = np.asarray(bv.pair_valid) > 0
            np.testing.assert_allclose(qb[sel], qv[sel], rtol=5e-4, atol=5e-4,
                                       err_msg=layout)

    def test_brick_train_step_runs(self):
        """One jitted NCE training step in brick layout decreases over steps
        and reports finite metrics."""
        from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
        from pointcontrast_tpu.nn.registry import load_model
        from pointcontrast_tpu.train import PretrainConfig, make_train_step
        from pointcontrast_tpu.train import optim
        from pointcontrast_tpu.train.state import create_train_state

        ds = SyntheticPairDataset(num_pairs=2, points_per_frame=1500, seed=0)
        scheme = PadScheme(npad0=4096)
        batch = collate_pair(
            [ds[0], ds[1]], scheme, mode="nce", npos=64,
            rng=np.random.RandomState(0), fuse_frames=True, layout="brick")
        model = load_model("Res16UNet14A")(in_channels=3, out_channels=16,
                                           normalize_feature=True)
        config = PretrainConfig(mode="nce", npos=64, lr=0.1)
        tx = optim.make_optimizer(
            "sgd", config.lr, optim.exp_lr(config.exp_gamma,
                                           config.lr_update_freq), config)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0))
        step = jax.jit(lambda s, b: make_train_step(config)(s, b, axis_name=None))
        l0 = None
        for _ in range(4):
            state, metrics = step(state, batch)
            if l0 is None:
                l0 = float(metrics["loss"])
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss"]) < l0


class TestCustomVJP:
    """Scatter-free custom backwards == plain autodiff (at valid rows; pad
    rows legitimately differ — autodiff assigns gradient to masked pad
    inputs, the custom rule zeroes it, and every producer masks anyway)."""

    def test_sym_conv_grads_match_autodiff(self):
        from pointcontrast_tpu.sparse.kernel_map import kernel_offsets, reversal_permutation
        from pointcontrast_tpu.sparse import ops

        coords, rng = make_coords(seed=5)
        n, cin, cout = len(coords), 5, 4
        vox, vmeta, _, _ = dual_pyramids(coords, num_levels=1)
        lv = vox.levels[0]
        rev = reversal_permutation(kernel_offsets(3, 3, "hypercube"))
        feats = np.zeros((vmeta.npads[0], cin), np.float32)
        feats[:n] = rng.randn(n, cin)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
        valid = np.asarray(lv.valid)

        def loss(form):
            def f(F, W):
                out = ops.sparse_conv(
                    jnp.asarray(F), jnp.asarray(lv.nbr), W,
                    valid_out=jnp.asarray(valid),
                    rev=rev if form == "custom" else None)
                return (out ** 2).sum()
            return f

        gF_a, gW_a = jax.grad(loss("auto"), argnums=(0, 1))(feats, jnp.asarray(w))
        gF_c, gW_c = jax.grad(loss("custom"), argnums=(0, 1))(feats, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(gW_c), np.asarray(gW_a),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gF_c)[:n], np.asarray(gF_a)[:n],
                                   rtol=1e-4, atol=1e-4)

    def test_brick_conv_grads_match_autodiff(self):
        from pointcontrast_tpu.sparse.brick import _brick_core, build_plan

        coords, rng = make_coords(seed=6)
        n, cin, cout = len(coords), 4, 3
        _, _, brk, rows0 = dual_pyramids(coords, num_levels=1)
        bl = brk.levels[0]
        plan = build_plan(3, 3)
        table = np.zeros((bl.valid.shape[0], cin), np.float32)
        table[rows0] = rng.randn(n, cin)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
        valid = jnp.asarray(bl.valid)
        nbr = jnp.asarray(bl.nbr.nbr)

        def loss_custom(F, W):
            out = brick.brick_conv(F, nbr, W, plan, valid_out=valid)
            return (out ** 2).sum()

        def loss_auto(F, W):
            out = ops.mask_rows(_brick_core(F, nbr, W, plan), valid)
            return (out ** 2).sum()

        gF_a, gW_a = jax.grad(loss_auto, argnums=(0, 1))(
            jnp.asarray(table), jnp.asarray(w))
        gF_c, gW_c = jax.grad(loss_custom, argnums=(0, 1))(
            jnp.asarray(table), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(gW_c), np.asarray(gW_a),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gF_c)[rows0],
                                   np.asarray(gF_a)[rows0],
                                   rtol=1e-4, atol=1e-4)
