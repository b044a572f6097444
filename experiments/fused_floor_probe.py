"""Round-5 probe: the attainable floor of the FUSED im2col conv regime.

VERDICT r4 item 2: the "~77% of pure-gather floor" claim dates from the
round-2/3 scan form; nobody re-measured the attainable floor for the fused
im2col shapes.  This probe answers it WITHIN-RUN by decomposing the bench
step top-down into three real programs that share the exact conv inventory
of the shipped step:

  1. ``full``        — the real bench train step (bench.measure, fused conv).
  2. ``conv_fwd+bwd``— ONLY the sparse convs: every conv call the model makes
                       (recorded by tracing the real model apply under
                       jax.eval_shape with the real bench batch, so shapes /
                       dtypes / group splits / rev permutations are exact),
                       replayed with independent random inputs, fwd + the real
                       custom-VJP backward via value_and_grad.
  3. ``gather2x``    — ONLY the gathers of those convs, issued TWICE (the
                       scatter-free backward re-gathers exactly 1x forward
                       traffic, PERF.md round 4) — the pure-gather floor at
                       the fused s-major [S, G*Cin] col shapes.

full − conv = the non-conv step share (BN/ReLU/pad-masks/loss/optimizer):
what an epilogue-fusion pass could attack.  conv − gather2x = MXU matmuls +
per-op overhead beyond raw row traffic: what only a fused VMEM gather+matmul
kernel (Pallas, blocked) could attack.

Run on the TPU:  python experiments/fused_floor_probe.py
Env: PC_TPU_BENCH_DTYPE (inherited by the traced model — run float32 for
     comparison against PERF.md's 236.8 ms step, bfloat16 for the shipped
     default), PC_TPU_CONV_FUSED_GROUP (default 13).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 2
ITERS = 10


def record_conv_inventory(model, variables, feats, pyramid):
    """Trace one train-mode apply and record every sparse-conv kernel call
    (name, array shapes/dtypes, static args) without executing anything."""
    import jax

    from pointcontrast_tpu.sparse import ops

    records = []
    patch_names = [
        "_conv_chunk_fused", "_conv_chunk_down2", "_conv_chunk_down_fused",
        "_conv_tr_chunk", "_conv_chunk_sym", "_conv_sym",
    ]
    originals = {n: getattr(ops, n) for n in patch_names}

    def make_recorder(name, orig):
        def wrapper(*args):
            arrays, statics = [], []
            for a in args:
                if hasattr(a, "shape") and hasattr(a, "dtype"):
                    arrays.append((tuple(a.shape), str(a.dtype)))
                else:
                    statics.append(a)
            records.append({"name": name, "arrays": arrays,
                            "statics": statics})
            return orig(*args)
        return wrapper

    try:
        for n in patch_names:
            setattr(ops, n, make_recorder(n, originals[n]))
        jax.eval_shape(
            lambda v, f: model.apply(
                v, f, pyramid, train=True, mutable=["batch_stats"]
            ),
            variables, feats,
        )
    finally:
        for n in patch_names:
            setattr(ops, n, originals[n])
    return records


def build_replay_inputs(records, seed=0):
    """Random inputs with the recorded shapes/dtypes; index arrays get valid
    ranges (index CONTENT is cost-neutral on this chip — PERF.md: sorted vs
    random gathers within 5%)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    diff_inputs, static_inputs = [], []
    for rec in records:
        name, arrays = rec["name"], rec["arrays"]
        feat_shape, feat_dtype = arrays[0]
        n_in = feat_shape[0]
        feats = rng.randn(*feat_shape).astype("float32").astype(feat_dtype)
        if name in ("_conv_chunk_fused", "_conv_chunk_sym"):
            (k, b, s), idx_dtype = arrays[1][0], arrays[1][1]
            nbr = rng.randint(0, s, (k, b, s)).astype(idx_dtype)
            w_shape, w_dtype = arrays[2]
            w = (rng.randn(*w_shape) * 0.05).astype(w_dtype)
            diff_inputs.append((feats, w))
            static_inputs.append((name, nbr, rec["statics"]))
        elif name == "_conv_sym":
            (k, n_out), idx_dtype = arrays[1][0], arrays[1][1]
            nbr = rng.randint(0, n_in, (k, n_out)).astype(idx_dtype)
            w_shape, w_dtype = arrays[2]
            w = (rng.randn(*w_shape) * 0.05).astype(w_dtype)
            diff_inputs.append((feats, w))
            static_inputs.append((name, nbr, rec["statics"]))
        elif name == "_conv_chunk_down_fused":
            (k, b, s_out), idx_dtype = arrays[1][0], arrays[1][1]
            s_in = n_in // b
            nbr = rng.randint(0, s_in, (k, b, s_out)).astype(idx_dtype)
            w_shape, w_dtype = arrays[2]
            w = (rng.randn(*w_shape) * 0.05).astype(w_dtype)
            diff_inputs.append((feats, w))
            static_inputs.append((name, nbr, rec["statics"]))
        elif name == "_conv_chunk_down2":
            (k, b, s_out), idx_dtype = arrays[1][0], arrays[1][1]
            s_in = n_in // b
            nbr = rng.randint(0, s_in, (k, b, s_out)).astype(idx_dtype)
            (b2, s_in2), up_dtype = arrays[2][0], arrays[2][1]
            up_parent = rng.randint(0, s_out, (b2, s_in2)).astype(up_dtype)
            up_offset = rng.randint(0, k, arrays[3][0]).astype(arrays[3][1])
            w_shape, w_dtype = arrays[4]
            w = (rng.randn(*w_shape) * 0.05).astype(w_dtype)
            diff_inputs.append((feats, w))
            static_inputs.append((name, (nbr, up_parent, up_offset),
                                  rec["statics"]))
        elif name == "_conv_tr_chunk":
            (b, s_fine), up_dtype = arrays[1][0], arrays[1][1]
            w_shape, w_dtype = arrays[3]
            k = w_shape[0]
            s_c = n_in // b
            up_parent = rng.randint(0, s_c, (b, s_fine)).astype(up_dtype)
            up_offset = rng.randint(0, k, arrays[2][0]).astype(arrays[2][1])
            w = (rng.randn(*w_shape) * 0.05).astype(w_dtype)
            diff_inputs.append((feats, w))
            static_inputs.append((name, (up_parent, up_offset),
                                  rec["statics"]))
        else:
            raise ValueError(name)
    return diff_inputs, static_inputs


def make_conv_replay(static_inputs):
    """loss(diff_inputs) running every recorded conv on its own inputs."""
    import jax.numpy as jnp

    from pointcontrast_tpu.sparse import ops

    def loss(diff_inputs):
        total = jnp.float32(0)
        for (feats, w), (name, idx, statics) in zip(
            diff_inputs, static_inputs
        ):
            if name in ("_conv_chunk_fused", "_conv_chunk_sym"):
                out = getattr(ops, name)(feats, idx, w, *statics)
            elif name == "_conv_sym":
                out = ops._conv_sym(feats, idx, w, *statics)
            elif name == "_conv_chunk_down_fused":
                out = ops._conv_chunk_down_fused(feats, idx, w, *statics)
            elif name == "_conv_chunk_down2":
                nbr, up_parent, up_offset = idx
                out = ops._conv_chunk_down2(
                    feats, nbr, up_parent, up_offset, w, *statics
                )
            elif name == "_conv_tr_chunk":
                up_parent, up_offset = idx
                out = ops._conv_tr_chunk(feats, up_parent, up_offset, w)
            total = total + jnp.mean(jnp.square(out.astype(jnp.float32)))
        return total

    return loss


def make_gather2x(static_inputs):
    """Only the row gathers of every recorded conv, issued twice (fwd + the
    scatter-free backward's re-gather), at the fused s-major col shapes."""
    import numpy as np

    import jax.numpy as jnp

    from pointcontrast_tpu.sparse.ops import (
        _center_of,
        _chunk_view,
        _offset_groups,
    )

    def gathers(diff_inputs):
        total = jnp.float32(0)
        for (feats, _w), (name, idx, statics) in zip(
            diff_inputs, static_inputs
        ):
            for _rep in range(2):
                if name in ("_conv_chunk_fused", "_conv_chunk_sym"):
                    nbr = idx
                    k, b_, s_ = nbr.shape
                    rev = statics[0]
                    group = statics[1] if len(statics) > 1 else 13
                    center = _center_of(rev)
                    groups = _offset_groups(k, center, group)
                    f3 = _chunk_view(feats, b_)
                    for b in range(b_):
                        fb = f3[b]
                        for ga in groups:
                            gi = jnp.transpose(
                                nbr[np.asarray(ga, np.int32), b, :]
                            ).reshape(-1)
                            col = jnp.take(fb, gi, axis=0)
                            # full-array reduction so XLA cannot shrink
                            # the gather to the consumed rows
                            total = total + jnp.sum(col, dtype=jnp.float32)
                elif name in ("_conv_chunk_down_fused", "_conv_chunk_down2"):
                    nbr = idx if name == "_conv_chunk_down_fused" else idx[0]
                    k, b_, s_out = nbr.shape
                    group = statics[-1]
                    groups = _offset_groups(k, None, group)
                    f3 = _chunk_view(feats, b_)
                    for b in range(b_):
                        fb = f3[b]
                        for ga in groups:
                            gi = jnp.transpose(
                                nbr[np.asarray(ga, np.int32), b, :]
                            ).reshape(-1)
                            col = jnp.take(fb, gi, axis=0)
                            # full-array reduction so XLA cannot shrink
                            # the gather to the consumed rows
                            total = total + jnp.sum(col, dtype=jnp.float32)
                elif name in ("_conv_tr_chunk", "_conv_sym"):
                    if name == "_conv_tr_chunk":
                        up_parent, up_offset = idx
                        b_, s_fine = up_parent.shape
                        f3 = _chunk_view(feats, b_)
                        gi = up_parent.astype(jnp.int32)
                        for b in range(b_):
                            col = jnp.take(f3[b], gi[b], axis=0)
                            total = total + jnp.sum(col, dtype=jnp.float32)
                    else:
                        nbr = idx
                        for kk in range(nbr.shape[0]):
                            col = jnp.take(feats, nbr[kk], axis=0)
                            total = total + jnp.sum(col, dtype=jnp.float32)
        return total

    return gathers


def timeit(fn, *args):
    import jax

    for _ in range(WARMUP):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    import bench
    from pointcontrast_tpu.data import (
        PadScheme,
        SyntheticPairDataset,
        collate_pair,
    )
    from pointcontrast_tpu.nn.registry import load_model

    # exact bench workload (bench.measure / measure_semseg lines) for the
    # conv inventory; PC_TPU_PROBE_SCALE=pretrain|semseg
    import jax.numpy as jnp

    scale = os.environ.get("PC_TPU_PROBE_SCALE", "pretrain")
    if scale == "semseg":
        from pointcontrast_tpu.semseg.dataset import collate_semseg

        batch_scenes, npad0 = 6, 262144
        srng = np.random.RandomState(0)
        sds = SyntheticPairDataset(
            num_pairs=batch_scenes, points_per_frame=90000, room_size=2.4,
            voxel_size=0.02, seed=0,
        )
        samples = []
        for i in range(batch_scenes):
            c = np.asarray(sds[i][0], np.int32)
            samples.append((
                c,
                srng.randint(0, 255, (len(c), 3)).astype(np.float32),
                srng.randint(0, 20, len(c)).astype(np.int32),
            ))
        sbatch = collate_semseg(
            samples, PadScheme.scannet(npad0=npad0), ignore_label=255,
            shift_coords=False, rng=np.random.RandomState(1),
            layout=bench.LAYOUT,
            num_chunks=batch_scenes if bench.LAYOUT == "chunked" else None,
        )
        feats, pyramid = sbatch.feats, sbatch.pyramid
        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=20, dtype=jnp.dtype(bench.DTYPE)
        )
    else:
        ds = SyntheticPairDataset(
            num_pairs=bench.BATCH_PAIRS * 2,
            points_per_frame=bench.POINTS_PER_FRAME,
            room_size=bench.ROOM_SIZE, seed=0,
        )
        scheme = PadScheme.scannet(npad0=bench.NPAD0)
        batch = collate_pair(
            [ds[i] for i in range(bench.BATCH_PAIRS)], scheme, mode="nce",
            npos=4096, rng=np.random.RandomState(0), fuse_frames=True,
            layout=bench.LAYOUT,
        )
        feats, pyramid = batch.feats0, batch.pyramid0
        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=32, normalize_feature=True,
            dtype=jnp.dtype(bench.DTYPE),
        )
    variables = jax.eval_shape(
        lambda r, f: model.init(r, f, pyramid, train=False),
        jax.random.PRNGKey(0), feats,
    )
    records = record_conv_inventory(model, variables, feats, pyramid)
    counts = {}
    for r in records:
        counts[r["name"]] = counts.get(r["name"], 0) + 1
    print(json.dumps({"probe": "fused_floor", "scale": scale,
                      "conv_calls": len(records),
                      "by_kind": counts, "dtype": bench.DTYPE}), flush=True)

    diff_inputs, static_inputs = build_replay_inputs(records)
    diff_inputs = jax.device_put(diff_inputs)

    conv_loss = make_conv_replay(static_inputs)
    conv_fwd = jax.jit(conv_loss)

    def _fwdbwd(d):
        # consume the grads with a reduction so the backward is not DCE'd
        loss, grads = jax.value_and_grad(conv_loss)(d)
        gsum = sum(
            jnp.sum(g, dtype=jnp.float32) for g in jax.tree.leaves(grads)
        )
        return loss + 0.0 * gsum

    conv_fwdbwd = jax.jit(_fwdbwd)
    gather2x = jax.jit(make_gather2x(static_inputs))

    t_gather = timeit(gather2x, diff_inputs)
    t_conv_fwd = timeit(conv_fwd, diff_inputs)
    t_conv = timeit(conv_fwdbwd, diff_inputs)
    if scale == "semseg":
        rate = bench.measure_semseg()  # within-run full step
        t_full = 6 / rate
    else:
        rate = bench.measure("nce")
        t_full = bench.BATCH_PAIRS / rate

    print(json.dumps({
        "probe": "fused_floor",
        "scale": scale,
        "full_step_ms": round(t_full * 1e3, 1),
        "conv_fwdbwd_ms": round(t_conv * 1e3, 1),
        "conv_fwd_ms": round(t_conv_fwd * 1e3, 1),
        "gather2x_ms": round(t_gather * 1e3, 1),
        "conv_frac_of_step": round(t_conv / t_full, 3),
        "gather_frac_of_conv": round(t_gather / t_conv, 3),
        "nonconv_ms": round((t_full - t_conv) * 1e3, 1),
        "rate_per_sec": round(rate, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
