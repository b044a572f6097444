"""Decompose the pretrain train-step time: fwd / fwd+loss / full step.

Within-run, device-synced (value materialization), on the exact bench
workload.  Each segment is its own jitted program over the same batch:
  fwd        model.apply forward only (train=True, mutable batch_stats)
  loss       forward + PointInfoNCE loss value
  step       full train step (loss + bwd + SGD)  == bench.py's program

The deltas bound what the loss adds and what the backward+optimizer adds.
Fresh compiles on the TPU take minutes per program; the persistent cache
(utils.cache) makes re-runs fast.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

BATCH_PAIRS = 4
NPAD0 = BATCH_PAIRS * 32768
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, make_train_step
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.state import create_train_state
    from pointcontrast_tpu.losses.contrastive import point_info_nce_loss
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ds = SyntheticPairDataset(
        num_pairs=BATCH_PAIRS, points_per_frame=45000, room_size=1.75, seed=0
    )
    scheme = PadScheme.scannet(npad0=NPAD0)
    rng = np.random.RandomState(0)
    batch = collate_pair(
        [ds[i] for i in range(BATCH_PAIRS)], scheme, mode="nce",
        npos=4096, rng=rng, fuse_frames=True, layout="chunked",
    )

    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True
    )
    config = PretrainConfig(mode="nce", npos=4096, lr=0.1)
    schedule = optim.exp_lr(config.exp_gamma, config.lr_update_freq)
    tx = optim.make_optimizer("sgd", config.lr, schedule, config)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0)
    )

    batch = jax.device_put(batch)

    @jax.jit
    def fwd(params, stats, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": stats},
            b.feats0, b.pyramid0, train=True, mutable=["batch_stats"],
        )
        return out.sum()

    @jax.jit
    def fwd_loss(params, stats, b):
        f0, upd = model.apply(
            {"params": params, "batch_stats": stats},
            b.feats0, b.pyramid0, train=True, mutable=["batch_stats"],
        )
        return point_info_nce_loss(
            f0, f0, b.q_idx, b.k_idx, b.pair_valid, temperature=config.nce_t
        )

    step_fn = make_train_step(config)
    step = jax.jit(lambda s, b: step_fn(s, b, axis_name=None))

    def timeit(name, fn):
        r = fn()
        float(jax.device_get(r))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fn()
        float(jax.device_get(r))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:10s} {dt * 1e3:8.1f} ms")
        return dt

    p, st = state.params, state.batch_stats
    t_fwd = timeit("fwd", lambda: fwd(p, st, batch))
    t_loss = timeit("fwd+loss", lambda: fwd_loss(p, st, batch))
    t_step = timeit("step", lambda: step(state, batch)[1]["loss"])
    print(
        f"loss adds {1e3 * (t_loss - t_fwd):.1f} ms; "
        f"bwd+opt adds {1e3 * (t_step - t_loss):.1f} ms; "
        f"bwd/fwd ratio {(t_step - t_loss) / t_fwd:.2f}"
    )


if __name__ == "__main__":
    main()
