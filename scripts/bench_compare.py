"""A/B: voxel-layout vs brick-layout pretrain step on the real TPU.

Runs the flagship bench config (Res16UNet34C, 4 fused pairs, PointInfoNCE)
through both layouts at identical data and prints step times.  Not the
driver bench -- a development tool backing PERF.md numbers."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH_PAIRS = 4
POINTS_PER_FRAME = 45000
ROOM = 1.75
NPAD0 = 131072


def main():
    import jax

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data import PadScheme, SyntheticPairDataset, collate_pair
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, make_train_step
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.state import create_train_state

    ds = SyntheticPairDataset(
        num_pairs=BATCH_PAIRS, points_per_frame=POINTS_PER_FRAME,
        room_size=ROOM, seed=0,
    )
    samples = [ds[i] for i in range(BATCH_PAIRS)]
    scheme = PadScheme.scannet(npad0=NPAD0)

    for layout in (sys.argv[1:] or ["voxel", "brick"]):
        rng = np.random.RandomState(0)
        t0 = time.perf_counter()
        batch = collate_pair(
            samples, scheme, mode="nce", npos=4096, rng=rng,
            fuse_frames=True, layout=layout,
        )
        t_collate = time.perf_counter() - t0
        print(f"[{layout}] collate {t_collate:.2f}s  feats {batch.feats0.shape} "
              f"truncated={float(batch.truncated_voxels)}", flush=True)

        model = load_model("Res16UNet34C")(
            in_channels=3, out_channels=32, normalize_feature=True
        )
        config = PretrainConfig(mode="nce", npos=4096, lr=0.1)
        tx = optim.make_optimizer(
            "sgd", config.lr,
            optim.exp_lr(config.exp_gamma, config.lr_update_freq), config)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0))
        step_fn = make_train_step(config)
        step = jax.jit(lambda s, b: step_fn(s, b, axis_name=None),
                       donate_argnums=0)
        dbatch = jax.device_put(batch)

        t0 = time.perf_counter()
        state, metrics = step(state, dbatch)
        print(f"[{layout}] first step (compile) {time.perf_counter() - t0:.1f}s "
              f"loss={float(jax.device_get(metrics['loss'])):.4f}", flush=True)
        for _ in range(2):
            state, metrics = step(state, dbatch)
        float(jax.device_get(metrics["loss"]))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, dbatch)
        float(jax.device_get(metrics["loss"]))
        dt = (time.perf_counter() - t0) / iters
        print(f"[{layout}] step {dt * 1e3:.1f} ms  "
              f"{BATCH_PAIRS / dt:.2f} pairs/s", flush=True)

        # forward-only (eval) timing
        fwd = jax.jit(
            lambda p, b: state.apply_fn(
                p, b.feats0, b.pyramid0, train=False),
            static_argnames=())
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = fwd(variables, dbatch)
        float(jax.device_get(out[0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, dbatch)
        float(jax.device_get(out[0, 0]))
        print(f"[{layout}] fwd {(time.perf_counter() - t0) / iters * 1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
