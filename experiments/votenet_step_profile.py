"""Decompose the VoteNet sparseconv train step: backbone / heads / loss / bwd.

Within-run, device-synced, on the exact votenet_sparseconv_bench workload
(batch 4 x 40k points at 2.5 cm, npad0 196608, chunked layout).  Segments,
each its own jitted program over the same batch:

  fps        ops.furthest_point_sample(xyz, 1024) alone (the sequential
             1023-step fori_loop is a latency suspect)
  backbone   Res16UNet forward + point gather + seed FPS (SparseConvBackbone)
  fwd        full VoteNet forward (backbone + voting + proposal)
  fwd+loss   forward + get_loss
  step       full train step (== the shipped trainer._step)

The deltas bound what the vote/proposal heads, the loss, and the backward
add over the sparse backbone.  Run on the real chip:
  python experiments/votenet_step_profile.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 4
NUM_POINTS = 40000
NPAD0 = 196608
ITERS = 15


def timeit(fn, sync, iters=ITERS):
    out = fn()
    sync(out)  # compile + warmup
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.detect import ops
    from pointcontrast_tpu.detect.datasets import (
        SyntheticDetectionDataset,
        collate_detection,
    )
    from pointcontrast_tpu.detect.loss import get_loss
    from pointcontrast_tpu.detect.train import (
        DetectConfig,
        DetectTrainer,
        _batch_to_inputs,
        _batch_to_labels,
    )
    from pointcontrast_tpu.detect.votenet import SparseConvBackbone, VoteNet

    print("devices:", jax.devices(), flush=True)
    ds = SyntheticDetectionDataset(
        num_scenes=BATCH, num_objects=6, num_points=NUM_POINTS, seed=0
    )
    dc = ds.dc
    samples = [ds[i] for i in range(BATCH)]
    scheme = PadScheme.scannet(npad0=NPAD0)
    batch = collate_detection(samples, voxel_size=0.025, scheme=scheme,
                              layout="chunked")
    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        backbone="sparseconv",
    )
    cfg = DetectConfig(checkpoint_dir="/tmp/votenet_profile")
    trainer = DetectTrainer(model, dc, cfg, batch)
    state = trainer.state
    inputs = _batch_to_inputs(batch)
    labels = _batch_to_labels(batch)

    def sync_tree(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jax.device_get(jnp.asarray(leaf).reshape(-1)[0]))

    xyz = inputs["point_clouds"][..., :3]

    fps = jax.jit(lambda p: ops.furthest_point_sample(p, 1024))
    t_fps = timeit(lambda: fps(xyz), sync_tree)
    print(f"fps 40k->1024          {t_fps * 1e3:8.1f} ms", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    bb = SparseConvBackbone(input_feature_dim=3, output_feature_dim=256,
                            num_seed=1024, name="backbone_net")
    bb_vars = {
        "params": state.params["backbone_net"],
        "batch_stats": state.batch_stats["backbone_net"],
    }

    @jax.jit
    def backbone_fwd(v, ins):
        return bb.apply(
            v, ins["point_clouds"], ins["voxel_feats"], ins["voxel_pyramid"],
            ins["point_voxel_idx"], {}, train=True, mutable=["batch_stats"],
        )

    t_bb = timeit(lambda: backbone_fwd(bb_vars, inputs), sync_tree)
    print(f"backbone fwd           {t_bb * 1e3:8.1f} ms", flush=True)

    @jax.jit
    def full_fwd(v, ins):
        return model.apply(v, ins, train=True, mutable=["batch_stats"])

    t_fwd = timeit(lambda: full_fwd(variables, inputs), sync_tree)
    print(f"full fwd               {t_fwd * 1e3:8.1f} ms "
          f"(heads +{(t_fwd - t_bb) * 1e3:.1f})", flush=True)

    @jax.jit
    def fwd_loss(v, ins):
        end_points, _ = model.apply(v, ins, train=True,
                                    mutable=["batch_stats"])
        end_points.update(labels)
        loss, end_points = get_loss(end_points, dc)
        return loss

    t_loss = timeit(lambda: fwd_loss(variables, inputs), sync_tree)
    print(f"fwd + loss             {t_loss * 1e3:8.1f} ms "
          f"(loss +{(t_loss - t_fwd) * 1e3:.1f})", flush=True)

    # trainer._step donates its state arg (detect/train.py donate_argnums=0),
    # so rebind the state each call — reusing a donated buffer raises a
    # deleted-buffer RuntimeError on the second invocation.
    cell = [state]

    def step():
        cell[0], m = trainer._step(cell[0], batch)
        return m["loss"]

    t_step = timeit(step, sync_tree)
    print(f"full step              {t_step * 1e3:8.1f} ms "
          f"(bwd+opt +{(t_step - t_loss) * 1e3:.1f})  "
          f"= {BATCH / t_step:.2f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
