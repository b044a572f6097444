"""Pretraining entry point.

Usage: python -m pointcontrast_tpu.apps.pretrain [config.yaml] [k=v ...]

Mirrors /root/reference/pretrain/pointcontrast/ddp_train.py:33-74: loads the
config (resuming the run dir's snapshot if present), builds the loader and
trainer named by ``trainer.trainer``, and trains to ``opt.max_iter``.  DDP
process spawning (lib/multiprocessing.py) has no equivalent: one controller
drives the whole mesh.
"""
from __future__ import annotations

import logging
import os
import sys

from pointcontrast_tpu.config import load_config, maybe_resume_config, save_config

log = logging.getLogger(__name__)

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs", "pretrain_default.yaml",
)


def build_dataset(cfg):
    from pointcontrast_tpu.data import ScanNetMatchPairDataset, SyntheticPairDataset
    from pointcontrast_tpu.data.transforms import Compose, Jitter

    kwargs = dict(
        voxel_size=cfg.data.voxel_size,
        positive_search_multiplier=cfg.trainer.positive_pair_search_voxel_size_multiplier,
        random_rotation=cfg.trainer.use_random_rotation,
        rotation_range=cfg.trainer.rotation_range,
        random_scale=cfg.trainer.use_random_scale,
        min_scale=cfg.trainer.min_scale,
        max_scale=cfg.trainer.max_scale,
        transform=Compose([Jitter()]),
        seed=cfg.misc.seed,
    )
    if cfg.data.dataset == "ScanNetMatchPairDataset":
        return ScanNetMatchPairDataset(
            cfg.data.dataset_root_dir, cfg.data.scannet_match_dir, **kwargs
        )
    if cfg.data.dataset == "SyntheticPairDataset":
        return SyntheticPairDataset(
            num_pairs=cfg.data.get("num_pairs", 50),
            points_per_frame=cfg.data.get("points_per_frame", 20000),
            **kwargs,
        )
    raise ValueError(f"unknown dataset {cfg.data.dataset!r}")


def main(argv: list[str] | None = None):
    from pointcontrast_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    path = DEFAULT_CONFIG
    if argv and "=" not in argv[0]:
        path = argv.pop(0)
    cfg = load_config(path, argv)
    cfg = maybe_resume_config(cfg.misc.out_dir, cfg)
    os.makedirs(cfg.misc.out_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.misc.out_dir, "config.yaml"))

    import jax

    from pointcontrast_tpu.data import PadScheme, PairLoader
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.parallel import make_mesh
    from pointcontrast_tpu.train import PretrainConfig, PretrainTrainer
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    num_devices = cfg.distributed.num_devices or len(jax.devices())
    mesh = make_mesh(num_devices) if num_devices > 1 else None

    mode = (
        "nce" if cfg.trainer.trainer == "PointNCELossTrainer" else "hardest"
    )
    scheme = PadScheme(
        npad0=cfg.data.npad0,
        level_ratios=tuple(cfg.data.pad_ratios) if cfg.data.get("pad_ratios") else None,
    )
    dataset = build_dataset(cfg)
    loader = PairLoader(
        dataset,
        batch_size=cfg.trainer.batch_size,
        scheme=scheme,
        mode=mode,
        npos=cfg.misc.npos,
        num_pos=cfg.trainer.num_pos_per_batch * cfg.trainer.batch_size,
        num_hn=cfg.trainer.num_hn_samples_per_batch * cfg.trainer.batch_size,
        num_device_batches=num_devices if mesh is not None else 1,
        num_workers=cfg.misc.num_workers,
        seed=cfg.misc.seed,
        fuse_frames=bool(cfg.data.get("fuse_frames", True)),
        conv0_kernel_size=cfg.net.conv1_kernel_size,
        layout=cfg.data.get("layout", "voxel"),
    )
    import jax.numpy as jnp

    model = load_model(cfg.net.model)(
        in_channels=3,
        out_channels=cfg.net.model_n_out,
        conv1_kernel_size=cfg.net.conv1_kernel_size,
        bn_momentum=cfg.opt.bn_momentum,
        normalize_feature=cfg.net.normalize_feature,
        # activations dtype; params/norm stats stay f32.  bfloat16 keeps the
        # level-0 gather table inside the fast-gather footprint (PERF.md).
        dtype=jnp.dtype(cfg.net.get("dtype", "float32")),
    )
    tcfg = PretrainConfig(
        mode=mode,
        nce_t=cfg.misc.nceT,
        npos=cfg.misc.npos,
        num_pos_per_batch=cfg.trainer.num_pos_per_batch,
        num_hn_samples_per_batch=cfg.trainer.num_hn_samples_per_batch,
        pos_thresh=cfg.trainer.pos_thresh,
        neg_thresh=cfg.trainer.neg_thresh,
        optimizer=cfg.opt.optimizer.lower(),
        lr=cfg.opt.lr,
        momentum=cfg.opt.momentum,
        weight_decay=cfg.opt.weight_decay,
        exp_gamma=cfg.opt.exp_gamma,
        scheduler=cfg.opt.scheduler.lower(),
        max_iter=cfg.opt.max_iter,
        lr_update_freq=cfg.trainer.lr_update_freq,
        stat_freq=cfg.trainer.stat_freq,
        checkpoint_dir=os.path.join(cfg.misc.out_dir, "weights"),
    )
    from pointcontrast_tpu.utils import preemption

    guard = preemption.PreemptionGuard()
    trainer = PretrainTrainer(model, loader, tcfg, mesh=mesh,
                              preemption_guard=guard)
    try:
        history = trainer.train()
    except preemption.Preempted as p:
        preemption.write_requeue_marker(cfg.misc.out_dir, p.step)
        log.warning("exiting requeueable (iter %d); restart resumes", p.step)
        sys.exit(preemption.REQUEUE_EXIT_CODE)
    finally:
        loader.close()
        # restore the previous handlers: a finished run must not keep
        # swallowing SIGTERM/SIGUSR1 in a long-lived host process (pytest,
        # notebooks) — a later signal would silently flip an unrelated
        # trainer into the requeue path
        guard.uninstall()
    preemption.clear_requeue_marker(cfg.misc.out_dir)
    return history


if __name__ == "__main__":
    main()
