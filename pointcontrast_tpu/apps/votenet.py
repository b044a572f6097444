"""VoteNet finetune entry point.

Usage: python -m pointcontrast_tpu.apps.votenet [config.yaml] [k=v ...]

Mirrors /root/reference/downstream/votenet_det_new/ddp_main.py:52-168 +
lib/train.py:44-217: dataset choice scannet/sunrgbd, optional voxelization
wrapper for the sparseconv backbone, Adam with epoch-milestone decay, eval
every N epochs at IoU 0.25/0.5, pretrain backbone transfer.
"""
from __future__ import annotations

import logging
import os
import sys

from pointcontrast_tpu.config import load_config, maybe_resume_config, save_config

log = logging.getLogger(__name__)

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs", "votenet_default.yaml",
)


class _BatchLoader:
    """Round-robin detection batches with background collation.

    num_device_batches > 1 stacks that many per-device batches on a leading
    axis (the data-parallel mesh axis), like PairLoader/SemsegLoader."""

    def __init__(self, dataset, batch_size, voxel_size=None, scheme=None,
                 shuffle=True, seed=0, num_device_batches=1,
                 layout="voxel"):
        from pointcontrast_tpu.data.sampler import DistributedInfSampler
        from pointcontrast_tpu.detect.datasets import collate_detection

        self.dataset = dataset
        self.batch_size = batch_size
        self.voxel_size = voxel_size
        self.scheme = scheme
        self.layout = layout
        self.collate = collate_detection
        self.num_device_batches = num_device_batches
        self.sampler = DistributedInfSampler(len(dataset), shuffle=shuffle, seed=seed)

    def _one(self):
        idxs = [next(self.sampler) for _ in range(self.batch_size)]
        return self.collate(
            [self.dataset[i] for i in idxs],
            voxel_size=self.voxel_size, scheme=self.scheme,
            layout=self.layout,
        )

    def __next__(self):
        import jax
        import numpy as np

        if self.num_device_batches == 1:
            return self._one()
        parts = [self._one() for _ in range(self.num_device_batches)]
        return jax.tree.map(lambda *xs: np.stack(xs), *parts)

    def epoch(self):
        """One deterministic full pass in dataset order (validation: every
        scene exactly once per evaluate, like the reference's val loop; the
        final partial batch costs one extra cached compile)."""
        for start in range(0, len(self.dataset), self.batch_size):
            idxs = range(start, min(start + self.batch_size, len(self.dataset)))
            yield self.collate(
                [self.dataset[i] for i in idxs],
                voxel_size=self.voxel_size, scheme=self.scheme,
                layout=self.layout,
            )


def main(argv: list[str] | None = None):
    from pointcontrast_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    path = DEFAULT_CONFIG
    if argv and "=" not in argv[0]:
        path = argv.pop(0)
    cfg = load_config(path, argv)
    cfg = maybe_resume_config(cfg.misc.out_dir, cfg)
    os.makedirs(cfg.misc.out_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.misc.out_dir, "config.yaml"))

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.detect.configs import (
        ScannetDatasetConfig,
        SunrgbdDatasetConfig,
    )
    from pointcontrast_tpu.detect.datasets import ScannetDetectionDataset
    from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
    from pointcontrast_tpu.detect.votenet import VoteNet
    from pointcontrast_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if cfg.data.dataset == "scannet":
        dc = ScannetDatasetConfig()
        train_ds = ScannetDetectionDataset(
            cfg.data.data_path,
            split_file=os.path.join(cfg.data.split_dir, "scannetv2_train.txt"),
            num_points=cfg.data.num_points, use_color=cfg.data.use_color,
            use_height=cfg.data.use_height, augment=True, seed=cfg.misc.seed,
        )
        val_ds = ScannetDetectionDataset(
            cfg.data.data_path,
            split_file=os.path.join(cfg.data.split_dir, "scannetv2_val.txt"),
            num_points=cfg.data.num_points, use_color=cfg.data.use_color,
            use_height=cfg.data.use_height, augment=False, seed=cfg.misc.seed,
        )
    elif cfg.data.dataset == "sunrgbd":
        from pointcontrast_tpu.detect.sunrgbd import SunrgbdDetectionVotesDataset

        dc = SunrgbdDatasetConfig()
        train_ds = SunrgbdDetectionVotesDataset(
            cfg.data.data_path, split_set="train",
            num_points=cfg.data.num_points, use_color=cfg.data.use_color,
            use_height=cfg.data.use_height, augment=True,
        )
        val_ds = SunrgbdDetectionVotesDataset(
            cfg.data.data_path, split_set="val",
            num_points=cfg.data.num_points, use_color=cfg.data.use_color,
            use_height=cfg.data.use_height, augment=False,
        )
    elif cfg.data.dataset == "synthetic":
        # Random box-object rooms with the ScanNet sample contract — lets
        # the app run end-to-end without data on disk (tests / smoke runs),
        # like the semseg app's SyntheticSemsegDataset branch.
        from pointcontrast_tpu.detect.datasets import SyntheticDetectionDataset

        dc = ScannetDatasetConfig()
        num_scenes = int(cfg.data.get("num_scenes", 8))
        train_ds = SyntheticDetectionDataset(
            num_scenes=num_scenes, num_points=cfg.data.num_points,
            use_color=cfg.data.use_color, use_height=cfg.data.use_height,
            augment=True, seed=cfg.misc.seed,
        )
        val_ds = SyntheticDetectionDataset(
            num_scenes=max(num_scenes // 2, 1),
            num_points=cfg.data.num_points, use_color=cfg.data.use_color,
            use_height=cfg.data.use_height, augment=False, seed=cfg.misc.seed,
        )
    else:
        raise ValueError(f"unknown dataset {cfg.data.dataset!r}")

    use_voxels = cfg.net.backbone == "sparseconv"
    scheme = (
        PadScheme(
            npad0=cfg.data.npad0,
            level_ratios=tuple(cfg.data.pad_ratios)
            if cfg.data.get("pad_ratios") else None,
        )
        if use_voxels else None
    )
    import jax
    import jax.numpy as jnp

    from pointcontrast_tpu.parallel import make_mesh

    num_devices = (
        int(cfg.distributed.num_devices) if cfg.get("distributed") else 0
    ) or len(jax.devices())
    mesh = make_mesh(num_devices) if num_devices > 1 else None
    layout = cfg.data.get("layout", "voxel") if use_voxels else "voxel"
    train_loader = _BatchLoader(
        train_ds, cfg.data.batch_size,
        voxel_size=cfg.data.voxel_size if use_voxels else None,
        scheme=scheme, seed=cfg.misc.seed,
        num_device_batches=num_devices if mesh is not None else 1,
        layout=layout,
    )
    val_loader = _BatchLoader(
        val_ds, cfg.data.batch_size,
        voxel_size=cfg.data.voxel_size if use_voxels else None,
        scheme=scheme, shuffle=False, seed=cfg.misc.seed, layout=layout,
    )

    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=int(cfg.data.use_color) * 3 + int(cfg.data.use_height),
        num_proposal=cfg.net.num_proposal, vote_factor=cfg.net.vote_factor,
        sampling=cfg.net.cluster_sampling, backbone=cfg.net.backbone,
        backbone_model=cfg.net.get("backbone_model", "Res16UNet34C"),
        # sparseconv-backbone activations dtype (heads/losses stay f32, as do
        # params and norm stats); bfloat16 measured +3.0% within-run (PERF.md)
        dtype=jnp.dtype(cfg.net.get("dtype", "float32")),
    )
    tcfg = DetectConfig(
        learning_rate=cfg.optimizer.learning_rate,
        weight_decay=cfg.optimizer.weight_decay,
        lr_decay_steps=tuple(cfg.optimizer.lr_decay_steps),
        lr_decay_rates=tuple(cfg.optimizer.lr_decay_rates),
        bn_decay_step=cfg.optimizer.bn_decay_step,
        bn_decay_rate=cfg.optimizer.bn_decay_rate,
        max_epoch=cfg.optimizer.max_epoch,
        eval_every=cfg.eval.eval_every,
        checkpoint_dir=os.path.join(cfg.misc.out_dir, "weights"),
        ap_iou_thresholds=tuple(cfg.eval.ap_iou_thresholds),
        use_3d_nms=cfg.eval.use_3d_nms,
        cls_nms=cfg.eval.cls_nms,
        nms_iou=cfg.eval.nms_iou,
        per_class_proposal=cfg.eval.per_class_proposal,
        conf_thresh=cfg.eval.conf_thresh,
    )
    trainer = DetectTrainer(model, dc, tcfg, next(train_loader), mesh=mesh)

    if cfg.net.weights:
        from pointcontrast_tpu.train.checkpoint import lenient_filter

        ckpt = (
            latest_checkpoint(cfg.net.weights)
            if os.path.isdir(cfg.net.weights) else cfg.net.weights
        )
        if ckpt:
            source = load_checkpoint(ckpt)["params"]
            # transfer into the sparseconv backbone subtree
            # (reference ddp_main.py:120-141 loads into net.backbone_net.net)
            target = trainer.state.params
            if "backbone_net" in target and "net" in target["backbone_net"]:
                merged, loaded, skipped = lenient_filter(
                    target["backbone_net"]["net"], source
                )
                target = dict(target)
                target["backbone_net"] = dict(target["backbone_net"])
                target["backbone_net"]["net"] = merged
                trainer.state = trainer.state.replace(params=target)
                log.info("backbone transfer: %d loaded %d skipped",
                         len(loaded), len(skipped))

    from pointcontrast_tpu.utils import preemption

    guard = preemption.PreemptionGuard()
    trainer.preemption_guard = guard
    steps_per_epoch = max(1, len(train_ds) // cfg.data.batch_size)
    try:
        for epoch in range(trainer.epoch, cfg.optimizer.max_epoch):
            loss = trainer.train_epoch(train_loader, steps_per_epoch)
            log.info("epoch %d loss %.4f", epoch, loss)
            if (epoch + 1) % cfg.eval.eval_every == 0:
                # full deterministic val pass: every scene exactly once
                metrics = trainer.evaluate(val_loader.epoch())
                for t, m in metrics.items():
                    log.info("epoch %d AP@%.2f mAP %.4f AR %.4f",
                             epoch, t, m["mAP"], m["AR"])
                # trainer.epoch is already epoch+1 (train_epoch advanced it);
                # saving that value makes resume continue at the NEXT epoch
                # instead of re-training the one just finished
                trainer.save()
    except preemption.Preempted as p:
        preemption.write_requeue_marker(cfg.misc.out_dir, p.step)
        log.warning("exiting requeueable (epoch %d); restart resumes", p.step)
        sys.exit(preemption.REQUEUE_EXIT_CODE)
    finally:
        guard.uninstall()  # see apps/pretrain.py: no stale handlers
    preemption.clear_requeue_marker(cfg.misc.out_dir)
    return trainer


if __name__ == "__main__":
    main()
