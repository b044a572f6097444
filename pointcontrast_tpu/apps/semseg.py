"""Semseg finetune entry point.

Usage: python -m pointcontrast_tpu.apps.semseg [config.yaml] [k=v ...]

Mirrors /root/reference/downstream/semseg/ddp_main.py:51-243: dataset +
loaders, model build, lenient pretrain-weight transfer, CE training with
PolyLR and periodic mIoU validation.
"""
from __future__ import annotations

import logging
import os
import sys

from pointcontrast_tpu.config import load_config, maybe_resume_config, save_config

log = logging.getLogger(__name__)

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs", "semseg_default.yaml",
)


def build_datasets(cfg):
    from pointcontrast_tpu.semseg import transforms as t
    from pointcontrast_tpu.semseg.datasets import load_dataset

    cls = load_dataset(cfg.data.dataset)
    prevoxel = t.Compose([t.ElasticDistortion(cls.ELASTIC_DISTORT_PARAMS)])
    input_tf = t.Compose([
        t.RandomDropout(0.2),
        t.RandomHorizontalFlip(cls.ROTATION_AXIS, cls.IS_TEMPORAL),
        t.ChromaticAutoContrast(),
        t.ChromaticTranslation(cfg.augmentation.data_aug_color_trans_ratio),
        t.ChromaticJitter(cfg.augmentation.data_aug_color_jitter_std),
    ]) if cfg.augmentation.use_feat_aug else None
    train_ds = cls(
        cfg.data.path, phase=cfg.train.train_phase, augment_data=True,
        prevoxel_transform=prevoxel, input_transform=input_tf,
        ignore_label=cfg.data.ignore_label,
    )
    val_ds = cls(
        cfg.data.path, phase=cfg.train.val_phase, augment_data=False,
        ignore_label=cfg.data.ignore_label,
    )
    return train_ds, val_ds


def main(argv: list[str] | None = None):
    from pointcontrast_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    path = DEFAULT_CONFIG
    if argv and "=" not in argv[0]:
        path = argv.pop(0)
    cfg = load_config(path, argv)
    cfg = maybe_resume_config(cfg.train.out_dir, cfg)
    os.makedirs(cfg.train.out_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.train.out_dir, "config.yaml"))

    import jax

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.parallel import make_mesh
    from pointcontrast_tpu.semseg.dataset import SemsegLoader
    from pointcontrast_tpu.semseg.train import SemsegConfig, SemsegTrainer
    from pointcontrast_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    num_devices = cfg.distributed.num_devices or len(jax.devices())
    mesh = make_mesh(num_devices) if num_devices > 1 else None

    train_ds, val_ds = build_datasets(cfg)
    scheme = PadScheme(
        npad0=cfg.data.npad0,
        level_ratios=tuple(cfg.data.pad_ratios) if cfg.data.get("pad_ratios") else None,
    )
    ndb = num_devices if mesh is not None else 1
    layout = cfg.data.get("layout", "voxel")
    # CRF wrapper (reference net.wrapper_type, config/default.yaml:9-12 +
    # models/wrapper.py:12-35): collators build the bilateral-grid map,
    # the model is wrapped with the mean-field filter.
    wrapper_type = cfg.net.get("wrapper_type", "") or ""
    crf_cfg = None
    if wrapper_type:
        region = {0: "hypercube", 1: "hypercross"}[
            int(cfg.net.get("wrapper_region_type", 1))]
        crf_cfg = dict(
            kernel_size=int(cfg.net.get("wrapper_kernel_size", 3)),
            region=region,
            spatial_sigma=float(cfg.net.get("wrapper_spatial_sigma", 1.0)),
            chromatic_sigma=float(cfg.net.get("wrapper_chromatic_sigma", 12.0)),
        )
        # The bilateral-grid map is built over whatever row placement the
        # layout uses (chunked slice rows included — build_bilateral_map
        # rows=), so the backbone keeps its configured layout.
    train_loader = SemsegLoader(
        train_ds, cfg.data.batch_size, scheme,
        augment_shift=cfg.augmentation.shift_coords,
        limit_numpoints=cfg.data.limit_numpoints,
        num_workers=cfg.data.num_workers,
        conv0_kernel_size=cfg.net.conv1_kernel_size,
        num_device_batches=ndb,
        layout=layout,
        crf=crf_cfg,
    )

    import jax.numpy as jnp

    model = load_model(cfg.net.model)(
        in_channels=3,
        out_channels=train_ds.num_classes,
        conv1_kernel_size=cfg.net.conv1_kernel_size,
        bn_momentum=cfg.optimizer.bn_momentum,
        # activations dtype (params/norm stats stay f32); see PERF.md
        dtype=jnp.dtype(cfg.net.get("dtype", "float32")),
    )
    if wrapper_type:
        from pointcontrast_tpu.semseg.crf import BilateralCRF, TrilateralCRF
        from pointcontrast_tpu.sparse.kernel_map import kernel_offsets

        wrapper_cls = {
            "BilateralCRF": BilateralCRF, "TrilateralCRF": TrilateralCRF,
        }[wrapper_type]
        if wrapper_type == "TrilateralCRF":
            # the 7D (space+color+time) grid needs per-point timestamps,
            # which the 3D semseg datasets don't carry (the reference only
            # pairs it with the 4D ST nets, conditional_random_fields.py:161)
            raise ValueError(
                "TrilateralCRF requires 4D spatio-temporal inputs; the "
                "semseg app's datasets are 3D — use BilateralCRF"
            )
        grid_dim = 6
        kv = len(kernel_offsets(
            crf_cfg["kernel_size"], grid_dim, crf_cfg["region"]))
        model = wrapper_cls(
            net=model, nchannels=train_ds.num_classes, kernel_volume=kv,
            meanfield_iterations=int(cfg.net.get("wrapper_iterations", 10)),
        )

    pretrained = None
    if cfg.net.weights:
        ckpt = (
            latest_checkpoint(cfg.net.weights)
            if os.path.isdir(cfg.net.weights) else cfg.net.weights
        )
        if ckpt:
            pretrained = load_checkpoint(ckpt)["params"]
            log.info("loaded pretrain weights from %s", ckpt)

    tcfg = SemsegConfig(
        optimizer=cfg.optimizer.optimizer.lower(),
        lr=cfg.optimizer.lr,
        momentum=cfg.optimizer.sgd_momentum,
        weight_decay=cfg.optimizer.weight_decay,
        scheduler=cfg.optimizer.scheduler.lower(),
        poly_power=cfg.optimizer.poly_power,
        max_iter=cfg.optimizer.max_iter,
        iter_size=cfg.train.iter_size,
        ignore_label=cfg.data.ignore_label,
        stat_freq=cfg.train.stat_freq,
        val_freq=cfg.train.val_freq,
        save_freq=cfg.train.save_freq,
        checkpoint_dir=os.path.join(cfg.train.out_dir, "weights"),
        wrapper_lr=float(cfg.net.get("wrapper_lr", 0) or 0) or None,
    )
    # whole-split validation (single-device eval step), reference semantics
    trainer = SemsegTrainer(
        model, train_loader, None, tcfg,
        num_classes=train_ds.num_classes, pretrained_params=pretrained,
        mesh=mesh, val_dataset=val_ds, val_scheme=scheme,
        val_batch_size=cfg.data.batch_size,
        conv0_kernel_size=cfg.net.conv1_kernel_size, layout=layout,
        crf=crf_cfg,
    )
    from pointcontrast_tpu.utils import preemption

    guard = preemption.PreemptionGuard()
    trainer.preemption_guard = guard
    try:
        history = trainer.train()
    except preemption.Preempted as p:
        preemption.write_requeue_marker(cfg.train.out_dir, p.step)
        log.warning("exiting requeueable (iter %d); restart resumes", p.step)
        sys.exit(preemption.REQUEUE_EXIT_CODE)
    finally:
        train_loader.close()
        guard.uninstall()  # see apps/pretrain.py: no stale handlers
    preemption.clear_requeue_marker(cfg.train.out_dir)
    return history


if __name__ == "__main__":
    main()
