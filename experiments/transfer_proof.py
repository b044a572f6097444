"""Transfer-learning proof (VERDICT r3 missing-item 1 / next-round item 3).

The reference exists to show contrastive pretraining on point-cloud pairs
improves downstream tasks (README.md abstract; ddp_main.py:150-176 loads the
pretrain weights leniently into the semseg net).  This experiment
demonstrates the same causal chain end-to-end in-framework:

  1. pretrain Res16UNet14A with PointInfoNCE on synthetic ROOM pairs
     (floor/walls/boxes geometry — the same structural vocabulary the
     downstream scenes use);
  2. finetune semseg from (a) that checkpoint vs (b) scratch on TWO small
     scenes whose colors are label-INDEPENDENT (label_colors=False), so the
     task is solvable only from geometry — the regime where a geometric
     prior can show up;
  3. evaluate mIoU on a held-out scene pool, mean over 3 finetune seeds.

Run:  python experiments/transfer_proof.py        (TPU; ~10-20 min with a
      cold compile cache).  Env: PC_TPU_TRANSFER_{PRE_STEPS,FT_STEPS,SEEDS}.
Prints one JSON line with both arms and the gap.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRE_STEPS = int(os.environ.get("PC_TPU_TRANSFER_PRE_STEPS", "300"))
FT_STEPS = int(os.environ.get("PC_TPU_TRANSFER_FT_STEPS", "40"))
SEEDS = int(os.environ.get("PC_TPU_TRANSFER_SEEDS", "3"))
MODEL = "Res16UNet14A"
NPAD_PRE = 16384
NPAD_FT = 8192


def pretrain():
    import jax
    import numpy as np

    from pointcontrast_tpu.data import (
        PadScheme, SyntheticPairDataset, collate_pair,
    )
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, make_train_step, optim
    from pointcontrast_tpu.train.state import create_train_state

    ds = SyntheticPairDataset(
        num_pairs=16, points_per_frame=4000, room_size=3.0, seed=0,
    )
    scheme = PadScheme.scannet(npad0=NPAD_PRE)
    rng = np.random.RandomState(0)
    batches = [
        collate_pair(
            [ds[(2 * b) % len(ds)], ds[(2 * b + 1) % len(ds)]], scheme,
            mode="nce", npos=512, rng=rng, fuse_frames=True, layout="chunked",
        )
        for b in range(8)
    ]

    model = load_model(MODEL)(
        in_channels=3, out_channels=32, normalize_feature=True,
    )
    config = PretrainConfig(mode="nce", npos=512, lr=0.1)
    tx = optim.make_optimizer(
        "sgd", config.lr,
        optim.exp_lr(config.exp_gamma, config.lr_update_freq), config,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx,
        (batches[0].feats0, batches[0].pyramid0),
    )
    step = jax.jit(
        lambda s, b: make_train_step(config)(s, b, axis_name=None),
        donate_argnums=0,
    )
    first = last = None
    for i in range(PRE_STEPS):
        state, m = step(state, batches[i % len(batches)])
        if i == 0:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    print(json.dumps({"phase": "pretrain", "steps": PRE_STEPS,
                      "loss_first": round(first, 4),
                      "loss_last": round(last, 4)}), flush=True)
    return jax.device_get(state.params)


def finetune_and_eval(pretrained_params, seed: int):
    import jax
    import numpy as np

    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.semseg.dataset import collate_semseg
    from pointcontrast_tpu.semseg.datasets.synthetic import (
        SyntheticSemsegDataset,
    )
    from pointcontrast_tpu.semseg.train import (
        SemsegConfig, evaluate_dataset, make_semseg_train_step,
    )
    from pointcontrast_tpu.train import optim
    from pointcontrast_tpu.train.checkpoint import lenient_filter
    from pointcontrast_tpu.train.state import create_train_state

    train_ds = SyntheticSemsegDataset(
        phase="train", num_scenes=2, points=4000, label_colors=False,
    )
    val_ds = SyntheticSemsegDataset(
        phase="val", num_scenes=4, points=4000, label_colors=False,
    )
    scheme = PadScheme(npad0=NPAD_FT)
    config = SemsegConfig(
        optimizer="sgd", lr=0.1, scheduler="polylr", max_iter=FT_STEPS,
        ignore_label=255,
    )
    model = load_model(MODEL)(
        in_channels=3, out_channels=train_ds.num_classes,
    )
    rng = np.random.RandomState(seed)
    batches = [
        collate_semseg(
            [train_ds.__getitem__(i % 2, rng=rng) for i in range(2 * b, 2 * b + 2)],
            scheme, ignore_label=255, shift_coords=True, rng=rng,
            layout="chunked", num_chunks=2,
        )
        for b in range(4)
    ]
    tx = optim.make_optimizer(
        config.optimizer, config.lr,
        optim.make_scheduler(config.scheduler, config), config,
    )
    state = create_train_state(
        jax.random.PRNGKey(seed), model, tx,
        (batches[0].feats, batches[0].pyramid),
    )
    if pretrained_params is not None:
        merged, loaded, skipped = lenient_filter(
            state.params, pretrained_params)
        state = state.replace(params=merged)
        if seed == 0:
            print(json.dumps({"phase": "load", "loaded": len(loaded),
                              "skipped": len(skipped)}), flush=True)
    step = jax.jit(
        lambda s, b: make_semseg_train_step(config)(s, b, axis_name=None),
        donate_argnums=0,
    )
    for i in range(FT_STEPS):
        state, m = step(state, batches[i % len(batches)])
    float(jax.device_get(m["loss"]))
    miou, _ious, acc, scenes = evaluate_dataset(
        state, val_ds, scheme, train_ds.num_classes, batch_size=2,
        ignore_label=255, layout="chunked",
    )
    return miou, acc


def main():
    import numpy as np

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    params = pretrain()
    arms = {}
    for name, init in (("pretrained", params), ("scratch", None)):
        mious, accs = [], []
        for seed in range(SEEDS):
            miou, acc = finetune_and_eval(init, seed)
            mious.append(miou)
            accs.append(acc)
            print(json.dumps({"phase": "finetune", "arm": name, "seed": seed,
                              "miou": round(miou, 2), "acc": round(acc, 2)}),
                  flush=True)
        arms[name] = (float(np.mean(mious)), float(np.mean(accs)))
    gap = arms["pretrained"][0] - arms["scratch"][0]
    print(json.dumps({
        "experiment": "transfer_proof", "model": MODEL,
        "pre_steps": PRE_STEPS, "ft_steps": FT_STEPS, "seeds": SEEDS,
        "pretrained_miou": round(arms["pretrained"][0], 2),
        "scratch_miou": round(arms["scratch"][0], 2),
        "pretrained_acc": round(arms["pretrained"][1], 2),
        "scratch_acc": round(arms["scratch"][1], 2),
        "miou_gap": round(gap, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
