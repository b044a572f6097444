"""Transfer-learning proof (VERDICT r3 missing-item 1 / next-round item 3).

The reference exists to show contrastive pretraining on point-cloud pairs
improves downstream tasks (README.md abstract; ddp_main.py:150-176 loads the
pretrain weights leniently into the semseg net).  This experiment
demonstrates the causal chain end-to-end in-framework with THREE measurements,
ordered from the most direct to the most downstream:

  1. HELD-OUT NCE accuracy: pretrain Res16UNet14A with PointInfoNCE on 64
     synthetic ROOM pair scenes (floor/walls/boxes — the same structural
     vocabulary the downstream scenes use), then measure, on pairs from
     UNSEEN scenes, how often the true correspondence wins the 512-way
     softmax (chance 1/512 ~= 0.2%).  Random-init features are the control.
     This is the transfer the pretext task optimizes, evaluated off the
     training distribution.
  2. Linear probe: freeze the backbone, train only the final classifier on
     two label-independent-color scenes (geometry-only task), eval mIoU on
     held-out scenes — the standard SSL feature-quality evaluation.
  3. Full finetune from (a) the checkpoint vs (b) scratch, same data,
     mean over seeds — the reference's own protocol.

Run:  python experiments/transfer_proof.py        (TPU; ~20-30 min with a
      warm compile cache).  Env: PC_TPU_TRANSFER_{PRE_STEPS,FT_STEPS,SEEDS}.
Prints one JSON line per phase and a final summary line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRE_STEPS = int(os.environ.get("PC_TPU_TRANSFER_PRE_STEPS", "2000"))
FT_STEPS = int(os.environ.get("PC_TPU_TRANSFER_FT_STEPS", "150"))
SEEDS = int(os.environ.get("PC_TPU_TRANSFER_SEEDS", "4"))
MODEL = "Res16UNet14A"
NPAD_PRE = 16384
NPAD_FT = 8192
NPOS = 512


def _pair_batches(num_pairs, scene_seed, num_batches, rng_seed):
    import numpy as np

    from pointcontrast_tpu.data import (
        PadScheme, SyntheticPairDataset, collate_pair,
    )

    ds = SyntheticPairDataset(
        num_pairs=num_pairs, points_per_frame=4000, room_size=3.0,
        scene_seed=scene_seed,
        # match the downstream scenes' lattice (SyntheticSemsegDataset
        # VOXEL_SIZE=0.05): conv kernels learn scale-specific geometry,
        # and the reference pretrains/finetunes at matched 2.5 cm too
        voxel_size=0.05,
    )
    scheme = PadScheme.scannet(npad0=NPAD_PRE)
    rng = np.random.RandomState(rng_seed)
    return [
        collate_pair(
            [ds[(2 * b) % len(ds)], ds[(2 * b + 1) % len(ds)]], scheme,
            mode="nce", npos=NPOS, rng=rng, fuse_frames=True, layout="chunked",
        )
        for b in range(num_batches)
    ]


def _make_model():
    from pointcontrast_tpu.nn.registry import load_model

    return load_model(MODEL)(
        in_channels=3, out_channels=32, normalize_feature=True,
    )


def pretrain():
    import time

    import jax
    import numpy as np

    from pointcontrast_tpu.data import (
        PadScheme, SyntheticPairDataset, collate_pair,
    )
    from pointcontrast_tpu.train import PretrainConfig, make_train_step, optim
    from pointcontrast_tpu.train.state import create_train_state

    # STREAMING collation: every step draws 2 random scenes with FRESH
    # rotations/scales/crops and FRESH positive-pair samples, exactly like
    # the production loader.  Two earlier designs that precollated fixed
    # batches (8, then 32) memorized them — train loss fell well below
    # ln(npos) while held-out NCE loss stayed at chance.  Augmentation and
    # sampling diversity, not scene count, is what makes features transfer.
    ds = SyntheticPairDataset(
        num_pairs=64, points_per_frame=4000, room_size=3.0, scene_seed=1234,
        voxel_size=0.05,  # match the downstream scenes' 5 cm lattice
    )
    scheme = PadScheme.scannet(npad0=NPAD_PRE)
    rng = np.random.RandomState(0)

    def fresh_batch():
        a = int(rng.randint(len(ds)))
        b = int(rng.randint(len(ds)))
        return collate_pair(
            [ds.__getitem__(a, rng=rng), ds.__getitem__(b, rng=rng)],
            scheme, mode="nce", npos=NPOS, rng=rng, fuse_frames=True,
            layout="chunked",
        )

    b0 = fresh_batch()
    model = _make_model()
    config = PretrainConfig(mode="nce", npos=NPOS, lr=0.1)
    tx = optim.make_optimizer(
        "sgd", config.lr,
        optim.exp_lr(config.exp_gamma, config.lr_update_freq), config,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (b0.feats0, b0.pyramid0),
    )
    init_params = jax.device_get(state.params)
    step = jax.jit(
        lambda s, b: make_train_step(config)(s, b, axis_name=None),
        donate_argnums=0,
    )
    first = last = None
    t0 = time.time()
    for i in range(PRE_STEPS):
        state, m = step(state, b0 if i == 0 else fresh_batch())
        if i == 0:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    print(json.dumps({"phase": "pretrain", "steps": PRE_STEPS,
                      "loss_first": round(first, 4),
                      "loss_last": round(last, 4),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    return jax.device_get(state.params), init_params


def heldout_nce(params_by_arm):
    """Measurement 1: 512-way correspondence accuracy on UNSEEN scenes.

    Reuses the training loss's logit construction (point_info_nce_loss,
    losses/contrastive.py:26) but reports argmax accuracy; model runs in
    batch-stat mode (train=True statistics, discarded) so a fresh-init
    control isn't penalized by its untrained running stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcontrast_tpu.losses.contrastive import point_info_nce_loss

    batches = _pair_batches(8, 987654, 4, rng_seed=99)
    model = _make_model()

    @jax.jit
    def metrics(params, batch):
        f, _ = model.apply(
            {"params": params}, batch.feats0, batch.pyramid0, train=True,
            mutable=["batch_stats"],
        )
        loss = point_info_nce_loss(
            f, f, batch.q_idx, batch.k_idx, batch.pair_valid)
        q = jnp.take(f, batch.q_idx, axis=0)
        k = jnp.take(f, batch.k_idx, axis=0)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        neg_inf = jnp.asarray(-1e9, logits.dtype)
        diag = jnp.eye(logits.shape[0], dtype=bool)
        logits = jnp.where((batch.pair_valid[None, :] > 0) | diag,
                           logits, neg_inf)
        hit = (jnp.argmax(logits, axis=1) ==
               jnp.arange(logits.shape[0])).astype(jnp.float32)
        acc = jnp.sum(hit * batch.pair_valid) / jnp.sum(batch.pair_valid)
        return loss, acc

    out = {}
    for arm, params in params_by_arm.items():
        losses, accs = [], []
        for b in batches:
            l, a = metrics(params, b)
            losses.append(float(jax.device_get(l)))
            accs.append(float(jax.device_get(a)))
        out[arm] = (float(np.mean(losses)), float(np.mean(accs)))
        print(json.dumps({"phase": "heldout_nce", "arm": arm,
                          "loss": round(out[arm][0], 4),
                          "acc_pct": round(100 * out[arm][1], 2),
                          "chance_pct": round(100.0 / NPOS, 2)}), flush=True)
    return out


def finetune_and_eval(pretrained_params, seed: int, probe: bool = False,
                      num_scenes: int = 2):
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
        phase="train", num_scenes=num_scenes, points=4000, label_colors=False,
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
            [train_ds.__getitem__(i % num_scenes, rng=rng)
             for i in range(2 * b, 2 * b + 2)],
            scheme, ignore_label=255, shift_coords=True, rng=rng,
            layout="chunked", num_chunks=2,
        )
        for b in range(4)
    ]
    import optax

    tx = optim.make_optimizer(
        config.optimizer, config.lr,
        optim.make_scheduler(config.scheduler, config), config,
    )
    if probe:
        # linear probe: freeze everything but the 'final' classifier —
        # the standard SSL evaluation (features fixed, head learned)
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda kp, _: "head"
                if any(getattr(k, "key", "") == "final" for k in kp)
                else "frozen",
                params,
            )

        tx = optax.multi_transform(
            {"head": tx, "frozen": optax.set_to_zero()}, label)
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
    params, init_params = pretrain()
    nce = heldout_nce({"pretrained": params, "random_init": init_params})
    arms = {}
    for name, init, probe in (
        ("pretrained", params, False),
        ("scratch", None, False),
        ("probe_pretrained", params, True),
        ("probe_scratch", None, True),
    ):
        mious, accs = [], []
        for seed in range(SEEDS):
            miou, acc = finetune_and_eval(init, seed, probe=probe)
            mious.append(miou)
            accs.append(acc)
            print(json.dumps({"phase": "finetune", "arm": name, "seed": seed,
                              "miou": round(miou, 2), "acc": round(acc, 2)}),
                  flush=True)
        arms[name] = (float(np.mean(mious)), float(np.mean(accs)))
    print(json.dumps({
        "experiment": "transfer_proof", "model": MODEL,
        "pre_steps": PRE_STEPS, "ft_steps": FT_STEPS, "seeds": SEEDS,
        "heldout_nce_acc_pretrained_pct": round(100 * nce["pretrained"][1], 2),
        "heldout_nce_acc_random_pct": round(100 * nce["random_init"][1], 2),
        "heldout_nce_chance_pct": round(100.0 / NPOS, 2),
        "pretrained_miou": round(arms["pretrained"][0], 2),
        "scratch_miou": round(arms["scratch"][0], 2),
        "miou_gap": round(arms["pretrained"][0] - arms["scratch"][0], 2),
        "probe_pretrained_miou": round(arms["probe_pretrained"][0], 2),
        "probe_scratch_miou": round(arms["probe_scratch"][0], 2),
        "probe_gap": round(
            arms["probe_pretrained"][0] - arms["probe_scratch"][0], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
