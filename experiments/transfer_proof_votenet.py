"""Detection transfer proof — the reference's SECOND headline claim.

PointContrast's paper validates pretraining on TWO downstream tasks:
semantic segmentation (proved in-framework by transfer_proof.py) and
VoteNet detection with the sparseconv backbone (reference
downstream/votenet_det_new: the sparseconv backbone loads the pretrain
checkpoint, README "Fine-tuning on ScanNet Detection").  This experiment
closes that loop: the SAME streaming-NCE pretrain used by transfer_proof
(Res16UNet14A, 2000 steps, synthetic room pairs at 5 cm) is leniently
loaded into VoteNet's sparseconv backbone (`backbone_net/net/...` — the
same prefix remap the reference's detection config performs on the .pth
keys) and finetuned on synthetic detection scenes against a from-scratch
control, reporting held-out mAP@0.25 over seeds.

Run:  python experiments/transfer_proof_votenet.py     (TPU; reuses the
      transfer_proof pretrain recipe).  Env:
      PC_TPU_TRANSFER_{PRE_STEPS,SEEDS}, PC_TPU_DET_FT_STEPS.
Prints one JSON line per phase and a final summary line.
"""
from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

FT_STEPS = int(os.environ.get("PC_TPU_DET_FT_STEPS", "2000"))
SEEDS = int(os.environ.get("PC_TPU_TRANSFER_SEEDS", "3"))
MODEL = "Res16UNet14A"
VOXEL = 0.05          # matches the pretrain lattice (transfer_proof.py)
NPAD0 = 32768
BATCH = 2
NUM_POINTS = 8192
TRAIN_SCENES = 8
VAL_SCENES = 8


def _collate(ds, idxs, layout="chunked"):
    from pointcontrast_tpu.data.collate import PadScheme
    from pointcontrast_tpu.detect.datasets import collate_detection

    scheme = PadScheme.scannet(npad0=NPAD0)
    return collate_detection(
        [ds[i] for i in idxs], voxel_size=VOXEL, scheme=scheme, layout=layout,
    )


def finetune_and_eval(pretrained_params, seed: int):
    import jax
    import numpy as np

    from pointcontrast_tpu.detect.datasets import SyntheticDetectionDataset
    from pointcontrast_tpu.detect.train import DetectConfig, DetectTrainer
    from pointcontrast_tpu.detect.votenet import VoteNet
    from pointcontrast_tpu.train.checkpoint import lenient_filter

    train_ds = SyntheticDetectionDataset(
        num_scenes=TRAIN_SCENES, num_objects=5, num_points=NUM_POINTS,
        scene_seed=31, seed=seed, augment=True,
    )
    val_ds = SyntheticDetectionDataset(
        num_scenes=VAL_SCENES, num_objects=5, num_points=NUM_POINTS,
        scene_seed=7777, seed=10_000 + seed, augment=False,
    )
    dc = train_ds.dc
    model = VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        backbone="sparseconv", backbone_model=MODEL,
    )
    # augment=True makes __getitem__ stochastic: each pool batch sees fresh
    # flips/rotations of the train scenes, cycled over FT_STEPS
    rng = np.random.RandomState(seed)
    pool = [
        _collate(train_ds, rng.randint(TRAIN_SCENES, size=BATCH))
        for _ in range(12)
    ]
    cfg = DetectConfig(
        checkpoint_dir=f"/tmp/votenet_transfer_{os.getpid()}_{seed}",
    )
    trainer = DetectTrainer(
        model, dc, cfg, pool[0], rng=jax.random.PRNGKey(seed),
    )
    if pretrained_params is not None:
        # the pretrain tree is the bare Res16UNet; VoteNet holds it under
        # backbone_net/net (reference remaps the .pth keys the same way)
        nested = {"backbone_net": {"net": pretrained_params}}
        merged, loaded, skipped = lenient_filter(trainer.state.params, nested)
        trainer.state = trainer.state.replace(params=merged)
        if seed == 0:
            print(json.dumps({"phase": "load", "loaded": len(loaded),
                              "skipped": len(skipped)}), flush=True)
    for i in range(FT_STEPS):
        trainer.state, m = trainer._step(trainer.state, pool[i % len(pool)])
    final_loss = float(jax.device_get(m["loss"]))
    val_batches = [
        _collate(val_ds, range(b * BATCH, (b + 1) * BATCH))
        for b in range(VAL_SCENES // BATCH)
    ]
    metrics = trainer.evaluate(iter(val_batches))
    return {
        "map25": float(metrics[0.25]["mAP"]),
        "ar25": float(metrics[0.25]["AR"]),
        "map50": float(metrics[0.5]["mAP"]),
        "loss": final_loss,
    }


def main():
    import numpy as np

    from pointcontrast_tpu.utils.cache import enable_compilation_cache
    from pointcontrast_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    enable_compilation_cache()
    import pickle

    import transfer_proof

    # the pretrain arm is deterministic given PRE_STEPS; cache it so
    # finetune-side iterations don't re-pay the 8-minute pretrain phase
    cache = os.environ.get(
        "PC_TPU_PRETRAIN_PARAMS_CACHE",
        f"/tmp/pc_tpu_pretrain_{MODEL}_{transfer_proof.PRE_STEPS}.pkl",
    )
    if cache and os.path.exists(cache):
        with open(cache, "rb") as f:
            params = pickle.load(f)
        print(json.dumps({"phase": "pretrain", "cached": cache}), flush=True)
    else:
        params, _init = transfer_proof.pretrain()
        if cache:
            with open(cache, "wb") as f:
                pickle.dump(params, f)
    arms = {}
    for name, init in (("pretrained", params), ("scratch", None)):
        runs = []
        for seed in range(SEEDS):
            r = finetune_and_eval(init, seed)
            runs.append(r)
            print(json.dumps({"phase": "finetune", "arm": name, "seed": seed,
                              **{k: round(v, 4) for k, v in r.items()}}),
                  flush=True)
        arms[name] = {
            k: float(np.mean([r[k] for r in runs])) for k in runs[0]
        }
    print(json.dumps({
        "experiment": "transfer_proof_votenet", "model": MODEL,
        "ft_steps": FT_STEPS, "seeds": SEEDS,
        "pretrained_map25": round(arms["pretrained"]["map25"] * 100, 2),
        "scratch_map25": round(arms["scratch"]["map25"] * 100, 2),
        "map25_gap": round(
            (arms["pretrained"]["map25"] - arms["scratch"]["map25"]) * 100, 2),
        "pretrained_map50": round(arms["pretrained"]["map50"] * 100, 2),
        "scratch_map50": round(arms["scratch"]["map50"] * 100, 2),
        "pretrained_loss": round(arms["pretrained"]["loss"], 3),
        "scratch_loss": round(arms["scratch"]["loss"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
