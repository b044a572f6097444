"""Data-efficiency curve: pretraining gain vs labeled-scene count.

The reference paper's hallmark claim (and its Fig. 5-style experiments) is
that contrastive pretraining helps MOST when downstream labels are scarce.
This sweeps the number of labeled training scenes and measures the
pretrained-vs-scratch mIoU gap at each point, reusing transfer_proof's
pretraining (streaming collation; see that file) and finetune protocol
(150 PolyLR steps, geometry-only scenes, held-out eval pool, mean over
seeds).

Run:  python experiments/transfer_data_efficiency.py        (TPU; warm
      cache ~30 min).  Env: PC_TPU_TRANSFER_{PRE_STEPS,FT_STEPS,SEEDS},
      PC_TPU_TRANSFER_SCENE_COUNTS=1,2,4,8.
Prints one JSON line per sweep point and a final summary line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transfer_proof import SEEDS, finetune_and_eval, pretrain  # noqa: E402

SCENE_COUNTS = [
    int(s) for s in os.environ.get(
        "PC_TPU_TRANSFER_SCENE_COUNTS", "1,2,4,8").split(",")
]


def main():
    import numpy as np

    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    params, _ = pretrain()
    curve = {}
    for n in SCENE_COUNTS:
        arms = {}
        for name, init in (("pretrained", params), ("scratch", None)):
            mious = [
                finetune_and_eval(init, seed, num_scenes=n)[0]
                for seed in range(SEEDS)
            ]
            arms[name] = float(np.mean(mious))
        gap = arms["pretrained"] - arms["scratch"]
        curve[n] = (arms["pretrained"], arms["scratch"], gap)
        print(json.dumps({"phase": "sweep", "train_scenes": n,
                          "pretrained_miou": round(arms["pretrained"], 2),
                          "scratch_miou": round(arms["scratch"], 2),
                          "gap": round(gap, 2)}), flush=True)
    print(json.dumps({
        "experiment": "transfer_data_efficiency", "seeds": SEEDS,
        "curve": {str(n): {"pretrained": round(v[0], 2),
                           "scratch": round(v[1], 2),
                           "gap": round(v[2], 2)}
                  for n, v in curve.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
