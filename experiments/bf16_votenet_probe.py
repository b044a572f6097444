"""Round-4: bf16 sparseconv backbone on the VoteNet detection step.

The fused im2col conv flipped bf16 from a -4% loss to a win at pretrain
(+3.6%) and semseg (+4.1%) scale (`bf16_fused_probe.py`, PERF.md).  VoteNet's
sparseconv backbone shares those convs (196k rows at 2.5 cm) but the step
also carries the voting/proposal point ops, which stay f32 by design
(detect/votenet.py casts the backbone output back to f32 before the heads)
— so the expected win is diluted by the f32 head share.  Measured within-run
because VoteNet cross-session variance is large (PERF.md round 4).

Run on the TPU:  python experiments/bf16_votenet_probe.py
Env: PC_TPU_PROBE_DTYPES=float32,bfloat16
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPES = os.environ.get(
    "PC_TPU_PROBE_DTYPES", "float32,bfloat16").split(",")


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench

    results = {}
    for dt in DTYPES:
        bench.DTYPE = dt  # module-level knob read by measure_votenet()
        scenes = bench.measure_votenet()
        results[dt] = scenes
        print(json.dumps({"probe": "bf16_votenet", "dtype": dt,
                          "scenes_per_sec": round(scenes, 3)}), flush=True)
    if "float32" in results and "bfloat16" in results:
        print(json.dumps({
            "probe": "bf16_votenet",
            "ratio_bf16_over_f32": round(
                results["bfloat16"] / results["float32"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
