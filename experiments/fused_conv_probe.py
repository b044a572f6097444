"""Round-4 probe: fused im2col chunked same-level conv vs the scan form.

VERDICT r3 item 1: the round-3 fused single-gather transpose conv won on
16k-row sub-tables; this measures the same trick applied to the 26-offset
same-level convs (ops._conv_chunk_fused — one [S, G]-block gather + one
[S, G*Cin] @ [G*Cin, Cout] MXU matmul per chunk) at the REAL bench-step
level, within-run, for several gather group sizes.

Run on the TPU:  python experiments/fused_conv_probe.py
Env: PC_TPU_PROBE_GROUPS=0,26,13   comma list of group sizes (0 = scan form)
     PC_TPU_PROBE_SCALE=pretrain|semseg
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUPS = [
    int(g) for g in os.environ.get("PC_TPU_PROBE_GROUPS", "0,26,13").split(",")
]


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench

    results = {}
    for g in GROUPS:
        os.environ["PC_TPU_CONV_FUSED_GROUP"] = str(g)
        pairs = bench.measure("nce")
        results[g] = pairs
        print(json.dumps({"probe": "fused_conv", "group": g,
                          "pairs_per_sec": round(pairs, 3)}), flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"probe": "fused_conv", "best_group": best,
                      "best": round(results[best], 3),
                      "scan_baseline": round(results.get(0, -1.0), 3)}),
          flush=True)


if __name__ == "__main__":
    main()
