"""Round-4 re-probe: bf16 activations on top of the FUSED im2col conv.

Round 3 measured bf16 as a ~4% LOSS and rejected it — but that was on the
scan-form conv, where gathers are per-ROW-overhead bound at C=32 and the
matmuls contract only Cin deep (the MXU is idle either way, so halving row
bytes bought nothing and the converts added work).  The fused im2col form
(ops._conv_chunk_fused, round-4 default) changes both terms: the gathered
col block is [S, G*Cin] (wide rows — byte traffic matters), and the matmul
contracts G*Cin >= 832 deep (MXU-bound — bf16 doubles the peak).  That is
new evidence, so the rejection is re-tested within-run at the bench step.

Run on the TPU:  python experiments/bf16_fused_probe.py
Env: PC_TPU_PROBE_DTYPES=float32,bfloat16   PC_TPU_PROBE_MODE=nce
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPES = os.environ.get(
    "PC_TPU_PROBE_DTYPES", "float32,bfloat16").split(",")
MODE = os.environ.get("PC_TPU_PROBE_MODE", "nce")


def main():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench

    results = {}
    for dt in DTYPES:
        bench.DTYPE = dt  # module-level knob read by measure()
        pairs = bench.measure(MODE)
        results[dt] = pairs
        print(json.dumps({"probe": "bf16_fused", "dtype": dt, "mode": MODE,
                          "pairs_per_sec": round(pairs, 3)}), flush=True)
    if "float32" in results and "bfloat16" in results:
        print(json.dumps({
            "probe": "bf16_fused",
            "ratio_bf16_over_f32": round(
                results["bfloat16"] / results["float32"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
