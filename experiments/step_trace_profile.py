"""Round-5: HLO-level attribution of the pretrain bench step.

The fused-floor probe (experiments/fused_floor_probe.py) decomposed the
step top-down: conv fwd+bwd 177.3 ms of a 253.8 ms step, leaving a
**76.5 ms non-conv share** whose composition program-replay cannot see
(XLA fuses BN/ReLU/masks into larger loops inside the one compiled step).
This captures a jax.profiler trace of the warmed bench step and converts
it with tensorboard_plugin_profile into per-HLO-category device time, so
the non-conv share is attributed to real op groups (reductions, elementwise
fusions, transposes/copies, the optimizer) instead of guessed at.

Run on the TPU:  python experiments/step_trace_profile.py
Env: PC_TPU_BENCH_DTYPE / PC_TPU_CONV_FUSED_GROUP as bench.py.
Output: one JSON line per top op group + a category rollup.
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the generated xplane_pb2 in this image predates the installed protobuf's
# C++ fastpath — force the pure-python parser (set before any tf import)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = os.environ.get("PC_TPU_TRACE_DIR", "/tmp/pc_step_trace")
N_TRACED_STEPS = 4


def capture():
    from pointcontrast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    import bench
    from pointcontrast_tpu.data import (
        PadScheme,
        SyntheticPairDataset,
        collate_pair,
    )
    from pointcontrast_tpu.nn.registry import load_model
    from pointcontrast_tpu.train import PretrainConfig, optim
    from pointcontrast_tpu.train.pretrain import make_train_step
    from pointcontrast_tpu.train.state import create_train_state
    import jax.numpy as jnp

    ds = SyntheticPairDataset(
        num_pairs=bench.BATCH_PAIRS * 2,
        points_per_frame=bench.POINTS_PER_FRAME,
        room_size=bench.ROOM_SIZE, seed=0,
    )
    scheme = PadScheme.scannet(npad0=bench.NPAD0)
    batch = collate_pair(
        [ds[i] for i in range(bench.BATCH_PAIRS)], scheme, mode="nce",
        npos=4096, rng=np.random.RandomState(0), fuse_frames=True,
        layout=bench.LAYOUT,
    )
    model = load_model("Res16UNet34C")(
        in_channels=3, out_channels=32, normalize_feature=True,
        dtype=jnp.dtype(bench.DTYPE),
    )
    config = PretrainConfig(mode="nce", npos=4096)
    schedule = optim.exp_lr(config.exp_gamma, config.lr_update_freq)
    tx = optim.make_optimizer("sgd", config.lr, schedule, config)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, (batch.feats0, batch.pyramid0)
    )
    step = jax.jit(lambda s, b: make_train_step(config)(s, b, axis_name=None))
    for _ in range(3):
        state, m = step(state, batch)
    float(jax.device_get(m["loss"]))

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(N_TRACED_STEPS):
        state, m = step(state, batch)
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()


def report():
    """Parse the xplane.pb directly: the tensorboard_plugin_profile converter
    in this image is broken two ways (protobuf descriptor vintage + a pywrap
    symbol mismatch), but the raw XSpace proto ships with tensorflow and the
    device plane's "XLA Ops" line is a flat non-overlapping timeline whose
    event metadata carries the full HLO op text — enough to both rank ops
    and classify them by opcode.  Requires
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (pure-python proto parse).
    """
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True
    ))
    if not xplanes:
        print(json.dumps({"probe": "step_trace", "error": "no xplane"}))
        return
    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    dev = next(p for p in xs.planes if "/device:" in p.name
               and any(ln.name == "XLA Ops" for ln in p.lines))
    ops_line = next(ln for ln in dev.lines if ln.name == "XLA Ops")
    em = dev.event_metadata

    opcode_re = re.compile(r"=\s*\S+\s+([a-z0-9-]+)\(")

    def classify(md) -> tuple[str, str]:
        name = md.name
        m = opcode_re.search(name)
        opcode = m.group(1) if m else "?"
        if opcode == "fusion":
            kind = re.search(r"kind=(k\w+)", name)
            opcode = f"fusion.{kind.group(1)[1:] if kind else '?'}"
        return md.display_name or name[:40], opcode

    per_op_ps: dict[int, float] = {}
    n_ev: dict[int, int] = {}
    for ev in ops_line.events:
        per_op_ps[ev.metadata_id] = (
            per_op_ps.get(ev.metadata_id, 0.0) + ev.duration_ps
        )
        n_ev[ev.metadata_id] = n_ev.get(ev.metadata_id, 0) + 1

    by_opcode: dict[str, float] = {}
    scored = []
    for mid, ps in per_op_ps.items():
        disp, opcode = classify(em[mid])
        by_opcode[opcode] = by_opcode.get(opcode, 0.0) + ps
        scored.append((ps, disp, opcode, em[mid].name[:160], n_ev[mid]))
    scored.sort(reverse=True)
    per_step = N_TRACED_STEPS
    for ps, disp, opcode, text, cnt in scored[:25]:
        print(json.dumps({
            "op": disp, "opcode": opcode, "calls_per_step": cnt // per_step,
            "ms_per_step": round(ps / 1e9 / per_step, 3), "hlo": text,
        }), flush=True)
    roll = {
        k: round(v / 1e9 / per_step, 2)
        for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1])
    }
    print(json.dumps({
        "probe": "step_trace", "ms_per_step_by_opcode": roll,
        "total_device_ms_per_step":
        round(sum(by_opcode.values()) / 1e9 / per_step, 1),
    }), flush=True)


if __name__ == "__main__":
    import shutil

    if "--report-only" not in sys.argv:
        shutil.rmtree(TRACE_DIR, ignore_errors=True)
        capture()
    report()
