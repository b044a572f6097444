"""Checkpoint save/restore + lenient transfer loading.

Mirrors the reference semantics:
  - save {curr_iter, params, batch_stats, opt_state} with a ``weights.latest``
    pointer to the newest file (the reference symlinks weights/weights.pth,
    /root/reference/pretrain/pointcontrast/lib/ddp_trainer.py:151-169);
  - "lenient" loading keeps only entries whose name AND shape match, used for
    pretrain -> finetune transfer (reference
    /root/reference/downstream/semseg/lib/utils.py:19-76, four filter
    variants incl. ``module.`` / ``encoder.`` prefix stripping — prefixes do
    not arise here, flax trees are already unwrapped).

Uses orbax-checkpoint for the array tree IO.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state, keep: int = 5) -> str:
    """Write ``directory/checkpoint_<step>`` and update the latest pointer."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint_{step}")
    payload = {
        "curr_iter": np.asarray(step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    with open(os.path.join(directory, "weights.latest"), "w") as f:
        f.write(f"checkpoint_{step}")
    _prune(directory, keep)
    return path


def _prune(directory: str, keep: int):
    ckpts = sorted(
        (d for d in os.listdir(directory) if d.startswith("checkpoint_")),
        key=lambda d: int(d.split("_")[1]),
    )
    for d in ckpts[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(directory, d), ignore_errors=True)


def latest_checkpoint(directory: str) -> str | None:
    pointer = os.path.join(directory, "weights.latest")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(directory, name)
    return path if os.path.exists(path) else None


def load_checkpoint(path: str, template: Any | None = None) -> dict:
    """Restore the payload dict. If ``template`` (a matching pytree of
    arrays) is given, restored leaves adopt its structure."""
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        restored = ckptr.restore(path, item=template)
    else:
        restored = ckptr.restore(path)
    return restored


def lenient_filter(target_params: Any, source_params: Any) -> tuple[Any, list, list]:
    """Copy source leaves into target where path+shape match.

    Returns (merged_params, loaded_paths, skipped_paths) — the reference logs
    the matched/unmatched sets the same way
    (downstream/semseg/ddp_main.py:150-176)."""
    flat_t = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(target_params)[0]
    }
    flat_s = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(source_params)[0]
    }
    loaded, skipped = [], []
    merged = dict(flat_t)
    for k, v in flat_t.items():
        if k in flat_s and tuple(flat_s[k].shape) == tuple(v.shape):
            merged[k] = flat_s[k]
            loaded.append(k)
        else:
            skipped.append(k)
    # Rebuild the tree with original structure.
    leaves_with_path = jax.tree_util.tree_flatten_with_path(target_params)
    treedef = leaves_with_path[1]
    new_leaves = [
        merged[jax.tree_util.keystr(kp)] for kp, _ in leaves_with_path[0]
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), loaded, skipped
