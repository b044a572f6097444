"""Contrastive pretraining losses, fully on-device with static shapes.

Replaces the reference trainers' loss math
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py):
  - PointInfoNCE:       :400-426 (unique-anchor sampling happens host-side in
    the data pipeline; the matmul + cross-entropy runs here).
  - Hardest-contrastive: :186-238.  The reference mines hardest negatives
    with a GPU pdist but does the positive-pair exclusion with numpy hashes
    on the CPU every iteration (:199-234).  Here the exclusion is a
    precomputed [P, H] collision bitmap gathered on-device, so the whole loss
    jits with no host sync.

All sampled index arrays are fixed-size with validity masks (padded batches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def point_info_nce_loss(
    f0: jnp.ndarray,  # [N0, C] features of frame 0 (L2-normalized by model)
    f1: jnp.ndarray,  # [N1, C]
    q_idx: jnp.ndarray,  # [P] anchor rows into f0
    k_idx: jnp.ndarray,  # [P] positive rows into f1
    pair_valid: jnp.ndarray,  # [P] 1/0
    temperature: float = 0.4,
):
    """PointInfoNCE: in-batch softmax CE where pair i's positive is the
    diagonal and every other sampled pair's key is a negative
    (ddp_trainer.py:420-426)."""
    q = jnp.take(f0, q_idx, axis=0)
    k = jnp.take(f1, k_idx, axis=0)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / temperature
    # Invalid columns must not act as negatives; invalid rows drop out of the
    # mean. (A padded row's diagonal is also masked, but its row is unused.)
    neg_inf = jnp.asarray(-1e9, logits.dtype)
    col_mask = pair_valid[None, :] > 0
    diag = jnp.eye(logits.shape[0], dtype=bool)
    logits = jnp.where(col_mask | diag, logits, neg_inf)
    logp = jax.nn.log_softmax(logits, axis=1)
    per_pair = -jnp.diagonal(logp)
    return _masked_mean(per_pair, pair_valid)


def _packed_bit(packed: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Row-wise bit test of a little-endian bit-packed [P, H/8] uint8 map:
    returns packed[i, col[i]//8] bit (col[i] % 8) as bool [P].  The pack
    happens host-side in the collator (np.packbits bitorder='little') —
    shipping bits instead of bools cuts the H2D bitmap payload 8x."""
    byte = jnp.take_along_axis(packed, (col[:, None] >> 3), axis=1)[:, 0]
    return ((byte >> (col & 7).astype(byte.dtype)) & 1).astype(bool)


def _pdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix, matching the reference's
    sqrt(||a-b||^2 + 1e-7) (ddp_trainer.py:184-186)."""
    d2 = (
        jnp.sum(a * a, axis=1)[:, None]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        + jnp.sum(b * b, axis=1)[None, :]
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-7)


def hardest_contrastive_loss(
    f0: jnp.ndarray,  # [N0, C]
    f1: jnp.ndarray,  # [N1, C]
    pos0_idx: jnp.ndarray,  # [P] sampled positive-pair anchors into f0
    pos1_idx: jnp.ndarray,  # [P] ... into f1
    pos_valid: jnp.ndarray,  # [P]
    cand0_idx: jnp.ndarray,  # [H] negative candidate rows into f0
    cand0_valid: jnp.ndarray,  # [H]
    cand1_idx: jnp.ndarray,  # [H] candidate rows into f1
    cand1_valid: jnp.ndarray,  # [H]
    collide0: jnp.ndarray,  # [P, H/8] uint8, bit j of byte b set iff
    #                          (pos0_idx[i], cand1_idx[b*8+j]) is a true pair
    collide1: jnp.ndarray,  # [P, H/8] uint8 likewise for (cand0, pos1)
    pos_thresh: float = 0.1,
    neg_thresh: float = 1.4,
):
    """Hardest-negative contrastive loss (ddp_trainer.py:186-238).

    Matches the reference semantics exactly: the hardest negative is the
    *unmasked* argmin over candidates; anchors whose hardest negative
    collides with a true positive pair are dropped from the negative loss
    (not re-mined), via the precomputed collision bitmaps.

    Returns (pos_loss, neg_loss).
    """
    pos_f0 = jnp.take(f0, pos0_idx, axis=0)
    pos_f1 = jnp.take(f1, pos1_idx, axis=0)
    sub_f0 = jnp.take(f0, cand0_idx, axis=0)
    sub_f1 = jnp.take(f1, cand1_idx, axis=0)

    big = jnp.asarray(1e9, jnp.float32)
    d01 = jnp.where(cand1_valid[None, :] > 0, _pdist(pos_f0, sub_f1), big)
    d10 = jnp.where(cand0_valid[None, :] > 0, _pdist(pos_f1, sub_f0), big)

    d01_min = jnp.min(d01, axis=1)
    d01_ind = jnp.argmin(d01, axis=1)
    d10_min = jnp.min(d10, axis=1)
    d10_ind = jnp.argmin(d10, axis=1)

    hit0 = _packed_bit(collide0, d01_ind)
    hit1 = _packed_bit(collide1, d10_ind)
    mask0 = (pos_valid > 0) & ~hit0
    mask1 = (pos_valid > 0) & ~hit1

    pos_d2 = jnp.sum(jnp.square(pos_f0 - pos_f1), axis=1)
    pos_loss = _masked_mean(jax.nn.relu(pos_d2 - pos_thresh), pos_valid)
    neg0 = _masked_mean(jnp.square(jax.nn.relu(neg_thresh - d01_min)), mask0)
    neg1 = _masked_mean(jnp.square(jax.nn.relu(neg_thresh - d10_min)), mask1)
    return pos_loss, 0.5 * (neg0 + neg1)
