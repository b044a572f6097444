"""VoteNet losses.

Behavioral mirror of
/root/reference/downstream/votenet_det_new/models/loss_helper.py:18-247 and
lib/utils/nn_distance.py:15-94, jit-friendly (all masked sums, no boolean
indexing).  Total = vote + 0.5*objectness + box + 0.1*sem_cls, x10; box =
center + 0.1*heading_cls + heading_reg + 0.1*size_cls + size_reg.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def huber_loss(error, delta: float = 1.0):
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


def nn_distance(pc1, pc2, l1smooth: bool = False, delta: float = 1.0,
                l1: bool = False):
    """Batched bidirectional nearest-neighbor distances.
    pc1 [B,N,C], pc2 [B,M,C] -> (dist1 [B,N], idx1, dist2 [B,M], idx2)."""
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]
    if l1smooth:
        d = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff * diff, axis=-1)
    return (
        jnp.min(d, axis=2), jnp.argmin(d, axis=2),
        jnp.min(d, axis=1), jnp.argmin(d, axis=1),
    )


def _masked_sum_mean(x, mask):
    return jnp.sum(x * mask) / (jnp.sum(mask) + 1e-6)


def _ce(logits, labels):
    """Per-element softmax CE, logits [..., C], labels [...] int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def compute_vote_loss(end_points):
    """loss_helper.py:18-64: min-of-min l1 Chamfer from predicted votes to
    the (up to 3) GT votes of each object seed."""
    b, num_seed, _ = end_points["seed_xyz"].shape
    vote_xyz = end_points["vote_xyz"]  # [B, num_seed*vf, 3]
    seed_inds = end_points["seed_inds"]  # [B, num_seed]

    seed_gt_votes_mask = jnp.take_along_axis(
        end_points["vote_label_mask"], seed_inds, axis=1
    )
    seed_gt_votes = jnp.take_along_axis(
        end_points["vote_label"], seed_inds[:, :, None], axis=1
    )  # [B, num_seed, 9]
    seed_gt_votes = seed_gt_votes + jnp.tile(end_points["seed_xyz"], (1, 1, 3))

    vf = vote_xyz.shape[1] // num_seed
    vote_r = vote_xyz.reshape(b * num_seed, vf, 3)
    gt_r = seed_gt_votes.reshape(b * num_seed, GT_VOTE_FACTOR, 3)
    _d1, _i1, dist2, _i2 = nn_distance(vote_r, gt_r, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(b, num_seed)
    return _masked_sum_mean(votes_dist, seed_gt_votes_mask.astype(jnp.float32))


def compute_objectness_loss(end_points):
    """loss_helper.py:66-105."""
    aggregated_vote_xyz = end_points["aggregated_vote_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, ind1, _d2, _i2 = nn_distance(aggregated_vote_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > FAR_THRESHOLD)
    ).astype(jnp.float32)

    scores = end_points["objectness_scores"]  # [B, K, 2]
    w = jnp.asarray(OBJECTNESS_CLS_WEIGHTS)
    ce = _ce(scores, objectness_label) * jnp.take(w, objectness_label)
    objectness_loss = _masked_sum_mean(ce, objectness_mask)
    return objectness_loss, objectness_label, objectness_mask, ind1


def compute_box_and_sem_cls_loss(end_points, config):
    """loss_helper.py:107-182."""
    nh = config.num_heading_bin
    ns = config.num_size_cluster
    mean_size_arr = np.asarray(config.mean_size_arr, dtype=np.float32)

    assignment = end_points["object_assignment"]  # [B, K]
    objectness_label = end_points["objectness_label"].astype(jnp.float32)
    box_label_mask = end_points["box_label_mask"]

    # center: bidirectional Chamfer
    pred_center = end_points["center"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, _i1, dist2, _i2 = nn_distance(pred_center, gt_center)
    center_loss = _masked_sum_mean(dist1, objectness_label) + _masked_sum_mean(
        dist2, box_label_mask
    )

    # heading
    heading_class_label = jnp.take_along_axis(
        end_points["heading_class_label"], assignment, axis=1
    )
    heading_class_loss = _masked_sum_mean(
        _ce(end_points["heading_scores"], heading_class_label), objectness_label
    )
    heading_residual_label = jnp.take_along_axis(
        end_points["heading_residual_label"], assignment, axis=1
    )
    hr_norm_label = heading_residual_label / (np.pi / max(nh, 1))
    hl_one_hot = jax.nn.one_hot(heading_class_label, nh)
    hr_pred = jnp.sum(
        end_points["heading_residuals_normalized"] * hl_one_hot, axis=-1
    )
    heading_reg_loss = _masked_sum_mean(
        huber_loss(hr_pred - hr_norm_label, 1.0), objectness_label
    )

    # size
    size_class_label = jnp.take_along_axis(
        end_points["size_class_label"], assignment, axis=1
    )
    size_class_loss = _masked_sum_mean(
        _ce(end_points["size_scores"], size_class_label), objectness_label
    )
    size_residual_label = jnp.take_along_axis(
        end_points["size_residual_label"], assignment[:, :, None], axis=1
    )  # [B, K, 3]
    sl_one_hot = jax.nn.one_hot(size_class_label, ns)  # [B, K, ns]
    sr_pred = jnp.sum(
        end_points["size_residuals_normalized"] * sl_one_hot[:, :, :, None], axis=2
    )  # [B, K, 3]
    mean_size_label = jnp.sum(
        sl_one_hot[:, :, :, None] * jnp.asarray(mean_size_arr)[None, None], axis=2
    )
    sr_label_norm = size_residual_label / jnp.maximum(mean_size_label, 1e-6)
    size_reg_loss = _masked_sum_mean(
        jnp.mean(huber_loss(sr_pred - sr_label_norm, 1.0), axis=-1),
        objectness_label,
    )

    # semantic class
    sem_cls_label = jnp.take_along_axis(
        end_points["sem_cls_label"], assignment, axis=1
    )
    sem_cls_loss = _masked_sum_mean(
        _ce(end_points["sem_cls_scores"], sem_cls_label), objectness_label
    )
    return (center_loss, heading_class_loss, heading_reg_loss,
            size_class_loss, size_reg_loss, sem_cls_loss)


def compute_objectness_loss_boxnet(end_points):
    """BoxNet variant (loss_helper_boxnet.py:20-60): objectness label is the
    seed point's GT vote mask (no near/far gray zone — mask is all ones);
    assignment still via nearest GT center."""
    aggregated_vote_xyz = end_points["aggregated_vote_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    _d1, ind1, _d2, _i2 = nn_distance(aggregated_vote_xyz, gt_center)

    seed_inds = end_points["seed_inds"]
    seed_labels = jnp.take_along_axis(
        end_points["vote_label_mask"], seed_inds, axis=1
    )
    end_points["seed_labels"] = seed_labels
    objectness_label = jnp.take_along_axis(
        seed_labels, end_points["aggregated_vote_inds"], axis=1
    ).astype(jnp.int32)
    objectness_mask = jnp.ones(objectness_label.shape, jnp.float32)

    scores = end_points["objectness_scores"]
    w = jnp.asarray(OBJECTNESS_CLS_WEIGHTS)
    ce = _ce(scores, objectness_label) * jnp.take(w, objectness_label)
    objectness_loss = _masked_sum_mean(ce, objectness_mask)
    return objectness_loss, objectness_label, objectness_mask, ind1


def get_loss_boxnet(end_points, config):
    """BoxNet total (loss_helper_boxnet.py:62-122): no vote loss,
    loss = (0.5*objectness + box + 0.1*sem_cls) * 10."""
    objectness_loss, objectness_label, objectness_mask, assignment = (
        compute_objectness_loss_boxnet(end_points)
    )
    end_points["objectness_loss"] = objectness_loss
    end_points["objectness_label"] = objectness_label
    end_points["objectness_mask"] = objectness_mask
    end_points["object_assignment"] = assignment
    total = objectness_label.shape[0] * objectness_label.shape[1]
    end_points["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total
    end_points["neg_ratio"] = (
        jnp.sum(objectness_mask) / total - end_points["pos_ratio"]
    )
    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
        end_points, config
    )
    end_points["center_loss"] = center_loss
    end_points["heading_cls_loss"] = heading_cls_loss
    end_points["heading_reg_loss"] = heading_reg_loss
    end_points["size_cls_loss"] = size_cls_loss
    end_points["size_reg_loss"] = size_reg_loss
    end_points["sem_cls_loss"] = sem_cls_loss
    box_loss = (
        center_loss + 0.1 * heading_cls_loss + heading_reg_loss
        + 0.1 * size_cls_loss + size_reg_loss
    )
    end_points["box_loss"] = box_loss
    loss = (0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss) * 10.0
    end_points["loss"] = loss
    end_points["vote_loss"] = jnp.zeros(())
    obj_pred = jnp.argmax(end_points["objectness_scores"], axis=2)
    end_points["obj_acc"] = _masked_sum_mean(
        (obj_pred == objectness_label).astype(jnp.float32), objectness_mask
    )
    return loss, end_points


def get_loss(end_points, config):
    """loss_helper.py:184-247. Returns (loss, end_points-with-metrics)."""
    vote_loss = compute_vote_loss(end_points)
    end_points["vote_loss"] = vote_loss

    objectness_loss, objectness_label, objectness_mask, assignment = (
        compute_objectness_loss(end_points)
    )
    end_points["objectness_loss"] = objectness_loss
    end_points["objectness_label"] = objectness_label
    end_points["objectness_mask"] = objectness_mask
    end_points["object_assignment"] = assignment
    total = objectness_label.shape[0] * objectness_label.shape[1]
    end_points["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total
    end_points["neg_ratio"] = (
        jnp.sum(objectness_mask) / total - end_points["pos_ratio"]
    )

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
        end_points, config
    )
    end_points["center_loss"] = center_loss
    end_points["heading_cls_loss"] = heading_cls_loss
    end_points["heading_reg_loss"] = heading_reg_loss
    end_points["size_cls_loss"] = size_cls_loss
    end_points["size_reg_loss"] = size_reg_loss
    end_points["sem_cls_loss"] = sem_cls_loss
    box_loss = (
        center_loss + 0.1 * heading_cls_loss + heading_reg_loss
        + 0.1 * size_cls_loss + size_reg_loss
    )
    end_points["box_loss"] = box_loss

    loss = (vote_loss + 0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss) * 10.0
    end_points["loss"] = loss

    obj_pred = jnp.argmax(end_points["objectness_scores"], axis=2)
    end_points["obj_acc"] = _masked_sum_mean(
        (obj_pred == objectness_label).astype(jnp.float32), objectness_mask
    )
    return loss, end_points
