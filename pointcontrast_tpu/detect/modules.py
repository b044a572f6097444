"""PointNet++ building blocks as flax modules (channels-last).

Mirrors the reference wrappers over the CUDA extension:
  - SharedMLP (pytorch_utils.py:11-87): Dense+BN+ReLU stacks applied
    pointwise (1x1 convs in torch layout == Dense in channels-last).
  - QueryAndGroup (pointnet2_utils.py:294-377): ball query + grouping with
    centered, radius-normalized relative xyz concatenated to features.
  - PointnetSAModuleVotes (pointnet2_modules.py:90-170): FPS (or given
    inds) -> group -> MLP -> max-pool.
  - PointnetFPModule (pointnet2_modules.py:173-215): three_nn inverse-
    distance interpolation + skip concat + MLP.

Layouts: xyz [B, N, 3]; features [B, N, C] (channels LAST — torch uses
[B, C, N]; transposition happens only in checkpoint converters).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcontrast_tpu.detect import ops


class SharedMLP(nn.Module):
    """Dense + BN + ReLU per layer, applied to the trailing channel dim."""

    channels: Sequence[int]
    bn: bool = True
    activation: bool = True
    bn_momentum: float = 0.1  # torch BatchNorm default

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.bn, name=f"layer{i}")(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=1.0 - self.bn_momentum,
                    name=f"bn{i}",
                )(x)
            if self.activation:
                x = nn.relu(x)
        return x


def query_and_group(
    xyz, new_xyz, features, radius: float, nsample: int,
    use_xyz: bool = True, normalize_xyz: bool = False,
):
    """-> grouped [B, M, nsample, 3+C or C], idx [B, M, nsample]."""
    idx = ops.ball_query(new_xyz, xyz, radius, nsample)
    b, m, s = idx.shape
    grouped_xyz = jnp.take_along_axis(
        xyz[:, None, :, :], idx[:, :, :, None], axis=2
    )  # [B, M, S, 3]
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_feats = jnp.take_along_axis(
            features[:, None, :, :], idx[:, :, :, None], axis=2
        )  # [B, M, S, C]
        if use_xyz:
            out = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            out = grouped_feats
    else:
        out = grouped_xyz
    return out, idx


class PointnetSAModuleVotes(nn.Module):
    """Single-scale set abstraction with optional externally-supplied
    sample inds (vote aggregation uses seed-FPS inds)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, xyz, features, inds=None, train: bool = True):
        if inds is None:
            inds = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = jnp.take_along_axis(xyz, inds[:, :, None], axis=1)
        grouped, _idx = query_and_group(
            xyz, new_xyz, features, self.radius, self.nsample,
            use_xyz=self.use_xyz, normalize_xyz=self.normalize_xyz,
        )  # [B, M, S, C']
        out = SharedMLP(self.mlp, bn_momentum=self.bn_momentum, name="mlp")(
            grouped, train=train
        )
        out = jnp.max(out, axis=2)  # [B, M, mlp[-1]]
        return new_xyz, out, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: interpolate known->unknown + skip concat + MLP."""

    mlp: Sequence[int]
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = True):
        dist, idx = ops.three_nn(unknown_xyz, known_xyz)
        w = ops.interpolation_weights(dist)
        # channels-last interpolate: [B, M, C] -> [B, N, C]
        g = jnp.take_along_axis(
            known_feats[:, None, :, :],
            idx[:, :, :, None], axis=2,
        )  # [B, N, 3, C]
        interp = jnp.sum(g * w[:, :, :, None], axis=2)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, bn_momentum=self.bn_momentum, name="mlp")(
            interp, train=train
        )


class VotingModule(nn.Module):
    """Per-seed vote generation (reference models/voting_module.py:16-65):
    2x Dense-BN-ReLU then a head emitting (offset3 + feature residual) per
    vote."""

    vote_factor: int
    seed_feature_dim: int
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, seed_xyz, seed_features, train: bool = True):
        b, num_seed, _ = seed_xyz.shape
        c = self.seed_feature_dim
        m = 1.0 - self.bn_momentum
        net = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=m, name="bn1")(
                nn.Dense(c, use_bias=False, name="conv1")(seed_features)
            )
        )
        net = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=m, name="bn2")(
                nn.Dense(c, use_bias=False, name="conv2")(net)
            )
        )
        net = nn.Dense((3 + c) * self.vote_factor, name="conv3")(net)
        net = net.reshape(b, num_seed, self.vote_factor, 3 + c)
        offset = net[:, :, :, 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(
            b, num_seed * self.vote_factor, 3
        )
        residual = net[:, :, :, 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            b, num_seed * self.vote_factor, c
        )
        return vote_xyz, vote_features


class ProposalModule(nn.Module):
    """Vote clustering + box/class decoding
    (reference models/proposal_module.py:18-113)."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: Any  # [num_size_cluster, 3] numpy
    num_proposal: int
    sampling: str = "vote_fps"
    seed_feat_dim: int = 256
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, xyz, features, end_points, train: bool = True,
                 rng=None):
        agg = PointnetSAModuleVotes(
            npoint=self.num_proposal, radius=0.3, nsample=16,
            mlp=[128, 128, 128], use_xyz=True, normalize_xyz=True,
            bn_momentum=self.bn_momentum, name="vote_aggregation",
        )
        if self.sampling == "vote_fps":
            new_xyz, feats, sample_inds = agg(xyz, features, train=train)
        elif self.sampling == "seed_fps":
            sample_inds = ops.furthest_point_sample(
                end_points["seed_xyz"], self.num_proposal
            )
            new_xyz, feats, _ = agg(xyz, features, inds=sample_inds, train=train)
        elif self.sampling == "random":
            b = xyz.shape[0]
            num_seed = end_points["seed_xyz"].shape[1]
            key = rng if rng is not None else jax.random.PRNGKey(0)
            sample_inds = jax.random.randint(
                key, (b, self.num_proposal), 0, num_seed, dtype=jnp.int32
            )
            new_xyz, feats, _ = agg(xyz, features, inds=sample_inds, train=train)
        else:
            raise ValueError(f"unknown sampling {self.sampling!r}")

        end_points["aggregated_vote_xyz"] = new_xyz
        end_points["aggregated_vote_inds"] = sample_inds

        m = 1.0 - self.bn_momentum
        net = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=m, name="bn1")(
                nn.Dense(128, use_bias=False, name="conv1")(feats)
            )
        )
        net = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=m, name="bn2")(
                nn.Dense(128, use_bias=False, name="conv2")(net)
            )
        )
        out_dim = (
            2 + 3 + self.num_heading_bin * 2 + self.num_size_cluster * 4
            + self.num_class
        )
        net = nn.Dense(out_dim, name="conv3")(net)
        return decode_scores(
            net, end_points, self.num_class, self.num_heading_bin,
            self.num_size_cluster, self.mean_size_arr,
        )


def decode_scores(net, end_points, num_class, num_heading_bin,
                  num_size_cluster, mean_size_arr):
    """Split the proposal head output into semantic fields
    (reference proposal_module.py:18-44). net: [B, num_proposal, D]."""
    import numpy as np

    b, num_proposal, _ = net.shape
    nh, ns = num_heading_bin, num_size_cluster
    end_points["objectness_scores"] = net[:, :, 0:2]
    base_xyz = end_points["aggregated_vote_xyz"]
    end_points["center"] = base_xyz + net[:, :, 2:5]
    end_points["heading_scores"] = net[:, :, 5 : 5 + nh]
    hrn = net[:, :, 5 + nh : 5 + nh * 2]
    end_points["heading_residuals_normalized"] = hrn
    end_points["heading_residuals"] = hrn * (np.pi / max(nh, 1))
    end_points["size_scores"] = net[:, :, 5 + nh * 2 : 5 + nh * 2 + ns]
    srn = net[:, :, 5 + nh * 2 + ns : 5 + nh * 2 + ns * 4].reshape(
        b, num_proposal, ns, 3
    )
    end_points["size_residuals_normalized"] = srn
    end_points["size_residuals"] = srn * jnp.asarray(
        np.asarray(mean_size_arr, dtype=np.float32)
    )[None, None, :, :]
    end_points["sem_cls_scores"] = net[:, :, 5 + nh * 2 + ns * 4 :]
    return end_points
