"""VoteNet: deep Hough voting detector.

Mirrors /root/reference/downstream/votenet_det_new/models/votenet.py:27-127
and backbone_module.py:19-180.  Two backbones:

  - 'pointnet2': 4 SA layers (2048/1024/512/256 points) + 2 FP layers ->
    1024 seeds x 256-d;
  - 'sparseconv': Res16UNet34C over a voxel pyramid; voxel features are
    gathered back to points via a precomputed point->voxel index (the
    reference does a host roundtrip + per-sample python FPS loop,
    backbone_module.py:154-173; here it is one batched gather + batched FPS
    inside the same jitted program).

BoxNet (the no-voting ablation, models/boxnet.py) shares the pieces: set
``use_voting=False``.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pointcontrast_tpu.detect import ops
from pointcontrast_tpu.detect.modules import (
    PointnetFPModule,
    PointnetSAModuleVotes,
    ProposalModule,
    VotingModule,
)


class Pointnet2Backbone(nn.Module):
    """reference backbone_module.py:19-131 (SSG PointNet++)."""

    input_feature_dim: int = 0
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, pointcloud, end_points, train: bool = True):
        xyz = pointcloud[..., 0:3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        bnm = self.bn_momentum
        sa1 = PointnetSAModuleVotes(
            npoint=2048, radius=0.2, nsample=64,
            mlp=[64, 64, 128], bn_momentum=bnm, name="sa1",
        )
        sa2 = PointnetSAModuleVotes(
            npoint=1024, radius=0.4, nsample=32,
            mlp=[128, 128, 256], bn_momentum=bnm, name="sa2",
        )
        sa3 = PointnetSAModuleVotes(
            npoint=512, radius=0.8, nsample=16,
            mlp=[128, 128, 256], bn_momentum=bnm, name="sa3",
        )
        sa4 = PointnetSAModuleVotes(
            npoint=256, radius=1.2, nsample=16,
            mlp=[128, 128, 256], bn_momentum=bnm, name="sa4",
        )
        xyz1, feat1, inds1 = sa1(xyz, features, train=train)
        end_points["sa1_inds"], end_points["sa1_xyz"] = inds1, xyz1
        xyz2, feat2, _ = sa2(xyz1, feat1, train=train)
        end_points["sa2_xyz"] = xyz2
        xyz3, feat3, _ = sa3(xyz2, feat2, train=train)
        xyz4, feat4, _ = sa4(xyz3, feat3, train=train)

        f3 = PointnetFPModule(mlp=[256, 256], bn_momentum=bnm, name="fp1")(
            xyz3, xyz4, feat3, feat4, train=train
        )
        f2 = PointnetFPModule(mlp=[256, 256], bn_momentum=bnm, name="fp2")(
            xyz2, xyz3, feat2, f3, train=train
        )
        end_points["fp2_features"] = f2
        end_points["fp2_xyz"] = xyz2
        end_points["fp2_inds"] = inds1[:, : xyz2.shape[1]]
        return end_points


class SparseConvBackbone(nn.Module):
    """Res16UNet over voxels -> per-point features -> FPS seeds
    (reference backbone_module.py:134-180)."""

    input_feature_dim: int = 3
    output_feature_dim: int = 256
    num_seed: int = 1024
    model_name: str = "Res16UNet34C"
    bn_momentum: float = 0.1
    dtype: Any = None  # backbone activation dtype (heads stay f32)

    @nn.compact
    def __call__(self, pointcloud, voxel_feats, pyramid, point_voxel_idx,
                 end_points, train: bool = True):
        """point_voxel_idx: [B, N] int32 rows into the flat [npad0] voxel
        array (pad row for dropped points)."""
        from pointcontrast_tpu.nn.registry import load_model

        net = load_model(self.model_name)(
            in_channels=voxel_feats.shape[-1],
            out_channels=self.output_feature_dim,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="net",
        )
        # [npad0, C]; voting/proposal heads always run f32
        vout = net(voxel_feats, pyramid, train=train).astype(jnp.float32)
        b, n = point_voxel_idx.shape
        point_feats = jnp.take(vout, point_voxel_idx.reshape(-1), axis=0)
        point_feats = point_feats.reshape(b, n, -1)

        xyz = pointcloud[..., 0:3]
        seed_inds = ops.furthest_point_sample(xyz, self.num_seed)
        seed_xyz = jnp.take_along_axis(xyz, seed_inds[:, :, None], axis=1)
        seed_feats = jnp.take_along_axis(
            point_feats, seed_inds[:, :, None], axis=1
        )
        end_points["fp2_features"] = seed_feats
        end_points["fp2_xyz"] = seed_xyz
        end_points["fp2_inds"] = seed_inds
        return end_points


class VoteNet(nn.Module):
    """reference models/votenet.py:27-127 (+ BoxNet via use_voting=False,
    models/boxnet.py)."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: Any
    input_feature_dim: int = 0
    num_proposal: int = 128
    vote_factor: int = 1
    sampling: str = "vote_fps"
    backbone: str = "pointnet2"
    # sparseconv backbone net (reference selects it via the sparseconv
    # sub-package config, models/backbone/sparseconv/config.py)
    backbone_model: str = "Res16UNet34C"
    use_voting: bool = True
    bn_momentum: float = 0.1  # decayed per epoch by DetectTrainer (reference
    # pytorch_utils.BNMomentumScheduler, 0.5 halved every 20 epochs)
    dtype: Any = None  # sparseconv-backbone activation dtype (heads f32)

    @nn.compact
    def __call__(self, inputs: dict, train: bool = True):
        end_points: dict = {}
        if self.backbone == "pointnet2":
            end_points = Pointnet2Backbone(
                input_feature_dim=self.input_feature_dim,
                bn_momentum=self.bn_momentum, name="backbone_net",
            )(inputs["point_clouds"], end_points, train=train)
        else:
            end_points = SparseConvBackbone(
                input_feature_dim=self.input_feature_dim + 3,
                output_feature_dim=256,
                num_seed=1024,
                model_name=self.backbone_model,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name="backbone_net",
            )(
                inputs["point_clouds"], inputs["voxel_feats"],
                inputs["voxel_pyramid"], inputs["point_voxel_idx"],
                end_points, train=train,
            )

        xyz = end_points["fp2_xyz"]
        features = end_points["fp2_features"]
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = xyz
        end_points["seed_features"] = features

        if self.use_voting:
            xyz, features = VotingModule(
                self.vote_factor, 256, bn_momentum=self.bn_momentum, name="vgen"
            )(xyz, features, train=train)
            # L2-normalize vote features (votenet.py:120-121)
            norm = jnp.linalg.norm(features, axis=-1, keepdims=True)
            features = features / jnp.maximum(norm, 1e-8)
            end_points["vote_xyz"] = xyz
            end_points["vote_features"] = features

        end_points = ProposalModule(
            self.num_class, self.num_heading_bin, self.num_size_cluster,
            self.mean_size_arr, self.num_proposal,
            self.sampling if self.use_voting else "seed_fps",
            bn_momentum=self.bn_momentum,
            name="pnet",
        )(xyz, features, end_points, train=train)
        return end_points


class BoxNet(VoteNet):
    """Ablation without Hough voting (reference models/boxnet.py): proposals
    aggregate seed features directly via seed-FPS; paired with
    ``loss.get_loss_boxnet``."""

    use_voting: bool = False
    sampling: str = "seed_fps"
