"""Full inference path: PLY files on disk -> dataset -> model -> prediction
export in original coordinates -> full-pointcloud nearest-voxel eval."""
import os

import numpy as np
import pytest
import jax

from pointcontrast_tpu.data.collate import PadScheme
from pointcontrast_tpu.semseg.datasets.scannet import ScannetVoxelizationDataset
from pointcontrast_tpu.semseg.test import average_precision, test_model
from pointcontrast_tpu.utils.ply import save_ply


class TinyScannet(ScannetVoxelizationDataset):
    VOXEL_SIZE = 0.05


def _make_scene(rng, n=3000):
    """Labeled scene using two of the 20 valid ScanNet classes (raw nyu ids
    1=wall, 2=floor)."""
    floor = rng.rand(n // 2, 3) * [3, 3, 0.02]
    wall = rng.rand(n - n // 2, 3) * [3, 0.02, 1.5]
    coords = np.concatenate([floor, wall]).astype(np.float32)
    labels = np.concatenate(
        [np.full(len(floor), 2), np.full(len(wall), 1)]
    ).astype(np.int32)
    colors = np.stack(
        [40 + 100 * labels, 200 - 60 * labels, np.full_like(labels, 90)], 1
    ).astype(np.float32)
    return coords, colors, labels


@pytest.fixture(scope="module")
def ply_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_like")
    rng = np.random.RandomState(0)
    names = []
    for i in range(2):
        coords, colors, labels = _make_scene(rng)
        name = f"scene{i:04d}_00.ply"
        save_ply(str(root / name), coords, colors, labels)
        names.append(name)
    ds = TinyScannet(
        data_root=str(root), phase="val", data_paths=names, augment_data=False
    )
    return ds


class TestFullEval:
    def test_model_eval_and_fullcloud_transfer(self, ply_dataset, tmp_path):
        from pointcontrast_tpu.nn.res16unet import Res16UNetBase
        from pointcontrast_tpu.nn.resnet_block import BasicBlock
        from pointcontrast_tpu.train.state import create_train_state
        import optax

        class TinyUNet(Res16UNetBase):
            BLOCK = BasicBlock
            LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
            PLANES = (4, 8, 16, 32, 32, 16, 8, 8)
            INIT_DIM = 4

        ds = ply_dataset
        assert ds.num_classes == 20
        scheme = PadScheme(npad0=8192)
        model = TinyUNet(in_channels=3, out_channels=ds.num_classes)
        from pointcontrast_tpu.semseg.dataset import collate_semseg

        sample = ds[0]
        batch = collate_semseg([sample[:3]], scheme)
        state = create_train_state(
            jax.random.PRNGKey(0), model, optax.sgd(0.1),
            (batch.feats, batch.pyramid),
        )
        pred_dir = str(tmp_path / "preds")
        result = test_model(
            state, ds, ds.num_classes, scheme, save_pred_dir=pred_dir
        )
        assert np.isfinite(result["miou"])
        assert 0 <= result["acc"] <= 100
        assert os.path.exists(os.path.join(pred_dir, "pred_0000_00.npy"))
        pred = np.load(os.path.join(pred_dir, "pred_0000_00.npy"))
        assert pred.shape[1] == 4
        # exported labels are RAW nyu ids (invertible through label_map)
        assert set(np.unique(pred[:, 3]).astype(int)) <= set(range(41)) | {255}
        # coords are back in original meters (scene spans ~3m)
        assert pred[:, :3].max() < 10.0

        # full-pointcloud nearest-voxel transfer eval runs end to end
        miou, ious = ds.test_pointcloud(pred_dir)
        assert np.isfinite(miou)
        assert len(ious) == 20

    def test_average_precision_oracle(self):
        probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.3, 0.7], [0.2, 0.8]])
        labels = np.array([0, 0, 1, 1])
        aps = average_precision(probs, labels, 2)
        np.testing.assert_allclose(aps, [1.0, 1.0])
        # one wrong high-confidence prediction lowers AP
        probs_bad = np.array([[0.9, 0.1], [0.1, 0.9], [0.3, 0.7], [0.8, 0.2]])
        aps_bad = average_precision(probs_bad, labels, 2)
        assert aps_bad[0] < 1.0
