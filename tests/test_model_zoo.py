"""Model-zoo coverage: every registered family builds and runs forward."""
import numpy as np
import pytest
import jax

from pointcontrast_tpu.nn.registry import MODELS, load_model
from pointcontrast_tpu.sparse.quantize import sparse_quantize
from pointcontrast_tpu.sparse.topology import build_pyramid


def _pyramid_3d(levels=6, n=900, seed=0, down3=True):
    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [np.zeros((n, 1), int), rng.randint(0, 40, (n, 3))], 1
    )
    uc = coords[sparse_quantize(coords, return_index=True)]
    pyr, meta = build_pyramid(uc, levels, build_down3=down3)
    feats = np.zeros((meta.npads[0], 3), np.float32)
    feats[: meta.counts[0]] = 1.0
    return pyr, feats, meta


def _pyramid_4d(levels=5, n=900, seed=0, region="hybrid"):
    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [np.zeros((n, 1), int), rng.randint(0, 30, (n, 3)),
         rng.randint(0, 3, (n, 1))], 1
    )
    uc = coords[sparse_quantize(coords, return_index=True)]
    kwargs = dict(stride_axes=(True, True, True, False))
    if region == "hybrid":
        kwargs["axis_types"] = ("hypercube",) * 3 + ("hypercross",)
    pyr, meta = build_pyramid(uc, levels, dimension=4, region=region, **kwargs)
    feats = np.zeros((meta.npads[0], 3), np.float32)
    feats[: meta.counts[0]] = 1.0
    return pyr, feats, meta


def _run(model, feats, pyr):
    v = jax.jit(lambda r, f, p: model.init(r, f, p, train=False))(
        jax.random.PRNGKey(0), feats, pyr
    )
    out = model.apply(v, feats, pyr, train=False)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    return arr


class TestRegistry:
    def test_inventory_size(self):
        # the reference zoo: 22 Res16UNet + 26 ResUNet/MinkUNet + 15 ResNet
        # (SURVEY section 2.3); everything registered and loadable
        assert len(MODELS) >= 60
        for required in [
            "Res16UNet34C", "Res16UNet14A", "ResUNet14", "ResUNet18INBN",
            "MinkUNetHyper14INBN", "ResNet14", "ResNet50",
            "STRes16UNet14", "STResUNet14", "STResNet14",
            "STResTesseractUNet14", "STResTesseract16UNet18A",
        ]:
            assert load_model(required) is not None

    def test_res16unet_smallest(self):
        pyr, feats, meta = _pyramid_3d(levels=5)
        m = load_model("Res16UNet14A")(in_channels=3, out_channels=6)
        out = _run(m, feats, pyr)
        assert out.shape == (meta.npads[0], 6)

    def test_resunet_and_hyper(self):
        pyr, feats, meta = _pyramid_3d(levels=4)
        for name in ["ResUNet14", "MinkUNetHyper14INBN"]:
            m = load_model(name)(in_channels=3, out_channels=5)
            out = _run(m, feats, pyr)
            assert out.shape == (meta.npads[0], 5)

    def test_resnet_strided(self):
        pyr, feats, meta = _pyramid_3d(levels=6, down3=True)
        m = load_model("ResNet14")(in_channels=3, out_channels=5)
        out = _run(m, feats, pyr)
        assert out.shape == (meta.npads[5], 5)  # pixel-dist 32 output

    def test_st_4d_hybrid(self):
        pyr, feats, meta = _pyramid_4d(levels=5)
        m = load_model("STRes16UNet14")(in_channels=3, out_channels=5,
                                        dimension=4)
        out = _run(m, feats, pyr)
        assert out.shape == (meta.npads[0], 5)

    def test_st_4d_tesseract(self):
        pyr, feats, meta = _pyramid_4d(levels=4, region="hypercube")
        m = load_model("STResTesseractUNet14")(in_channels=3, out_channels=5,
                                               dimension=4)
        out = _run(m, feats, pyr)
        assert out.shape == (meta.npads[0], 5)
        # full 4D hypercube kernel: 3^4 = 81 offsets
        assert pyr.levels[0].nbr.shape[0] == 81
