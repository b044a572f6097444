"""Model registry: name -> module class.

Mirrors the reference's registries
(/root/reference/pretrain/pointcontrast/model/__init__.py:8-31 and
/root/reference/downstream/semseg/models/__init__.py:16-59), which collect
every class whose name contains 'Net'."""
from __future__ import annotations

import inspect

from pointcontrast_tpu.nn import res16unet

MODELS: dict = {}


def _collect(module):
    for name, obj in inspect.getmembers(module, inspect.isclass):
        if "Net" in name and getattr(obj, "BLOCK", None) is not None:
            MODELS[name] = obj


_collect(res16unet)


def _collect_extra():
    """Families added after the core build (import lazily to keep cheap)."""
    import logging

    try:
        from pointcontrast_tpu.nn import resunet, resnet

        _collect(resunet)
        _collect(resnet)
    except ImportError:
        # never swallow silently: load_model would later raise a misleading
        # "model not found" for the whole ResUNet/ResNet families
        logging.getLogger(__name__).exception(
            "ResUNet/ResNet model families failed to import and are "
            "missing from the registry"
        )


_collect_extra()


def load_model(name: str):
    if name not in MODELS:
        raise KeyError(
            f"model {name!r} not found; available: {sorted(MODELS)}"
        )
    return MODELS[name]
