"""Dataset registry (mirrors
/root/reference/downstream/semseg/lib/datasets/__init__.py:10-33)."""
from __future__ import annotations

from pointcontrast_tpu.semseg.datasets import scannet, stanford, synthetic

DATASETS: list = []


def _add(module):
    DATASETS.extend(
        getattr(module, a)
        for a in dir(module)
        if "Dataset" in a and isinstance(getattr(module, a), type)
    )


_add(scannet)
_add(stanford)
_add(synthetic)


def load_dataset(name: str):
    mdict = {d.__name__: d for d in DATASETS}
    if name not in mdict:
        raise ValueError(
            f"Dataset {name} not defined; options: {sorted(mdict)}"
        )
    return mdict[name]
