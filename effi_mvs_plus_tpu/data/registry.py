"""Dataset registry (reference: datasets/__init__.py:5-8)."""

from __future__ import annotations

from effi_mvs_plus_tpu.data import datasets as _ds

_REGISTRY = {
    "dtu_yao": _ds.DTUTrainDataset,
    "dtu": _ds.DTUTrainDataset,
    "general_eval": _ds.GeneralEvalDataset,
    "blend": _ds.BlendedMVSDataset,
    "blendedmvs": _ds.BlendedMVSDataset,
    "tank": _ds.TanksDataset,
    "tanks": _ds.TanksDataset,
}


def find_dataset(name):
    return _REGISTRY[name]


def register_dataset(name, cls):
    """Register a custom dataset class/factory under `name` (usable as
    --dataset in the CLIs)."""
    _REGISTRY[name] = cls
