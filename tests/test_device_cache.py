"""DeviceCacheLoader: HBM-cached batches must equal the streaming
Loader's batches bit-for-bit (deterministic eval mode), train mode must
produce valid sampled batches, and the budget guard must refuse
over-HBM datasets."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import synth_dtu_dataset as g
    g.W, g.H = 160, 128          # toy resolution for test speed
    root = str(tmp_path_factory.mktemp("dtu"))
    scans = g.build(root, n_scans=2, n_refs=6, seed=0)
    lst = os.path.join(root, "train.txt")
    with open(lst, "w") as f:
        f.write("\n".join(scans) + "\n")
    g.W, g.H = 640, 512
    return root, lst


def _dataset(tiny_tree, mode):
    from effi_mvs_plus_tpu.data.datasets import DTUTrainDataset
    root, lst = tiny_tree
    return DTUTrainDataset(root, lst, mode, 4, crop_wh=(160, 128))


def test_cache_matches_loader(tiny_tree):
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.data.device_cache import DeviceCacheLoader
    ds = _dataset(tiny_tree, "test")
    ld = Loader(ds, 3, shuffle=False, drop_last=True, num_workers=2)
    dc = DeviceCacheLoader(ds, 3, shuffle=False, drop_last=True)
    assert len(ld) == len(dc)
    for b_ref, b_dc in zip(ld, dc):
        b_ref.pop("filename", None)

        def cmp(a, b, path=""):
            if isinstance(a, dict):
                assert set(a) == set(b)
                for k in a:
                    cmp(a[k], b[k], path + "/" + k)
            else:
                a, b = np.asarray(a), np.asarray(b)
                assert a.shape == b.shape, path
                assert np.max(np.abs(a - b)) < 1e-6, path

        cmp(b_ref, b_dc)


def test_cache_train_mode_batches(tiny_tree):
    from effi_mvs_plus_tpu.data.device_cache import DeviceCacheLoader
    ds = _dataset(tiny_tree, "train")
    dc = DeviceCacheLoader(ds, 4, shuffle=True, seed=1, drop_last=True)
    b = next(iter(dc))
    assert np.asarray(b["imgs"]).shape == (4, 4, 128, 160, 3)
    assert np.isfinite(np.asarray(b["depth"]["stage4"])).all()
    assert 0.0 <= float(np.asarray(b["imgs"]).max()) <= 1.0
    # shuffling differs across epochs
    b2 = next(iter(dc))
    assert not np.allclose(np.asarray(b["imgs"]), np.asarray(b2["imgs"]))


def test_cache_budget_guard(tiny_tree):
    from effi_mvs_plus_tpu.data.device_cache import DeviceCacheLoader
    ds = _dataset(tiny_tree, "test")
    with pytest.raises(ValueError, match="device cache"):
        DeviceCacheLoader(ds, 2, budget_bytes=1000)
