"""Data codecs: PFM/cam/pair round-trips and parity with the reference
readers; loader collation."""

import os

import numpy as np

from effi_mvs_plus_tpu.data import (read_pfm, save_pfm, read_cam_file,
                                    write_cam_file, read_pair_file)
from effi_mvs_plus_tpu.data.cams import (stage_proj_matrices,
                                         inverse_depth_values)
from effi_mvs_plus_tpu.data.loader import Loader, _collate


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 900, (37, 53)).astype(np.float32)
    p = tmp_path / "d.pfm"
    save_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_matches_reference_codec(tmp_path):
    import sys
    import types
    if "torchvision" not in sys.modules:  # reference data_io pulls it in
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.Compose = lambda *a, **k: None
        tf.ToTensor = lambda *a, **k: None
        tf.Normalize = lambda *a, **k: None
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    sys.path.insert(0, "/root/reference")
    from datasets.data_io import read_pfm as ref_read, save_pfm as ref_save

    img = np.random.default_rng(1).standard_normal((21, 17)).astype(np.float32)
    ours = tmp_path / "ours.pfm"
    theirs = tmp_path / "theirs.pfm"
    save_pfm(ours, img)
    ref_save(str(theirs), img)
    # cross-read
    np.testing.assert_array_equal(ref_read(str(ours))[0], img)
    np.testing.assert_array_equal(read_pfm(theirs)[0], img)


def test_cam_file_roundtrip(tmp_path):
    ext = np.random.default_rng(2).standard_normal((4, 4)).astype(np.float32)
    ext[3] = [0, 0, 0, 1]
    intr = np.array([[361.5, 0, 80.2], [0, 360.1, 66.7], [0, 0, 1]],
                    np.float32)
    p = tmp_path / "c_cam.txt"
    write_cam_file(p, ext, intr, [425.0, 2.5, 384, 935.0])
    cam = read_cam_file(p)
    np.testing.assert_allclose(cam["extrinsics"], ext, rtol=1e-6)
    np.testing.assert_allclose(cam["intrinsics"], intr, rtol=1e-6)
    assert cam["depth_fields"][:2] == [425.0, 2.5]


def test_pair_file_parses_reference_format(tmp_path):
    p = tmp_path / "pair.txt"
    p.write_text("2\n0\n3 10 2.5 11 2.1 12 1.9\n1\n2 10 2.2 13 1.0\n")
    pairs = read_pair_file(p)
    assert pairs == [(0, [10, 11, 12]), (1, [10, 13])]


def test_stage_proj_matrices_scaling():
    ext = np.eye(4, dtype=np.float32)
    intr = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]], np.float32)
    stages = stage_proj_matrices(ext, intr)
    assert set(stages) == {f"stage{i}" for i in range(5)}
    np.testing.assert_allclose(stages["stage2"][1, 0, 0], 100.0)
    np.testing.assert_allclose(stages["stage1"][1, 0, 0], 50.0)
    np.testing.assert_allclose(stages["stage4"][1, 1, 1], 400.0)
    # row 2 of K never scales; extrinsics identical across stages
    for s in stages.values():
        np.testing.assert_allclose(s[1, 2, 2], 1.0)
        np.testing.assert_allclose(s[0], ext)


def test_inverse_depth_values_ordering():
    dv = inverse_depth_values(425.0, 2.5 * 0.53, 384)
    assert dv.shape == (384,)
    assert dv[0] < dv[-1]                       # ascending inverse depth
    assert abs(1.0 / dv[-1] - 425.0) < 1e-3     # max disp = 1/depth_min
    dv_rev = inverse_depth_values(425.0, 2.5 * 0.53, 384, disp_max_first=True)
    np.testing.assert_allclose(dv_rev, dv[::-1], rtol=1e-6)


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((4, 3), i, np.float32), "i": i,
                "name": f"item{i}"}


def test_loader_batches_and_prefetch():
    ld = Loader(_ToyDataset(), batch_size=4, shuffle=False, num_workers=2)
    batches = list(ld)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 4, 3)
    np.testing.assert_array_equal(batches[0]["i"], [0, 1, 2, 3])
    assert batches[2]["x"].shape == (2, 4, 3)
    assert batches[0]["name"] == ["item0", "item1", "item2", "item3"]

    ld2 = Loader(_ToyDataset(), batch_size=4, shuffle=True, drop_last=True,
                 seed=1)
    b2 = list(ld2)
    assert len(b2) == 2
    all_idx = np.concatenate([b["i"] for b in b2])
    assert len(set(all_idx.tolist())) == 8


def test_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise RuntimeError("boom")

    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        list(Loader(Bad(), batch_size=1))
