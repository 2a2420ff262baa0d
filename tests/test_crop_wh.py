"""--crop_wh semantics (ADVICE r3 medium): a crop smaller than the
native rectified images must centre-crop the images, shift the cam
intrinsics' principal point to match, and crop the GT pyramids
consistently — so the crop is valid on real-DTU-shaped data, not only
on trees rendered at the crop size."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import synth_dtu_dataset as g
    g.set_resolution(160, 128)
    root = str(tmp_path_factory.mktemp("dtu_crop"))
    scans = g.build(root, n_scans=1, n_refs=4, seed=3)
    lst = os.path.join(root, "train.txt")
    with open(lst, "w") as f:
        f.write("\n".join(scans) + "\n")
    g.set_resolution(640, 512)
    return root, lst


def _ds(tree, crop_wh):
    from effi_mvs_plus_tpu.data.datasets import DTUTrainDataset
    root, lst = tree
    return DTUTrainDataset(root, lst, "test", 3, crop_wh=crop_wh)


def test_crop_images_and_gt_consistent(tree):
    full = _ds(tree, (160, 128))[0]
    crop = _ds(tree, (96, 64))[0]
    sh, sw = (128 - 64) // 2, (160 - 96) // 2
    assert crop["imgs"].shape[1:3] == (64, 96)
    np.testing.assert_array_equal(
        crop["imgs"], full["imgs"][:, sh:sh + 64, sw:sw + 96])
    # centre crops compose: GT cropped directly from the half-res raw
    # equals the crop of the full-size GT
    np.testing.assert_array_equal(
        crop["depth"]["stage4"],
        full["depth"]["stage4"][sh:sh + 64, sw:sw + 96])
    np.testing.assert_array_equal(
        crop["mask"]["stage4"],
        full["mask"]["stage4"][sh:sh + 64, sw:sw + 96])


def test_crop_shifts_principal_point(tree):
    """A world point projecting to full-image pixel (u,v) must project to
    (u-sw, v-sh) in the cropped camera — at FULL resolution (stage4).
    Catches both a missing shift and a mis-scaled one (cam files carry
    quarter-res intrinsics)."""
    full = _ds(tree, (160, 128))[0]
    crop = _ds(tree, (96, 64))[0]
    sh, sw = 32, 32

    def project(pm, X):
        p = pm[1][:3, :3] @ (pm[0][:3, :3] @ X + pm[0][:3, 3])
        return p[:2] / p[2]

    X = np.array([30.0, -12.0, 600.0], np.float32)
    for v in range(3):
        uf = project(full["proj_matrices"]["stage4"][v], X)
        uc = project(crop["proj_matrices"]["stage4"][v], X)
        np.testing.assert_allclose(uf - uc, [sw, sh], atol=1e-3)
        # extrinsics untouched
        np.testing.assert_array_equal(
            full["proj_matrices"]["stage4"][v][0],
            crop["proj_matrices"]["stage4"][v][0])


def test_crop_larger_than_image_rejected(tree):
    ds = _ds(tree, (320, 256))
    with pytest.raises(ValueError, match="crop"):
        ds[0]


def test_device_cache_parity_under_crop(tree):
    """Cached batches must equal streamed batches when the crop is a true
    crop (images natively larger), not only at crop-sized trees."""
    from effi_mvs_plus_tpu.data.device_cache import DeviceCacheLoader
    from effi_mvs_plus_tpu.data.loader import Loader
    ds = _ds(tree, (96, 64))
    ld = Loader(ds, 2, shuffle=False, drop_last=True, num_workers=1)
    dc = DeviceCacheLoader(ds, 2, shuffle=False, drop_last=True)
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
