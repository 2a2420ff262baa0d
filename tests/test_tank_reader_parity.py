"""Tanks & Temples reader parity: synthetic scene trees in the standard
preprocessed layout (cams_1/, pair.txt, native-size jpgs), compared
sample-for-sample against the reference tank reader — covering BOTH cam
line-11 variants (2-field [min max] and 4-field [min interval num max],
reference tank.py:88-94)."""

import os

import numpy as np
import pytest

from conftest import load_reference_models  # noqa: F401


def _build_tank_tree(root, scan, depth_fields, n_views=3, wh=(1920, 1080)):
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio

    rng = np.random.default_rng(hash(scan) % 2**31)
    base = os.path.join(root, "intermediate", scan)
    os.makedirs(os.path.join(base, "cams_1"), exist_ok=True)
    os.makedirs(os.path.join(base, "images"), exist_ok=True)

    with open(os.path.join(base, "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} 10.0" for s in srcs) + "\n")

    w, h = wh
    K = np.array([[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]],
                 np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [100.0 * v, 0, 0]
        camio.write_cam_file(
            os.path.join(base, "cams_1", f"{v:08d}_cam.txt"),
            E, K, depth_fields)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(base, "images", f"{v:08d}.jpg"))


@pytest.mark.slow
@pytest.mark.parametrize("scan,depth_fields", [
    ("Horse", [425.0, 935.0]),                  # 2-field: [min, max]
    ("Family", [425.0, 2.5, 192.0, 935.0]),     # 4-field: max = field 3
])
def test_tank_reader_matches_reference(tmp_path, scan, depth_fields):
    load_reference_models()
    from datasets.tank import MVSDataset as RefDataset

    from effi_mvs_plus_tpu.data.datasets import TanksDataset

    root = str(tmp_path)
    _build_tank_tree(root, scan, depth_fields)

    ref_ds = RefDataset(root, n_views=3, ndepths=192,
                        split="intermediate", scan=[scan])
    our_ds = TanksDataset(root, [scan], nviews=3, ndepths=192)

    assert len(ref_ds) == len(our_ds) == 3

    for i in (0, 2):
        r = ref_ds[i]
        o = our_ds[i]
        # jpg decode + cv2 float resize: identical inputs, identical ops
        np.testing.assert_allclose(
            o["imgs"].transpose(0, 3, 1, 2), np.asarray(r["imgs"]),
            atol=2e-6)
        for s in ("stage0", "stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(
                o["proj_matrices"][s], np.asarray(r["proj_matrices"][s]),
                rtol=1e-6)
        # the depth band pins the line-11 variant semantics: both formats
        # must produce the 1/935..1/425 inverse-depth linspace
        np.testing.assert_allclose(o["depth_values"],
                                   np.asarray(r["depth_values"]), rtol=1e-6)
        assert abs(float(o["depth_values"][0]) - 1.0 / 935.0) < 1e-9
        assert abs(float(o["depth_values"][-1]) - 1.0 / 425.0) < 1e-9
