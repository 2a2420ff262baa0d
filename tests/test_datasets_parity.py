"""Dataset-reader parity: build a synthetic DTU-training directory tree and
compare our reader's output with the reference dtu_yao reader
sample-for-sample (val mode: deterministic view selection)."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, load_reference_models  # noqa: F401


def _build_dtu_train_tree(root, n_views=4):
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.data.pfm import save_pfm

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "Cameras", "train"), exist_ok=True)
    with open(os.path.join(root, "Cameras", "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} 10.0" for s in srcs) + "\n")

    K = np.array([[360.0, 0, 80.0], [0, 360.0, 64.0], [0, 0, 1]], np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [10.0 * v, 0, 0]
        camio.write_cam_file(
            os.path.join(root, "Cameras", "train", f"{v:08d}_cam.txt"),
            E, K, [425.0, 2.5])

    scan = "scan1"
    img_dir = os.path.join(root, "Rectified", f"{scan}_train")
    dep_dir = os.path.join(root, "Depths_raw", scan)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    for v in range(n_views):
        for light in range(7):
            img = rng.integers(0, 255, (512, 640, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"rect_{v + 1:03d}_{light}_r5000.png"))
        depth = rng.uniform(420, 940, (1200, 1600)).astype(np.float32)
        save_pfm(os.path.join(dep_dir, f"depth_map_{v:04d}.pfm"), depth)
        mask = (rng.uniform(0, 1, (1200, 1600)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(mask).save(
            os.path.join(dep_dir, f"depth_visual_{v:04d}.png"))

    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")
    return listfile


@pytest.mark.slow
def test_dtu_train_reader_matches_reference(tmp_path):
    import sys
    load_reference_models()          # installs utils stub + path
    from datasets.dtu_yao import MVSDataset as RefDataset

    from effi_mvs_plus_tpu.data.datasets import DTUTrainDataset

    root = str(tmp_path)
    listfile = _build_dtu_train_tree(root, n_views=4)

    ref_ds = RefDataset(root, listfile, "val", 3, 384,
                        interval_scale=0.53, dispmaxfirst="last")
    our_ds = DTUTrainDataset(root, listfile, "val", 3, 384)

    assert len(ref_ds) == len(our_ds) == 4

    for i in (0, 3):
        r = ref_ds[i]
        o = our_ds[i]
        np.testing.assert_allclose(
            o["imgs"].transpose(0, 3, 1, 2), r["imgs"], atol=1e-6)
        for s in ("stage0", "stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(o["proj_matrices"][s],
                                       r["proj_matrices"][s], rtol=1e-6)
        np.testing.assert_allclose(o["depth_values"], r["depth_values"],
                                   rtol=1e-6)
        for s in ("stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(o["depth"][s], r["depth"][s],
                                       atol=1e-4)
            np.testing.assert_array_equal(o["mask"][s], r["mask"][s])
        assert o["filename"] == r["filename"]
