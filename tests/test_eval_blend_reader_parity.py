"""Reader parity for the remaining two dataset readers, side by side with
the reference implementations on synthetic trees in the standard layouts:

* GeneralEvalDataset vs reference general_eval (DTU testing layout:
  images/ + cams/ + pair.txt, 1600x1200 inputs scaled to the max_h/max_w
  budget snapped to multiples of 32, hardcoded 2.5 base interval,
  interval from the cam file's depth count rescaled to ndepths);
* BlendedMVSDataset vs reference blend (blended_images/ +
  rendered_depth_maps/ + cams/pair.txt, 4-field cam line, endpoint=False
  inverse-depth linspace, masks from GT within [min,max], deterministic
  first-nviews-1 source selection in train mode)."""

import os

import numpy as np
import pytest

from conftest import load_reference_models  # noqa: F401


def _write_pair(path, n_views):
    with open(path, "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} 10.0" for s in srcs) + "\n")


def _build_dtu_eval_tree(root, scan="scan1", n_views=3, wh=(1600, 1200)):
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio

    rng = np.random.default_rng(3)
    base = os.path.join(root, scan)
    os.makedirs(os.path.join(base, "cams"), exist_ok=True)
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    _write_pair(os.path.join(base, "pair.txt"), n_views)

    w, h = wh
    K = np.array([[2800.0, 0, w / 2], [0, 2800.0, h / 2], [0, 0, 1]],
                 np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [20.0 * v, 0, 0]
        # real DTU eval cam files carry [min, interval, num, max]
        camio.write_cam_file(
            os.path.join(base, "cams", f"{v:08d}_cam.txt"),
            E, K, [425.0, 2.5, 192.0, 905.0])
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(base, "images", f"{v:08d}.jpg"))
    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write(scan + "\n")
    return listfile


@pytest.mark.slow
def test_general_eval_reader_matches_reference(tmp_path):
    load_reference_models()
    from datasets.general_eval import MVSDataset as RefDataset

    from effi_mvs_plus_tpu.data.datasets import GeneralEvalDataset

    root = str(tmp_path)
    listfile = _build_dtu_eval_tree(root)
    scans = ["scan1"]

    ref_ds = RefDataset(root, scans, "test", 3, 384, interval_scale=0.53,
                        dispmaxfirst="last", max_h=1184, max_w=1600)
    our_ds = GeneralEvalDataset(root, listfile, 3, 384,
                                interval_scale=0.53, max_h=1184, max_w=1600)

    assert len(ref_ds) == len(our_ds) == 3
    for i in (0, 2):
        r = ref_ds[i]
        o = our_ds[i]
        assert o["imgs"].shape[1:3] == (1184, 1600)
        np.testing.assert_allclose(
            o["imgs"].transpose(0, 3, 1, 2), np.asarray(r["imgs"]),
            atol=2e-6)
        for s in ("stage0", "stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(
                o["proj_matrices"][s], np.asarray(r["proj_matrices"][s]),
                rtol=1e-6)
        np.testing.assert_allclose(o["depth_values"],
                                   np.asarray(r["depth_values"]), rtol=1e-6)
        assert o["filename"] == r["filename"]


def _build_blend_tree(root, scan="5a0271884e62597cdee0d0eb", n_views=9,
                      wh=(768, 576)):
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.data.pfm import save_pfm

    rng = np.random.default_rng(5)
    base = os.path.join(root, scan)
    os.makedirs(os.path.join(base, "cams"), exist_ok=True)
    os.makedirs(os.path.join(base, "blended_images"), exist_ok=True)
    os.makedirs(os.path.join(base, "rendered_depth_maps"), exist_ok=True)
    # >=8 srcs per ref so no ref is dropped by the <7 filter
    _write_pair(os.path.join(base, "cams", "pair.txt"), n_views)

    w, h = wh
    K = np.array([[1100.0, 0, w / 2], [0, 1100.0, h / 2], [0, 0, 1]],
                 np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [5.0 * v, 0, 0]
        camio.write_cam_file(
            os.path.join(base, "cams", f"{v:08d}_cam.txt"),
            E, K, [2.5, 0.05, 128.0, 12.0])
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(base, "blended_images", f"{v:08d}.jpg"))
        depth = rng.uniform(1.5, 14.0, (h, w)).astype(np.float32)
        save_pfm(os.path.join(base, "rendered_depth_maps",
                              f"{v:08d}.pfm"), depth)
    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write(scan + "\n")
    return listfile


@pytest.mark.slow
def test_blend_reader_matches_reference(tmp_path):
    load_reference_models()
    from datasets.blend import MVSDataset as RefDataset

    from effi_mvs_plus_tpu.data.datasets import BlendedMVSDataset

    root = str(tmp_path)
    listfile = _build_blend_tree(root)

    ref_ds = RefDataset(root, listfile, "train", 7, 96)
    our_ds = BlendedMVSDataset(root, listfile, "train", 7, 96)

    assert len(ref_ds) == len(our_ds) == 9
    for i in (0, 8):
        r = ref_ds[i]
        o = our_ds[i]
        np.testing.assert_allclose(
            o["imgs"].transpose(0, 3, 1, 2), np.asarray(r["imgs"]),
            atol=2e-6)
        for s in ("stage0", "stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(
                o["proj_matrices"][s], np.asarray(r["proj_matrices"][s]),
                rtol=1e-6)
        np.testing.assert_allclose(o["depth_values"],
                                   np.asarray(r["depth_values"]), rtol=1e-6)
        for s in ("stage1", "stage2", "stage3", "stage4"):
            np.testing.assert_allclose(o["depth"][s],
                                       np.asarray(r["depth"][s]), atol=1e-5)
            np.testing.assert_array_equal(o["mask"][s],
                                          np.asarray(r["mask"][s]))
        assert o["filename"] == r["filename"]
