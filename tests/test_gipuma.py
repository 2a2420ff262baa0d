"""Gipuma/fusibile export path: dmb codec, P-matrix cams, scene
conversion (reference /root/reference/misc/gipuma.py behaviours)."""

import os

import numpy as np

from effi_mvs_plus_tpu.data import cams as camio
from effi_mvs_plus_tpu.data.pfm import save_pfm
from effi_mvs_plus_tpu.fuse import gipuma


def test_dmb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(400, 900, (24, 32)).astype(np.float32)
    p = str(tmp_path / "disp.dmb")
    gipuma.write_dmb(p, depth)
    out = gipuma.read_dmb(p)
    np.testing.assert_array_equal(out, depth)
    normals = gipuma.fake_normal(depth)
    assert normals.shape == (24, 32, 3)
    np.testing.assert_array_equal(normals[..., 2], -1.0)


def test_gipuma_cam_is_projection(tmp_path):
    K = np.array([[100., 0, 16], [0, 100., 12], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "cam.jpg.P")
    gipuma.write_gipuma_cam(p, E, K)
    P = np.loadtxt(p)
    np.testing.assert_allclose(P, K @ E[:3, :4], rtol=1e-5)


def test_convert_scene_layout(tmp_path):
    out_folder = str(tmp_path / "scan1")
    for sub in ("cams", "depth_est", "confidence", "images"):
        os.makedirs(os.path.join(out_folder, sub))
    rng = np.random.default_rng(1)
    K = np.array([[100., 0, 16], [0, 100., 12], [0, 0, 1]], np.float32)
    for vid in (0, 1):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [vid, 0, 0]
        camio.write_cam_file(
            os.path.join(out_folder, "cams", f"{vid:08d}_cam.txt"),
            E, K, [425.0, 2.5])
        depth = rng.uniform(400, 900, (24, 32)).astype(np.float32)
        conf = rng.uniform(0, 1, (24, 32)).astype(np.float32)
        save_pfm(os.path.join(out_folder, "depth_est", f"{vid:08d}.pfm"),
                 depth)
        save_pfm(os.path.join(out_folder, "confidence", f"{vid:08d}.pfm"),
                 conf)

    gdir = str(tmp_path / "gipuma")
    gipuma.convert_scene(out_folder, gdir, [0, 1], prob_threshold=0.5)
    for vid in (0, 1):
        name = f"{vid:08d}"
        assert os.path.exists(os.path.join(gdir, "cams", f"{name}.jpg.P"))
        disp = gipuma.read_dmb(os.path.join(gdir, f"2333_{name}",
                                            "disp.dmb"))
        assert disp.shape == (24, 32)
        # probability filter zeroes low-confidence pixels
        assert (disp == 0).any() and (disp > 0).any()
        normals = gipuma.read_dmb(os.path.join(gdir, f"2333_{name}",
                                               "normals.dmb"))
        assert normals.shape == (24, 32, 3)
