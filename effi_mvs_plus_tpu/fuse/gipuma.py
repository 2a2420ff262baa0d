"""Gipuma/fusibile export path.

Counterpart of the reference's optional gipuma fusion
(/root/reference/misc/gipuma.py): converts our depth/confidence/cam
outputs into the Gipuma on-disk layout — `.dmb` binary depth maps, P-matrix
cam text files, fake normal maps pointing at the camera — applies the
probability filter, and (optionally) shells out to an external `fusibile`
executable if one is provided.  The executable itself is third-party CUDA
and is NOT bundled; the converter keeps the capability surface complete.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np

from effi_mvs_plus_tpu.data.pfm import read_pfm


def write_dmb(path, arr):
    """Gipuma binary map: int32 type(1), h, w, c then float32 data
    (misc/gipuma.py:25-43 layout: type, h, w, nb)."""
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", 1, h, w, c))
        arr.tofile(f)


def read_dmb(path):
    with open(path, "rb") as f:
        _t, h, w, c = struct.unpack("<iiii", f.read(16))
        data = np.frombuffer(f.read(), "<f4").reshape(h, w, c)
    return data[:, :, 0] if c == 1 else data


def write_gipuma_cam(path, extrinsics, intrinsics):
    """P = K @ E[:3,:4] written as a 3x4 text matrix (gipuma.py:46-70)."""
    P = np.asarray(intrinsics) @ np.asarray(extrinsics)[:3, :4]
    with open(path, "w") as f:
        for row in P:
            f.write(" ".join(f"{v:f}" for v in row) + "\n")
        f.write("\n")


def fake_normal(depth):
    """Unit normals pointing at the camera (gipuma.py:109-122)."""
    h, w = depth.shape
    n = np.zeros((h, w, 3), np.float32)
    n[:, :, 2] = -1.0
    return n


def convert_scene(out_folder, gipuma_folder, view_ids, prob_threshold=0.3):
    """Convert a scene's saved outputs (depth_est/ confidence/ cams/) into
    the fusibile input layout (gipuma.py:125-189): per-view folders
    2333_<id>/ with disp.dmb + normals.dmb, cams/<id>.jpg.P and images."""
    cam_dir = os.path.join(gipuma_folder, "cams")
    img_dir = os.path.join(gipuma_folder, "images")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    from effi_mvs_plus_tpu.data.cams import read_cam_file
    for vid in view_ids:
        name = f"{vid:08d}"
        cam = read_cam_file(os.path.join(out_folder, "cams",
                                         f"{name}_cam.txt"))
        write_gipuma_cam(os.path.join(cam_dir, f"{name}.jpg.P"),
                         cam["extrinsics"], cam["intrinsics"])
        src_img = os.path.join(out_folder, "images", f"{name}.jpg")
        if os.path.exists(src_img):
            shutil.copy(src_img, os.path.join(img_dir, f"{name}.jpg"))

        depth = read_pfm(os.path.join(out_folder, "depth_est",
                                      f"{name}.pfm"))[0]
        conf = read_pfm(os.path.join(out_folder, "confidence",
                                     f"{name}.pfm"))[0]
        if conf.shape != depth.shape:
            import cv2
            conf = cv2.resize(conf, (depth.shape[1], depth.shape[0]))
        depth = np.where(conf >= prob_threshold, depth, 0.0)

        view_dir = os.path.join(gipuma_folder, f"2333_{name}")
        os.makedirs(view_dir, exist_ok=True)
        write_dmb(os.path.join(view_dir, "disp.dmb"), depth)
        write_dmb(os.path.join(view_dir, "normals.dmb"), fake_normal(depth))


def run_fusibile(fusibile_exe, gipuma_folder, disp_threshold=0.2,
                 num_consistent=3):
    """Shell out to an external fusibile binary (gipuma.py:192-213)."""
    cmd = [fusibile_exe,
           "-input_folder", gipuma_folder + "/",
           "-p_folder", os.path.join(gipuma_folder, "cams") + "/",
           "-images_folder", os.path.join(gipuma_folder, "images") + "/",
           "--depth_min=0.001", "--depth_max=100000",
           f"--disp_thresh={disp_threshold}",
           f"--num_consistent={num_consistent}",
           "--cam_scale=1", "-gpu"]
    return subprocess.run(cmd, capture_output=True, text=True)
