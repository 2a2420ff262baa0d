"""Synthetic DTU-testing-layout scene builder for end-to-end tests.

Renders a textured fronto-parallel-ish plane from a ring of cameras into
`<root>/scan1/{images,cams,pair.txt}` exactly as the DTU eval layout
expects (general_eval reader contract), so the full CLI pipeline
(inference -> PFM outputs -> dypcd fusion -> PLY) can run without the real
dataset.
"""

from __future__ import annotations

import os

import numpy as np


def make_texture(rng=None, size=512):
    """Multi-octave noise texture: contrast at EVERY feature-pyramid scale
    (a single-octave noise texture averages to flat gray at 1/8 resolution
    and starves the stage-1 cost volume of signal).  Equal octave weights
    measured best for the checkpoint's matching accuracy (1/f weighting
    was ~2x worse — probed 2026-08-19)."""
    rng = rng or np.random.default_rng(0)
    tex = np.zeros((size, size, 3))
    for cells in (size, size // 4, size // 16, size // 64):
        oct_ = rng.uniform(0, 1, (cells, cells, 3))
        reps = size // cells
        tex += np.repeat(np.repeat(oct_, reps, 0), reps, 1)
    tex -= tex.min()
    tex /= tex.max()
    return tex


def _render_plane(K, E, H, W, depth_plane=600.0, tex=None, rng=None,
                  texel_mm=2.0):
    """Render a textured plane z=depth_plane (world) through camera (K,E).
    Returns uint8 image."""
    rng = rng or np.random.default_rng(0)
    if tex is None:
        tex = make_texture(rng)
    n = tex.shape[0]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).T
    rays = np.linalg.inv(K) @ pix                       # cam dirs
    R = E[:3, :3]
    t = E[:3, 3]
    cam_origin = -R.T @ t
    dirs = R.T @ rays                                   # world dirs
    lam = (depth_plane - cam_origin[2]) / dirs[2]
    pts = cam_origin[:, None] + dirs * lam              # world points
    # bilinear texture lookup (wrap): nearest-texel blockiness aliases the
    # sub-pixel matching the accuracy oracle relies on
    u = pts[0] / texel_mm % n
    v = pts[1] / texel_mm % n
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = (u - u0)[:, None], (v - v0)[:, None]
    u1, v1 = (u0 + 1) % n, (v0 + 1) % n
    img = (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
           + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)
    return (img.reshape(H, W, 3) * 255).astype(np.uint8)


def look_at_extrinsic(cam_center, target):
    """World->cam extrinsic whose optical axis points at `target` (y-down
    image convention, yaw/pitch only)."""
    z = np.asarray(target, np.float64) - np.asarray(cam_center, np.float64)
    z = z / np.linalg.norm(z)
    x = np.cross([0.0, 1.0, 0.0], z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = np.stack([x, y, z]).astype(np.float32)
    E[:3, 3] = (-E[:3, :3] @ np.asarray(cam_center, np.float32))
    return E


def build_scene(root, n_views=4, H=64, W=96, depth_plane=600.0,
                depth_min=425.0, depth_max=935.0, focal=120.0,
                baseline=8.0):
    """Create scan1/ with images, full-res cam files (intrinsics stored at
    4x the model baseline like the DTU testing cams), and a pair file.

    focal: pixels — sets the metric pixel footprint depth_plane/focal (the
    accuracy-oracle test raises it for a sub-mm footprint).
    baseline: camera x-spacing in mm; depth sensitivity per pixel of
    disparity error is depth^2/(focal*baseline)."""
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio

    scan_dir = os.path.join(root, "scan1")
    os.makedirs(os.path.join(scan_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scan_dir, "cams"), exist_ok=True)

    f = float(focal)
    K_full = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)
    tex = make_texture(rng)

    # ring of cameras on a line, each aimed at the plane point in front of
    # camera 0 — keeps view overlap high at ANY baseline (a fixed yaw per
    # view loses overlap past ~20 mm offsets)
    exts = []
    for v in range(n_views):
        center = np.array([baseline * v, baseline / 4.0 * v, 0.0])
        exts.append(look_at_extrinsic(center, [0.0, 0.0, depth_plane]))

    interval = (depth_max - depth_min) / 192.0
    for v, E in enumerate(exts):
        img = _render_plane(K_full, E, H, W, depth_plane, tex, rng)
        Image.fromarray(img).save(
            os.path.join(scan_dir, "images", f"{v:08d}.jpg"))
        camio.write_cam_file(
            os.path.join(scan_dir, "cams", f"{v:08d}_cam.txt"),
            E, K_full, [depth_min, interval, 192.0, depth_max])

    with open(os.path.join(scan_dir, "pair.txt"), "w") as fh:
        fh.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            fh.write(f"{v}\n{len(srcs)} "
                     + " ".join(f"{s} 10.0" for s in srcs) + "\n")

    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as fh:
        fh.write("scan1\n")
    return scan_dir, listfile
