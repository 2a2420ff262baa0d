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


def _render_plane(K, E, H, W, depth_plane=600.0, tex=None, rng=None):
    """Render a textured plane z=depth_plane (world) through camera (K,E).
    Returns uint8 image."""
    rng = rng or np.random.default_rng(0)
    if tex is None:
        tex = rng.uniform(0, 1, (64, 64, 3))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).T
    rays = np.linalg.inv(K) @ pix                       # cam dirs
    R = E[:3, :3]
    t = E[:3, 3]
    cam_origin = -R.T @ t
    dirs = R.T @ rays                                   # world dirs
    lam = (depth_plane - cam_origin[2]) / dirs[2]
    pts = cam_origin[:, None] + dirs * lam              # world points
    u = np.abs(pts[0] / 4.0) % 64
    v = np.abs(pts[1] / 4.0) % 64
    img = tex[v.astype(int), u.astype(int)]
    return (img.reshape(H, W, 3) * 255).astype(np.uint8)


def build_scene(root, n_views=4, H=64, W=96, depth_plane=600.0,
                depth_min=425.0, depth_max=935.0):
    """Create scan1/ with images, full-res cam files (intrinsics stored at
    4x the model baseline like the DTU testing cams), and a pair file."""
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio

    scan_dir = os.path.join(root, "scan1")
    os.makedirs(os.path.join(scan_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scan_dir, "cams"), exist_ok=True)

    f = 120.0
    K_full = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 1, (64, 64, 3))

    exts = []
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * (v - n_views / 2)
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [8.0 * v, 2.0 * v, 0.0]
        exts.append(E)

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
