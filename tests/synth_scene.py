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


def render_multi_depth(K, E, H, W, surfaces, tex=None, rng=None,
                       texel=2.0, bg_z=None):
    """Ray-cast a set of bounded planes with a z-buffer: the non-planar
    scene class (depth discontinuities, occlusion edges, slanted
    surfaces) the single-plane rigs cannot represent (VERDICT r4 next #4
    — warp-ladder rung occupancy on real-scene-like content).

    surfaces: list of dicts {z0, gx, gy, x_range, y_range}: the plane
    z = z0 + gx*x + gy*y (world) clipped to x_range x y_range; nearest
    positive intersection wins.  bg_z: optional infinite backdrop plane
    depth.  Returns (img uint8 (H,W,3), depth (H,W) float32 cam-frame z,
    0 where no surface is hit).
    """
    rng = rng or np.random.default_rng(0)
    if tex is None:
        tex = make_texture(rng)
    n = tex.shape[0]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).T
    rays = np.linalg.inv(K) @ pix
    R = E[:3, :3]
    t = E[:3, 3]
    o = -R.T @ t                                        # cam origin, world
    d = R.T @ rays                                      # world dirs
    surf_list = list(surfaces)
    if bg_z is not None:
        surf_list.append({"z0": bg_z, "gx": 0.0, "gy": 0.0,
                          "x_range": (-1e9, 1e9), "y_range": (-1e9, 1e9)})
    best_t = np.full(pix.shape[1], np.inf)
    best_sid = np.full(pix.shape[1], -1, np.int64)
    for sid, s in enumerate(surf_list):
        denom = d[2] - s["gx"] * d[0] - s["gy"] * d[1]
        denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        lam = (s["z0"] + s["gx"] * o[0] + s["gy"] * o[1] - o[2]) / denom
        px_w = o[0] + lam * d[0]
        py_w = o[1] + lam * d[1]
        ok = ((lam > 1e-6) & (px_w >= s["x_range"][0])
              & (px_w <= s["x_range"][1]) & (py_w >= s["y_range"][0])
              & (py_w <= s["y_range"][1]) & (lam < best_t))
        best_t = np.where(ok, lam, best_t)
        best_sid = np.where(ok, sid, best_sid)
    hit = best_sid >= 0
    lam = np.where(hit, best_t, 0.0)
    pts = o[:, None] + d * lam                          # world points
    # cam-frame depth (z of E @ [pt,1]) — what the depth maps mean
    depth = (R[2] @ pts + t[2]) * hit
    # texture by world (x, y), offset per surface so adjacent surfaces
    # don't share texture phase across an occlusion edge
    u = (pts[0] / texel + best_sid * 37.3) % n
    v = (pts[1] / texel + best_sid * 11.7) % n
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = (u - u0)[:, None], (v - v0)[:, None]
    u1, v1 = (u0 + 1) % n, (v0 + 1) % n
    img = (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
           + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)
    img = img * hit[:, None]
    return ((img.reshape(H, W, 3) * 255).astype(np.uint8),
            depth.reshape(H, W).astype(np.float32))


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


def build_tank_scene(root, scene="Horse", n_views=7, H=128, W=192,
                     plane_z=1.6, depth_min=0.4, depth_max=3.5,
                     focal_mult=1.8, baseline=0.04, seed=0):
    """Create a Tanks&Temples-layout scene at METRIC scale:
    `<root>/intermediate/<scene>/{images,cams,pair.txt}` exactly as the
    tank reader expects (reference datasets/tank.py:88-141 layout; cam
    line 11 is the 4-field [min, interval, num, max] variant).

    The surface is the exactly-known plane z=plane_z (meters) — the T&T
    analogue of `build_scene`'s DTU-mm rig, for the metric-scale fused
    accuracy oracle (VERDICT r4 next #2).  Cameras sit on a ring at z=0,
    spaced `baseline` m apart, each aimed at the plane point in front of
    camera 0 (same look-at recipe as `build_scene`).

    focal_mult: focal = focal_mult*W px — tank-class FOV is ~1.16*W
    (tank.py native cams); a slightly narrower FOV at tiny CI resolutions
    keeps the triangulation floor z^2/(f*b) well below the stage-1
    hypothesis spacing.
    Returns the scene directory.
    """
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio

    scene_dir = os.path.join(root, "intermediate", scene)
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "cams"), exist_ok=True)

    f = float(focal_mult) * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(seed)
    tex = make_texture(rng)
    # texel ~= 2 px ground footprint at the plane (world units = meters)
    texel = 2.0 * plane_z / f

    exts = []
    for v in range(n_views):
        center = np.array([baseline * v, baseline / 4.0 * v, 0.0])
        exts.append(look_at_extrinsic(center, [0.0, 0.0, plane_z]))

    interval = (depth_max - depth_min) / 192.0
    for v, E in enumerate(exts):
        img = _render_plane(K, E, H, W, plane_z, tex, rng, texel_mm=texel)
        Image.fromarray(img).save(
            os.path.join(scene_dir, "images", f"{v:08d}.jpg"), quality=95)
        camio.write_cam_file(
            os.path.join(scene_dir, "cams", f"{v:08d}_cam.txt"),
            E, K, [depth_min, interval, 192.0, depth_max])

    with open(os.path.join(scene_dir, "pair.txt"), "w") as fh:
        fh.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = sorted((s for s in range(n_views) if s != v),
                          key=lambda s: abs(s - v))
            fh.write(f"{v}\n{len(srcs)} "
                     + " ".join(f"{s} 10.0" for s in srcs) + "\n")
    return scene_dir


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
