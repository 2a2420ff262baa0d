"""Shared T&T-deployment-point rig with SCENE-LIKE inputs.

The dynamic cost volume's runtime depends on input coherence: with real
(coherent) images the refined stage-2/3 hypothesis bands are narrow and
the pallas warp ladder stays on the MXU path; with uniform-noise images
the depth estimates are incoherent, the support spans overflow the
region margins, and every stage demotes to the XLA gather fallback
(~5x slower — measured round 3).  Throughput at the T&T point must
therefore be measured on scene-like content; noise measures only the
fallback path.

Renders a multi-octave-textured plane at z=1.6 m (metric T&T scale,
depth band 0.4-3.5 m) through a ring of 11 cameras with 1.5-10.5 cm
baselines — the geometry class the reference's tank driver feeds
(/root/reference/datasets/tank.py:137, test_tank.sh:14-15).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

H, W, V = 1056, 1920, 11
NDEPTHS = (96, 8, 8)
NUMDEPTH = 384
PLANE_Z = 1.6
BAND = (0.4, 3.5)


def cameras():
    f_full = 1.16 * W
    K = np.array([[f_full, 0, W / 2], [0, f_full, H / 2], [0, 0, 1]],
                 np.float32)
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.015 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [0.03 * v, 0.008 * v, 0.004 * v]
        exts.append(E)
    return K, exts


def render_views(K, exts, seed=0):
    from synth_scene import _render_plane, make_texture
    rng = np.random.default_rng(seed)
    tex = make_texture(rng)
    # texel ~= 2 px ground footprint: pixel at 1.6 m, f=2227 px covers
    # ~0.72 mm; 1.5 mm texels give sub-pixel-matchable contrast
    imgs = [_render_plane(K, E, H, W, depth_plane=PLANE_Z, tex=tex,
                          texel_mm=0.0015).astype(np.float32) / 255.0
            for E in exts]
    return np.stack(imgs)


def batch(B, seed=0):
    """(imgs (B,V,H,W,3) f32, proj_matrices dict, depth_values (B,Nd))."""
    from effi_mvs_plus_tpu.data import cams as camio
    K, exts = cameras()
    views = render_views(K, exts, seed)
    intr_q = K.copy()
    intr_q[:2] /= 4.0
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm = {k: np.broadcast_to(np.stack([p[k] for p in projs])[None],
                             (B, V, 2, 4, 4)).copy()
          for k in ("stage1", "stage2", "stage3")}
    dv = np.broadcast_to(camio.inverse_depth_values(
        BAND[0], (BAND[1] - BAND[0]) / NUMDEPTH, NUMDEPTH)[None],
        (B, NUMDEPTH)).copy()
    return np.broadcast_to(views[None], (B, V, H, W, 3)).copy(), pm, dv
