"""Dynamic point-cloud fusion (dypcd), vectorised for accelerator execution.

Re-design of the reference's per-view numpy/cv2 fusion loop
(/root/reference/test_dtu_dypcd.py:164-350): for every reference view,
reproject through each source view's depth map (ref -> src -> ref), apply
the *dynamic* consistency ladder

    mask_i = (reproj_dist < i * dist_base)
             & (|depth_reproj - depth_ref| < log10(max(i, 1.05)) * diff_base)
    keep   = OR_i ( #views passing level i  >=  i ),        i in [s, e)

average the passing reprojected depths with the reference (high-confidence
pixels keep the reference depth), and back-project to world points.

Instead of a Python loop over (49 ref x 10 src) with cv2.remap, all source
views of one reference are stacked and the whole ladder is computed in one
jitted call: the remap becomes the shared bilinear-gather op, the ladder a
vectorised comparison against a threshold vector.  Per-scene work is
embarrassingly parallel (scans -> processes/hosts, SURVEY §2.5).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from effi_mvs_plus_tpu.core.geometry import inv3x3
from effi_mvs_plus_tpu.ops import bilinear_gather


# Fusion constants live in the typed config tree (config.py); re-exported
# here so fusion call-sites keep one import.
from effi_mvs_plus_tpu.config import (DypcdParams, TankParams,  # noqa: F401
                                      TANK_FILTER_CONFIGS)

# Coordinate-geometry matmuls run at HIGHEST precision: on TPU the default
# matmul precision truncates f32 operands to bf16 (pixel coords up to 1920
# quantise to 8-px steps) — the round-5 T&T bias adjudication
# (core/geometry.py _PREC) applies to the fusion reprojection chain too.
_PREC = lax.Precision.HIGHEST


def _cam_rays(K_inv, depth):
    """Back-project a depth map: (3,3) K^-1, (H,W) depth -> (H,W,3) cam."""
    H, W = depth.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    pix = jnp.stack([x, y, jnp.ones_like(x)], -1)
    return jnp.einsum("ij,hwj->hwi", K_inv, pix, precision=_PREC) * depth[..., None]


def _rigid_inv(E):
    """Inverse of a rigid [R|t] 4x4: [R^T | -R^T t] (avoids the fp32 LU
    accuracy cliff of jnp.linalg.inv, see core.geometry.inv3x3)."""
    R = E[:3, :3]
    t = E[:3, 3]
    top = jnp.concatenate(
        [R.T, (-jnp.matmul(R.T, t, precision=_PREC))[:, None]],
        axis=1)
    return jnp.concatenate([top, E[3:4, :]], axis=0)


def _reproject_one(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """Single src view: returns (depth_reprojected, x_rep, y_rep)."""
    H, W = depth_ref.shape
    K_ref_inv = inv3x3(K_ref)
    K_src_inv = inv3x3(K_src)
    rel = jnp.matmul(E_src, _rigid_inv(E_ref), precision=_PREC)
    rel_back = jnp.matmul(E_ref, _rigid_inv(E_src), precision=_PREC)
    xyz_ref = _cam_rays(K_ref_inv, depth_ref)                       # (H,W,3)
    xyz_src = (jnp.einsum("ij,hwj->hwi", rel[:3, :3], xyz_ref, precision=_PREC)
               + rel[:3, 3])
    z = xyz_src[..., 2]
    kxyz = jnp.einsum("ij,hwj->hwi", K_src, xyz_src, precision=_PREC)
    x_src = kxyz[..., 0] / kxyz[..., 2]
    y_src = kxyz[..., 1] / kxyz[..., 2]

    sampled = bilinear_gather(depth_src[None, :, :, None],
                              x_src.reshape(1, -1),
                              y_src.reshape(1, -1)).reshape(H, W)

    pix_src = jnp.stack([x_src, y_src, jnp.ones_like(x_src)], -1)
    xyz_src2 = jnp.einsum("ij,hwj->hwi", K_src_inv, pix_src, precision=_PREC) * sampled[..., None]
    xyz_rep = (jnp.einsum("ij,hwj->hwi", rel_back[:3, :3], xyz_src2, precision=_PREC)
               + rel_back[:3, 3])
    depth_rep = xyz_rep[..., 2]
    kxyz_rep = jnp.einsum("ij,hwj->hwi", K_ref, xyz_rep, precision=_PREC)
    zr = kxyz_rep[..., 2]
    zr = jnp.where(zr == 0, zr + 1e-5, zr)
    return depth_rep, kxyz_rep[..., 0] / zr, kxyz_rep[..., 1] / zr


def _dynamic_ladder(depth_ref, depth_rep, x_rep, y_rep, levels, dist_thresh,
                    diff_thresh, vote_over, relative=False):
    """Shared dynamic-consistency core.

    depth_rep/x_rep/y_rep: (S,H,W) reprojections; levels/dist_thresh/
    diff_thresh: (L,) threshold ladder; vote_over: the count needed at the
    final OR (the unreachable `geo_mask_sum >= e` term kept for parity).
    Returns (geo_mask (H,W), fused-depth numerator pieces).
    """
    H, W = depth_ref.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dist = jnp.sqrt((x_rep - x) ** 2 + (y_rep - y) ** 2)       # (S,H,W)
    depth_diff = jnp.abs(depth_rep - depth_ref)
    if relative:
        depth_diff = depth_diff / depth_ref

    masks = ((dist[None] < dist_thresh[:, None, None, None])
             & (depth_diff[None] < diff_thresh[:, None, None, None]))
    # (L,S,H,W)
    top_mask = masks[-1]
    counts = jnp.sum(masks.astype(jnp.int32), axis=1)          # (L,H,W)
    geo_mask = jnp.any(counts >= levels[:, None, None], axis=0)
    geo_mask = geo_mask | (jnp.sum(top_mask.astype(jnp.int32), 0)
                           >= vote_over)

    depth_sum = jnp.sum(jnp.where(top_mask, depth_rep, 0.0), axis=0)
    n_pass = jnp.sum(top_mask.astype(jnp.float32), axis=0)
    fused = (depth_sum + depth_ref) / (n_pass + 1.0)
    return geo_mask, fused


def _consistency_one(depth_ref, conf_ref, K_ref, E_ref, depth_srcs, K_srcs,
                     E_srcs, params: DypcdParams):
    """DTU dypcd ladder for one reference view (traceable core)."""
    depth_rep, x_rep, y_rep = jax.vmap(
        lambda d, K, E: _reproject_one(depth_ref, K_ref, E_ref, d, K, E)
    )(depth_srcs, K_srcs, E_srcs)                      # each (S,H,W)

    levels = jnp.arange(params.s, params.e, dtype=jnp.float32)  # (L,)
    geo_mask, fused = _dynamic_ladder(
        depth_ref, depth_rep, x_rep, y_rep, levels,
        levels * params.dist_base,
        jnp.log10(jnp.maximum(levels, 1.05)) * params.diff_base,
        vote_over=params.e)
    fused = jnp.where(conf_ref > params.conf_override, depth_ref, fused)

    photo_mask = conf_ref > params.conf_thresh
    return photo_mask & geo_mask, fused, geo_mask, photo_mask


@functools.partial(jax.jit, static_argnames=("params",))
def consistency(depth_ref, conf_ref, K_ref, E_ref, depth_srcs, K_srcs,
                E_srcs, params: DypcdParams = DypcdParams()):
    """DTU dypcd fusion for one reference view.

    depth_srcs: (S,H,W); K_srcs/E_srcs: (S,3,3)/(S,4,4).
    Returns (final_mask (H,W) bool, fused_depth (H,W), geo_mask, photo_mask).
    """
    return _consistency_one(depth_ref, conf_ref, K_ref, E_ref,
                            depth_srcs, K_srcs, E_srcs, params)


@functools.partial(jax.jit, static_argnames=("params", "chunk"))
def consistency_scene(depth, conf, K, E, ref_ids, src_ids,
                      params: DypcdParams = DypcdParams(), chunk: int = 4):
    """Whole-scan dypcd fusion with device-resident views (VERDICT r1 #8).

    Instead of one jitted call + host round-trip per reference view
    (49 dispatches/scan), all depth maps stay on-device and every
    reference's ladder runs inside ONE jitted call, chunked `chunk` refs
    at a time to bound the (chunk,L,S,H,W) mask transient.

    depth/conf: (N,H,W); K: (N,3,3); E: (N,4,4);
    ref_ids: (R,) int32; src_ids: (R,S) int32 rows into the N stack.
    Returns (final (R,H,W) bool, fused (R,H,W), geo (R,H,W), photo (R,H,W)).
    """
    def one(rs):
        rid, srow = rs
        return _consistency_one(depth[rid], conf[rid], K[rid], E[rid],
                                depth[srow], K[srow], E[srow], params)
    return lax.map(one, (ref_ids, src_ids), batch_size=chunk)


@functools.partial(jax.jit, static_argnames=("params",))
def consistency_tank(depth_ref, conf_ref, K_ref, E_ref, depth_srcs, K_srcs,
                     E_srcs, params: TankParams = TankParams()):
    """T&T dynamic fusion for one reference view (reference
    misc/fusion.py:117-181 + test_tank.py:455-530): threshold ladder
    i in [dh_view_num, S+1) with dist < i/dist_filter and
    depth_diff < i/depth_filter; no high-confidence override."""
    S = depth_srcs.shape[0]
    if S < params.dh_view_num + 1:
        # too few source views to ever satisfy the vote (the reference
        # driver skips these refs, test_tank.py:482-483)
        zeros = jnp.zeros_like(depth_ref, dtype=bool)
        return zeros, depth_ref, zeros, conf_ref > params.prob_threshold
    depth_rep, x_rep, y_rep = jax.vmap(
        lambda d, K, E: _reproject_one(depth_ref, K_ref, E_ref, d, K, E)
    )(depth_srcs, K_srcs, E_srcs)

    levels = jnp.arange(params.dh_view_num, S + 1, dtype=jnp.float32)
    geo_mask, fused = _dynamic_ladder(
        depth_ref, depth_rep, x_rep, y_rep, levels,
        levels / params.dist_filter, levels / params.depth_filter,
        vote_over=S + 1, relative=params.relative)

    photo_mask = conf_ref > params.prob_threshold
    return photo_mask & geo_mask, fused, geo_mask, photo_mask


def backproject_to_world(depth, mask, K, E):
    """Masked pixels -> world points (numpy, dynamic shapes on host)."""
    H, W = depth.shape
    ys, xs = np.nonzero(np.asarray(mask))
    d = np.asarray(depth)[ys, xs]
    pix = np.stack([xs, ys, np.ones_like(xs)]).astype(np.float64) * d
    xyz_cam = np.linalg.inv(np.asarray(K, np.float64)) @ pix
    xyz_w = (np.linalg.inv(np.asarray(E, np.float64))
             @ np.vstack([xyz_cam, np.ones_like(d)]))[:3]
    return xyz_w.T.astype(np.float32), (ys, xs)


def save_mask_pngs(mask_dir, ref, photo_mask, geo_mask, final_mask):
    """Write the standard fusion-debug artifacts the reference emits per
    reference view (test_dtu_dypcd.py:309-313): mask/<ref>_photo.png,
    _geo.png, _final.png as 0/255 images."""
    os.makedirs(mask_dir, exist_ok=True)
    try:
        from PIL import Image
    except Exception:
        return
    for name, m in (("photo", photo_mask), ("geo", geo_mask),
                    ("final", final_mask)):
        img = (np.asarray(m).astype(np.uint8) * 255)
        Image.fromarray(img).save(
            os.path.join(mask_dir, f"{ref:08d}_{name}.png"))


def fuse_scene_device(pair_data, views, params: DypcdParams = DypcdParams(),
                      progress=None, mask_dir=None, chunk: int = 4):
    """Fuse one scene with all views device-resident (one jit dispatch per
    source-count group instead of one per reference view).

    pair_data: [(ref_view, [src_views...])]
    views: view_id -> dict(depth (H,W), conf (H,W), K (3,3), E (4,4),
           image (H,W,3) float [0,1] or None) — a plain dict; every view
           referenced by pair_data must share (H,W).
    Returns (xyz (N,3) float32, rgb (N,3) uint8 or None).
    """
    vids = sorted(views.keys())
    row = {v: i for i, v in enumerate(vids)}
    depth = jnp.asarray(np.stack([np.asarray(views[v]["depth"],
                                             np.float32) for v in vids]))
    conf = jnp.asarray(np.stack([np.asarray(views[v]["conf"],
                                            np.float32) for v in vids]))
    K = jnp.asarray(np.stack([np.asarray(views[v]["K"], np.float32)
                              for v in vids]))
    E = jnp.asarray(np.stack([np.asarray(views[v]["E"], np.float32)
                              for v in vids]))

    # group refs by source count — each group is one static shape
    groups = {}
    for ref, srcs in pair_data:
        groups.setdefault(len(srcs), []).append((ref, srcs))

    all_xyz, all_rgb = [], []
    have_imgs = True
    for S, group in sorted(groups.items()):
        if S == 0:
            continue
        ref_ids = jnp.asarray([row[r] for r, _ in group], jnp.int32)
        src_ids = jnp.asarray([[row[s] for s in srcs] for _, srcs in group],
                              jnp.int32)
        final, fused, geo, photo = consistency_scene(
            depth, conf, K, E, ref_ids, src_ids, params, chunk)
        final_h = np.asarray(final)
        fused_h = np.asarray(fused)
        for i, (ref, _) in enumerate(group):
            r = views[ref]
            xyz, (ys, xs) = backproject_to_world(fused_h[i], final_h[i],
                                                 r["K"], r["E"])
            all_xyz.append(xyz)
            if r.get("image") is not None:
                img = np.asarray(r["image"])
                all_rgb.append((img[ys, xs] * 255).astype(np.uint8))
            else:
                have_imgs = False
            if mask_dir is not None:
                save_mask_pngs(mask_dir, ref, np.asarray(photo[i]),
                               np.asarray(geo[i]), final_h[i])
            if progress is not None:
                progress(ref, float(np.asarray(photo[i]).mean()),
                         float(np.asarray(geo[i]).mean()),
                         float(final_h[i].mean()))
    xyz = (np.concatenate(all_xyz, 0) if all_xyz
           else np.zeros((0, 3), np.float32))
    rgb = np.concatenate(all_rgb, 0) if all_rgb and have_imgs else None
    return xyz, rgb


def fuse_scene(pair_data, load_view, params: DypcdParams = DypcdParams(),
               progress=None, mask_dir=None):
    """Fuse one scene into a point cloud.

    pair_data: [(ref_view, [src_views...])]
    load_view: view_id -> dict(depth (H,W), conf (H,W) or None,
               K (3,3), E (4,4), image (H,W,3) float [0,1] or None)
    mask_dir: when set, dump per-ref photo/geo/final mask PNGs there
              (the reference's threshold-tuning artifacts,
              test_dtu_dypcd.py:309-316).
    Returns (xyz (N,3) float32, rgb (N,3) uint8).

    Loads every referenced view once, then fuses with the device-resident
    batched path (`fuse_scene_device`) when all views share one shape;
    mixed shapes fall back to the per-reference dispatch.
    """
    needed = sorted({v for ref, srcs in pair_data for v in [ref, *srcs]})
    views = {v: load_view(v) for v in needed}
    shapes = {np.asarray(views[v]["depth"]).shape for v in needed}
    if len(shapes) == 1:
        return fuse_scene_device(pair_data, views, params,
                                 progress=progress, mask_dir=mask_dir)

    all_xyz, all_rgb = [], []
    for ref, srcs in pair_data:
        r = views[ref]
        sv = [views[s] for s in srcs]
        depth_srcs = jnp.stack([np.asarray(s["depth"]) for s in sv])
        K_srcs = jnp.stack([np.asarray(s["K"]) for s in sv])
        E_srcs = jnp.stack([np.asarray(s["E"]) for s in sv])
        final_mask, fused, geo_mask, photo_mask = consistency(
            jnp.asarray(r["depth"]), jnp.asarray(r["conf"]),
            jnp.asarray(r["K"]), jnp.asarray(r["E"]),
            depth_srcs, K_srcs, E_srcs, params)
        xyz, (ys, xs) = backproject_to_world(np.asarray(fused),
                                             np.asarray(final_mask),
                                             r["K"], r["E"])
        all_xyz.append(xyz)
        if r.get("image") is not None:
            img = np.asarray(r["image"])
            all_rgb.append((img[ys, xs] * 255).astype(np.uint8))
        if mask_dir is not None:
            save_mask_pngs(mask_dir, ref, photo_mask, geo_mask, final_mask)
        if progress is not None:
            progress(ref, float(np.asarray(photo_mask).mean()),
                     float(np.asarray(geo_mask).mean()),
                     float(np.asarray(final_mask).mean()))
    xyz = np.concatenate(all_xyz, 0) if all_xyz else np.zeros((0, 3), np.float32)
    rgb = (np.concatenate(all_rgb, 0) if all_rgb and len(all_rgb) == len(all_xyz)
           else None)
    return xyz, rgb
