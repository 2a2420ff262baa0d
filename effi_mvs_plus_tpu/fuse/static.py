"""Static (non-dynamic) fusion variants from the Vis-MVSNet lineage.

TPU-native equivalents of the reference's static consistency path
(/root/reference/misc/fusion.py:79-115: ``get_reproj`` / ``vis_filter`` /
``ave_fusion`` plus the ``prob_filter`` gate at :70-76).  The deployed
T&T driver uses the *dynamic* variants (fuse/dypcd.py::consistency_tank);
these static ones are the fixed-threshold alternative the upstream code
keeps available, carried here for completeness.

Semantics carried exactly (they differ from the dynamic path!):

* pixel grids use **+0.5 cell centers** (fusion.py:8-13),
* every homogeneous normalization divides by ``last + 1e-9``
  (fusion.py:23-48),
* ``get_reproj`` projects each *source* pixel (with its own depth) into
  the reference camera, producing an (x_ref, y_ref, depth_in_ref) field
  on source pixels, then warps that field into reference-pixel alignment
  with ``project_img`` — whose normalized coords are ``coord/size*2-1``
  **clamped to [-1.1, 1.1]** and sampled with align_corners=True
  (fusion.py:50-65): sampled pixel position = (norm+1)/2*(size-1),
* ``vis_filter`` thresholds are reciprocals — dist < 1/img_dist_thresh,
  |Δdepth| < 1/depth_thresh — the in_range input is overridden to ones
  (fusion.py:105), and the vote is ``sum_views >= vthresh - 1.1``,
* ``ave_fusion`` averages passing reprojected depths with the reference
  depth counted once (fusion.py:113-115).

Everything is a single jittable call over all source views (vmap), no
per-view Python loop.
"""

from __future__ import annotations

import functools

import jax
from jax import lax
import jax.numpy as jnp

from effi_mvs_plus_tpu.core.geometry import inv3x3
from effi_mvs_plus_tpu.fuse.dypcd import _rigid_inv
from effi_mvs_plus_tpu.ops import bilinear_gather

# Coordinate-geometry matmuls run at HIGHEST precision: on TPU the default
# matmul precision truncates f32 operands to bf16 (pixel coords up to 1920
# quantise to 8-px steps) — the round-5 T&T bias adjudication
# (core/geometry.py _PREC) applies to the fusion reprojection chain too.
_PREC = lax.Precision.HIGHEST



def _centered_grid(H, W):
    """+0.5 cell-center pixel grid: x (H,W), y (H,W)."""
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    return x, y


def _img2cam(x, y, depth, K_inv):
    """(H,W) centered pixel coords + depth -> (H,W,3) cam points, with the
    reference's normalize-then-scale (÷ (z+1e-9), fusion.py:23-25)."""
    pix = jnp.stack([x, y, jnp.ones_like(x)], -1)
    ray = jnp.einsum("ij,hwj->hwi", K_inv, pix, precision=_PREC)
    ray = ray / (ray[..., 2:3] + 1e-9)
    return ray * depth[..., None]


def _cam2img(xyz, K):
    """(H,W,3) cam points -> centered pixel coords (x, y), ÷(z+1e-9)."""
    proj = jnp.einsum("ij,hwj->hwi", K, xyz, precision=_PREC)
    z = proj[..., 2] + 1e-9
    return proj[..., 0] / z, proj[..., 1] / z


def _reproj_field_one(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """One source view of ``get_reproj`` (fusion.py:79-96): the
    (x_ref, y_ref, depth_in_ref) field on source pixels, warped into
    reference-pixel alignment via the ref-depth projection.

    Returns (reproj_xyd (H,W,3), in_range (H,W) bool)."""
    H, W = depth_ref.shape
    xs, ys = _centered_grid(H, W)
    K_ref_inv = inv3x3(K_ref)
    K_src_inv = inv3x3(K_src)
    src2ref = jnp.matmul(E_ref, _rigid_inv(E_src),
                     precision=_PREC)     # world hop composed rigidly
    ref2src = jnp.matmul(E_src, _rigid_inv(E_ref), precision=_PREC)

    # field on SOURCE pixels: project each src pixel into the ref camera
    xyz_src = _img2cam(xs, ys, depth_src, K_src_inv)
    xyz_in_ref = (jnp.einsum("ij,hwj->hwi", src2ref[:3, :3], xyz_src, precision=_PREC)
                  + src2ref[:3, 3])
    x_ref, y_ref = _cam2img(xyz_in_ref, K_ref)
    field = jnp.stack([x_ref, y_ref, xyz_in_ref[..., 2]], -1)   # (H,W,3)

    # project_img: ref pixels -> src coords via the REF depth map, then
    # sample the field with the /size*2-1 normalization quirk
    xyz_ref = _img2cam(xs, ys, depth_ref, K_ref_inv)
    xyz_in_src = (jnp.einsum("ij,hwj->hwi", ref2src[:3, :3], xyz_ref, precision=_PREC)
                  + ref2src[:3, 3])
    wx, wy = _cam2img(xyz_in_src, K_src)
    nx = jnp.clip(wx / W * 2.0 - 1.0, -1.1, 1.1)
    ny = jnp.clip(wy / H * 2.0 - 1.0, -1.1, 1.1)
    in_range = (nx >= -1.0) & (nx <= 1.0) & (ny >= -1.0) & (ny <= 1.0)
    px = (nx + 1.0) * 0.5 * (W - 1)          # align_corners=True mapping
    py = (ny + 1.0) * 0.5 * (H - 1)
    warped = bilinear_gather(field[None], px.reshape(1, -1),
                             py.reshape(1, -1)).reshape(H, W, 3)
    return warped, in_range


def get_reproj(depth_ref, K_ref, E_ref, depth_srcs, K_srcs, E_srcs):
    """All-views static reprojection (fusion.py:79-96).

    depth_ref (H,W); depth_srcs (S,H,W); K_* (3,3)/(S,3,3);
    E_* (4,4)/(S,4,4).
    Returns (reproj_xyd (S,H,W,3), in_range (S,H,W) bool)."""
    return jax.vmap(
        lambda d, K, E: _reproj_field_one(depth_ref, K_ref, E_ref, d, K, E)
    )(depth_srcs, K_srcs, E_srcs)


def vis_filter(depth_ref, reproj_xyd, img_dist_thresh, depth_thresh,
               vthresh):
    """Static visibility filter (fusion.py:99-110).

    reproj_xyd: (S,H,W,3).  Thresholds are the reference's reciprocal
    convention: dist < 1/img_dist_thresh, |Δd| < 1/depth_thresh; the
    in_range input is overridden to ones upstream (fusion.py:105) so it
    is not a parameter here.
    Returns (per-view masks (S,H,W) bool, vote mask (H,W) bool)."""
    H, W = depth_ref.shape
    x, y = _centered_grid(H, W)
    dist = jnp.sqrt((reproj_xyd[..., 0] - x) ** 2
                    + (reproj_xyd[..., 1] - y) ** 2)            # (S,H,W)
    ddiff = jnp.abs(depth_ref - reproj_xyd[..., 2])
    masks = (dist < 1.0 / img_dist_thresh) & (ddiff < 1.0 / depth_thresh)
    vote = jnp.sum(masks.astype(jnp.float32), axis=0) >= (vthresh - 1.1)
    return masks, vote


def ave_fusion(depth_ref, reproj_xyd, masks):
    """Average passing reprojected depths with the reference depth counted
    once (fusion.py:113-115)."""
    m = masks.astype(jnp.float32)
    num = jnp.sum(reproj_xyd[..., 2] * m, axis=0) + depth_ref
    return num / (jnp.sum(m, axis=0) + 1.0)


def prob_filter(conf, prob_thresh, greater=True):
    """Photometric gate (fusion.py:70-76): conf (C,H,W) per-stage maps AND-
    reduced against per-stage thresholds (C,)."""
    thresh = jnp.asarray(prob_thresh, jnp.float32).reshape(-1, 1, 1)
    m = conf > thresh if greater else conf < thresh
    return jnp.all(m, axis=0)


@functools.partial(jax.jit, static_argnames=("img_dist_thresh",
                                             "depth_thresh", "vthresh"))
def consistency_static(depth_ref, conf_ref, K_ref, E_ref, depth_srcs,
                       K_srcs, E_srcs, prob_thresh=0.8,
                       img_dist_thresh=1.0, depth_thresh=100.0,
                       vthresh=2.0):
    """One-call static fusion for a reference view: reproject + visibility
    vote + average, gated by the photometric confidence.

    Returns (final (H,W) bool, fused (H,W), geo (H,W), photo (H,W)) —
    the same contract as fuse.dypcd.consistency, so the drivers can swap
    ladders."""
    reproj_xyd, _ = get_reproj(depth_ref, K_ref, E_ref,
                               depth_srcs, K_srcs, E_srcs)
    masks, geo = vis_filter(depth_ref, reproj_xyd, img_dist_thresh,
                            depth_thresh, vthresh)
    fused = ave_fusion(depth_ref, reproj_xyd, masks)
    photo = conf_ref > prob_thresh
    return photo & geo, fused, geo, photo
