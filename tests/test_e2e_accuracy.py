"""The composed accuracy oracle (VERDICT r2 missing #1 / next #2): run the
REAL chain — cli/test_dtu.py inference with the imported reference
checkpoint -> fuse/dypcd.py -> PLY -> eval/dtu.py chamfer with a synthetic
ObsMask/plane — on a multi-view synthetic scene whose surface is exactly
known (a textured plane at z=600 mm), and assert the end-to-end `overall`
is far below the initial depth-hypothesis spacing.

This is the sandbox stand-in for the DTU <=0.32 mm protocol
(/root/reference/evaluations/dtu/ComputeStat_web.m:75-83): it cannot
reproduce the absolute DTU number (different imagery), but it DOES
exercise every cross-module unit/geometry convention at once — a flipped
intrinsic scale, a wrong inverse-depth order, a fusion reprojection bug,
or an eval mask error each blow the asserted bound by an order of
magnitude.

Geometry floors (documented, not model error): pixel footprint at the
plane = depth/focal = 600/960 = 0.625 mm -> the method cloud samples the
plane at ~0.625 mm, so stl->method completeness has a ~0.3 mm sampling
floor even for perfect depths.  Scene-geometry probes (2026-08-19): the
checkpoint's matching on this texture is ~0.25 px, so depth error scales
as z^2/(f*b) — focal 960 / baseline 80 puts the median per-view depth
error at 0.6-1.2 mm, which is what the fused cloud can deliver.

Run `python scripts/e2e_accuracy_synth.py` to produce the committed JSON
artifact (E2E_ACCURACY_r03.json) from the same chain.
"""

import json
import os

import numpy as np
import pytest

from synth_scene import build_scene

CKPT = "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt"

PLANE_Z = 600.0
FOCAL = 960.0
BASELINE_MM = 80.0       # depth sensitivity z^2/(f*b) ~ 0.6 mm per 0.25 px
                         # of matching error — DTU-rig-class triangulation
H, W, VIEWS = 128, 160, 5
INITIAL_SPACING_MM = (935.0 - 425.0) / 48   # stage-1 sweep spacing ~10.6 mm


def run_accuracy_chain(workdir, gt_spacing=0.8):
    """Inference -> fusion -> PLY -> chamfer eval on the synthetic plane.
    Returns the stats dict (acc/comp/overall + context)."""
    root = os.path.join(workdir, "data")
    out = os.path.join(workdir, "out")
    os.makedirs(root, exist_ok=True)
    build_scene(root, n_views=VIEWS, H=H, W=W, depth_plane=PLANE_Z,
                focal=FOCAL, baseline=BASELINE_MM)
    listfile = os.path.join(root, "list.txt")

    from effi_mvs_plus_tpu.cli import test_dtu
    test_dtu.main([
        "--testpath", root, "--testlist", listfile, "--loadckpt", CKPT,
        "--outdir", out, "--num_view", str(VIEWS),
        "--max_h", str(H), "--max_w", str(W),
        "--num_worker", "1", "--conf", "0.3",
    ])

    from effi_mvs_plus_tpu.fuse.ply import read_ply
    method, _ = read_ply(os.path.join(out, "mvsnet001_l3.ply"))
    method = np.asarray(method, np.float64)
    assert len(method) > 1000, f"fusion kept only {len(method)} points"

    # exactly-known ground truth: the plane z=PLANE_Z sampled on a world
    # grid covering the WELL-OBSERVED interior of the reference view's
    # footprint (camera 0 at identity; -5 mm inset so completeness only
    # demands surface the rig definitely observed — the MATLAB protocol's
    # ObsMask/plane restriction plays this role on real DTU)
    cx, cy = W / 2, H / 2
    x0, x1 = (0 - cx) / FOCAL * PLANE_Z, (W - 1 - cx) / FOCAL * PLANE_Z
    y0, y1 = (0 - cy) / FOCAL * PLANE_Z, (H - 1 - cy) / FOCAL * PLANE_Z
    xs = np.arange(x0 + 5, x1 - 5, gt_spacing)
    ys = np.arange(y0 + 5, y1 - 5, gt_spacing)
    gx, gy = np.meshgrid(xs, ys)
    stl = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, PLANE_Z)], 1)

    # synthetic ObsMask: a permissive voxel grid around the GT volume
    from effi_mvs_plus_tpu.eval import dtu as E
    bb = np.array([[xs[0] - 20, ys[0] - 20, PLANE_Z - 40],
                   [xs[-1] + 20, ys[-1] + 20, PLANE_Z + 40]])
    res = 4.0
    shape = tuple(np.ceil((bb[1] - bb[0]) / res).astype(int) + 2)
    obs_mask = np.ones(shape, bool)
    plane = np.array([0.0, 0.0, 1.0, -(PLANE_Z - 30.0)])  # z > plane-30

    r = E.evaluate_scan(method, stl, obs_mask, bb, res, plane, dst=0.2)
    stats = {
        "n_method_pts": int(len(method)),
        "n_stl_pts": int(len(stl)),
        "acc_mean_mm": r.acc_mean,
        "comp_mean_mm": r.comp_mean,
        "overall_mm": (r.acc_mean + r.comp_mean) / 2,
        "initial_hypothesis_spacing_mm": INITIAL_SPACING_MM,
        "pixel_footprint_mm": PLANE_Z / FOCAL,
        "config": {"H": H, "W": W, "views": VIEWS, "plane_z": PLANE_Z,
                   "focal": FOCAL, "gt_spacing_mm": gt_spacing,
                   "ckpt": os.path.basename(CKPT)},
    }
    return stats


@pytest.mark.slow
def test_synthetic_scene_overall_far_below_hypothesis_spacing(tmp_path):
    stats = run_accuracy_chain(str(tmp_path))
    # the whole point: a composed-chain convention bug (flipped intrinsics,
    # wrong depth ordering, fusion frame error, eval mask bug) produces
    # tens of mm here; the end-to-end overall must sit FAR below the
    # 10.6 mm initial sweep spacing (2 mm ~ the per-view matching floor
    # plus sampling floors at this rig).
    assert stats["overall_mm"] < 2.0, stats
    # and each direction individually
    assert stats["acc_mean_mm"] < 2.0, stats
    assert stats["comp_mean_mm"] < 2.0, stats
    out = os.environ.get("E2E_ACCURACY_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(stats, f, indent=1)
