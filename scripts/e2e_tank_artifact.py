"""E2E_TANK_r05.json: the metric-scale fused accuracy oracle at the FULL
T&T deployment point (VERDICT r4 next #2) — 1056x1920, 11 views, ndepths
96/8/8, model_tank.ckpt on TPU, through the REAL chain:
build_tank_scene -> cli/test_tank.py (InferenceEngine + consistency_tank
with the deployed Horse filter config) -> PLY -> chamfer vs the exactly
known plane z=1.6 m.

Counterpart of the reference's leaderboard oracle
(/root/reference/test_tank.py:455-570, README.md:80).  Records the
overall/acc/comp (mm) against the ~59 mm stage-1 hypothesis spacing at
the plane, under BOTH the deployed Horse filter params (depth_filter
6000 -> sub-2 mm cross-view consistency ladder) and the rig-scaled
ladder (depth_filter 200) the CI test uses.

    timeout 7200 python scripts/e2e_tank_artifact.py > /tmp/e2e_tank_art.log 2>&1
"""

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

ART = "/root/repo/E2E_TANK_r05.json"
WORK = "/tmp/e2e_tank_full"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import test_e2e_tank_accuracy as T

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)

    # full deployment point; T&T-class FOV (tank.py native cams ~1.16*W).
    # Only the DEPLOYED Horse filter params run at full scale: at 1056p
    # the cross-view consistency is sub-mm, the geo mask keeps 96-99.9%
    # of pixels, and the sub-2 mm ladder is the canonical config.  (A
    # rig-scaled depth_filter=200 run keeps ~22M points and its chamfer
    # eval OOMs the 125 GB host — the permissive ladder is exercised at
    # CI scale by tests/test_e2e_tank_accuracy.py instead.)
    common = dict(H=1056, W=1920, views=11, num_view=11, focal_mult=1.16,
                  gt_spacing_mm=4.0)
    runs = {}
    for tag, df, skip in (("deployed_horse_params", 6000.0, False),):
        stats = T.run_tank_chain(WORK, depth_filter=df, skip_depth=skip,
                                 **common)
        stats["depth_filter"] = df
        runs[tag] = stats
        print(tag, json.dumps(stats), flush=True)

    best = min(runs.values(), key=lambda s: s["overall_mm"])
    art = {
        "config": {**common, "plane_z_m": T.PLANE_Z_M,
                   "band_m": list(T.BAND_M),
                   "ckpt": "model_tank.ckpt",
                   "backend": jax.default_backend()},
        "stage1_spacing_mm": T.SPACING_MM,
        "runs": runs,
        "overall_mm": best["overall_mm"],
        "passes_half_spacing_bound": bool(
            best["overall_mm"] < T.SPACING_MM / 2),
    }
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
