"""TANK_r05.json: T&T deployment-point throughput vs the pinned derived
GPU denominator (TANK_DENOMINATOR_r03.json), round 5.

Adds over the round-4 artifact (VERDICT r4 next #1/#4, weak #4):
  - regression guard tiers mirroring bench.py (warn <90% / flag <75% of
    the last committed best_maps_per_s) so T&T numbers can't silently
    regress either;
  - a NON-PLANAR scene row (two planes + slant, occlusion edges — the
    content class between the plane rig and the noise cliff) with its
    rung occupancy;
  - depth sanity against the known geometry on every row.

    timeout 10800 python scripts/tank_r5_artifact.py > /tmp/tank_r5_art.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo/tests")

import tank_scene_rig as rig  # noqa: E402

BOUND = json.load(open("/root/repo/TANK_DENOMINATOR_r03.json"))
ART = "/root/repo/TANK_r05.json"
LAST_COMMITTED_MAPS_PER_S = 5.042     # round-5 best (TANK_r05.json)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")
    cfg = EffiMVSConfig(ndepths=rig.NDEPTHS, compute_dtype=jnp.bfloat16)

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    fjit = jax.jit(lambda i, s1, s2, s3, d: forward(
        params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
        cfg, ctx=None)["depth"][-1])

    def run(imgs, pm, dv, iters=6):
        B = imgs.shape[0]
        args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
                jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
                jnp.asarray(dv))
        t0 = time.perf_counter()
        d0 = fjit(*args)
        fence(d0)
        compile_s = time.perf_counter() - t0
        dn = np.asarray(d0, np.float32)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fjit(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters / B
        return dt, compile_s, dn

    scene_rows = []
    for B in (1, 2, 3):
        imgs, pm, dv = rig.batch(B)
        try:
            dt, compile_s, dn = run(imgs, pm, dv)
        except Exception as e:  # noqa: BLE001 — large B may OOM HBM
            print(f"B={B} failed: {type(e).__name__}: {e}", flush=True)
            break
        scene_rows.append({
            "B": B, "s_per_map": round(dt, 4),
            "maps_per_s": round(1 / dt, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "median_depth_m": round(float(np.median(dn)), 4),
            "mean_abs_err_mm_vs_plane": round(
                float(np.abs(dn - rig.PLANE_Z).mean() * 1000), 2),
            "in_band_frac": float(((dn > 0.4) & (dn < 3.5)).mean()),
        })
        print(scene_rows[-1], flush=True)
    best = max(scene_rows, key=lambda s: s["maps_per_s"])

    # non-planar content: occlusion edges flag 4-6% of tiles — the
    # realistic middle ground between the plane rig and the noise cliff
    import probe_rung_occupancy_scene as occ
    imgs_np, pm_np, dv_np, gt_ref, _nd, _ck = occ.tank_inputs()
    dt_np, _, dn_np = run(imgs_np, pm_np, dv_np)
    valid = gt_ref > 0
    multi_depth_row = {
        "B": 1, "s_per_map": round(dt_np, 4),
        "maps_per_s": round(1 / dt_np, 3),
        "mean_abs_err_mm_vs_gt": round(float(
            np.abs(dn_np[0] - gt_ref)[valid].mean() * 1000), 2),
        "median_abs_err_mm_vs_gt": round(float(
            np.median(np.abs(dn_np[0] - gt_ref)[valid]) * 1000), 2),
    }
    print("multi_depth:", multi_depth_row, flush=True)

    # adversarial content: uniform noise -> incoherent refined hypotheses
    rng_ = np.random.default_rng(0)
    imgs, pm, dv = rig.batch(1)
    noise = rng_.uniform(0, 1, imgs.shape).astype(np.float32)
    dt_noise, _, _ = run(noise, pm, dv, iters=3)
    noise_row = {"B": 1, "s_per_map": round(dt_noise, 4),
                 "maps_per_s": round(1 / dt_noise, 3)}
    print("noise:", noise_row, flush=True)

    bound = BOUND["bound_2x_maps_per_s"]
    art = {
        "config": {
            "H": rig.H, "W": rig.W, "views": rig.V,
            "ndepths": list(rig.NDEPTHS), "numdepth": rig.NUMDEPTH,
            "ckpt": "model_tank.ckpt", "dtype": "bfloat16",
            "ladder": ("patch16" if __import__(
                "effi_mvs_plus_tpu.ops.pallas_warp",
                fromlist=["LADDER_PATCH16"]).LADDER_PATCH16 else "legacy"),
            "content": "textured-plane scene (tank_scene_rig.py)"},
        "scene_sweep": scene_rows,
        "multi_depth_scene": multi_depth_row,
        "noise_fallback": noise_row,
        "best_maps_per_s": best["maps_per_s"],
        "vs_baseline": round(best["maps_per_s"]
                             / BOUND["derived_tank_gpu_maps_per_s"], 2),
        "bound_2x_maps_per_s": bound,
        "meets_2x_bound": bool(best["maps_per_s"] >= bound),
        "denominator": BOUND,
        "warn_below_90pct_committed": bool(
            best["maps_per_s"] < 0.90 * LAST_COMMITTED_MAPS_PER_S),
        "regressed_vs_committed": bool(
            best["maps_per_s"] < 0.75 * LAST_COMMITTED_MAPS_PER_S),
        "last_committed_maps_per_s": LAST_COMMITTED_MAPS_PER_S,
    }
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
