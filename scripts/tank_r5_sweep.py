"""Round-5 T&T baseline at HEAD: extended batch sweep + trace.

    timeout 7200 python scripts/tank_r5_sweep.py [--trace] > /tmp/tank_r5_sweep.log 2>&1

Re-measures the T&T deployment point (1056x1920, 11 views, 96/8/8)
after the round-4 precision fix (commit 2f4cc80), extending the batch
sweep past B=3 (VERDICT r4 next-1a: it was still improving at B=3;
B=4 OOM'd on the round-4 tree).  OOM at any B is caught and recorded.
Optionally captures an xplane trace of one iteration at the best B for
scripts/xplane_summary.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import tank_scene_rig as rig  # noqa: E402


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

    rows = []
    best = None
    for B in (1, 2, 3, 4, 5):
        imgs, pm, dv = rig.batch(B)
        args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
                jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
                jnp.asarray(dv))
        try:
            t0 = time.perf_counter()
            d0 = fjit(*args)
            fence(d0)
            compile_s = time.perf_counter() - t0
            dn = np.asarray(d0, np.float32)
            t0 = time.perf_counter()
            out = None
            iters = 6
            for _ in range(iters):
                out = fjit(*args)
            fence(out)
            dt = (time.perf_counter() - t0) / iters / B
        except Exception as e:  # noqa: BLE001 — large B may OOM HBM
            print(f"B={B} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            rows.append({"B": B, "failed": type(e).__name__})
            break
        row = {
            "B": B, "s_per_map": round(dt, 4),
            "maps_per_s": round(1 / dt, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "median_depth_m": round(float(np.median(dn)), 4),
            "mean_abs_err_mm_vs_plane": round(
                float(np.abs(dn - rig.PLANE_Z).mean() * 1000), 2),
            "in_band_frac": float(((dn > 0.4) & (dn < 3.5)).mean()),
        }
        rows.append(row)
        if best is None or row["maps_per_s"] > best[1]["maps_per_s"]:
            best = (args, row)
        print(row, flush=True)

    if "--trace" in sys.argv and best is not None:
        args, row = best
        os.system("rm -rf /tmp/tank_xprof_r5")
        with jax.profiler.trace("/tmp/tank_xprof_r5"):
            fence(fjit(*args))
        print(f"trace of B={row['B']} -> /tmp/tank_xprof_r5", flush=True)

    with open("/tmp/tank_r5_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
