"""T&T deployment-point throughput on SCENE content (+ optional trace).

    timeout 7200 python scripts/tank_r4_bench.py [--trace] > /tmp/tank_r4.log 2>&1

Times the full forward at B=1 and B=2 with warp=auto on the textured
plane scene (see tank_scene_rig.py for why noise content is the wrong
rig), checks depth sanity against the known plane, and optionally
captures a jax.profiler trace of one B=1 iteration for
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

    rows = []
    fjit = jax.jit(lambda i, s1, s2, s3, d: forward(
        params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
        cfg, ctx=None)["depth"][-1])
    traced = False
    for B in (1, 2):
        imgs, pm, dv = rig.batch(B)
        args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
                jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
                jnp.asarray(dv))
        t0 = time.perf_counter()
        d0 = fjit(*args)
        fence(d0)
        compile_s = time.perf_counter() - t0
        dn = np.asarray(d0, np.float32)
        err_mm = np.abs(dn - rig.PLANE_Z).mean() * 1000
        t0 = time.perf_counter()
        out = None
        iters = 6
        for _ in range(iters):
            out = fjit(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters / B
        rows.append({
            "B": B, "s_per_map": round(dt, 4),
            "maps_per_s": round(1 / dt, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "median_depth_m": round(float(np.median(dn)), 4),
            "mean_abs_err_mm_vs_plane": round(float(err_mm), 2),
            "in_band_frac": float(((dn > 0.4) & (dn < 3.5)).mean()),
        })
        print(rows[-1], flush=True)

        if B == 1 and "--trace" in sys.argv and not traced:
            traced = True
            os.system("rm -rf /tmp/tank_xprof_r4")
            with jax.profiler.trace("/tmp/tank_xprof_r4"):
                fence(fjit(*args))
            print("trace -> /tmp/tank_xprof_r4", flush=True)

    with open("/tmp/tank_r4_scene.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
