"""Full-forward A/B of the warp region window (REGION_COLS x ALIGN_X) —
the deployment gate for shrinking the kernel's horizontal matmul dim.

The kernel matmul is (region_rows*C) x region_cols x lanes, so Qc scales
every stage's MXU FLOPs linearly; per-chunk support spans measured
<=147 px at both rigs (probe_span_stats.py) make 256 columns feasible if
the origin alignment granule drops below 128 (worst-case slack is
ALIGN_X-1 columns).  Constants bind at import, so ONE config per
process:

    for c_a in "384 128" "256 64" "256 32"; do set -- $c_a; \
      EFFI_REGION_COLS=$1 EFFI_ALIGN_X=$2 timeout 3600 \
      python scripts/ab_region_window.py; done > /tmp/ab_region.log 2>&1

Rows: per-stage warp kernel at the T&T geometry, then full forwards at
tank B1/B3 (model_tank, scene content) and the DTU bench point B6
(model_dtu, noise content — the committed bench.py flagship shape).
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
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.ops import pallas_warp as pw
    from effi_mvs_plus_tpu.data import cams as camio

    tag = (f"t{pw.TILE_COLS}_r{pw.REGION_ROWS}_c{pw.REGION_COLS}"
           f"_db{pw._DB_CAP}")

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print(f"tunnel up [{tag}]", flush=True)
    results = []

    def emit(row):
        row["window"] = tag
        results.append(row)
        print(row, flush=True)

    # ---- per-stage warp at T&T geometry (tank rig cameras) ----
    _, pm, dv = rig.batch(1)
    key = jax.random.PRNGKey(0)
    for si, (name, scale, C, D) in enumerate(
            [("stage1", 8, 32, 96), ("stage2", 4, 16, 8),
             ("stage3", 2, 8, 8)]):
        P = jnp.asarray(pm[name])
        src_p = P[:, 1:]
        ref_p = P[:, :1]
        rot, tr = geometry.relative_projection(
            (src_p[..., 1, :, :] @ src_p[..., 0, :, :]).reshape(-1, 4, 4),
            jnp.broadcast_to(ref_p[..., 1, :, :] @ ref_p[..., 0, :, :],
                             src_p[..., 1, :, :].shape).reshape(-1, 4, 4))
        hs, ws = rig.H // scale, rig.W // scale
        B, V = 1, rig.V - 1
        rot = rot.reshape(B, V, 3, 3)
        tr = tr.reshape(B, V, 3)
        if si == 0:
            dvn = np.asarray(dv)[0]
            inv = np.linspace(1 / dvn[0], 1 / dvn[-1], D, dtype=np.float32)
            dvals = 1.0 / inv
        else:
            mid = float(np.asarray(dv).mean())
            dvals = np.linspace(mid * 0.96, mid * 1.04, D, np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (B, D, hs, ws)).copy())
        ref = jax.random.uniform(key, (B, hs, ws, C), jnp.bfloat16)
        srcs = jax.random.uniform(key, (B, V, hs, ws, C), jnp.bfloat16)
        f = jax.jit(lambda r, s, ro, t_, d: pw.warp_correlate_views_fused(
            r, s, ro, t_, d, 1))
        y = f(ref, srcs, rot, tr, depth)
        fence(y)
        t0 = time.perf_counter()
        for _ in range(4):
            y = f(ref, srcs, rot, tr, depth)
        fence(y)
        emit({"unit": f"warp.{name}",
              "ms": round((time.perf_counter() - t0) / 4 * 1e3, 2)})

    # ---- full forwards ----
    def bench(params, cfg, args, B, iters):
        f = jax.jit(lambda i, s1, s2, s3, d: forward(
            params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
            cfg, ctx=None)["depth"][-1])
        y = f(*args)
        fence(y)
        med = float(np.median(np.asarray(y, np.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(*args)
        fence(y)
        return (time.perf_counter() - t0) / iters / B, med

    params_t = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")
    cfg_t = EffiMVSConfig(ndepths=rig.NDEPTHS, compute_dtype=jnp.bfloat16)
    for B in (1, 3):
        imgs, pm_b, dv_b = rig.batch(B)
        args = (jnp.asarray(imgs), jnp.asarray(pm_b["stage1"]),
                jnp.asarray(pm_b["stage2"]), jnp.asarray(pm_b["stage3"]),
                jnp.asarray(dv_b))
        dt, med = bench(params_t, cfg_t, args, B, iters=6)
        emit({"point": f"tank.B{B}", "s_per_map": round(dt, 4),
              "maps_per_s": round(1 / dt, 3), "median_depth": round(med, 4)})

    params_d = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    H, W, V, B = 864, 1152, 5, 6
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (B, V, H, W, 3)).astype(np.float32)
    intr_q = np.array([[360.0, 0, W / 8], [0, 360.0, H / 8], [0, 0, 1]],
                      np.float32)
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        exts.append(E)
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm_d = {k: jnp.asarray(np.broadcast_to(
        np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)).copy())
        for k in ("stage1", "stage2", "stage3")}
    dv_d = jnp.asarray(np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy())
    args = (jnp.asarray(imgs), pm_d["stage1"], pm_d["stage2"],
            pm_d["stage3"], dv_d)
    cfg_d = EffiMVSConfig(compute_dtype=jnp.bfloat16)
    dt, med = bench(params_d, cfg_d, args, B, iters=8)
    emit({"point": "dtu.B6", "s_per_map": round(dt, 4),
          "maps_per_s": round(1 / dt, 3), "median_depth": round(med, 1)})

    out = f"/tmp/ab_region_{tag}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
