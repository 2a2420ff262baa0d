"""Warp-ladder rung occupancy + throughput on NON-PLANAR synthetic
scenes (VERDICT r4 next #4): two depth planes + a slanted surface with
occlusion edges at both deployment rigs, rendered through the rigs' real
camera rings.  The single-plane rigs measure the hot path; uniform noise
measures only the fallback — this is the scene class in between, where
real T&T/DTU content lives.

For each rig it runs the REAL forward (reference checkpoint), then
reconstructs the exact per-stage hypothesis bands the model used (stage 1
global band; stages 2/3 `depth_range_samples_local` around the previous
stage's upsampled output — mirrors models/effi_mvs.py:196-250) and asks
the deployed fit predicate which rung each stage's launch takes and how
many (view, tile)s overflow each window (the sparse-patch load).

    JAX_PLATFORMS=cpu python scripts/probe_rung_occupancy_scene.py dtu
    python scripts/probe_rung_occupancy_scene.py tank --time   # on TPU

With --time also measures steady-state maps/s of the full forward on the
scene content (the number that says whether real-scene throughput sits
near the plane-rig value or the noise cliff).  Writes
/tmp/rung_occupancy_<rig>.json; merge into RUNG_OCCUPANCY_r05.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo/tests")


def tank_inputs():
    import tank_scene_rig as rig
    from synth_scene import render_multi_depth, make_texture
    from effi_mvs_plus_tpu.data import cams as camio
    K, exts = rig.cameras()
    f = float(K[0, 0])
    # meters: near plane (left), slanted surface (center, occluding the
    # backdrop), far backdrop — all inside the 0.4-3.5 band
    surfaces = [
        {"z0": 1.1, "gx": 0.0, "gy": 0.0,
         "x_range": (-1e9, 0.02), "y_range": (-1e9, 1e9)},
        {"z0": 1.45, "gx": 0.35, "gy": 0.15,
         "x_range": (-0.05, 0.75), "y_range": (-0.5, 0.5)},
    ]
    tex = make_texture(np.random.default_rng(0))
    texel = 2.0 * 1.6 / f
    imgs, gts = [], []
    for E in exts:
        img, dep = render_multi_depth(K, E, rig.H, rig.W, surfaces,
                                      tex=tex, texel=texel, bg_z=2.3)
        imgs.append(img.astype(np.float32) / 255.0)
        gts.append(dep)
    intr_q = K.copy()
    intr_q[:2] /= 4.0
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm = {k: np.stack([p[k] for p in projs])[None]
          for k in ("stage1", "stage2", "stage3")}
    dv = camio.inverse_depth_values(
        rig.BAND[0], (rig.BAND[1] - rig.BAND[0]) / rig.NUMDEPTH,
        rig.NUMDEPTH)[None]
    return (np.stack(imgs)[None], pm, dv, gts[0], rig.NDEPTHS,
            "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")


def dtu_inputs():
    from synth_scene import render_multi_depth, make_texture
    from effi_mvs_plus_tpu.data import cams as camio
    H, W, V = 864, 1152, 5
    f = 1440.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        exts.append(E)
    surfaces = [                                       # millimetres
        {"z0": 560.0, "gx": 0.0, "gy": 0.0,
         "x_range": (-1e9, 5.0), "y_range": (-1e9, 1e9)},
        {"z0": 640.0, "gx": 0.25, "gy": 0.1,
         "x_range": (-15.0, 200.0), "y_range": (-160.0, 160.0)},
    ]
    tex = make_texture(np.random.default_rng(1))
    texel = 2.0 * 600.0 / f
    imgs, gts = [], []
    for E in exts:
        img, dep = render_multi_depth(K, E, H, W, surfaces, tex=tex,
                                      texel=texel, bg_z=860.0)
        imgs.append(img.astype(np.float32) / 255.0)
        gts.append(dep)
    intr_q = K.copy()
    intr_q[:2] /= 4.0
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm = {k: np.stack([p[k] for p in projs])[None]
          for k in ("stage1", "stage2", "stage3")}
    dv = camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None]
    return (np.stack(imgs)[None], pm, dv, gts[0], (48, 8, 8),
            "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")


def occupancy(pm, dv, depths, ndepths):
    """Per-stage rung report from forward outputs (depths: list of 13)."""
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.models.effi_mvs import _relative_projections
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    dvj = jnp.asarray(dv)
    depth_interval = float((dvj[:, -1] - dvj[:, 0])[0]) / dv.shape[1]
    ratios = (4.0, 2.0, 1.0)
    rows = []
    for s, name in enumerate(("stage1", "stage2", "stage3")):
        P = geometry.compose_projection(jnp.asarray(pm[name]))
        rots, trs = _relative_projections(P)
        if s == 0:
            h, w = depths[0].shape[-2:]
            hyp = 1.0 / geometry.depth_range_samples_global(
                dvj, ndepths[0], h, w)
        else:
            cur = jnp.asarray(depths[4 * s])            # upsampled prev
            h, w = cur.shape[-2:]
            hyp = 1.0 / geometry.depth_range_samples_local(
                1.0 / cur, ndepths[s],
                jnp.asarray(depth_interval * ratios[s])[None, None, None])
        C = (32, 16, 8)[s]
        tc, rc, rows1 = pw._window_policy(C, ndepths[s])
        px, py = pw._project_views(rots, trs, hyp.astype(jnp.float32), h, w)
        f16 = np.asarray(pw.support_fits(
            rots, trs, hyp, h, w, C, px=px, py=py, per_tile=True,
            region_rows=16, tile_cols=tc, region_cols=rc))
        f1 = np.asarray(pw.support_fits(
            rots, trs, hyp, h, w, C, px=px, py=py, per_tile=True,
            region_rows=rows1, tile_cols=tc, region_cols=rc))
        cap_s, cap_b = pw._patch_capacities(f1.size)
        n16, n1 = int((~f16).sum()), int((~f1).sum())
        rung = (0 if n16 == 0 else
                1 if n1 == 0 else
                2 if n1 <= cap_s else
                3 if n1 <= cap_b else 4)
        rows.append({
            "stage": name, "window": [tc, rc, rows1],
            "tiles": int(f1.size),
            "overflow_rows16": n16, "overflow_rows1": n1,
            "frac_fit_rows16": round(1 - n16 / f1.size, 4),
            "frac_fit_rows1": round(1 - n1 / f1.size, 4),
            "patch_caps": [cap_s, cap_b], "rung": rung,
        })
        print(rows[-1], flush=True)
    return rows


def main():
    rig = sys.argv[1] if len(sys.argv) > 1 else "tank"
    do_time = "--time" in sys.argv
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward

    imgs, pm, dv, gt_ref, ndepths, ckpt = (
        tank_inputs() if rig == "tank" else dtu_inputs())
    print(f"{rig}: rendered {imgs.shape}, gt depth range "
          f"[{gt_ref.min():.3f}, {gt_ref.max():.3f}]", flush=True)

    params = load_torch_checkpoint(ckpt)
    on_tpu = jax.default_backend() == "tpu"
    cfg = EffiMVSConfig(
        ndepths=ndepths,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    fjit = jax.jit(lambda i, s1, s2, s3, d: [
        x.astype(jnp.float32) for x in forward(
            params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
            cfg, ctx=None)["depth"]])
    args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
            jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
            jnp.asarray(dv))
    t0 = time.perf_counter()
    depths = fjit(*args)
    depths = [np.asarray(d) for d in depths]
    print(f"forward done in {time.perf_counter() - t0:.1f}s", flush=True)

    final = depths[-1][0]
    valid = gt_ref > 0
    err = np.abs(final - gt_ref)[valid]
    unit = 1000.0 if rig == "tank" else 1.0              # -> mm
    report = {
        "rig": rig, "ndepths": list(ndepths),
        "depth_mean_abs_err_mm": round(float(err.mean() * unit), 2),
        "depth_median_abs_err_mm": round(
            float(np.median(err) * unit), 2),
        "stages": occupancy(pm, dv, depths, ndepths),
    }

    if do_time:
        def fence(x):
            return float(jax.device_get(jnp.ravel(x[0])[0]))
        iters = 6
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fjit(*args)
        fence(out[-1])
        dt = (time.perf_counter() - t0) / iters
        report["s_per_map"] = round(dt, 4)
        report["maps_per_s"] = round(1 / dt, 3)
        print({"s_per_map": report["s_per_map"],
               "maps_per_s": report["maps_per_s"]}, flush=True)

    out_path = f"/tmp/rung_occupancy_{rig}.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
