"""Per-segment TPU timing at the T&T deployment point (1056x1920, 11
views, ndepths 96,8,8, B=1) with the bench_tank_tpu rig geometry, plus
the support-ladder rung each stage takes — to find where the 13x gap to
the 2x T&T bound (TANK_DENOMINATOR_r03.json) actually lives.

    timeout 4800 python scripts/profile_tank_r3.py > /tmp/tank_prof.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W, V, B = 1056, 1920, 11, 1
NDEPTHS = (96, 8, 8)


def timeit(fn, *args, warmup=1, iters=4):
    import jax
    import jax.numpy as jnp

    def _fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def report(name, seconds):
    print(f"{name:52s} {seconds * 1e3:9.2f} ms", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu import ops
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params, blocks
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    print("devices:", jax.devices(), flush=True)
    dt = jnp.bfloat16
    cfg = EffiMVSConfig(ndepths=NDEPTHS, compute_dtype=dt)
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    # tank rig (bench_tank_tpu.py): metric scale, 1.5-10.5 cm baselines
    f4 = 1.16 * W / 4.0
    intr_q = np.array([[f4, 0, W / 8], [0, f4, H / 8], [0, 0, 1]],
                      np.float32)
    from effi_mvs_plus_tpu.data import cams as camio
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.015 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [0.03 * v, 0.008 * v, 0.004 * v]
        exts.append(E)
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    ref_P = {k: jnp.asarray(np.stack([projs[0][k]] * (V - 1)))
             for k in ("stage1", "stage2", "stage3")}
    src_P = {k: jnp.asarray(np.stack([p[k] for p in projs[1:]]))
             for k in ("stage1", "stage2", "stage3")}

    stages = [
        ("stage1", H // 8, W // 8, 32, 96, (0.4, 3.5)),
        ("stage2", H // 4, W // 4, 16, 8, (1.0, 1.12)),
        ("stage3", H // 2, W // 2, 8, 8, (1.0, 1.05)),
    ]

    for name, hs, ws, C, D, band in stages:
        rot, tr = geometry.relative_projection(
            src_P[name][:, 1] @ src_P[name][:, 0],
            ref_P[name][:, 1] @ ref_P[name][:, 0])
        rot = jnp.broadcast_to(rot[None], (B, V - 1, 3, 3))
        tr = jnp.broadcast_to(tr[None], (B, V - 1, 3))
        if name == "stage1":
            inv = np.linspace(1 / band[0], 1 / band[1], D, dtype=np.float32)
            dvals = 1.0 / inv
        else:
            dvals = np.linspace(band[0], band[1], D, dtype=np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (B, D, hs, ws)).copy())
        ref = jax.random.uniform(key, (B, hs, ws, C), dt)
        srcs = jax.random.uniform(key, (B, V - 1, hs, ws, C), dt)

        px, py = pw._project_views(rot, tr, depth, hs, ws)
        for rows in (16, 24):
            fits = bool(jax.jit(
                lambda px, py, _r=rows: pw.support_fits(
                    rot, tr, depth, hs, ws, C, px=px, py=py,
                    region_rows=_r))(px, py))
            print(f"{name}: support_fits(rows={rows}) = {fits}", flush=True)

        fn = jax.jit(lambda r, s, ro, t_, d: pw.warp_correlate_views_fused(
            r, s, ro, t_, d, 1))
        report(f"{name} warp_correlate_views ({V-1} views)",
               timeit(fn, ref, srcs, rot, tr, depth))

    # feature net at full res, all views
    imgs = jax.random.uniform(key, (B * V, H, W, 3), dt)
    fe = jax.jit(lambda x: blocks.feature_net(x, params["feature"]))
    report("feature_net(all 11 views)", timeit(fe, imgs))

    # context net (ref view only)
    cn = jax.jit(lambda x: blocks.feature_net(x, params["cnet_depth"]))
    report("context_net(ref)", timeit(cn, imgs[:B]))

    # cost regularizer at stage1 volume (96, 132, 240)
    vol = jax.random.uniform(key, (B, 96, H // 8, W // 8, 1), dt)
    cr = jax.jit(
        lambda v: blocks.cost_reg_net(v, params["cost_regularization"]))
    report("cost_reg_net (96,132,240)", timeit(cr, vol))

    # update blocks per stage
    for s, (hs, ws) in enumerate([(H // 8, W // 8), (H // 4, W // 4),
                                  (H // 2, W // 2)]):
        hd, cd = cfg.hdim_stage[s], cfg.cdim_stage[s]
        hid = jax.random.uniform(key, (B, hs, ws, hd), dt)
        ctxf = jax.random.uniform(key, (B, hs, ws, cd), dt)
        inv_d = jax.random.uniform(key, (B, hs, ws, 1), dt)
        volD = jax.random.uniform(key, (B, NDEPTHS[s], hs, ws), jnp.float32)
        p = params[f"update_block_depth{s + 1}"]

        def mk(hid, ctxf, inv_d, volD, p=p, s=s):
            def get_cost(depth, it):
                dv = 1.0 / depth[..., 0]
                drs = geometry.depth_range_samples_local(dv, cfg.CostNum, 1.0)
                ds = 1.0 / drs
                c1 = ops.resample_volume_at_depths(volD, ds, 0.4, 3.5)
                return jnp.concatenate([c1, c1], axis=1).transpose(
                    0, 2, 3, 1).astype(dt)

            def scale4(disp):
                return geometry.disp_to_depth(disp, 0.4, 3.5)

            return blocks.update_block(hid, get_cost, inv_d, ctxf, p,
                                       cfg.gru_iters[s], scale4)

        ub = jax.jit(lambda *a, _mk=mk: _mk(*a)[1])
        report(f"update_block s{s+1} {hs}x{ws} hdim={hd}",
               timeit(ub, hid, ctxf, inv_d, volD))

    # convex upsample at final stage
    val = jax.random.uniform(key, (B, H // 2, W // 2), jnp.float32)
    msk = jax.random.uniform(key, (B, H // 2, W // 2, 36), jnp.float32)
    cu = jax.jit(lambda v, m: ops.convex_upsample(v, m, 2))
    report("convex_upsample 528x960->x2", timeit(cu, val, msk))

    print("done", flush=True)


if __name__ == "__main__":
    main()
