"""Per-segment TPU timing of the forward pass at the DTU eval shape.

Times each model component in isolation (own jit, fenced by a scalar host
readback — block_until_ready is unreliable over the axon relay) so Pallas /
layout work targets the real hot spot.  Segments print as they complete
(relay compiles run minutes each; partial output survives a timeout).

    python scripts/profile_segments.py [--height 864 --width 1152 --views 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, warmup=2, iters=8):
    """Dispatch `iters` times, fence once — relay RTT amortises."""
    import jax
    import jax.numpy as jnp

    def _fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jax.device_get(jnp.sum(leaf)))

    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def report(name, seconds):
    print(f"{name:48s} {seconds * 1e3:9.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=864)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu import ops
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.models import blocks

    print("devices:", jax.devices(), flush=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = EffiMVSConfig(compute_dtype=dt)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, V, H, W = args.batch, args.views, args.height, args.width
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (B, V, H, W, 3), dt)

    h1, w1 = H // 8, W // 8
    h2, w2 = H // 4, W // 4
    h3, w3 = H // 2, W // 2

    # ---------- full forward first: the headline ----------
    if not args.skip_full:
        from effi_mvs_plus_tpu.data import cams as camio
        intr = np.array([[W / 2, 0, W / 16], [0, W / 2, H / 16], [0, 0, 1]],
                        np.float32)
        exts = [np.eye(4, dtype=np.float32)]
        for v in range(1, V):
            E = np.eye(4, dtype=np.float32)
            a = 0.02 * v
            c, s_ = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s_], [0, 1, 0], [-s_, 0, c]],
                                 np.float32)
            E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
            exts.append(E)
        projs = [camio.stage_proj_matrices(E, intr) for E in exts]
        proj_ms = {k: jnp.asarray(np.broadcast_to(
            np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)))
            for k in ("stage1", "stage2", "stage3")}
        dvv = jnp.asarray(np.broadcast_to(
            camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
            (B, 384)))
        full = jax.jit(lambda i, p1, p2, p3, d: forward(
            params, i, {"stage1": p1, "stage2": p2, "stage3": p3}, d, cfg)[
                "depth"][-1])
        report("FULL forward", timeit(
            full, imgs, proj_ms["stage1"], proj_ms["stage2"],
            proj_ms["stage3"], dvv, warmup=2, iters=6))

    # ---------- stage-1 sweep ----------
    ref = jax.random.uniform(key, (B, h1, w1, 32), dt)
    src = jax.random.uniform(key, (B, h1, w1, 32), dt)
    rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)) \
        + 1e-3 * jax.random.normal(key, (B, 3, 3))
    tr = jax.random.normal(key, (B, 3)) * 1e-2
    depth48 = jnp.broadcast_to(
        jnp.linspace(425., 935., 48, dtype=jnp.float32)[None, :, None, None],
        (B, 48, h1, w1)).astype(dt)
    wc = jax.jit(lambda *a: ops.warp_correlate(*a, groups=1))
    report(f"warp_correlate D=48 {h1}x{w1} (x{V-1})",
           timeit(wc, ref, src, rot, tr, depth48))

    vol = jax.random.uniform(key, (B, 48, h1, w1, 1), dt)
    cr = jax.jit(
        lambda v: blocks.cost_reg_net(v, params["cost_regularization"]))
    report(f"cost_reg_net (48,{h1},{w1})", timeit(cr, vol))

    fe = jax.jit(lambda x: blocks.feature_net(x, params["feature"]))
    report("feature_net(all views)", timeit(fe, imgs.reshape(B * V, H, W, 3)))

    # ---------- GRU update blocks ----------
    for s, (hs, ws) in enumerate([(h1, w1), (h2, w2), (h3, w3)]):
        hd, cd = cfg.hdim_stage[s], cfg.cdim_stage[s]
        hid = jax.random.uniform(key, (B, hs, ws, hd), dt)
        ctxf = jax.random.uniform(key, (B, hs, ws, cd), dt)
        inv_d = jax.random.uniform(key, (B, hs, ws, 1), dt)
        volD = jax.random.uniform(key, (B, 48 if s == 0 else 8, hs, ws),
                                  jnp.float32)
        p = params[f"update_block_depth{s + 1}"]

        def mk(hid, ctxf, inv_d, volD, p=p, s=s):
            def get_cost(depth, it):
                dv = 1.0 / depth[..., 0]
                drs = geometry.depth_range_samples_local(dv, cfg.CostNum, 1.0)
                ds = 1.0 / drs
                c1 = ops.resample_volume_at_depths(volD, ds, 400., 960.)
                return jnp.concatenate([c1, c1], axis=1).transpose(
                    0, 2, 3, 1).astype(dt)

            def scale4(disp):
                return geometry.disp_to_depth(disp, 425., 935.)

            return blocks.update_block(hid, get_cost, inv_d, ctxf, p,
                                       cfg.gru_iters[s], scale4)

        ub = jax.jit(lambda *a, _mk=mk: _mk(*a)[1])
        report(f"update_block s{s+1} {hs}x{ws} hdim={hd}",
               timeit(ub, hid, ctxf, inv_d, volD))

    # ---------- stage 2/3 fresh volumes ----------
    for s, (hs, ws, c) in enumerate([(h2, w2, 16), (h3, w3, 8)], start=2):
        refs = jax.random.uniform(key, (B, hs, ws, c), dt)
        srcs = jax.random.uniform(key, (B, hs, ws, c), dt)
        d8 = jnp.broadcast_to(
            jnp.linspace(425., 935., 8, dtype=jnp.float32)[None, :, None,
                                                           None],
            (B, 8, hs, ws)).astype(dt)
        report(f"warp_correlate D=8 {hs}x{ws} (x{V-1}) s{s}",
               timeit(wc, refs, srcs, rot, tr, d8))

    # ---------- CSP + upsample ----------
    fresh = jax.random.uniform(key, (B, 8, h2, w2, 1), dt)
    low = jax.random.uniform(key, (B, 8, h2 // 2, w2 // 2, 1), dt)
    csp = jax.jit(lambda a, b: blocks.csp_block(a, b, params["CSP_R1"]))
    report(f"csp_block (8,{h2},{w2})", timeit(csp, fresh, low))

    val = jax.random.uniform(key, (B, h3, w3), jnp.float32)
    msk = jax.random.uniform(key, (B, h3, w3, 36), jnp.float32)
    cu = jax.jit(lambda v, m: ops.convex_upsample(v, m, 2))
    report(f"convex_upsample {h3}x{w3}->x2", timeit(cu, val, msk))

    print("done", flush=True)


if __name__ == "__main__":
    main()
