"""TPU timing of the fused warp+correlate BACKWARD kernel and the full
train step.

Sections print as they complete (relay compiles run minutes):
1. per-stage value_and_grad of sum(warp_correlate_views_fused) at the
   training-resolution stage shapes (B=4, 4 src views),
2. full train step (same config as scripts/train_run_tpu.py: B=4, V=5,
   512x640, bf16) — median s/step over 30 steps; comparator is
   TRAIN_r02.json's s_per_step_steady.

    timeout 3600 python scripts/bench_warp_bwd.py > /tmp/warp_bwd.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.ops import pallas_warp

    print("devices:", jax.devices(), flush=True)

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros((1,)))
    print("tunnel up", flush=True)

    # ---- per-stage bwd micro-bench (training res 512x640) ----
    # Calibrated-rig pixel-space projections (NOT raw noise matrices — those
    # produce projective distortion that fails support_fits and silently
    # times the XLA fallback).  Stages 2/3 use the narrow refined band the
    # cascade actually produces (8 hypotheses around the estimate).
    from effi_mvs_plus_tpu.core import geometry
    B, V = 4, 4                      # 4 source views
    key = jax.random.PRNGKey(0)

    def rig(h, w):
        f = 1.3 * w
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)

        def P(E):
            out = np.eye(4, dtype=np.float32)
            out[:3, :4] = K @ E[:3, :4]
            return out

        rots, trs = [], []
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            a = 0.012 * (v + 1 - V / 2)
            c, s = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
            E[:3, 3] = [9.0 * (v + 1), 2.0 * v, 0.0]
            r, t = geometry.relative_projection(
                jnp.asarray(P(E))[None],
                jnp.asarray(P(np.eye(4, dtype=np.float32)))[None])
            rots.append(r[0])
            trs.append(t[0])
        return (jnp.broadcast_to(jnp.stack(rots)[None], (B, V, 3, 3)),
                jnp.broadcast_to(jnp.stack(trs)[None], (B, V, 3)))

    for name, (h, w, C, D, lo, hi) in {
        "stage1  64x80  C32 D48": (64, 80, 32, 48, 500., 820.),
        "stage2 128x160 C16 D8": (128, 160, 16, 8, 640., 680.),
        "stage3 256x320 C8  D8": (256, 320, 8, 8, 650., 670.),
    }.items():
        rot, tr = rig(h, w)
        ref = jax.random.uniform(key, (B, h, w, C), jnp.bfloat16)
        src = jax.random.uniform(key, (B, V, h, w, C), jnp.bfloat16)
        depth = jnp.broadcast_to(
            jnp.linspace(lo, hi, D, dtype=jnp.float32)[None, :, None, None],
            (B, D, h, w))
        fits = bool(jax.device_get(pallas_warp.support_fits(
            rot, tr, depth, h, w, C)))
        print(f"{name}: support_fits={fits} "
              f"({'pallas' if fits else 'XLA fallback'} path)", flush=True)

        def loss(rf, sf):
            out = pallas_warp.warp_correlate_views_fused(
                rf, sf, rot, tr, depth)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        for _ in range(2):
            fence(g(ref, src)[0])
        t0 = time.perf_counter()
        r = None
        for _ in range(8):
            r = g(ref, src)
        fence(r[0])
        dt = (time.perf_counter() - t0) / 8
        print(f"bwd {name}: {dt * 1e3:8.2f} ms", flush=True)

    # ---- full train step ----
    from train_run_tpu import make_batch, B as TB, STEPS
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
    from effi_mvs_plus_tpu.train.optim import make_optimizer
    from effi_mvs_plus_tpu.train.trainer import make_train_step

    cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(1e-3, STEPS, params=params)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    rng_np = np.random.default_rng(0)
    batch = make_batch(rng_np, camio)
    batch = {k: (jax.device_put(v) if not isinstance(v, dict)
                 else {kk: jax.device_put(vv) for kk, vv in v.items()})
             for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    times = []
    for i in range(33):
        t0 = time.perf_counter()
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.fold_in(rng, i))
        _ = float(m["loss"])         # per-step readback, same as train_run
        times.append(time.perf_counter() - t0)
    med = float(np.median(times[3:]))
    print(f"train step (B={TB}, 512x640, 5 views, bf16): "
          f"{med * 1e3:.1f} ms/step median "
          f"(TRAIN_r02 comparator 387 ms)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
