"""Benchmark: depth-maps/sec/chip at the reference DTU eval config
(1152x864, 5 views, ndepths 48,8,8, 384 inverse-depth samples).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the pinned reference GPU throughput, 6.9 depth-maps/s on an
RTX 2080 Ti (Effi-MVS CVPR'22 ~0.145 s/map at the DTU eval config; see
BASELINE.md "Pinned reference GPU throughput") — the BASELINE.json bound
is >=2x that, i.e. vs_baseline must be >= 2.0.  The measured CPU
reference on this machine is 0.0101 maps/s (98.6 s/map) for context.
"""

import json
import time

import numpy as np

BASELINE_MAPS_PER_S = 6.9   # pinned reference GPU throughput (BASELINE.md)

# Last value committed to BASELINE.md for THIS metric.  Guard tiers
# (VERDICT r4 weak #4 — a 30-40% slip must not land green): warn below
# 90% of the committed value, flag `regressed_vs_committed` below 75%.
LAST_COMMITTED_MAPS_PER_S = 22.25   # tiled projection-field dispatch (r5)

H, W, V, B = 864, 1152, 5, 6   # B swept in scripts/bench_batch_sweep.py:
                               # {4: 12.1, 6: 14.1, 8: 12.7 maps/s} —
                               # B=6 is the sweet spot (all B healthy,
                               # scripts/tpu_batch_health.py)
WARMUP, ITERS, REPEATS = 2, 8, 3


def main():
    import jax
    # persistent compile cache: the DTU-shape forward takes minutes to
    # compile through the relay; cache it across processes so a fresh
    # bench run (e.g. the driver's) skips straight to execution
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.data import cams as camio

    try:
        params = load_torch_checkpoint(
            "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    except Exception:
        from effi_mvs_plus_tpu.models import init_params
        params = init_params(jax.random.PRNGKey(0))

    cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16)

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
    proj_ms = {k: jnp.asarray(np.broadcast_to(
        np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)).copy())
        for k in ("stage1", "stage2", "stage3")}
    depth_values = jnp.asarray(np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy())
    imgs = jnp.asarray(imgs)

    @jax.jit
    def run(imgs, s1, s2, s3, dv):
        out = forward(params, imgs, {"stage1": s1, "stage2": s2, "stage3": s3},
                      dv, cfg, ctx=None)
        return out["depth"][-1]

    args = (imgs, proj_ms["stage1"], proj_ms["stage2"], proj_ms["stage3"],
            depth_values)

    def fence(x):
        # On the axon relay, block_until_ready returns before execution
        # completes (measured: it reports impossible >800 TFLOP/s); a
        # device->host readback is the only reliable fence, costing ~30 ms
        # relay RTT — so we dispatch a batch of iterations (the device
        # executes them in order) and fence once at the end.
        return float(jax.device_get(x[0, 0, 0]))

    fence(jnp.zeros((1, 1, 1)))      # tunnel warm-up (first op ~100 s)
    for _ in range(WARMUP):
        fence(run(*args))
    rates = []
    for _ in range(REPEATS):         # per-repeat spread (VERDICT r2 #8)
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = run(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / ITERS
        rates.append(B / dt)
    rates.sort()
    maps_per_s = rates[len(rates) // 2]          # median repeat

    print(json.dumps({
        "metric": "depth_maps_per_sec_per_chip_1152x864_5views",
        "value": round(maps_per_s, 4),
        "unit": "depth-maps/s",
        "vs_baseline": round(maps_per_s / BASELINE_MAPS_PER_S, 2),
        "spread": {"min": round(rates[0], 4), "max": round(rates[-1], 4),
                   "repeats": REPEATS, "iters_per_repeat": ITERS},
        "warn_below_90pct_committed": bool(
            maps_per_s < 0.90 * LAST_COMMITTED_MAPS_PER_S),
        "regressed_vs_committed": bool(
            maps_per_s < 0.75 * LAST_COMMITTED_MAPS_PER_S),
    }))


if __name__ == "__main__":
    main()
