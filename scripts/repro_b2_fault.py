"""Minimal repro for the B=2 TPU-worker crash (BASELINE.md next-steps #4).

Observed 2026-08-17, twice, in separate processes: running the full
forward at the DTU eval shape with batch 2 kills the TPU worker
(`UNAVAILABLE: TPU worker process crashed or restarted`) while B=1/4/6/8
are healthy.  This script bisects: it runs the pallas plane-sweep kernel
ALONE at B=2 (stage-1 shapes), then the full forward, printing a marker
before each step — whichever step crashes the worker names the culprit.

Run standalone (fresh process; the crash poisons a process):
    timeout 1800 python scripts/repro_b2_fault.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

H, W, V, B = 864, 1152, 5, 2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from effi_mvs_plus_tpu.ops import pallas_warp

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros((1, 1)))
    print("tunnel up", flush=True)

    # --- step 1: pallas kernel alone, stage-1 shapes (1/8 res, D=48) ---
    h, w, C, D = H // 8, W // 8, 32, 48
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
    srcs = jnp.asarray(
        rng.normal(size=(B, V - 1, h, w, C)).astype(np.float32))
    rots = jnp.tile(jnp.eye(3)[None, None], (B, V - 1, 1, 1)).astype(
        np.float32)
    transs = jnp.zeros((B, V - 1, 3), np.float32)
    depth = jnp.ones((B, D, h, w), np.float32) * 600.0
    print("step 1: pallas warp_correlate_views_fused alone, B=2 ...",
          flush=True)
    out = jax.jit(pallas_warp.warp_correlate_views_fused)(
        ref, srcs, rots, transs, depth)
    fence(out)
    print("step 1 OK", flush=True)

    # --- step 2: full forward, B=2 (the original crash) ---
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.data import cams as camio

    params = init_params(jax.random.PRNGKey(0))
    cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, V, H, W, 3)).astype(np.float32))
    intr_q = np.array([[360.0, 0, W / 8], [0, 360.0, H / 8], [0, 0, 1]],
                      np.float32)
    exts = []
    for v in range(V):
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
    dv = jnp.asarray(np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy())
    print("step 2: full forward, B=2 ...", flush=True)
    out = jax.jit(lambda *a: forward(
        params, a[0], {"stage1": a[1], "stage2": a[2], "stage3": a[3]},
        a[4], cfg, ctx=None)["depth"][-1])(
            imgs, proj_ms["stage1"], proj_ms["stage2"], proj_ms["stage3"], dv)
    fence(out)
    print("step 2 OK — crash not reproduced", flush=True)


if __name__ == "__main__":
    main()
