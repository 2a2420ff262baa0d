"""TPU gradient A/B for the pallas warp backward kernel.

Companion to scripts/tpu_batch_health.py (which gates the FORWARD): for
each stage shape x batch size, computes d_ref/d_src of an L2 objective
through BOTH the pallas views-fused path and the XLA gather path, fp32,
and asserts agreement.  This is the acceptance gate for backward-kernel
changes (e.g. the run-deferred source-gradient flush).

Run standalone (fresh process; relay crashes poison a process):
    nohup timeout 7200 python scripts/tpu_bwd_health.py > /tmp/bwd_health.log 2>&1 &
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

V = 5  # DTU eval view count -> 4 source views

# stage shapes at training resolution (bwd runs during training); stages
# 2/3 use the narrow refined band so the pallas path (not the geometry
# fallback) is what's exercised
STAGES = [
    ("stage1", 64, 80, 32, 48, (425.0, 935.0)),
    ("stage2", 128, 160, 16, 8, (620.0, 700.0)),
    ("stage3", 256, 320, 8, 8, (650.0, 670.0)),
]
BATCHES = [1, 2, 4]


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def fence(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

    fence(jnp.zeros((1, 1)))
    print("tunnel up", flush=True)

    failures = []
    for name, H, W, C, D, (dlo, dhi) in STAGES:
        f = 1.3 * W
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

        def P(E):
            out = np.eye(4, dtype=np.float32)
            out[:3, :4] = K @ E[:3, :4]
            return out

        rots, trs = [], []
        for v in range(V - 1):
            E = np.eye(4, dtype=np.float32)
            a = 0.012 * (v + 1 - (V - 1) / 2)
            c, s = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
            E[:3, 3] = [9.0 * (v + 1), 2.0 * v, 0.0]
            r, t = geometry.relative_projection(
                jnp.asarray(P(E))[None],
                jnp.asarray(P(np.eye(4, dtype=np.float32)))[None])
            rots.append(r[0])
            trs.append(t[0])
        rot1 = jnp.stack(rots)[None]
        tr1 = jnp.stack(trs)[None]

        for B in BATCHES:
            rot = jnp.broadcast_to(rot1, (B, V - 1, 3, 3))
            tr = jnp.broadcast_to(tr1, (B, V - 1, 3))
            key = jax.random.PRNGKey(B)
            k1, k2 = jax.random.split(key)
            ref = jax.random.normal(k1, (B, H, W, C), jnp.float32)
            src = jax.random.normal(k2, (B, V - 1, H, W, C), jnp.float32)
            depth = jnp.broadcast_to(
                jnp.linspace(dlo, dhi, D, dtype=jnp.float32)
                [None, :, None, None], (B, D, H, W))

            def loss_pallas(rf, sf):
                o = pw.warp_correlate_views_fused(rf, sf, rot, tr, depth)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def loss_xla(rf, sf):
                o = pw._views_xla(rf, sf, rot, tr, depth, 1)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(ref, src)
            gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(ref, src)
            diffs = []
            for a, b in zip(gx, gp):
                a = np.asarray(jax.device_get(a), np.float32)
                b = np.asarray(jax.device_get(b), np.float32)
                scale = max(1.0, float(np.abs(a).max()))
                diffs.append(float(np.abs(a - b).max()) / scale)
            ok = all(d < 1e-4 for d in diffs)
            print(f"{name} B={B}: d_ref reldiff {diffs[0]:.2e}, "
                  f"d_src reldiff {diffs[1]:.2e} -> "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
            if not ok:
                failures.append((name, B, diffs))

    if failures:
        print("FAILURES:", failures, flush=True)
        sys.exit(1)
    print(f"all {len(STAGES) * len(BATCHES)} grad configs healthy",
          flush=True)


if __name__ == "__main__":
    main()
