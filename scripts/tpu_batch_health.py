"""TPU batch-sweep health check for the pallas warp kernel (VERDICT r1 #1).

For every batch size B=1..8 and every DTU-eval stage shape, runs the
all-views fused pallas kernel AND the XLA gather path, asserts numerical
agreement, and prints one line per config incrementally.  A TPU-worker
crash at any config names the culprit (the process dies there); a clean
pass across all 24 configs plus the full-forward B=2 repro
(scripts/repro_b2_fault.py) is the health evidence BASELINE.md cites.

Run standalone (fresh process; relay crashes poison a process):
    nohup timeout 7200 python scripts/tpu_batch_health.py > /tmp/health.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V = 5  # DTU eval view count -> 4 source views

# (name, H, W, C, D, depth band): stage 1 sweeps the full 425-935 DTU
# range; stages 2/3 sweep the narrow refined band the cascade actually
# produces (8 hypotheses around the current estimate — reference
# Effi_MVS_plus.py shrinks the interval per stage), so the configs
# exercise the PALLAS path, not just the wild-geometry XLA fallback.
STAGES = [
    ("stage1", 108, 144, 32, 48, (425.0, 935.0)),
    ("stage2", 216, 288, 16, 8, (620.0, 700.0)),
    ("stage3", 432, 576, 8, 8, (650.0, 670.0)),
]


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

    only = set(sys.argv[1:])            # optional stage-name filter
    failures = []
    for name, H, W, C, D, (dlo, dhi) in STAGES:
        if only and name not in only:
            continue
        # realistic calibrated-rig relative projections per source view
        f = 1.3 * W
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

        def P(E):
            out = np.eye(4, dtype=np.float32)
            out[:3, :4] = K @ E[:3, :4]
            return out

        rots, transs = [], []
        for v in range(1, V):
            E = np.eye(4, dtype=np.float32)
            a = 0.02 * v
            c, s = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
            E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
            r, t = geometry.relative_projection(
                jnp.asarray(P(E))[None],
                jnp.asarray(P(np.eye(4, dtype=np.float32)))[None])
            rots.append(r[0])
            transs.append(t[0])
        rots1 = jnp.stack(rots)[None]        # (1, V-1, 3, 3)
        transs1 = jnp.stack(transs)[None]    # (1, V-1, 3)

        fp = jax.jit(lambda r, s, ro, tr, de: pw.warp_correlate_views_fused(
            r, s, ro, tr, de, 1))
        fx = jax.jit(lambda r, s, ro, tr, de: pw._views_xla(
            r, s, ro, tr, de, 1))

        for B in range(1, 9):
            key = jax.random.PRNGKey(B)
            k1, k2 = jax.random.split(key)
            ref = jax.random.uniform(k1, (B, H, W, C), jnp.bfloat16)
            src = jax.random.uniform(k2, (B, V - 1, H, W, C), jnp.bfloat16)
            ro = jnp.broadcast_to(rots1, (B, V - 1, 3, 3))
            tr = jnp.broadcast_to(transs1, (B, V - 1, 3))
            de = jnp.asarray(np.broadcast_to(
                np.linspace(dlo, dhi, D, dtype=np.float32)
                [None, :, None, None], (B, D, H, W)).copy())
            try:
                if B == 1:
                    fits = bool(pw.support_fits(ro, tr, de, H, W, C))
                    print(f"{name}: support_fits={fits} "
                          f"({'pallas' if fits else 'XLA-fallback'} path)",
                          flush=True)
                t0 = time.perf_counter()
                a = np.asarray(fp(ref, src, ro, tr, de)).astype(np.float32)
                t1 = time.perf_counter()
                b = np.asarray(fx(ref, src, ro, tr, de)).astype(np.float32)
                err = float(np.abs(a - b).max())
                ok = err < 5e-2 and np.isfinite(a).all()  # bf16 rounding
                print(f"{name} B={B}: maxdiff {err:.2e} "
                      f"pallas_wall {t1 - t0:6.2f}s "
                      f"{'OK' if ok else 'MISMATCH'}", flush=True)
                if not ok:
                    failures.append((name, B, err))
            except Exception as e:
                print(f"{name} B={B}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                failures.append((name, B, str(e)[:100]))

    if failures:
        print(f"FAILURES: {failures}", flush=True)
        sys.exit(1)
    print(f"ALL CONFIGS HEALTHY ({8 * max(1, len(only) or 3)} run)", flush=True)


if __name__ == "__main__":
    main()
