"""Probe which impl fails to compile at stage3 B>=6: pallas, XLA gather,
or the new cond-dispatch that contains both.

Usage: python scripts/probe_stage3_compile.py {pallas|xla|cond} [B]
Run each in a FRESH process (compile-helper failures can poison one).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V = 5
H, W, C, D = 432, 576, 8, 8


def main():
    which = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 6

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
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        r, t = geometry.relative_projection(
            jnp.asarray(P(E))[None],
            jnp.asarray(P(np.eye(4, dtype=np.float32)))[None])
        rots.append(r[0])
        transs.append(t[0])
    rots1 = jnp.stack(rots)[None]
    transs1 = jnp.stack(transs)[None]

    key = jax.random.PRNGKey(B)
    k1, k2 = jax.random.split(key)
    ref = jax.random.uniform(k1, (B, H, W, C), jnp.bfloat16)
    src = jax.random.uniform(k2, (B, V - 1, H, W, C), jnp.bfloat16)
    ro = jnp.broadcast_to(rots1, (B, V - 1, 3, 3))
    tr = jnp.broadcast_to(transs1, (B, V - 1, 3))
    de = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)
        [None, :, None, None], (B, D, H, W)).copy())

    fns = {
        "pallas": lambda: jax.jit(lambda *a: pw._plane_sweep_correlate_views(
            a[0], a[1], a[2], a[3], a[4]))(ref, src, ro, tr, de),
        "xla": lambda: jax.jit(lambda *a: pw._views_xla(*a, 1))(
            ref, src, ro, tr, de),
        "cond": lambda: jax.jit(lambda *a: pw.warp_correlate_views_fused(
            *a, 1))(ref, src, ro, tr, de),
    }
    t0 = time.perf_counter()
    out = fns[which]()
    fence(out)
    print(f"{which} B={B}: OK in {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
