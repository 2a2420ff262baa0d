"""TPU A/B: fused Pallas ConvGRU step vs the XLA conv path, at the three
per-stage shapes of the DTU bench config (B=6, 1152x864 -> H/8, H/4, H/2;
hidden dims 48/32/16, update.py:33-49).  Prints ms/step per impl and the
numerical maxdiff.  VERDICT r2 #3's acceptance table."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, warmup=2, iters=20):
    import jax
    import jax.numpy as jnp

    def _fence(r):
        return float(jax.device_get(jnp.sum(r.astype(jnp.float32))))

    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.ops import pallas_gru as pg

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dt = jnp.bfloat16
    rows = []
    for name, (H, W, hd) in [("stage1", (108, 144, 48)),
                             ("stage2", (216, 288, 32)),
                             ("stage3", (432, 576, 16))]:
        k1, k2, k3 = jax.random.split(key, 3)
        h = jax.random.normal(k1, (B, H, W, hd), dt)
        x = jax.random.normal(k2, (B, H, W, hd), dt)
        p = {n: {"weight": 0.1 * jax.random.normal(
                     jax.random.fold_in(k3, i), (3, 3, 2 * hd, hd), dt),
                 "bias": 0.1 * jax.random.normal(
                     jax.random.fold_in(k3, 10 + i), (hd,), dt)}
             for i, n in enumerate(("convz", "convr", "convq"))}

        f_xla = jax.jit(lambda h, x, p=p: pg.gru_step(h, x, p, impl="xla"))
        f_pal = jax.jit(lambda h, x, p=p: pg.gru_step(h, x, p,
                                                      impl="pallas"))
        a = f_xla(h, x)
        b = f_pal(h, x)
        maxdiff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
        t_xla = timeit(f_xla, h, x) * 1e3
        t_pal = timeit(f_pal, h, x) * 1e3
        rows.append({"stage": name, "B": B, "H": H, "W": W, "hd": hd,
                     "xla_ms": round(t_xla, 3), "pallas_ms": round(t_pal, 3),
                     "speedup": round(t_xla / t_pal, 2),
                     "maxdiff": maxdiff})
        print(f"{name} B{B} {H}x{W} hd{hd}: xla {t_xla:.2f} ms  "
              f"pallas {t_pal:.2f} ms  ({t_xla / t_pal:.2f}x)  "
              f"maxdiff {maxdiff:.1e}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
