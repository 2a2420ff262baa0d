"""Pin the cost model of TPU lax.cond/lax.switch with large operands.

The warp ladder's dispatch costs ~26 ms/map beyond its branch bodies
(round-4/5 traces: conditional self-time + async-copies).  Before
restructuring, measure WHAT drives the cost on this chip/relay:

  nocond        y = f(x)                      (baseline, no conditional)
  cond2_big     cond(p, f(x), g_small)        (1 of 2 branches uses x)
  switch5_one   switch(i, [f(x), g, g, g, g]) (1 of 5 uses x)
  switch5_all   switch(i, [f1(x)..f5(x)])     (all 5 use x)
  switch5_two   switch(i, [f(x,y2).., g...])  (two big operands)

x is a 512 MB f32 buffer; f consumes it with a cheap reduction (output
tiny, so timing differences isolate operand handling, not compute).
All variants take the branch that uses x.

    timeout 3600 python scripts/probe_cond_cost.py > /tmp/probe_cond.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def fence(v):
        return float(jax.device_get(jnp.ravel(v)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    N = 128 * 1024 * 1024          # 512 MB f32
    x = jnp.arange(N, dtype=jnp.float32).reshape(1024, -1)
    x2 = x + 1.0
    fence(x2)

    def f(a):
        return jnp.sum(a * 1.0000001)

    def g():
        return jnp.float32(0.0)

    def mk(name, fn):
        jf = jax.jit(fn)
        y = jf(x, x2)
        fence(y)
        iters = 8
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = jf(x, x2)
            fence(y)
            reps.append((time.perf_counter() - t0) / iters * 1e3)
        print({"variant": name, "ms": round(sorted(reps)[1], 2),
               "spread": [round(r, 2) for r in sorted(reps)]}, flush=True)

    # pred derived from x so it is data-dependent like the real ladder
    def pred(a):
        return a[0, 0] >= 0.0

    def idx(a):
        return (a[0, 0] < 0.0).astype(jnp.int32)   # 0 -> first branch

    mk("nocond", lambda a, b: f(a))
    mk("cond2_big", lambda a, b: lax.cond(pred(a), lambda: f(a), g))
    mk("switch5_one", lambda a, b: lax.switch(
        idx(a), [lambda: f(a), g, g, g, g]))
    mk("switch5_all", lambda a, b: lax.switch(
        idx(a), [lambda: f(a), lambda: f(a) + 1, lambda: f(a) + 2,
                 lambda: f(a) + 3, lambda: f(a) + 4]))
    mk("switch5_two_big", lambda a, b: lax.switch(
        idx(a), [lambda: f(a) + f(b), lambda: g(), lambda: g(),
                 lambda: g(), lambda: g()]))
    mk("cond2_bigout", lambda a, b: lax.cond(
        pred(a), lambda: a * 1.0000001, lambda: a * 2.0)[0, 0])


if __name__ == "__main__":
    main()
