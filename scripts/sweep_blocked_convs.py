"""On-chip sweep: plain XLA vs blocked for every remaining deployed conv
geometry (update-block encoder/head 2-D convs, cost_reg + CSP 3-D convs).

    timeout 5400 python scripts/sweep_blocked_convs.py > /tmp/sweep_convs.log 2>&1

Shapes are the T&T deployment point (B=1, 1056x1920, 11 views, D=96/8/8
-> stage resolutions 132x240 / 264x480 / 528x960); the encoder convs run
3 GRU iterations per stage so their per-iter cost triples.  bf16.
Emits /tmp/sweep_convs.json with the best block per geometry.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# ---- geometry tables ------------------------------------------------------
# 2-D: (name, N, H, W, I, O, k, pad, candidates)
C24 = [(2, 4), (4, 4), (2, 8)]
C22 = [(2, 2), (2, 4)]
G2D = []
for s, (H, W, hd, cd) in enumerate([(132, 240, 48, 12), (264, 480, 32, 8),
                                    (528, 960, 16, 4)], 1):
    st = f"s{s}"
    G2D += [
        (f"{st}.convc1", 1, H, W, 6, hd, 1, 0, C24),
        (f"{st}.convc2", 1, H, W, hd, hd, 3, 1, C24 if hd <= 16 else C22),
        (f"{st}.convd1", 1, H, W, 1, hd, 7, 3, C24),
        (f"{st}.convd2", 1, H, W, hd, hd, 3, 1, C24 if hd <= 16 else C22),
        (f"{st}.convd", 1, H, W, 2 * hd, hd - cd, 3, 1, C22),
        (f"{st}.convc", 1, H, W, hd, hd, 1, 0, C24 if hd <= 16 else C22),
        (f"{st}.head1", 1, H, W, hd, hd, 3, 1, C24 if hd <= 16 else C22),
        (f"{st}.head2", 1, H, W, hd, 1, 3, 1, C24),
    ]
G2D += [
    ("pix.0", 11, 132, 240, 1, 16, 3, 1, C24),
    ("pix.1", 11, 132, 240, 16, 16, 3, 1, C24),
]

# 3-D: (name, B, D, H, W, I, O, stride, pad, transpose, outpad, candidates)
G3D = []
for s, (D, H, W) in enumerate([(48, 132, 240), (8, 264, 480),
                               (8, 528, 960)], 1):
    st = f"s{s}"
    dl0 = min(D, 8)
    c0 = [(dl0, 1, 2), (dl0, 2, 2), (dl0, 1, 4)]
    G3D += [
        (f"{st}.reg.conv0", 1, D, H, W, 1, 8, 1, 1, False, 0, c0),
        (f"{st}.reg.conv1", 1, D, H, W, 8, 8, 1, 1, False, 0, c0),
        (f"{st}.reg.conv2", 1, D, H, W, 8, 16, 2, 1, False, 0,
         [(dl0 // 2, 1, 1), (dl0 // 2, 1, 2)]),
        (f"{st}.reg.conv3", 1, D // 2, H // 2, W // 2, 16, 16, 1, 1, False, 0,
         [(min(D // 2, 4), 1, 2), (min(D // 2, 4), 2, 2)]),
        (f"{st}.reg.conv4", 1, D // 2, H // 2, W // 2, 16, 32, 2, 1, False, 0,
         [(min(D // 4, 2), 1, 1), (min(D // 4, 2), 1, 2)]),
        (f"{st}.reg.conv5", 1, D // 4, H // 4, W // 4, 32, 32, 1, 1, False, 0,
         [(min(D // 4, 2), 1, 2), (min(D // 4, 2), 2, 2)]),
        (f"{st}.reg.conv6t", 1, D // 4, H // 4, W // 4, 32, 16, 2, 1, True,
         (1, 1, 1), [(min(D // 2, 4), 2, 2), (min(D // 2, 4), 2, 4)]),
        (f"{st}.reg.conv7t", 1, D // 2, H // 2, W // 2, 16, 8, 2, 1, True,
         (1, 1, 1), [(dl0, 2, 2), (dl0, 2, 4)]),
        (f"{st}.reg.prob", 1, D, H, W, 8, 1, 1, 1, False, 0,
         [(dl0, 1, 2), (dl0, 2, 4)]),
    ]
    if s > 1:  # CSP runs at stages 2/3 only
        G3D += [
            (f"{st}.csp.conv0", 1, D, H, W, 1, 8, (1, 2, 2), 1, False, 0,
             [(dl0, 1, 1), (dl0, 1, 2)]),
            (f"{st}.csp.convcost", 1, D, H // 2, W // 2, 1, 8, 1, 1, False, 0,
             c0),
            (f"{st}.csp.conv1", 1, D, H // 2, W // 2, 16, 8, 1, 1, False, 0,
             c0),
            (f"{st}.csp.conv2t", 1, D, H // 2, W // 2, 8, 1, (1, 2, 2), 1,
             True, (0, 1, 1), [(dl0, 2, 2), (dl0, 2, 4)]),
        ]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu import nn
    from effi_mvs_plus_tpu.ops import blocked_conv as bc

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)
    rng = np.random.default_rng(0)
    results = {}

    def bench(f, *args):
        y = f(*args)
        fence(y)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(*args)
        fence(y)
        return (time.perf_counter() - t0) / iters * 1e3

    def sweep(name, xshape, wshape, stride, pad, transpose, outpad, cands):
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(wshape) * 0.1, jnp.bfloat16)
        if transpose:
            f0 = jax.jit(lambda x, w: nn.conv_transpose3d(
                x, w, None, stride, pad, outpad))
        elif len(wshape) == 5:
            f0 = jax.jit(lambda x, w: nn.conv3d(x, w, None, stride, pad))
        else:
            f0 = jax.jit(lambda x, w: nn.conv2d(x, w, None, stride, pad))
        base = bench(f0, x, w)
        row = {"plain_ms": round(base, 3), "best": None,
               "best_ms": round(base, 3)}
        for ob in cands:
            try:
                fb = jax.jit(lambda x, w, ob=ob: bc.conv_blocked(
                    x, w, None, stride, pad, out_block=ob,
                    transpose=transpose, output_padding=outpad))
                ms = bench(fb, x, w)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} {ob} FAILED {type(e).__name__}", flush=True)
                continue
            row[str(ob)] = round(ms, 3)
            if ms < row["best_ms"]:
                row["best"], row["best_ms"] = ob, round(ms, 3)
        results[name] = row
        print(f"{name:16s} plain {base:7.3f} ms  best {row['best']} "
              f"{row['best_ms']:7.3f} ms ({base/row['best_ms']:4.2f}x)",
              flush=True)

    for (name, N, H, W, I, O, k, pad, cands) in G2D:
        sweep(name, (N, H, W, I), (k, k, I, O), 1, pad, False, 0, cands)
    for (name, B, D, H, W, I, O, stride, pad, tr, op, cands) in G3D:
        sweep(name, (B, D, H, W, I), (3, 3, 3, I, O), stride, pad, tr, op,
              cands)

    with open("/tmp/sweep_convs.json", "w") as f:
        json.dump(results, f, indent=1)
    tot_plain = sum(r["plain_ms"] for r in results.values())
    tot_best = sum(r["best_ms"] for r in results.values())
    print(f"TOTAL plain {tot_plain:.1f} ms -> best {tot_best:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
