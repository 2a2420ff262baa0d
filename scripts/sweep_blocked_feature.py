"""On-chip sweep: feature_net plain XLA vs space-to-depth blocked stem.

    timeout 3600 python scripts/sweep_blocked_feature.py > /tmp/sweep_blocked.log 2>&1

Times the FULL feature net (4 levels + FPN) at the two deployment
shapes (T&T 11 views 1056x1920, DTU bench B*V=30 864x1152) for the
plain path and candidate block plans, bf16, real-checkpoint weights.
Numerics are checked against the plain path in f32 on the first iter.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


PLANS = {
    "P128": {"conv0": (4, 8), "conv1": (2, 4), "conv2": (2, 2),
             "conv3": (1, 2), "out2": (2, 2), "out3": (2, 4)},
    "P64": {"conv0": (2, 4), "conv1": (2, 2), "conv2": (1, 2),
            "conv3": None, "out2": (1, 2), "out3": (2, 2)},
    "P256": {"conv0": (4, 8), "conv1": (4, 4), "conv2": (2, 4),
             "conv3": (2, 2), "out2": (2, 4), "out3": (4, 4)},
    "Plvl": {"conv0": (4, 8), "conv1": (2, 4), "conv2": (2, 2),
             "conv3": (1, 2), "out2": None, "out3": None},
    "Phead": {"conv0": None, "conv1": None, "conv2": None,
              "conv3": None, "out2": (2, 2), "out3": (2, 4)},
}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import blocks

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    fp = params["feature"]

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    shapes = [("tank", 11, 1056, 1920), ("dtu", 30, 864, 1152)]
    rng = np.random.default_rng(0)
    results = []
    for label, N, H, W in shapes:
        x = jnp.asarray(rng.standard_normal((N, H, W, 3)) * 0.25 + 0.5,
                        jnp.bfloat16)

        def run(impl, plan=None):
            f = jax.jit(lambda x: blocks.feature_net(
                x, fp, None, stem_impl=impl, block_plan=plan)["stage3"])
            y = f(x)
            fence(y)
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                y = f(x)
            fence(y)
            return (time.perf_counter() - t0) / iters * 1e3, y

        base_ms, y0 = run("xla")
        print(f"{label}: xla {base_ms:8.2f} ms", flush=True)
        results.append({"shape": label, "plan": "xla", "ms": round(base_ms, 2)})
        for pname, plan in PLANS.items():
            try:
                ms, y = run("blocked", plan)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                print(f"{label}: {pname} FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            d = float(jax.device_get(jnp.max(jnp.abs(
                y.astype(jnp.float32) - y0.astype(jnp.float32)))))
            print(f"{label}: {pname:6s} {ms:8.2f} ms  ({base_ms/ms:4.2f}x) "
                  f"maxdiff {d:.4f}", flush=True)
            results.append({"shape": label, "plan": pname,
                            "ms": round(ms, 2),
                            "speedup": round(base_ms / ms, 3),
                            "maxdiff": round(d, 5)})

    with open("/tmp/sweep_blocked_feature.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
