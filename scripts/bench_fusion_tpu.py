"""Fusion throughput at the DTU eval shape (VERDICT r1 #8): one scan =
49 reference views x 10 source views at 1152x1600, device-resident
batched ladder (fuse.dypcd.consistency_scene) vs the per-ref dispatch.

Prints s/scan for both paths and writes nothing — numbers land in
BASELINE.md.  Run standalone (one TPU process at a time):
    timeout 3600 python scripts/bench_fusion_tpu.py > /tmp/fusion_bench.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W, N, S = 1152, 1600, 49, 10
CHUNK = 4


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from effi_mvs_plus_tpu.fuse.dypcd import (DypcdParams, consistency,
                                              consistency_scene)

    rng = np.random.default_rng(0)
    f = 2892.33 / 2  # DTU eval intrinsics at 1152x1600 (half res)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    Ks = np.stack([K] * N)
    Es, depths, confs = [], [], []
    for v in range(N):
        E = np.eye(4, dtype=np.float32)
        a = 0.01 * (v - N // 2)
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [8.0 * (v - N // 2), 2.0 * (v % 7 - 3), 0.5 * v]
        Es.append(E)
        depths.append((650.0 + 40.0 * rng.standard_normal((H, W)))
                      .astype(np.float32))
        confs.append(rng.uniform(0, 1, (H, W)).astype(np.float32))
    depth = jnp.asarray(np.stack(depths))
    conf = jnp.asarray(np.stack(confs))
    Kd = jnp.asarray(Ks)
    Ed = jnp.asarray(np.stack(Es))
    # DTU pair structure: each ref's 10 nearest by index
    pair = []
    for r in range(N):
        srcs = sorted(range(N), key=lambda v: (v == r, abs(v - r)))[:S + 1]
        pair.append((r, [v for v in srcs if v != r][:S]))
    ref_ids = jnp.asarray([r for r, _ in pair], jnp.int32)
    src_ids = jnp.asarray([s for _, s in pair], jnp.int32)

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros((1,)))
    print("tunnel up", flush=True)

    params = DypcdParams()
    # --- batched device-resident path ---
    t0 = time.perf_counter()
    out = consistency_scene(depth, conf, Kd, Ed, ref_ids, src_ids,
                            params, CHUNK)
    fence(out[1])
    print(f"batched compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    out = consistency_scene(depth, conf, Kd, Ed, ref_ids, src_ids,
                            params, CHUNK)
    fence(out[1])
    batched_s = time.perf_counter() - t0
    keep = float(np.asarray(out[0]).mean())
    print(f"batched: {batched_s:.2f} s/scan (keep frac {keep:.3f})",
          flush=True)

    # --- per-ref dispatch (the old path): 49 jit calls + host sync each ---
    fin, fus, _, _ = consistency(depth[0], conf[0], Kd[0], Ed[0],
                                 depth[src_ids[0]], Kd[src_ids[0]],
                                 Ed[src_ids[0]], params)
    fence(fus)  # compile once
    t0 = time.perf_counter()
    for i in range(N):
        fin, fus, _, _ = consistency(depth[ref_ids[i]], conf[ref_ids[i]],
                                     Kd[ref_ids[i]], Ed[ref_ids[i]],
                                     depth[src_ids[i]], Kd[src_ids[i]],
                                     Ed[src_ids[i]], params)
        np.asarray(fin), np.asarray(fus)   # host round-trip like fuse_scene
    per_ref_s = time.perf_counter() - t0
    print(f"per-ref: {per_ref_s:.2f} s/scan  "
          f"(speedup {per_ref_s / batched_s:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
