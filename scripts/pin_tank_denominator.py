"""Pin the T&T-config reference-GPU denominator (VERDICT r2 #6).

The reference repo records no T&T runtime (its driver prints s/map at
runtime, test_tank.py:244-252, but commits no value), and no paper table
for it is confidently recallable.  The defensible pin: scale the
recalled DTU denominator (0.145 s/map on a 2080 Ti, BASELINE.md) by the
FLOP ratio between the two eval configs, computed by XLA's own cost
model on OUR forward (same network/math as the reference; conv+matmul
FLOPs dominate and scale identically).  A GPU at these sizes is
throughput-bound, so FLOP scaling is the right transfer (a CPU
wall-clock ratio is NOT — measured 0.57x because torch multithreading
saturates differently at the two shapes; /tmp 2026-08-19 run).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/pin_tank_denominator.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def flops_for(H, W, V, ndepths, numdepth):
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.data import cams as camio

    cfg = EffiMVSConfig(ndepths=tuple(ndepths))
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, V, H, W, 3)), jnp.float32)
    f = 1.3 * W / 8
    intr = np.array([[f, 0, W / 16], [0, f, H / 16], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        projs.append(camio.stage_proj_matrices(E, intr))
    proj_ms = {k: jnp.asarray(np.stack([p[k] for p in projs])[None])
               for k in ("stage1", "stage2", "stage3")}
    dv = jnp.asarray(camio.inverse_depth_values(425.0, 2.5 * 0.53,
                                                numdepth)[None])

    def fn(imgs, s1, s2, s3, dv):
        out = forward(params, imgs,
                      {"stage1": s1, "stage2": s2, "stage3": s3}, dv, cfg,
                      ctx=None)
        return out["depth"][-1]

    lowered = jax.jit(fn).lower(imgs, proj_ms["stage1"], proj_ms["stage2"],
                                proj_ms["stage3"], dv)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def main():
    dtu = flops_for(864, 1152, 5, (48, 8, 8), 384)
    tank = flops_for(1056, 1920, 11, (96, 8, 8), 384)
    ratio = tank / dtu
    dtu_s = 0.145
    tank_s = dtu_s * ratio
    out = {
        "dtu_flops_per_map": dtu,
        "tank_flops_per_map": tank,
        "flop_ratio_tank_over_dtu": round(ratio, 3),
        "pinned_dtu_gpu_s_per_map": dtu_s,
        "derived_tank_gpu_s_per_map": round(tank_s, 4),
        "derived_tank_gpu_maps_per_s": round(1 / tank_s, 4),
        "bound_2x_maps_per_s": round(2 / tank_s, 4),
        "method": "XLA cost_analysis FLOPs of our forward at both eval "
                  "configs; GPU assumed FLOP-throughput-bound",
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/TANK_DENOMINATOR_r03.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
