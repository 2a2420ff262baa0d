"""Model-axis sharding evidence (VERDICT r1 weak #6): per-device compiled
memory of the jitted forward under data-only vs depth-sharded vs
spatial-sharded policies, from XLA's own memory analysis.

Runs on 8 virtual CPU devices (no TPU needed — GSPMD partitioning and the
memory accounting are backend-independent):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sharding_memory_report.py [tank]

Default mode writes SHARDING_r02.json (training-ish shape, data x model
meshes).  `tank` mode writes SHARDING_TANK_r02.json: the T&T deployment
point (1056x1920, 11 views, ndepths 96,8,8) at batch 1 with the WHOLE
mesh on the model axis — the SURVEY §5.7 HBM-relief case, where one
depth map's stage-1 warp stack (B,V,D,H,W ≈ 10 x 96 x 132 x 240) is the
dominant temporary and must split across chips.  Per-device temp bytes
must FALL as the model axis grows if the annotations are load-bearing.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# reduced eval shape (full 1056x1920 makes CPU compiles minutes-long; the
# per-device scaling trend is shape-independent).  B always equals the
# data-axis size so every device holds exactly ONE sample's data slot —
# per-device temp then isolates what the MODEL axis saves.
H, W, V = 384, 640, 5
NDEPTHS = (48, 8, 8)

# T&T deployment point (test_tank.sh:14-15, tank.py:137-141): batch 1 —
# the mesh's model axis is the only thing that can relieve HBM.
TANK_H, TANK_W, TANK_V = 1056, 1920, 11
TANK_NDEPTHS = (96, 8, 8)


def tank_mode():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as graft
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.parallel import (ShardingPolicy, make_mesh,
                                            replicate, shard_batch,
                                            use_policy)

    # bf16 matches the deployed T&T config (TANK_r02.json)
    cfg = EffiMVSConfig(ndepths=TANK_NDEPTHS, compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)

    def fn(params, imgs, s1, s2, s3, dv):
        return forward(params, imgs,
                       {"stage1": s1, "stage2": s2, "stage3": s3},
                       dv, cfg, ctx=None)["depth"][-1]

    rows = []
    for model_axis, policy_kw in [
            (1, {}),
            (4, {"shard_depth": True}),
            (8, {"shard_depth": True}),
            (4, {"shard_depth": False, "shard_spatial": True}),
            (8, {"shard_depth": False, "shard_spatial": True}),
            (4, {"shard_views": True}),
            (8, {"shard_views": True})]:
        imgs, proj_ms, dv = graft._tiny_inputs(1, TANK_V, TANK_H, TANK_W)
        mesh = make_mesh(data=1, model=model_axis,
                         devices=jax.devices()[:model_axis])
        policy = ShardingPolicy(mesh, **policy_kw)
        p = replicate(params, mesh)
        batch = shard_batch(
            {"imgs": imgs, "s1": proj_ms["stage1"], "s2": proj_ms["stage2"],
             "s3": proj_ms["stage3"], "dv": dv}, mesh)
        # the policy hooks fire at TRACE time — a cached trace from a prior
        # row would silently reuse the prior row's constraints (verified:
        # identical temp bytes across policies without this)
        jax.clear_caches()
        with use_policy(policy):
            compiled = jax.jit(fn).lower(
                p, batch["imgs"], batch["s1"], batch["s2"], batch["s3"],
                batch["dv"]).compile()
        ma = compiled.memory_analysis()
        row = {
            "mesh": f"data=1 x model={model_axis}",
            "policy": (policy_kw or {"replicated": True}),
            "temp_MB_per_device": round(ma.temp_size_in_bytes / 2**20, 1),
            "arg_MB_per_device": round(ma.argument_size_in_bytes / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["temp_MB_per_device"]
    art = {"config": {"H": TANK_H, "W": TANK_W, "V": TANK_V, "B": 1,
                      "ndepths": list(TANK_NDEPTHS), "dtype": "bfloat16",
                      "backend": "cpu-virtual (GSPMD partitioning is "
                                 "backend-independent)"},
           "rows": rows,
           "temp_reduction_depth_x8":
               round(base / max(rows[2]["temp_MB_per_device"], 1e-9), 2),
           "temp_reduction_spatial_x8":
               round(base / max(rows[4]["temp_MB_per_device"], 1e-9), 2),
           "temp_reduction_views_x4":
               round(base / max(rows[5]["temp_MB_per_device"], 1e-9), 2),
           "temp_reduction_views_x8":
               round(base / max(rows[6]["temp_MB_per_device"], 1e-9), 2)}
    with open("/root/repo/SHARDING_TANK_r02.json", "w") as fo:
        json.dump(art, fo, indent=1)
    print("wrote SHARDING_TANK_r02.json", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as graft
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.parallel import (ShardingPolicy, make_mesh,
                                            replicate, shard_batch,
                                            use_policy)

    cfg = EffiMVSConfig(ndepths=NDEPTHS)
    params = init_params(jax.random.PRNGKey(0), cfg)

    def fn(params, imgs, s1, s2, s3, dv):
        return forward(params, imgs,
                       {"stage1": s1, "stage2": s2, "stage3": s3},
                       dv, cfg, ctx=None)["depth"][-1]

    rows = []
    for model_axis, policy_kw in [
            (1, {}),
            (2, {"shard_depth": True}),
            (4, {"shard_depth": True}),
            (2, {"shard_depth": False, "shard_spatial": True}),
            (4, {"shard_depth": False, "shard_spatial": True}),
            (2, {"shard_views": True}),
            (4, {"shard_views": True})]:
        n = 8
        B = n // model_axis                 # one sample per data slot
        imgs, proj_ms, dv = graft._tiny_inputs(B, V, H, W)
        mesh = make_mesh(data=B, model=model_axis,
                         devices=jax.devices()[:n])
        policy = ShardingPolicy(mesh, **policy_kw)
        p = replicate(params, mesh)
        batch = shard_batch(
            {"imgs": imgs, "s1": proj_ms["stage1"], "s2": proj_ms["stage2"],
             "s3": proj_ms["stage3"], "dv": dv}, mesh)
        # policy hooks fire at TRACE time — clear the jit cache so each row
        # traces with ITS policy (a cached trace reuses the prior row's)
        jax.clear_caches()
        with use_policy(policy):
            compiled = jax.jit(fn).lower(
                p, batch["imgs"], batch["s1"], batch["s2"], batch["s3"],
                batch["dv"]).compile()
        ma = compiled.memory_analysis()
        row = {
            "mesh": f"data={B} x model={model_axis}",
            "policy": (policy_kw or {"data_only": True}),
            "temp_MB_per_device": round(ma.temp_size_in_bytes / 2**20, 1),
            "arg_MB_per_device": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_MB_per_device": round(
                ma.output_size_in_bytes / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["temp_MB_per_device"]
    art = {"config": {"H": H, "W": W, "V": V, "B": "data-axis size",
                      "ndepths": list(NDEPTHS), "devices": 8,
                      "backend": "cpu-virtual (GSPMD partitioning is "
                                 "backend-independent)"},
           "rows": rows,
           "temp_reduction_depth_x4":
               round(base / max(rows[2]["temp_MB_per_device"], 1e-9), 2),
           "temp_reduction_spatial_x4":
               round(base / max(rows[4]["temp_MB_per_device"], 1e-9), 2),
           "temp_reduction_views_x4":
               round(base / max(rows[6]["temp_MB_per_device"], 1e-9), 2)}
    with open("/root/repo/SHARDING_r02.json", "w") as fo:
        json.dump(art, fo, indent=1)
    print("wrote SHARDING_r02.json", flush=True)


if __name__ == "__main__":
    if "tank" in sys.argv[1:]:
        tank_mode()
    else:
        main()
