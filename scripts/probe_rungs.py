"""Ground truth: which ladder rung each stage's warp launch takes at the
two deployment rigs, under the CURRENT window config (env knobs).

CPU-only, pure predicate math — no kernel runs:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      [EFFI_TILE_COLS=.. EFFI_REGION_ROWS=.. EFFI_REGION_COLS=..] \
      python scripts/probe_rungs.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def stage_geoms():
    """Yield (rig, stage, rot, trans, depth, hs, ws, C, D) for both rigs."""
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.data import cams as camio
    import tank_scene_rig as rig

    # tank rig
    _, pm, dv = rig.batch(1)
    for si, (name, scale, C, D) in enumerate(
            [("stage1", 8, 32, 96), ("stage2", 4, 16, 8),
             ("stage3", 2, 8, 8)]):
        P = jnp.asarray(pm[name])
        src_p = P[:, 1:]
        ref_p = P[:, :1]
        rot, tr = geometry.relative_projection(
            (src_p[..., 1, :, :] @ src_p[..., 0, :, :]).reshape(-1, 4, 4),
            jnp.broadcast_to(ref_p[..., 1, :, :] @ ref_p[..., 0, :, :],
                             src_p[..., 1, :, :].shape).reshape(-1, 4, 4))
        hs, ws = rig.H // scale, rig.W // scale
        V = rig.V - 1
        rot = rot.reshape(1, V, 3, 3)
        tr = tr.reshape(1, V, 3)
        if si == 0:
            dvn = np.asarray(dv)[0]
            inv = np.linspace(1 / dvn[0], 1 / dvn[-1], D, dtype=np.float32)
            dvals = 1.0 / inv
        else:
            mid = float(np.asarray(dv).mean())
            dvals = np.linspace(mid * 0.96, mid * 1.04, D, np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (1, D, hs, ws)).copy())
        yield "tank", name, rot, tr, depth, hs, ws, C, D

    # DTU bench rig (ab_region_window.py geometry)
    H, W, V = 864, 1152, 5
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        exts.append(E)
    intr_q = np.array([[360.0, 0, W / 8], [0, 360.0, H / 8], [0, 0, 1]],
                      np.float32)
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    for si, (name, scale, C, D) in enumerate(
            [("stage1", 8, 32, 48), ("stage2", 4, 16, 8),
             ("stage3", 2, 8, 8)]):
        Pm = jnp.asarray(np.broadcast_to(
            np.stack([p[name] for p in projs])[None], (1, V, 2, 4, 4)).copy())
        src_p = Pm[:, 1:]
        ref_p = Pm[:, :1]
        rot, tr = geometry.relative_projection(
            (src_p[..., 1, :, :] @ src_p[..., 0, :, :]).reshape(-1, 4, 4),
            jnp.broadcast_to(ref_p[..., 1, :, :] @ ref_p[..., 0, :, :],
                             src_p[..., 1, :, :].shape).reshape(-1, 4, 4))
        hs, ws = H // scale, W // scale
        rot = rot.reshape(1, V - 1, 3, 3)
        tr = tr.reshape(1, V - 1, 3)
        if si == 0:
            dvals = 1.0 / np.linspace(1 / 425.0, 1 / 933.8, D,
                                      dtype=np.float32)
        else:
            dvals = np.linspace(600 * 0.96, 600 * 1.04, D, np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (1, D, hs, ws)).copy())
        yield "dtu", name, rot, tr, depth, hs, ws, C, D


def main():
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    print(f"env_override={pw._ENV_WINDOW_OVERRIDE} (module consts: "
          f"tiles={pw.TILE_COLS} rows_rung1={pw.REGION_ROWS} "
          f"cols={pw.REGION_COLS} db_cap={pw._DB_CAP})", flush=True)
    for rigname, name, rot, tr, depth, hs, ws, C, D in stage_geoms():
        tc, rc, rows1 = pw._window_policy(C, D)
        fits16 = bool(pw.support_fits(rot, tr, depth, hs, ws, C,
                                      region_rows=16, tile_cols=tc,
                                      region_cols=rc))
        flags = np.asarray(pw.support_fits(rot, tr, depth, hs, ws, C,
                                           per_tile=True, tile_cols=tc,
                                           region_rows=rows1,
                                           region_cols=rc))
        n_bad = int((~flags).sum())
        cap_s, cap_b = pw._patch_capacities(flags.size)
        rung = (0 if fits16 else
                1 if n_bad == 0 else
                2 if n_bad <= cap_s else
                3 if n_bad <= cap_b else 4)
        db16 = pw._auto_depth_chunk(D, C, pw.TILE_ROWS * tc,
                                    region_rows=16)
        db1 = pw._auto_depth_chunk(D, C, pw.TILE_ROWS * tc,
                                   region_rows=rows1)
        print(f"{rigname}.{name}: window=({tc},{rc},r{rows1}) rung={rung} "
              f"fits16={fits16} n_bad={n_bad}/{flags.size} "
              f"caps=({cap_s},{cap_b}) DB16={db16} DB1={db1}", flush=True)


if __name__ == "__main__":
    main()
