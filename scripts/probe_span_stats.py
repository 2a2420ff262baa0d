"""Span statistics of the warp kernel's projected support, per stage, at
the two deployment rigs — sizes the ladder's (region_cols, ALIGN_X)
choices: the horizontal matmul dimension Qc scales every stage's MXU
FLOPs linearly, so the smallest region that still fits the support is
the speed-of-light lever (BASELINE.md round-4 notes).

CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_span_stats.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def span_report(tag, px, py, tile_rows, tile_cols, H_img=None, W_img=None):
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    pxp = pw._pad_to(jnp.asarray(px), {1: tile_rows, 2: tile_cols})
    pyp = pw._pad_to(jnp.asarray(py), {1: tile_rows, 2: tile_cols})
    pxf = np.asarray(pw._tile_flat(pxp, tile_rows, tile_cols))
    pyf = np.asarray(pw._tile_flat(pyp, tile_rows, tile_cols))
    H_img = px.shape[1] if H_img is None else H_img
    W_img = px.shape[2] if W_img is None else W_img
    valid = ((pxf > -1.0) & (pxf < W_img) & (pyf > -1.0) & (pyf < H_img))
    big = 1e6
    vx = np.where(valid, pxf, big)
    vy = np.where(valid, pyf, big)
    mnx = vx.min(axis=-1)
    mny = vy.min(axis=-1)
    sx = np.where(valid, pxf, -big).max(axis=-1) - mnx
    sy = np.where(valid, pyf, -big).max(axis=-1) - mny
    any_valid = valid.any(axis=-1)
    sx = sx[any_valid]
    sy = sy[any_valid]
    if sx.size == 0:
        print(f"{tag}: no valid tiles")
        return
    q = lambda a: [round(float(np.quantile(a, p)), 1)
                   for p in (0.5, 0.9, 0.99, 1.0)]
    print(f"{tag}: span_x q50/90/99/max = {q(sx)}  "
          f"span_y = {q(sy)}  tiles={sx.size}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.ops import pallas_warp as pw
    sys.path.insert(0, "/root/repo/scripts")
    import tank_scene_rig as rig

    imgs, pm, dv = rig.batch(1)
    # reuse the rig's stage geometry: build rel rot/trans per stage like
    # the model does
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.models.effi_mvs import EffiMVSConfig

    H, W = rig.H, rig.W
    ndepths = rig.NDEPTHS
    for si, (name, scale) in enumerate(
            [("stage1", 8), ("stage2", 4), ("stage3", 2)]):
        P = jnp.asarray(pm[name])             # (B, V, 2, 4, 4)
        ref_p = P[:, :1]
        src_p = P[:, 1:]
        rot, tr = geometry.relative_projection(
            (src_p[..., 1, :, :] @ src_p[..., 0, :, :]).reshape(-1, 4, 4),
            jnp.broadcast_to(ref_p[..., 1, :, :] @ ref_p[..., 0, :, :],
                             src_p[..., 1, :, :].shape).reshape(-1, 4, 4))
        hs, ws = H // scale, W // scale
        B, V = P.shape[0], P.shape[1] - 1
        rot = rot.reshape(B, V, 3, 3)
        tr = tr.reshape(B, V, 3)
        D = ndepths[si]
        if si == 0:
            dvn = np.asarray(dv)[0]
            inv = np.linspace(1.0 / dvn[0], 1.0 / dvn[-1], D,
                              dtype=np.float32)
            dvals = 1.0 / inv
        else:
            # +-2 hypothesis band around a mid depth, like the local range
            mid = float(np.asarray(dv).mean())
            dvals = np.linspace(mid * 0.96, mid * 1.04, D,
                                dtype=np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (B, D, hs, ws)).copy())
        px, py = pw._project_views(rot, tr, depth, hs, ws)
        BV = B * V
        C = {0: 32, 1: 16, 2: 8}[si]
        DB = pw._auto_depth_chunk(D, C, pw.TILE_ROWS * pw.TILE_COLS,
                                  region_rows=16)
        span_report(f"{name} ({hs}x{ws} D={D}) per-plane",
                    np.asarray(px).reshape(BV * D, hs, ws),
                    np.asarray(py).reshape(BV * D, hs, ws),
                    pw.TILE_ROWS, pw.TILE_COLS)
        # chunk-granular (what the kernel actually anchors on): DB planes
        # share one origin/region — span over the chunk's DB*P samples.
        # Tile-flatten per plane, then pool the DB planes of each chunk
        # into one "tile" by folding DB into the sample axis.
        import jax.numpy as jnp
        pxp = pw._pad_to(jnp.asarray(np.asarray(px).reshape(
            BV * D, hs, ws)), {1: pw.TILE_ROWS, 2: pw.TILE_COLS})
        pyp = pw._pad_to(jnp.asarray(np.asarray(py).reshape(
            BV * D, hs, ws)), {1: pw.TILE_ROWS, 2: pw.TILE_COLS})
        pxf = np.asarray(pw._tile_flat(pxp, pw.TILE_ROWS, pw.TILE_COLS))
        pyf = np.asarray(pw._tile_flat(pyp, pw.TILE_ROWS, pw.TILE_COLS))
        T, P = pxf.shape[1], pxf.shape[2]
        pxc = pxf.reshape(BV, D // DB, DB, T, P).transpose(
            0, 1, 3, 2, 4).reshape(BV * (D // DB) * T, 1, DB * P)
        pyc = pyf.reshape(BV, D // DB, DB, T, P).transpose(
            0, 1, 3, 2, 4).reshape(BV * (D // DB) * T, 1, DB * P)
        span_report(f"{name} chunked DB={DB}", pxc, pyc, 1, DB * P,
                    H_img=hs, W_img=ws)


if __name__ == "__main__":
    main()
