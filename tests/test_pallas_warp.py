"""Pallas fused warp+correlate: parity vs the XLA gather path (interpret
mode on CPU), gradient parity through the custom_vjp, and the
region-fits diagnostic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effi_mvs_plus_tpu.core import geometry
from effi_mvs_plus_tpu.ops import pallas_warp as pw
from effi_mvs_plus_tpu.ops import warp as xw


def _rig(H, W, ang=0.04, baseline=(30.0, 8.0, 5.0)):
    """Calibrated two-camera rig -> (rot, trans) relative projection."""
    f = 1.3 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    E_src = np.eye(4, dtype=np.float32)
    c, s = np.cos(ang), np.sin(ang)
    E_src[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    E_src[:3, 3] = baseline

    def P(E):
        out = np.eye(4, dtype=np.float32)
        out[:3, :4] = K @ E[:3, :4]
        return out

    return geometry.relative_projection(
        jnp.asarray(P(E_src))[None],
        jnp.asarray(P(np.eye(4, dtype=np.float32)))[None])


@pytest.mark.parametrize("shape", [(108, 144, 32, 6), (64, 128, 8, 3),
                                   (40, 192, 16, 4),
                                   # W > region_cols: right-edge tiles must
                                   # anchor against the PADDED width
                                   (64, 576, 8, 4)])
def test_pallas_warp_matches_xla(shape):
    H, W, C, D = shape
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    rot, tr = _rig(H, W)
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())

    px, py = geometry.project_to_src(rot, tr, depth[0][None], H, W)
    assert pw.region_fits(px[0], py[0]), "test rig must fit the region"

    want = np.asarray(xw.warp_correlate(ref, src, rot, tr, depth, 1))
    got = np.asarray(pw.warp_correlate_fused(ref, src, rot, tr, depth, 1,
                                             True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_warp_gradients_match():
    H, W, C, D = 48, 128, 8, 3
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    rot, tr = _rig(H, W)
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())

    gx = jax.grad(lambda a, b: jnp.sum(
        xw.warp_correlate(a, b, rot, tr, depth, 1) ** 2),
        argnums=(0, 1))(ref, src)
    gp = jax.grad(lambda a, b: jnp.sum(
        pw.warp_correlate_fused(a, b, rot, tr, depth, 1, True) ** 2),
        argnums=(0, 1))(ref, src)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def _wild_homography(H, W, D, C=8):
    """Projective distortion strong enough to overflow the kernel's static
    region margins UNDER THE CURRENT WINDOW CONFIG (TILE_COLS/REGION_*
    are env-tunable probe knobs; narrower tiles shrink per-tile spans, so
    a fixed curvature is not 'wild' for every config).  z varies with x,
    so py at large y sweeps many pixels across one tile — escalate the
    curvature until both overflow diagnostics agree it does not fit."""
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())
    tc, rc, rows1 = pw._window_policy(C, D)
    for b in (2e-3, 4e-3, 8e-3, 1.6e-2, 3.2e-2, 6.4e-2):
        bad = np.eye(3, dtype=np.float32)
        bad[2, 0] = b
        px, py = geometry.project_to_src(
            jnp.asarray(bad[None]), jnp.zeros((1, 3)), depth[0][None],
            H, W)
        rots = jnp.asarray(bad[None, None])
        trs = jnp.zeros((1, 1, 3))
        # the dispatch must reach rung 4 (full XLA demotion) under the
        # POLICY window: not even the big patch tier may absorb it
        flags = np.asarray(pw.support_fits(
            rots, trs, depth, H, W, C, per_tile=True, tile_cols=tc,
            region_rows=rows1, region_cols=rc))
        _, cap_big = pw._patch_capacities(flags.size)
        if (not pw.region_fits(px[0], py[0])
                and not bool(pw.support_fits(rots, trs, depth, H, W, C))
                and int((~flags).sum()) > cap_big):
            return bad, depth, px, py
    raise AssertionError("could not construct overflowing geometry")


def test_region_fits_flags_wild_homography():
    H, W, D = 104, 144, 3
    _, _, px, py = _wild_homography(H, W, D)
    assert not pw.region_fits(px[0], py[0])


def test_views_fused_matches_per_view_loop():
    H, W, C, D, V, B = 64, 128, 16, 4, 3, 2
    rng = np.random.default_rng(4)
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(B, V, H, W, C)).astype(np.float32))
    rots = []
    trs = []
    for v in range(V):
        r, t = _rig(H, W, ang=0.02 * (v + 1), baseline=(10.0 * (v + 1),
                                                        3.0 * v, 2.0))
        rots.append(r[0])
        trs.append(t[0])
    rots = jnp.broadcast_to(jnp.stack(rots)[None], (B, V, 3, 3))
    trs = jnp.broadcast_to(jnp.stack(trs)[None], (B, V, 3))
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy())

    want = pw._views_xla(ref, srcs, rots, trs, depth, 1)
    got = pw.warp_correlate_views_fused(ref, srcs, rots, trs, depth, 1,
                                        True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # gradients through the custom_vjp
    gx = jax.grad(lambda a, b: jnp.sum(
        pw._views_xla(a, b, rots, trs, depth, 1) ** 2),
        argnums=(0, 1))(ref, srcs)
    gp = jax.grad(lambda a, b: jnp.sum(
        pw.warp_correlate_views_fused(a, b, rots, trs, depth, 1, True)
        ** 2), argnums=(0, 1))(ref, srcs)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_gradients_match_long_depth_sweep():
    """D=48 full sweep: origins change several times along each tile's
    depth run, so the backward's run-deferred source-gradient flush fires
    repeatedly (not just at the final step) — grads must still match the
    XLA path exactly."""
    H, W, C, D, V, B = 48, 128, 8, 48, 2, 1
    rng = np.random.default_rng(7)
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(B, V, H, W, C)).astype(np.float32))
    rots, trs = [], []
    for v in range(V):
        r, t = _rig(H, W, ang=0.03 * (v + 1), baseline=(20.0 * (v + 1),
                                                        5.0 * v, 3.0))
        rots.append(r[0])
        trs.append(t[0])
    rots = jnp.broadcast_to(jnp.stack(rots)[None], (B, V, 3, 3))
    trs = jnp.broadcast_to(jnp.stack(trs)[None], (B, V, 3))
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy())

    gx = jax.grad(lambda a, b: jnp.sum(
        pw._views_xla(a, b, rots, trs, depth, 1) ** 2),
        argnums=(0, 1))(ref, srcs)
    gp = jax.grad(lambda a, b: jnp.sum(
        pw.warp_correlate_views_fused(a, b, rots, trs, depth, 1, True)
        ** 2), argnums=(0, 1))(ref, srcs)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_unsupported_shapes_fall_back():
    # W < 64 is below the kernel's support -> must use the XLA path exactly
    H, W, C, D = 32, 48, 8, 2
    assert not pw._supported(H, W, C, D, 1)
    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    rot, tr = _rig(H, W)
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())
    want = np.asarray(xw.warp_correlate(ref, src, rot, tr, depth, 1))
    got = np.asarray(pw.warp_correlate_fused(ref, src, rot, tr, depth, 1,
                                             True))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # one-tile-wide maps (96 -> padded 128) stay on the pallas path and
    # agree to kernel tolerance
    H, W = 32, 96
    assert pw._supported(H, W, C, D, 1)
    ref = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    rot, tr = _rig(H, W)
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())
    want = np.asarray(xw.warp_correlate(ref, src, rot, tr, depth, 1))
    got = np.asarray(pw.warp_correlate_fused(ref, src, rot, tr, depth, 1,
                                             True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_wild_geometry_auto_falls_back_exact():
    """Geometry beyond the kernel's static region margins must produce the
    EXACT XLA result (the traced support_fits predicate routes the whole
    batch to the gather path) — not silently-zeroed correlations."""
    H, W, C, D = 104, 144, 8, 3
    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, 1, H, W, C)).astype(np.float32))
    bad, depth, _, _ = _wild_homography(H, W, D, C)
    rots = jnp.asarray(bad[None, None])
    trs = jnp.zeros((1, 1, 3))

    assert not bool(pw.support_fits(rots, trs, depth, H, W, C))

    want = np.asarray(pw._views_xla(ref, src, rots, trs, depth, 1))
    got = np.asarray(pw.warp_correlate_views_fused(ref, src, rots, trs,
                                                   depth, 1, True))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.abs(want).max() > 0.01, "degenerate test scene"

    # gradients take the same fallback
    gx = jax.grad(lambda a, b: jnp.sum(
        pw._views_xla(a, b, rots, trs, depth, 1) ** 2),
        argnums=(0, 1))(ref, src)
    gp = jax.grad(lambda a, b: jnp.sum(
        pw.warp_correlate_views_fused(a, b, rots, trs, depth, 1, True)
        ** 2), argnums=(0, 1))(ref, src)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_support_fits_accepts_calibrated_rig():
    """The predicate must pass (and thus keep the pallas fast path) for the
    DTU-like calibrated rigs every other test uses."""
    H, W, C, D = 104, 144, 32, 6
    rot, tr = _rig(H, W)
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
        (1, D, H, W)).copy())
    assert bool(pw.support_fits(rot[None], tr[None], depth, H, W, C))


def test_sparse_overflow_patch():
    """A minority of depth-edge tiles overflowing the 24-row region must
    NOT demote the launch to the XLA path: the 4-rung ladder runs the
    kernel and sparse-patches exactly those tiles (rung 2); a flood of
    overflow tiles beyond the patch capacity falls back fully (rung 3).
    Both must match the exact gather math."""
    rng = np.random.default_rng(0)
    B, V, H, W, C, D = 1, 2, 128, 128, 8, 8
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((B, V, H, W, C)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, V, 3, 3))
    trs = jnp.asarray(np.array([[[0, 12.0, 0], [0, 15.0, 0]]], np.float32))

    # one tile band alternates 0.35/3.0 per column -> its vertical support
    # spans ~30 rows (in-image), overflowing both region rungs there
    base = np.full((H, W), 1.0, np.float32)
    base[48:56, :] = np.where((np.arange(W) % 2)[None, :] == 0, 0.35, 3.0)
    depth = jnp.asarray(np.broadcast_to(base, (B, D, H, W)).copy())

    flags = pw.support_fits(rots, trs, depth, H, W, C, per_tile=True)
    n_bad = int(jnp.sum(~flags))
    assert 0 < n_bad <= max(8, flags.size // 8)
    assert not bool(pw.support_fits(rots, trs, depth, H, W, C))

    got = np.asarray(pw.warp_correlate_views_fused(ref, srcs, rots, trs,
                                                   depth, 1, True))
    want = np.asarray(pw._views_xla(ref, srcs, rots, trs, depth, 1))
    np.testing.assert_allclose(got, want, atol=5e-4)

    # flood: most tiles overflow -> beyond capacity -> full XLA fallback
    base2 = np.where((np.arange(W) % 2)[None, :] == 0, 0.35, 3.0)
    depth2 = jnp.asarray(np.broadcast_to(
        base2[None], (B, D, H, W)).astype(np.float32).copy())
    flags2 = pw.support_fits(rots, trs, depth2, H, W, C, per_tile=True)
    assert int(jnp.sum(~flags2)) > max(8, flags2.size // 8)
    got2 = np.asarray(pw.warp_correlate_views_fused(ref, srcs, rots, trs,
                                                    depth2, 1, True))
    want2 = np.asarray(pw._views_xla(ref, srcs, rots, trs, depth2, 1))
    np.testing.assert_allclose(got2, want2, atol=5e-4)


def test_sparse_overflow_patch_gradients():
    """Backward mirror of the sparse patch (ADVICE r3): with a minority of
    overflowing tiles, grads must route through bwd-rung-2 (kernel grads
    with overflow cotangents zeroed + exact-gather vjp for the flagged
    tiles) and match the exact XLA gradients — not demote to the
    OOM-prone full-XLA backward."""
    rng = np.random.default_rng(3)
    B, V, H, W, C, D = 1, 2, 128, 128, 8, 8
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((B, V, H, W, C)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, V, 3, 3))
    trs = jnp.asarray(np.array([[[0, 12.0, 0], [0, 15.0, 0]]], np.float32))
    base = np.full((H, W), 1.0, np.float32)
    base[48:56, :] = np.where((np.arange(W) % 2)[None, :] == 0, 0.35, 3.0)
    depth = jnp.asarray(np.broadcast_to(base, (B, D, H, W)).copy())

    flags = pw.support_fits(rots, trs, depth, H, W, C, per_tile=True)
    n_bad = int(jnp.sum(~flags))
    assert 0 < n_bad <= max(8, flags.size // 8), "rig must hit rung 2"

    gx = jax.grad(lambda a, b: jnp.sum(
        pw._views_xla(a, b, rots, trs, depth, 1) ** 2),
        argnums=(0, 1))(ref, srcs)
    gp = jax.grad(lambda a, b: jnp.sum(
        pw.warp_correlate_views_fused(a, b, rots, trs, depth, 1, True)
        ** 2), argnums=(0, 1))(ref, srcs)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_border_out_of_image_does_not_demote():
    """Samples projecting OUTSIDE the source image contribute zeros under
    grid_sample zeros-padding whether or not the region covers them, so
    they must not drag the region anchor (round-4 fix): a rig whose border
    tiles project partly out of image must stay on the pallas rungs (all
    tiles fit) and still match the exact gather path."""
    rng = np.random.default_rng(5)
    B, V, H, W, C, D = 1, 2, 64, 128, 8, 4
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((B, V, H, W, C)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, V, 3, 3))
    # +x translation of ~40 px at depth 500: the right ~40 columns
    # project past the source image edge
    trs = jnp.asarray(np.array([[[40.0 * 500, 0, 0],
                                 [46.0 * 500, 0, 0]]], np.float32))
    depth = jnp.asarray(np.broadcast_to(
        np.linspace(480, 520, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy())

    px, py = pw._project_views(rots, trs, depth, H, W)
    assert float(px.max()) > W + 1, "rig must project off-image"
    flags = pw.support_fits(rots, trs, depth, H, W, C, per_tile=True,
                            px=px, py=py)
    assert bool(jnp.all(flags)), \
        "out-of-image-only overflow must not flag tiles"

    got = np.asarray(pw.warp_correlate_views_fused(ref, srcs, rots, trs,
                                                   depth, 1, True))
    want = np.asarray(pw._views_xla(ref, srcs, rots, trs, depth, 1))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_tiled_projection_bitwise_matches_relayout_path():
    """Round-5 tiled dispatch: `_project_views_tiled` computes px/py
    directly in the kernel's chunked tile layout.  Its samples must be
    BITWISE identical to projecting raw fields then edge-padding +
    tile-flattening + plane-chunking them (the legacy relayout the
    backward kernel still uses) — the clamped tiled coordinate grid
    reproduces the edge padding exactly, and the per-sample arithmetic
    is the same expression.  Any drift here would desynchronize the
    forward kernels/predicates/patch from the backward's fields."""
    rng = np.random.default_rng(11)
    B, V, D, H, W = 2, 3, 12, 37, 150          # awkward sizes force padding
    rots = jnp.asarray(np.eye(3, dtype=np.float32)[None, None]
                       + rng.normal(0, .01, (B, V, 3, 3)).astype(np.float32))
    trs = jnp.asarray(rng.normal(0, 5, (B, V, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(400, 900, (B, D, H, W)).astype(np.float32))
    tc, DB = 64, 4
    BV = B * V

    px, py = pw._project_views(rots, trs, depth, H, W)
    pxp = pw._pad_to(px.reshape(BV * D, H, W), {1: pw.TILE_ROWS, 2: tc})
    pyp = pw._pad_to(py.reshape(BV * D, H, W), {1: pw.TILE_ROWS, 2: tc})
    pxf_old = pw._chunk_planes(pw._tile_flat(pxp, pw.TILE_ROWS, tc),
                               BV, D, DB)
    pyf_old = pw._chunk_planes(pw._tile_flat(pyp, pw.TILE_ROWS, tc),
                               BV, D, DB)

    pxf, pyf = pw._project_views_tiled(rots, trs, depth, H, W,
                                       pw.TILE_ROWS, tc, DB)
    assert pxf.shape == pxf_old.shape
    assert np.array_equal(np.asarray(pxf), np.asarray(pxf_old))
    assert np.array_equal(np.asarray(pyf), np.asarray(pyf_old))

    # and the tiled-field predicate agrees with the raw-field one at the
    # same chunking
    C = 8
    flags_raw = pw.support_fits(rots, trs, depth, H, W, C, px=px, py=py,
                                per_tile=True, tile_cols=tc,
                                region_rows=16, region_cols=256,
                                depth_chunk=DB)
    flags_tiled = pw.support_fits(rots, trs, depth, H, W, C,
                                  per_tile=True, tile_cols=tc,
                                  region_rows=16, region_cols=256,
                                  pxf=pxf, pyf=pyf)
    assert np.array_equal(np.asarray(flags_raw), np.asarray(flags_tiled))
