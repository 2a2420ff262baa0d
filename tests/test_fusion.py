"""Fusion correctness on synthetic scenes with known geometry."""

import numpy as np
import jax.numpy as jnp

from effi_mvs_plus_tpu.fuse.dypcd import (consistency, consistency_scene,
                                          consistency_tank, DypcdParams,
                                          TankParams, backproject_to_world,
                                          fuse_scene, fuse_scene_device)
from effi_mvs_plus_tpu.fuse.ply import write_ply, read_ply


def make_two_view_plane(H=24, W=32, depth=5.0, noise=0.0, seed=0):
    """Two cameras looking at a fronto-parallel plane at `depth` (ref frame).
    Both depth maps are exact (plus optional noise on the src)."""
    rng = np.random.default_rng(seed)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    E_src = np.eye(4, dtype=np.float32)
    E_src[0, 3] = 0.5                       # small baseline along x
    depth_ref = np.full((H, W), depth, np.float32)
    # plane z=depth in ref frame = z=depth in src frame (pure translation in x)
    depth_src = np.full((H, W), depth, np.float32) + \
        noise * rng.standard_normal((H, W)).astype(np.float32)
    return depth_ref, depth_src, K, E_ref, E_src


def test_consistent_geometry_passes_and_inconsistent_fails():
    depth_ref, depth_src, K, E_ref, E_src = make_two_view_plane()
    conf = np.full(depth_ref.shape, 0.9, np.float32)
    final, fused, geo, photo = consistency(
        jnp.asarray(depth_ref), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), jnp.asarray(depth_src)[None],
        jnp.asarray(K)[None], jnp.asarray(E_src)[None], DypcdParams())
    final = np.asarray(final)
    # interior pixels: perfect consistency -> kept (1 src view passes
    # level 1 of the ladder); borders may fall outside the src image.
    assert final[4:-4, 4:-4].all()
    # fused depth: conf>0.75 override keeps the reference depth exactly
    np.testing.assert_allclose(np.asarray(fused)[4:-4, 4:-4], 5.0, atol=1e-4)

    # wildly inconsistent source depth -> nothing passes
    bad_src = np.full(depth_ref.shape, 50.0, np.float32)
    final_bad, _, geo_bad, _ = consistency(
        jnp.asarray(depth_ref), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), jnp.asarray(bad_src)[None],
        jnp.asarray(K)[None], jnp.asarray(E_src)[None], DypcdParams())
    assert not np.asarray(final_bad).any()

    # low confidence -> photometric reject even with good geometry
    low_conf = np.full(depth_ref.shape, 0.1, np.float32)
    final_low, _, _, photo_low = consistency(
        jnp.asarray(depth_ref), jnp.asarray(low_conf), jnp.asarray(K),
        jnp.asarray(E_ref), jnp.asarray(depth_src)[None],
        jnp.asarray(K)[None], jnp.asarray(E_src)[None], DypcdParams())
    assert not np.asarray(final_low).any()


def test_fused_depth_averages_without_override():
    depth_ref, depth_src, K, E_ref, E_src = make_two_view_plane()
    conf = np.full(depth_ref.shape, 0.6, np.float32)  # below 0.75 override
    final, fused, _, _ = consistency(
        jnp.asarray(depth_ref), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), jnp.asarray(depth_src)[None],
        jnp.asarray(K)[None], jnp.asarray(E_src)[None], DypcdParams())
    inner = np.asarray(fused)[6:-6, 6:-6]
    # average of ref and reprojected-src depth, both 5.0
    np.testing.assert_allclose(inner, 5.0, atol=1e-3)


def test_tank_variant_thresholds():
    depth_ref, depth_src, K, E_ref, E_src = make_two_view_plane(depth=5.0)
    conf = np.full(depth_ref.shape, 0.9, np.float32)
    srcs = jnp.asarray(np.stack([depth_src] * 3))
    Ks = jnp.asarray(np.stack([K] * 3))
    Es = jnp.asarray(np.stack([E_src] * 3))
    final, fused, geo, photo = consistency_tank(
        jnp.asarray(depth_ref), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), srcs, Ks, Es, TankParams(dh_view_num=2))
    assert np.asarray(final)[4:-4, 4:-4].all()
    # a single consistent view cannot satisfy dh_view_num=2
    final1, *_ = consistency_tank(
        jnp.asarray(depth_ref), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), srcs[:1], Ks[:1], Es[:1],
        TankParams(dh_view_num=2))
    assert not np.asarray(final1).any()


def test_backproject_roundtrip():
    depth_ref, _, K, E_ref, _ = make_two_view_plane()
    mask = np.zeros(depth_ref.shape, bool)
    mask[10, 12] = True
    xyz, (ys, xs) = backproject_to_world(depth_ref, mask, K, E_ref)
    # identity extrinsics: world == cam; reproject manually
    p = K @ xyz[0]
    p = p / p[2]
    assert abs(p[0] - 12) < 1e-4 and abs(p[1] - 10) < 1e-4
    assert abs(xyz[0][2] - 5.0) < 1e-5


def test_scene_batched_matches_per_ref_dispatch():
    """consistency_scene (device-resident, lax.map-chunked) must agree
    bitwise with the per-reference consistency calls it replaces."""
    rng = np.random.default_rng(3)
    H, W, N, S = 20, 28, 5, 3
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    depths, confs, Es = [], [], []
    for v in range(N):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.3 * v
        Es.append(E)
        depths.append((5.0 + 0.05 * rng.standard_normal((H, W)))
                      .astype(np.float32))
        confs.append(rng.uniform(0.2, 1.0, (H, W)).astype(np.float32))
    Ks = np.stack([K] * N)
    pair = [(r, [(r + k + 1) % N for k in range(S)]) for r in range(N)]
    ref_ids = jnp.asarray([r for r, _ in pair], jnp.int32)
    src_ids = jnp.asarray([s for _, s in pair], jnp.int32)

    fin_b, fus_b, geo_b, pho_b = consistency_scene(
        jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(confs)),
        jnp.asarray(Ks), jnp.asarray(np.stack(Es)),
        ref_ids, src_ids, DypcdParams(), 2)
    for i, (r, srcs) in enumerate(pair):
        fin, fus, geo, pho = consistency(
            jnp.asarray(depths[r]), jnp.asarray(confs[r]), jnp.asarray(K),
            jnp.asarray(Es[r]), jnp.asarray(np.stack([depths[s] for s in srcs])),
            jnp.asarray(np.stack([Ks[s] for s in srcs])),
            jnp.asarray(np.stack([Es[s] for s in srcs])), DypcdParams())
        np.testing.assert_array_equal(np.asarray(fin_b[i]), np.asarray(fin))
        # different compilations (lax.map body vs standalone jit) reassociate
        # the einsum chains -> last-ulp drift on the fused average
        np.testing.assert_allclose(np.asarray(fus_b[i]), np.asarray(fus),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(geo_b[i]), np.asarray(geo))
        np.testing.assert_array_equal(np.asarray(pho_b[i]), np.asarray(pho))


def test_fuse_scene_device_matches_callback_path():
    depth_ref, depth_src, K, E_ref, E_src = make_two_view_plane()
    conf = np.full(depth_ref.shape, 0.9, np.float32)
    views = {
        0: {"depth": depth_ref, "conf": conf, "K": K, "E": E_ref,
            "image": None},
        1: {"depth": depth_src, "conf": conf, "K": K, "E": E_src,
            "image": None},
    }
    pair = [(0, [1]), (1, [0])]
    xyz_d, _ = fuse_scene_device(pair, views)
    # per-ref legacy path, forced by giving the two views distinct shapes?
    # no — call the per-ref core directly for the same answer
    all_xyz = []
    for r, srcs in pair:
        fin, fus, _, _ = consistency(
            jnp.asarray(views[r]["depth"]), jnp.asarray(views[r]["conf"]),
            jnp.asarray(views[r]["K"]), jnp.asarray(views[r]["E"]),
            jnp.asarray(np.stack([views[s]["depth"] for s in srcs])),
            jnp.asarray(np.stack([views[s]["K"] for s in srcs])),
            jnp.asarray(np.stack([views[s]["E"] for s in srcs])),
            DypcdParams())
        xyz, _ = backproject_to_world(np.asarray(fus), np.asarray(fin),
                                      views[r]["K"], views[r]["E"])
        all_xyz.append(xyz)
    xyz_ref = np.concatenate(all_xyz, 0)
    np.testing.assert_allclose(xyz_d, xyz_ref, rtol=1e-6)


def test_fuse_scene_and_ply_roundtrip(tmp_path):
    depth_ref, depth_src, K, E_ref, E_src = make_two_view_plane()
    conf = np.full(depth_ref.shape, 0.9, np.float32)
    img = np.random.default_rng(0).uniform(0, 1, depth_ref.shape + (3,))

    views = {
        0: {"depth": depth_ref, "conf": conf, "K": K, "E": E_ref,
            "image": img.astype(np.float32)},
        1: {"depth": depth_src, "conf": conf, "K": K, "E": E_src,
            "image": img.astype(np.float32)},
    }
    xyz, rgb = fuse_scene([(0, [1]), (1, [0])], views.__getitem__)
    assert len(xyz) > 100 and rgb is not None and len(rgb) == len(xyz)

    path = tmp_path / "out.ply"
    write_ply(path, xyz, rgb)
    xyz2, rgb2 = read_ply(path)
    np.testing.assert_allclose(xyz2, xyz, rtol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)
