"""Fusion correctness on synthetic scenes with known geometry."""

import numpy as np
import jax.numpy as jnp

from effi_mvs_plus_tpu.fuse.dypcd import (consistency, consistency_tank,
                                          DypcdParams, TankParams,
                                          backproject_to_world, fuse_scene)
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
