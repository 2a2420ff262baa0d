"""Static fusion variants vs the reference torch implementation.

The reference's misc/fusion.py get_reproj/vis_filter/ave_fusion
(:79-115) hardcode .cuda(); the fixture monkeypatches Tensor.cuda to a
no-op so the oracle runs on CPU torch.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from effi_mvs_plus_tpu.fuse import static as fstatic

torch = pytest.importorskip("torch")


@pytest.fixture()
def ref_fusion(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        import misc.fusion as rf
        importlib.reload(rf)
        yield rf
    finally:
        sys.path.remove("/root/reference")


def make_scene(H=24, W=32, seed=3):
    """Two-view scene with a slanted depth field and a rotated+translated
    source camera, so reprojections exercise all terms."""
    rng = np.random.default_rng(seed)
    f = 1.2 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    a = 0.05
    R = np.array([[np.cos(a), 0, np.sin(a)],
                  [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    E_src = np.eye(4, dtype=np.float32)
    E_src[:3, :3] = R
    E_src[:3, 3] = [0.3, 0.05, 0.02]
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth_ref = 5.0 + 0.01 * xx + 0.005 * yy
    depth_src = 5.0 + 0.01 * xx - 0.004 * yy \
        + 0.02 * rng.standard_normal((H, W)).astype(np.float32)
    return depth_ref, depth_src, K, E_ref, E_src


def _torch_cams(K, E_list):
    """Reference cam format: (n, v, 2, 4, 4), slot 0 extrinsic, slot 1
    intrinsic 3x3 block."""
    cams = []
    for E in E_list:
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = E
        cam[1, :3, :3] = K
        cam[1, 3, 3] = 1.0
        cams.append(cam)
    return torch.from_numpy(np.stack(cams))


def test_static_reproj_matches_reference(ref_fusion):
    depth_ref, depth_src, K, E_ref, E_src = make_scene()
    H, W = depth_ref.shape

    tref = torch.from_numpy(depth_ref)[None, None]              # n1hw
    tsrc = torch.from_numpy(depth_src)[None, None, None]        # nv1hw
    cam_ref = _torch_cams(K, [E_ref])[None]                     # n,1,2,4,4
    cam_src = _torch_cams(K, [E_src])[None]

    want_xyd, want_in = ref_fusion.get_reproj(
        tref, tsrc, cam_ref[:, 0], cam_src)
    got_xyd, got_in = fstatic.get_reproj(
        jnp.asarray(depth_ref), jnp.asarray(K), jnp.asarray(E_ref),
        jnp.asarray(depth_src)[None], jnp.asarray(K)[None],
        jnp.asarray(E_src)[None])

    want = want_xyd[0].permute(0, 2, 3, 1).numpy()              # (v,H,W,3)
    np.testing.assert_allclose(np.asarray(got_xyd), want,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(got_in), want_in[0, :, 0].numpy() > 0.5)


def test_static_filter_and_fusion_match_reference(ref_fusion):
    depth_ref, depth_src, K, E_ref, E_src = make_scene()

    tref = torch.from_numpy(depth_ref)[None, None]
    tsrc = torch.from_numpy(depth_src)[None, None, None]
    cam_ref = _torch_cams(K, [E_ref])[None]
    cam_src = _torch_cams(K, [E_src])[None]
    want_xyd, _ = ref_fusion.get_reproj(tref, tsrc, cam_ref[:, 0], cam_src)
    want_masks, want_vote = ref_fusion.vis_filter(
        tref, want_xyd, torch.ones(1), img_dist_thresh=1.0,
        depth_thresh=10.0, vthresh=2.0)
    want_ave = ref_fusion.ave_fusion(tref, want_xyd, want_masks)

    got_xyd, _ = fstatic.get_reproj(
        jnp.asarray(depth_ref), jnp.asarray(K), jnp.asarray(E_ref),
        jnp.asarray(depth_src)[None], jnp.asarray(K)[None],
        jnp.asarray(E_src)[None])
    got_masks, got_vote = fstatic.vis_filter(
        jnp.asarray(depth_ref), got_xyd, img_dist_thresh=1.0,
        depth_thresh=10.0, vthresh=2.0)
    got_ave = fstatic.ave_fusion(jnp.asarray(depth_ref), got_xyd,
                                 got_masks)

    np.testing.assert_array_equal(np.asarray(got_masks),
                                  want_masks[0, :, 0].numpy() > 0.5)
    np.testing.assert_array_equal(np.asarray(got_vote),
                                  want_vote[0, 0].numpy())
    np.testing.assert_allclose(np.asarray(got_ave),
                               want_ave[0, 0].numpy(),
                               rtol=1e-4, atol=1e-3)


def test_prob_filter_multi_stage():
    conf = jnp.stack([jnp.full((4, 4), 0.9), jnp.full((4, 4), 0.6)])
    m = fstatic.prob_filter(conf, [0.8, 0.5])
    assert bool(jnp.all(m))
    m = fstatic.prob_filter(conf, [0.8, 0.7])
    assert not bool(jnp.any(m))


def test_consistency_static_perfect_geometry_keeps_interior():
    """Identical cameras + identical depths: every interior pixel passes
    the static vote and the fused depth equals the input."""
    H, W = 24, 32
    depth = np.full((H, W), 5.0, np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    E_src = np.eye(4, dtype=np.float32)
    E_src[0, 3] = 0.3
    conf = np.full((H, W), 0.9, np.float32)
    final, fused, geo, photo = fstatic.consistency_static(
        jnp.asarray(depth), jnp.asarray(conf), jnp.asarray(K),
        jnp.asarray(E_ref), jnp.asarray(depth)[None],
        jnp.asarray(K)[None], jnp.asarray(E_src)[None])
    assert np.asarray(final)[4:-4, 4:-4].all()
    np.testing.assert_allclose(np.asarray(fused)[4:-4, 4:-4], 5.0,
                               atol=1e-3)
