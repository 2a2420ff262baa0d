"""Legacy 3-D-distance fusion tail vs the reference torch implementation
(/root/reference/misc/fusion.py:243-330), element for element.

The reference hardcodes .cuda() elsewhere in the module but the legacy
functions are device-agnostic; they import cleanly on CPU torch.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from effi_mvs_plus_tpu.fuse import legacy

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


def make_scene(H=24, W=32, V=3, seed=7):
    rng = np.random.default_rng(seed)
    f = 1.2 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    def ext(v):
        E = np.eye(4, dtype=np.float32)
        a = 0.04 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [2.0 * v, 0.5 * v, 0.3 * v]
        return E

    def stacked(E):
        out = np.zeros((2, 4, 4), np.float32)
        out[0] = E
        out[1] = np.eye(4, dtype=np.float32)
        out[1, :3, :3] = K
        return out

    base = 50.0 + 10.0 * rng.random((H, W)).astype(np.float32)
    ref_depth = base
    src_depths = np.stack([base + rng.normal(0, 0.3, (H, W)).astype(
        np.float32) for _ in range(V)])
    ref_proj = stacked(ext(0))
    src_projs = np.stack([stacked(ext(v + 1)) for v in range(V)])
    return ref_depth, src_depths, ref_proj, src_projs


def torch_compose(proj):
    p = torch.from_numpy(proj)
    new = p[..., 0, :, :].clone()
    new[..., :3, :4] = torch.matmul(p[..., 1, :3, :3], p[..., 0, :3, :4])
    return new


def test_generate_points_parity(ref_fusion):
    ref_depth, _, ref_proj, _ = make_scene()
    want = ref_fusion.generate_points_from_depth(
        torch.from_numpy(ref_depth)[None, None],
        torch_compose(ref_proj)[None]).numpy()[0]          # (3, H, W)
    got = np.asarray(legacy.generate_points_from_depth(
        jnp.asarray(ref_depth), jnp.asarray(ref_proj)))    # (H, W, 3)
    np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                               rtol=1e-4, atol=1e-3)


def test_homo_warping_parity(ref_fusion):
    ref_depth, src_depths, ref_proj, src_projs = make_scene()
    H, W = ref_depth.shape
    fea = np.random.default_rng(0).random((3, H, W)).astype(np.float32)
    src_P = torch_compose(src_projs[0])
    ref_P = torch_compose(ref_proj)
    want = ref_fusion.homo_warping(
        torch.from_numpy(fea)[None], src_P[None], ref_P[None],
        torch.from_numpy(ref_depth)[None, None]).numpy()[0]   # (C, H, W)
    got = np.asarray(legacy.homo_warping(
        jnp.asarray(fea.transpose(1, 2, 0)),
        jnp.asarray(np.asarray(src_P)), jnp.asarray(np.asarray(ref_P)),
        jnp.asarray(ref_depth)))
    np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                               rtol=1e-4, atol=1e-3)


def test_filter_depth_parity(ref_fusion):
    ref_depth, src_depths, ref_proj, src_projs = make_scene()
    V, H, W = src_depths.shape
    ref_pc_t, aligned_t, dist_t = ref_fusion.filter_depth(
        torch.from_numpy(ref_depth)[None, None],
        torch.from_numpy(src_depths)[None, :, None],
        torch.from_numpy(ref_proj)[None],
        torch.from_numpy(src_projs)[None])
    ref_pc, aligned, dist = legacy.filter_depth(
        jnp.asarray(ref_depth), jnp.asarray(src_depths),
        jnp.asarray(ref_proj), jnp.asarray(src_projs))
    # reference repeats ref_pc over views: (V, 3, H, W)
    np.testing.assert_allclose(
        np.asarray(ref_pc).transpose(2, 0, 1), ref_pc_t.numpy()[0],
        rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(aligned).transpose(0, 3, 1, 2), aligned_t.numpy(),
        rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dist), dist_t.numpy()[:, 0], rtol=1e-3, atol=1e-2)
