"""Op-level parity vs torch reference semantics.

These tests pin the exact numerics the published checkpoints depend on:
grid_sample(align_corners=True, zeros padding) bilinear gather, the
depth-axis volume resampler, convex upsampling, and torch conv /
conv-transpose / batch-norm layer semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu import nn, ops
from effi_mvs_plus_tpu.core import geometry

jax.config.update("jax_enable_x64", False)

RNG = np.random.default_rng(0)


def test_bilinear_gather_matches_grid_sample():
    B, H, W, C = 2, 13, 17, 5
    fea = RNG.standard_normal((B, C, H, W), dtype=np.float32)
    N = 500
    # include in-range, boundary and out-of-range coordinates
    px = RNG.uniform(-3, W + 2, (B, N)).astype(np.float32)
    py = RNG.uniform(-3, H + 2, (B, N)).astype(np.float32)

    gx = 2 * px / (W - 1) - 1
    gy = 2 * py / (H - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1)[:, :, None, :])
    want = F.grid_sample(torch.from_numpy(fea), grid, mode="bilinear",
                         padding_mode="zeros", align_corners=True)
    want = want[:, :, :, 0].permute(0, 2, 1).numpy()     # (B,N,C)

    got = ops.bilinear_gather(jnp.asarray(fea.transpose(0, 2, 3, 1)),
                              jnp.asarray(px), jnp.asarray(py))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_homo_warp_matches_reference_impl():
    from conftest import load_reference_models
    homo_warping_new = load_reference_models().module.homo_warping_new

    B, C, H, W, D = 1, 8, 12, 16, 5
    src = RNG.standard_normal((B, C, H, W), dtype=np.float32)
    # a mild random projective relation
    ref_proj = np.eye(4, dtype=np.float32)[None].repeat(B, 0).copy()
    src_proj = np.eye(4, dtype=np.float32)[None].repeat(B, 0).copy()
    src_proj[:, :3, :3] += 0.05 * RNG.standard_normal((B, 3, 3)).astype(np.float32)
    src_proj[:, :3, 3] = 0.3 * RNG.standard_normal((B, 3)).astype(np.float32)
    K = np.array([[8, 0, W / 2], [0, 8, H / 2], [0, 0, 1]], np.float32)
    for P in (ref_proj, src_proj):
        P[:, :3, :4] = K @ P[:, :3, :4]
    depth = np.linspace(2.0, 6.0, D).astype(np.float32)
    depth_t = np.broadcast_to(depth[None, :, None, None], (B, D, H, W)).copy()

    want = homo_warping_new(torch.from_numpy(src), torch.from_numpy(src_proj),
                            torch.from_numpy(ref_proj),
                            torch.from_numpy(depth_t))
    want = want.reshape(B, C, D, H, W).permute(0, 2, 3, 4, 1).numpy()

    rot, tr = geometry.relative_projection(jnp.asarray(src_proj),
                                           jnp.asarray(ref_proj))
    got = ops.homo_warp(jnp.asarray(src.transpose(0, 2, 3, 1)), rot, tr,
                        jnp.asarray(depth_t))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_depth_axis_resampler_matches_pro_bilinear_sampler():
    from conftest import load_reference_models
    pro_bilinear_sampler = load_reference_models().Effi_MVS_plus.pro_bilinear_sampler

    B, D, H, W, K = 2, 16, 6, 7, 3
    vol = RNG.standard_normal((B, D, H, W), dtype=np.float32)
    dmin, dmax = 2.0, 10.0
    depth_sample = RNG.uniform(1.8, 11.0, (B, K, H, W)).astype(np.float32)

    pro = torch.from_numpy(vol).permute(0, 2, 3, 1).reshape(B * H * W, 1, 1, D)
    want = pro_bilinear_sampler(pro, torch.from_numpy(depth_sample),
                                torch.tensor(dmin), torch.tensor(dmax)).numpy()

    got = ops.resample_volume_at_depths(jnp.asarray(vol),
                                        jnp.asarray(depth_sample),
                                        dmin, dmax)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_convex_upsample_matches_reference():
    from conftest import load_reference_models
    upsample_depth = load_reference_models().Effi_MVS_plus.upsample_depth

    B, H, W, r = 2, 5, 6, 2
    depth = RNG.standard_normal((B, 1, H, W), dtype=np.float32)
    mask = RNG.standard_normal((B, 9 * r * r, H, W), dtype=np.float32)
    want = upsample_depth(torch.from_numpy(depth), torch.from_numpy(mask),
                          ratio=r).numpy()
    got = ops.convex_upsample(jnp.asarray(depth[:, 0]),
                              jnp.asarray(mask.transpose(0, 2, 3, 1)), r)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_conv_transpose3d_matches_torch():
    B, I, O, D, H, W = 1, 4, 3, 5, 6, 7
    x = RNG.standard_normal((B, I, D, H, W), dtype=np.float32)
    tconv = torch.nn.ConvTranspose3d(I, O, 3, stride=2, padding=1,
                                     output_padding=1)
    want = tconv(torch.from_numpy(x)).detach().numpy()

    w = tconv.weight.detach().numpy()                     # (I,O,kd,kh,kw)
    wj = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()
    got = nn.conv_transpose3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                              jnp.asarray(wj),
                              jnp.asarray(tconv.bias.detach().numpy()),
                              stride=2, padding=1, output_padding=1)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv_transpose3d_spatial_stride_matches_torch():
    B, I, O, D, H, W = 1, 1, 2, 4, 6, 8
    x = RNG.standard_normal((B, I, D, H, W), dtype=np.float32)
    tconv = torch.nn.ConvTranspose3d(I, O, 3, stride=(1, 2, 2), padding=1,
                                     output_padding=(0, 1, 1))
    want = tconv(torch.from_numpy(x)).detach().numpy()
    w = tconv.weight.detach().numpy()
    wj = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()
    got = nn.conv_transpose3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                              jnp.asarray(wj),
                              jnp.asarray(tconv.bias.detach().numpy()),
                              stride=(1, 2, 2), padding=1,
                              output_padding=(0, 1, 1))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_batch_norm_eval_and_train_match_torch():
    C = 6
    x = RNG.standard_normal((3, 8, 9, C), dtype=np.float32)
    tb = torch.nn.BatchNorm2d(C, momentum=0.1)
    tb.weight.data = torch.randn(C)
    tb.bias.data = torch.randn(C)
    tb.running_mean.data = torch.randn(C)
    tb.running_var.data = torch.rand(C) + 0.5

    # .copy(): jax CPU zero-copies numpy views, and torch mutates the
    # running stats in place during the train-mode forward below.
    p = {"weight": jnp.asarray(tb.weight.detach().numpy().copy()),
         "bias": jnp.asarray(tb.bias.detach().numpy().copy()),
         "running_mean": jnp.asarray(tb.running_mean.numpy().copy()),
         "running_var": jnp.asarray(tb.running_var.numpy().copy())}

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tb.eval()
    want_eval = tb(xt).detach().numpy().transpose(0, 2, 3, 1)
    got_eval = np.asarray(nn.batch_norm(jnp.asarray(x), p, None))
    np.testing.assert_allclose(got_eval, want_eval, atol=1e-5, rtol=1e-5)

    tb.train()
    want_train = tb(xt).detach().numpy().transpose(0, 2, 3, 1)
    ctx = nn.Ctx(train=True, rng=jax.random.PRNGKey(0))
    with ctx.scope("bn"):
        got_train = np.asarray(nn.batch_norm(jnp.asarray(x), p, ctx))
    np.testing.assert_allclose(got_train, want_train, atol=1e-4, rtol=1e-4)
    upd = ctx.updates["bn"]
    np.testing.assert_allclose(np.asarray(upd["running_mean"]),
                               tb.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["running_var"]),
                               tb.running_var.numpy(), atol=1e-4)


def test_photometric_confidence_matches_reference():
    B, D, H, W = 2, 16, 5, 6
    logits = RNG.standard_normal((B, D, H, W), dtype=np.float32)
    prob = torch.softmax(torch.from_numpy(logits), dim=1)

    sum4 = 4 * F.avg_pool3d(F.pad(prob.unsqueeze(1), pad=(0, 0, 0, 0, 1, 2)),
                            (4, 1, 1), stride=1, padding=0).squeeze(1)
    didx = torch.sum(prob * torch.arange(D, dtype=torch.float32)
                     .view(1, D, 1, 1), dim=1).long().clamp(0, D - 1)
    want = torch.gather(sum4, 1, didx.unsqueeze(1)).squeeze(1).numpy()

    got = ops.photometric_confidence(jax.nn.softmax(jnp.asarray(logits), axis=1))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_depth_range_samples_local_matches_reference():
    from conftest import load_reference_models
    get_depth_range_samples = load_reference_models().module.get_depth_range_samples

    B, H, W, n = 2, 4, 5, 8
    cur = RNG.uniform(0.001, 0.01, (B, H, W)).astype(np.float32)
    interval = np.float32(2e-4)
    want = get_depth_range_samples(torch.from_numpy(cur), n,
                                   torch.tensor(interval), "cpu",
                                   torch.float32, [B, H, W]).numpy()
    got = geometry.depth_range_samples_local(jnp.asarray(cur), n, interval)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7, rtol=1e-5)
