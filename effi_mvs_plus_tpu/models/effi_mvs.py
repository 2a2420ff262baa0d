"""Effi-MVS+ capability model: cascaded coarse-to-fine multi-view depth.

TPU-native re-design of the reference pipeline
(/root/reference/models/Effi_MVS_plus.py:315-567):

stage 1  full inverse-depth plane sweep (D=48) -> pixel-wise view weights
         -> 3-D U-Net regularisation -> expectation depth + confidence;
stages 2/3  fresh 8-hypothesis *dynamic* cost volume around the detached
         current depth + cross-scale propagation (CSP) of both stored
         volumes; every stage then runs 3 ConvGRU refinement iterations
         whose cost lookups resample the stored volumes along the depth
         axis (gather-free), followed by learned convex x2 upsampling.

Outputs 13 depth maps (1 init + 3 stages x (3 iters + upsample)) and a
photometric confidence at half input resolution — the same contract as the
reference (SURVEY §3.5), so its training loss and fusion stack apply
unchanged.

Data contract (channels-last):
    imgs:          (B, V, H, W, 3)  float in [0,1]
    proj_matrices: {'stage1'..'stage3': (B, V, 2, 4, 4)}  slot 0 extrinsics,
                   slot 1 intrinsics (rows 0-1 pre-scaled per stage)
    depth_values:  (B, Nd) ascending inverse-depth samples spanning the
                   scene range
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from effi_mvs_plus_tpu import nn, ops
from effi_mvs_plus_tpu.core import geometry
from effi_mvs_plus_tpu.models import blocks
from effi_mvs_plus_tpu.nn import scope
from effi_mvs_plus_tpu.parallel import mesh as par


@dataclasses.dataclass(frozen=True)
class EffiMVSConfig:
    """Architecture hyper-parameters (deployed values:
    Effi_MVS_plus.py:316-354, train.sh / test_dtu.sh presets)."""
    ndepths: Tuple[int, ...] = (48, 8, 8)
    depth_intervals_ratio: Tuple[float, ...] = (4.0, 2.0, 1.0)
    cost_num: int = 2            # stored volumes concatenated per lookup
    CostNum: int = 3             # hypotheses per GRU cost lookup
    gru_iters: Tuple[int, ...] = (3, 3, 3)
    hdim_stage: Tuple[int, ...] = (48, 32, 16)
    cdim_stage: Tuple[int, ...] = (12, 8, 4)
    context_feature: Tuple[int, ...] = (60, 40, 20)
    cost_dim_stage: Tuple[int, ...] = (32, 16, 8)
    feature_in_channel: Tuple[int, ...] = (8, 16, 32, 64)
    context_in_channel: Tuple[int, ...] = (4, 8, 16, 32)
    G: int = 1                   # correlation groups
    feat_ratio: Tuple[int, ...] = (2, 2, 2)
    num_stage: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    # warp+correlate implementation: 'auto' = pallas kernel on TPU, XLA
    # gather elsewhere; 'pallas' / 'xla' force.  The pallas path is
    # geometry-safe: a traced predicate (ops.pallas_warp.support_fits)
    # checks each batch's projected support against the kernel's static
    # region margins and lax.cond-falls back to the exact XLA gather path
    # for wilder cameras — no silent zeroing.
    warp_impl: str = "auto"
    # ConvGRU implementation: 'auto' = fused pallas kernel on TPU
    # (ops/pallas_gru.py), XLA convs elsewhere; 'pallas' / 'xla' force.
    gru_impl: str = "auto"
    # FPN-stem 3x3 chains: 'auto' = fused pallas kernel at inference on
    # TPU with folded BN (ops/pallas_conv.py); 'pallas' / 'xla' force.
    stem_impl: str = "auto"
    # Cost-regulariser + CSP 3-D convs: 'blocked' = space-to-depth
    # blocked form (ops/blocked_conv.py, blocks.REG_PLAN/CSP_PLAN);
    # 'auto' resolution is set by the full-forward A/B
    # (scripts/ab_blocked_forward.py).
    reg_impl: str = "auto"
    # Update-block encoder / depth-head / mask 2-D convs, + PixelwiseNet.
    enc_impl: str = "auto"


def _bshape(x, ndim):
    """Reshape per-batch scalars (B,) / (B,1,1,1) to rank `ndim`."""
    x = x.reshape(x.shape[0], *([1] * (ndim - 1)))
    return x


def _repeat2x_hw(x, h_axis, w_axis):
    return jnp.repeat(jnp.repeat(x, 2, axis=h_axis), 2, axis=w_axis)


def _warp_correlate_views(cfg, ref_fea, src_feas, rots, transs, depth):
    """All-views warp+correlation: one pallas launch on TPU ('auto'),
    an XLA gather loop elsewhere.  Returns (B, V-1, D, h, w)."""
    from effi_mvs_plus_tpu.ops import pallas_warp
    impl = cfg.warp_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and cfg.G == 1:
        return pallas_warp.warp_correlate_views_fused(
            ref_fea, src_feas, rots, transs, depth, cfg.G)
    return pallas_warp._views_xla(ref_fea, src_feas, rots, transs, depth,
                                  cfg.G)


def _relative_projections(P):
    """(B, V, 4, 4) composed projections -> per-src-view (rot, trans)
    mapping ref rays to src pixels: (B, V-1, 3, 3), (B, V-1, 3)."""
    Pv = P[:, 1:]
    Pref = jnp.broadcast_to(P[:, 0:1], Pv.shape)
    return geometry.relative_projection(Pv, Pref)


def forward(params, imgs, proj_matrices, depth_values,
            cfg: EffiMVSConfig = EffiMVSConfig(), ctx: Optional[nn.Ctx] = None):
    """Full multi-stage forward pass.

    Returns {'depth': [13 x (B,h,w)] coarsest->finest actual depths,
             'photometric_confidence': (B, H/2, W/2)}.
    """
    B, V, H, W, _ = imgs.shape
    dt = cfg.compute_dtype
    imgs = imgs.astype(dt)
    depth_values = depth_values.astype(jnp.float32)

    # Blocked-conv dispatch for the regulariser/CSP and encoder conv
    # groups, set by the full-forward A/B (scripts/ab_blocked_forward.py,
    # 2026-08-20; isolated per-conv probes overstate wins — BASELINE.md
    # round 4): reg 'auto' -> blocked at TPU inference (T&T B=2
    # 316 -> 292 ms/map, DTU B=6 17.96 -> 18.35 maps/s); enc measured a
    # ~4 ms LOSS at every point -> stays XLA; stem wins at B=1 only ->
    # stays opt-in.  Training-side A/B (scripts/train_ab_r05.py,
    # 2026-08-20, full fwd+bwd+AdamW): blocked wins 326 -> 305 ms/step
    # at the reference 640x512 B=4 shape (neutral at 320x256, 132.5 vs
    # 133.9), so 'auto' = blocked on TPU for training too (TRAIN_r05).
    reg_impl = cfg.reg_impl
    if reg_impl == "auto":
        reg_impl = "blocked" if jax.default_backend() == "tpu" else "xla"
    enc_impl = "xla" if cfg.enc_impl == "auto" else cfg.enc_impl

    disp_min = depth_values[:, 0]
    disp_max = depth_values[:, -1]
    depth_max_g = 1.0 / disp_min          # (B,)
    depth_min_g = 1.0 / disp_max
    depth_interval = (disp_max - disp_min) / depth_values.shape[1]   # (B,)

    def scale_inv_depth(disp):
        return geometry.disp_to_depth(disp,
                                      _bshape(depth_min_g, disp.ndim),
                                      _bshape(depth_max_g, disp.ndim))

    # ---- feature extraction: all views through the FPN in one batch ----
    # (per-view BN statistics via stat_groups — the reference loops views,
    # Effi_MVS_plus.py:432-434, so its train-mode BN stats are per view).
    # The view-flattened input and outputs are anchored with the policy's
    # view_batch spec: under a view-sharding policy GSPMD then shards the
    # whole per-view conv chain over the model axis — at the T&T
    # deployment point these activations are the single largest HBM cost
    # of the forward (buffer-assignment audit in SHARDING_TANK_r02.json).
    with scope(ctx, "feature"), nn.stat_groups(ctx, V):
        feats = blocks.feature_net(
            par.constrain_view_batch(imgs.reshape(B * V, H, W, 3)),
            params["feature"], ctx, stem_impl=cfg.stem_impl)
    feats = {k: par.constrain_view_batch(v).reshape(B, V, *v.shape[1:])
             for k, v in feats.items()}

    with scope(ctx, "cnet_depth"):
        cnet = blocks.feature_net(imgs[:, 0], params["cnet_depth"], ctx,
                                  stem_impl=cfg.stem_impl)

    hiddens, contexts = [], []
    for s in range(cfg.num_stage):
        c = cnet[f"stage{s + 1}"]
        h, inp = jnp.split(c, [cfg.hdim_stage[s]], axis=-1)
        hiddens.append(jnp.tanh(h))
        contexts.append(jax.nn.relu(inp))

    depth_predictions = []
    view_weights = None
    photometric_confidence = None
    reg_volume = cur_volume = None        # stored volumes, (B, D, h, w)
    vol_dmin = vol_dmax = None            # their per-pixel depth ranges

    for s in range(cfg.num_stage):
        # model-axis layout: image rows sharded over 'model' when a
        # spatial policy is active (T&T-resolution HBM relief) — the warp
        # gathers and conv halos become GSPMD collectives over ICI
        f = par.constrain_spatial(feats[f"stage{s + 1}"])   # (B,V,h,w,C)
        h, w = f.shape[2], f.shape[3]
        P = geometry.compose_projection(
            proj_matrices[f"stage{s + 1}"].astype(jnp.float32))  # (B,V,4,4)
        ref_fea = f[:, 0]
        interval_s = (depth_interval * cfg.depth_intervals_ratio[s])  # (B,)

        if s == 0:
            # ----- initial full sweep -----
            drs_disp = geometry.depth_range_samples_global(
                depth_values, cfg.ndepths[0], h, w)
            depth_hyps = 1.0 / drs_disp                 # (B,D,h,w) descending
            rots, trs = _relative_projections(P)
            sims = par.constrain_views_volume(_warp_correlate_views(
                cfg, ref_fea, f[:, 1:], rots, trs, depth_hyps))
            # all source views at once (the reference loops views,
            # Effi_MVS_plus.py:32-61; one batched conv launch is the
            # TPU-efficient shape, and nn.stat_groups keeps the per-view
            # BN running-stat chain exact).  The weighted accumulation
            # over views is associative -> with a view-sharded policy it
            # becomes a psum over the model axis (SURVEY §5.7).
            s_det = lax.stop_gradient(sims)             # (B,V-1,D,h,w)
            pnorm = jax.nn.softmax(s_det, axis=2)
            entropy = -jnp.sum(pnorm * jnp.log(pnorm + 1e-7), axis=2)
            with scope(ctx, "PixelwiseNet"), nn.stat_groups(ctx, V - 1):
                vw = blocks.pixelwise_net(
                    par.constrain_view_batch(
                        entropy.reshape(B * (V - 1), h, w, 1).astype(dt)),
                    params["PixelwiseNet"], ctx,
                    impl=enc_impl)                      # (B(V-1),h,w,1)
            vw = vw.reshape(B, V - 1, h, w)
            view_weights = vw                           # (B,V-1,h,w)
            vw_ = vw[:, :, None]                        # (B,V-1,1,h,w)
            sim_sum = jnp.sum(sims * vw_, axis=1)       # (B,D,h,w)
            w_sum = jnp.sum(vw_, axis=1)                # (B,1,h,w)
            similarity = (sim_sum / (w_sum + 1e-6))[..., None]  # (B,D,h,w,G)
            similarity = par.constrain_volume(similarity)

            with scope(ctx, "cost_regularization"):
                prob_pre, _pro = blocks.cost_reg_net(
                    similarity.astype(dt), params["cost_regularization"],
                    ctx, impl=reg_impl)
            prob = jax.nn.softmax(prob_pre.astype(jnp.float32), axis=1)
            init_depth = ops.depth_regression(prob, depth_hyps)
            conf = ops.photometric_confidence(prob)
            photometric_confidence = _repeat2x_hw(
                _repeat2x_hw(conf, 1, 2), 1, 2)         # x4 nearest -> H/2

            reg_volume = prob_pre.astype(jnp.float32)
            cur_volume = similarity[..., 0].astype(jnp.float32)
            vol_dmin = _bshape(depth_min_g, 4)
            vol_dmax = _bshape(depth_max_g, 4)
            cur_depth = init_depth                      # (B,h,w)
            depth_predictions.append(init_depth)
        else:
            # ----- dynamic cost volume around detached current depth -----
            cur_depth = lax.stop_gradient(depth_predictions[-1])  # (B,h,w)
            view_weights = _repeat2x_hw(view_weights, 2, 3)
            dv = 1.0 / cur_depth
            drs_disp = geometry.depth_range_samples_local(
                dv, cfg.ndepths[s], _bshape(interval_s, 3))
            depth_samples = 1.0 / drs_disp              # (B,8,h,w) descending

            rots, trs = _relative_projections(P)
            sims = par.constrain_views_volume(_warp_correlate_views(
                cfg, ref_fea, f[:, 1:], rots, trs, depth_samples))
            vw_ = view_weights[:, :, None]              # (B,V-1,1,h,w)
            sim_sum = jnp.sum(sims * vw_, axis=1)       # (B,8,h,w)
            w_sum = jnp.sum(vw_, axis=1)                # (B,1,h,w)
            fresh = par.constrain_volume(
                (sim_sum / (w_sum + 1e-6))[..., None])  # (B,8,h,w,G)

            new_dmax = depth_samples[:, 0:1]            # (B,1,h,w)
            new_dmin = depth_samples[:, -1:]

            # cross-scale propagation: previous-stage volumes resampled at
            # the new hypotheses (nearest-downsampled x2) then fused in.
            ds_low = depth_samples[:, :, ::2, ::2]
            reg_low = ops.resample_volume_at_depths(
                reg_volume, ds_low, vol_dmin, vol_dmax)
            with scope(ctx, f"CSP_R{s}"):
                reg_volume = par.constrain_volume(blocks.csp_block(
                    fresh.astype(dt), reg_low[..., None].astype(dt),
                    params[f"CSP_R{s}"], ctx, impl=reg_impl,
                    stage=s + 1).astype(jnp.float32))
            cur_low = ops.resample_volume_at_depths(
                cur_volume, ds_low, vol_dmin, vol_dmax)
            with scope(ctx, f"CSP_C{s}"):
                cur_volume = par.constrain_volume(blocks.csp_block(
                    fresh.astype(dt), cur_low[..., None].astype(dt),
                    params[f"CSP_C{s}"], ctx, impl=reg_impl,
                    stage=s + 1).astype(jnp.float32))
            vol_dmin, vol_dmax = new_dmin, new_dmax

        # ----- ConvGRU iterative refinement over the stored volumes -----
        inv_cur_depth = geometry.depth_to_disp(
            cur_depth, _bshape(depth_min_g, 3), _bshape(depth_max_g, 3))

        def get_cost(depth, it, cur_volume=cur_volume, reg_volume=reg_volume,
                     vol_dmin=vol_dmin, vol_dmax=vol_dmax,
                     interval_s=interval_s):
            """depth: (B,h,w,1) -> (B,h,w, CostNum*cost_num) cost lookup."""
            dv = 1.0 / depth[..., 0]
            drs = geometry.depth_range_samples_local(
                dv, cfg.CostNum, _bshape(interval_s, 3))
            ds = 1.0 / drs                              # (B,K,h,w)
            c_cur = ops.resample_volume_at_depths(cur_volume, ds,
                                                  vol_dmin, vol_dmax)
            c_reg = ops.resample_volume_at_depths(reg_volume, ds,
                                                  vol_dmin, vol_dmax)
            return jnp.concatenate([c_cur, c_reg],
                                   axis=1).transpose(0, 2, 3, 1).astype(dt)

        def scale4(disp):
            return scale_inv_depth(disp)

        with scope(ctx, f"update_block_depth{s + 1}"):
            _, mask, inv_depth_list = blocks.update_block(
                par.constrain_spatial(hiddens[s].astype(dt)), get_cost,
                inv_cur_depth[..., None], contexts[s].astype(dt),
                params[f"update_block_depth{s + 1}"], cfg.gru_iters[s],
                scale4, ctx, gru_impl=cfg.gru_impl, enc_impl=enc_impl,
                stage=s + 1)

        for inv_d in inv_depth_list:
            depth_predictions.append(
                scale_inv_depth(inv_d[..., 0].astype(jnp.float32))[1])
        inv_up = ops.convex_upsample(
            inv_depth_list[-1][..., 0].astype(jnp.float32),
            mask.astype(jnp.float32), cfg.feat_ratio[s])
        depth_predictions.append(scale_inv_depth(inv_up)[1])

    return {"depth": depth_predictions,
            "photometric_confidence": photometric_confidence}


# ---------------------------------------------------------------------------
# Parameter initialisation (training from scratch), torch-default inits.
# ---------------------------------------------------------------------------

def _key_iter(key):
    while True:
        key, sub = jax.random.split(key)
        yield sub


def _conv_bn(kit, k, i, o, transpose=False):
    init = nn.init_conv_transpose if transpose else nn.init_conv
    kshape = (tuple(k) if isinstance(k, (tuple, list)) else (k,) * 2) + (i, o)
    return {"conv": init(next(kit), kshape, use_bias=False),
            "bn": nn.init_bn(o)}


def _conv_bn3(kit, i, o, transpose=False):
    init = nn.init_conv_transpose if transpose else nn.init_conv
    return {"conv": init(next(kit), (3, 3, 3, i, o), use_bias=False),
            "bn": nn.init_bn(o)}


def _plain(kit, k, i, o, bias=True):
    kshape = (k, k, i, o)
    return nn.init_conv(next(kit), kshape, use_bias=bias)


def _feature_net_params(kit, in_ch, out_ch):
    p = {}
    p["conv0.0"] = _conv_bn(kit, 3, 3, in_ch[0])
    p["conv0.1"] = _conv_bn(kit, 3, in_ch[0], in_ch[0])
    for lvl in (1, 2, 3):
        p[f"conv{lvl}.0"] = _conv_bn(kit, 5, in_ch[lvl - 1], in_ch[lvl])
        p[f"conv{lvl}.1"] = _conv_bn(kit, 3, in_ch[lvl], in_ch[lvl])
        p[f"conv{lvl}.2"] = _conv_bn(kit, 3, in_ch[lvl], in_ch[lvl])
    p["out1"] = _plain(kit, 1, in_ch[3], out_ch[0], bias=False)
    p["inner1"] = _plain(kit, 1, in_ch[2], in_ch[3])
    p["inner2"] = _plain(kit, 1, in_ch[1], in_ch[3])
    p["out2"] = _plain(kit, 3, in_ch[3], out_ch[1], bias=False)
    p["out3"] = _plain(kit, 3, in_ch[3], out_ch[2], bias=False)
    return p


def _update_block_params(kit, hdim, cdim, cost_dim, ratio):
    enc = {
        "convc1": _plain(kit, 1, cost_dim, hdim),
        "convc2": _plain(kit, 3, hdim, hdim),
        "convd1": nn.init_conv(next(kit), (7, 7, 1, hdim), True),
        "convd2": _plain(kit, 3, hdim, hdim),
        "convd": _plain(kit, 3, 2 * hdim, hdim - cdim),
        "convc": _plain(kit, 1, hdim, hdim),
    }
    gru = {g: _plain(kit, 3, 2 * hdim, hdim)
           for g in ("convz", "convr", "convq")}
    head = {"conv1": _plain(kit, 3, hdim, hdim),
            "conv2": _plain(kit, 3, hdim, 1)}
    return {"encoder": enc, "depth_gru": gru, "depth_head": head,
            "mask.0": _plain(kit, 3, hdim, 2 * hdim),
            "mask.2": _plain(kit, 1, 2 * hdim, 9 * ratio * ratio)}


def init_params(key, cfg: EffiMVSConfig = EffiMVSConfig()):
    """Build the full parameter pytree with torch-default initialisation."""
    kit = _key_iter(key)
    params = {}
    params["PixelwiseNet"] = {
        "0": _conv_bn(kit, 3, 1, 16),
        "1": _conv_bn(kit, 3, 16, 16),
        "2": _conv_bn(kit, 3, 16, 8),
        "3": _plain(kit, 1, 8, 1),
    }
    params["feature"] = _feature_net_params(
        kit, cfg.feature_in_channel, cfg.cost_dim_stage)
    params["cnet_depth"] = _feature_net_params(
        kit, cfg.context_in_channel, cfg.context_feature)

    cr = {}
    chans = [(cfg.G, 8), (8, 8), (8, 16), (16, 16), (16, 32), (32, 32)]
    for i, (ci, co) in enumerate(chans):
        cr[f"conv{i}"] = _conv_bn3(kit, ci, co)
    cr["conv6"] = _conv_bn3(kit, 32, 16, transpose=True)
    cr["conv7"] = _conv_bn3(kit, 16, 8, transpose=True)
    cr["prob"] = {"weight": nn.init_conv(next(kit), (3, 3, 3, 8, 1), False)["weight"]}
    params["cost_regularization"] = cr

    for name in ("CSP_R1", "CSP_R2", "CSP_C1", "CSP_C2"):
        params[name] = {
            "conv0": _conv_bn3(kit, cfg.G, 8),
            "conv_cost": _conv_bn3(kit, 1, 8),
            "conv1": _conv_bn3(kit, 16, 8),
            "conv2": _conv_bn3(kit, 8, 1, transpose=True),
        }

    cost_dim = cfg.G * cfg.CostNum * cfg.cost_num
    for s in range(cfg.num_stage):
        params[f"update_block_depth{s + 1}"] = _update_block_params(
            kit, cfg.hdim_stage[s], cfg.cdim_stage[s], cost_dim,
            cfg.feat_ratio[s])
    return params
