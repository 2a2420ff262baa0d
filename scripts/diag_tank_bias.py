"""Part 2 of the T&T ~41 mm bias adjudication (VERDICT r4 weak #2):
per-output depth traces at the metric-scale rig, A/B over dtype and warp
implementation.

The rig itself is consistent (scripts/diag_tank_rig_consistency.py: the
brute-force photometric optimum is at 1600.0 mm median over 338 probe
pixels, sharp minimum) — so a biased model output localizes the bias to
the model pipeline: per-output medians say WHICH stage stops converging,
and the {bf16,f32} x {pallas-ladder, xla-warp} grid says whether the TPU
fast path (bf16 rounding / ladder rung demotion) is the cause.

Usage: python scripts/diag_tank_bias.py [--dtype bf16|f32] [--warp auto|xla]
       [--gru auto|xla] [--reg auto|xla] [--scale N]  (N=1 full 1056x1920,
       N=2 528x960 quarter-area, ... — smaller scales re-render the rig at
       reduced resolution with scaled intrinsics and 2x texel)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def build_batch(scale=1):
    import tank_scene_rig as rig
    from effi_mvs_plus_tpu.data import cams as camio
    if scale == 1:
        return rig.batch(1)
    scale = float(scale)
    from synth_scene import _render_plane, make_texture
    # snap to multiples of 64 (3-level U-Net at 1/8 res needs div-by-4)
    H, W = int(rig.H / scale) // 64 * 64, int(rig.W / scale) // 64 * 64
    K, exts = rig.cameras()
    K = K.copy()
    K[:2] /= scale
    rng = np.random.default_rng(0)
    tex = make_texture(rng)
    views = np.stack([
        _render_plane(K, E, H, W, depth_plane=rig.PLANE_Z, tex=tex,
                      texel_mm=0.0015 * scale).astype(np.float32) / 255.0
        for E in exts])
    intr_q = K.copy()
    intr_q[:2] /= 4.0
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm = {k: np.stack([p[k] for p in projs])[None].copy()
          for k in ("stage1", "stage2", "stage3")}
    dv = camio.inverse_depth_values(
        rig.BAND[0], (rig.BAND[1] - rig.BAND[0]) / rig.NUMDEPTH,
        rig.NUMDEPTH)[None]
    return views[None], pm, dv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--warp", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--gru", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--reg", default="auto", choices=["auto", "blocked", "xla"])
    ap.add_argument("--scale", type=float, default=1)
    ap.add_argument("--ckpt", default="model_tank.ckpt")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (f32 full scale OOMs the v5e HBM)")
    ap.add_argument("--prec", default=None,
                    choices=[None, "float32", "tensorfloat32", "bfloat16"],
                    help="jax default matmul precision override")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.prec:
        jax.config.update("jax_default_matmul_precision", args.prec)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    import tank_scene_rig as rig

    params = load_torch_checkpoint(
        f"/root/reference/checkpoints/Effi_MVS_plus/{args.ckpt}")
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = EffiMVSConfig(ndepths=rig.NDEPTHS, compute_dtype=dt,
                        warp_impl=args.warp, gru_impl=args.gru,
                        reg_impl=args.reg)

    imgs, pm, dv = build_batch(args.scale)
    imgs = jnp.asarray(imgs)
    pm = {k: jnp.asarray(v) for k, v in pm.items()}
    dv = jnp.asarray(dv)

    @jax.jit
    def run(imgs, s1, s2, s3, dv):
        out = forward(params, imgs, {"stage1": s1, "stage2": s2, "stage3": s3},
                      dv, cfg, ctx=None)
        stats = []
        for d in out["depth"]:
            dmm = d.astype(jnp.float32) * 1000.0
            err = jnp.abs(dmm - rig.PLANE_Z * 1000.0)
            stats.append(jnp.stack([
                jnp.median(dmm), jnp.mean(err),
                jnp.percentile(dmm, 10), jnp.percentile(dmm, 90)]))
        return jnp.stack(stats), jnp.median(out["photometric_confidence"])

    stats, conf = jax.device_get(run(imgs, pm["stage1"], pm["stage2"],
                                     pm["stage3"], dv))
    labels = (["s1.init"]
              + [f"s1.it{i}" for i in (1, 2, 3)] + ["s1.up"]
              + [f"s2.it{i}" for i in (1, 2, 3)] + ["s2.up"]
              + [f"s3.it{i}" for i in (1, 2, 3)] + ["s3.up"])
    print(f"config: dtype={args.dtype} warp={args.warp} gru={args.gru} "
          f"reg={args.reg} scale={args.scale} ckpt={args.ckpt}")
    print(f"true plane: {rig.PLANE_Z*1000:.0f} mm; "
          f"stage-1 spacing at z: ~{(rig.PLANE_Z**2 * ( (1/rig.BAND[0]-1/rig.BAND[1]) / rig.NDEPTHS[0]))*1000:.1f} mm")
    print(f"{'output':8s} {'median_mm':>10s} {'mean|err|_mm':>12s} "
          f"{'p10_mm':>9s} {'p90_mm':>9s}")
    rows = []
    for lab, (med, err, p10, p90) in zip(labels, stats):
        print(f"{lab:8s} {med:10.1f} {err:12.1f} {p10:9.1f} {p90:9.1f}")
        rows.append({"output": lab, "median_mm": round(float(med), 2),
                     "mean_abs_err_mm": round(float(err), 2)})
    print(f"median confidence: {float(conf):.3f}")
    tag = f"{args.dtype}_{args.warp}_{args.gru}_{args.reg}_s{args.scale}"
    with open(f"/tmp/diag_tank_bias_{tag}.json", "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
