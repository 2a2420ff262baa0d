"""Tanks & Temples inference + dynamic fusion driver.

Counterpart of the reference test_tank.py: per-scene depth inference at
1920x1056 with 11 views (ndepths 96,8,8), then the dynamic visibility
fusion with the per-scene filter configs, writing <scene>.ply for
leaderboard submission.

Usage:
  python -m effi_mvs_plus_tpu.cli.test_tank --testpath <tt_root> \
      --loadckpt model_tank.ckpt --outdir out --scenes Horse
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser(profile_name="tank_eval"):
    from effi_mvs_plus_tpu.config import get_profile, apply_profile_defaults
    p = argparse.ArgumentParser("effi-mvs-plus-tpu test_tank")
    p.add_argument("--profile", default=profile_name,
                   help="named preset from config.PROFILES")
    p.add_argument("--testpath", required=True)
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--outdir", default="./outputs/tank")
    p.add_argument("--savedir", default=None)
    p.add_argument("--scenes", nargs="+", default=["Horse"])
    p.add_argument("--ndepths", type=str)
    p.add_argument("--GRUiters", type=str, default="3,3,3")
    p.add_argument("--CostNum", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--num_view", type=int)
    # reference tank.py:137 hardcodes 1920x1056; exposed so synthetic
    # rigs / CI can run the same chain at reduced resolution
    p.add_argument("--max_h", type=int, default=1056)
    p.add_argument("--max_w", type=int, default=1920)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--shard_views", action="store_true",
                   help="multi-chip single-map mode: shard the source-view"
                        " axis over ALL local devices (model-axis mesh) so"
                        " every chip cooperates on one 1920x1056 map; the"
                        " per-chip HBM for the FPN stack drops ~V/n-fold")
    p.add_argument("--skip_depth", action="store_true")
    p.add_argument("--skip_fusion", action="store_true")
    # optional overrides of the per-scene filter config (reference
    # test_tank.py:600-615 dict stays the deployed default; synthetic
    # rigs at other scales need rig-appropriate thresholds)
    p.add_argument("--dist_filter", type=float, default=None)
    p.add_argument("--depth_filter", type=float, default=None)
    p.add_argument("--prob_threshold", type=float, default=None)
    p.add_argument("--dh_view_num", type=int, default=None)
    apply_profile_defaults(p, get_profile(profile_name))
    return p


def save_depths(args):
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.data.datasets import TanksDataset
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.infer import InferenceEngine
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig

    params = load_torch_checkpoint(args.loadckpt)
    cfg = EffiMVSConfig(
        ndepths=tuple(int(x) for x in args.ndepths.split(",")),
        gru_iters=tuple(int(x) for x in args.GRUiters.split(",")),
        CostNum=args.CostNum, compute_dtype=jnp.bfloat16)
    engine = InferenceEngine(params, cfg,
                             shard_views=getattr(args, "shard_views", False))
    for scene in args.scenes:
        ds = TanksDataset(args.testpath, [scene], args.num_view,
                          args.numdepth,
                          target_wh=(args.max_w, args.max_h))
        loader = Loader(ds, args.batch_size, num_workers=4)
        stats = engine.save_scene_depths(loader, args.outdir, verbose=False)
        print(f"{scene}: {stats['maps']} maps, "
              f"{stats['s_per_map']:.3f}s/map", flush=True)


def fuse_scene_tank(args, scene):
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.data import read_pair_file, read_cam_file
    from effi_mvs_plus_tpu.data.datasets import (TANK_INTERMEDIATE)
    from effi_mvs_plus_tpu.data.pfm import read_pfm
    from effi_mvs_plus_tpu.fuse.dypcd import (consistency_tank,
                                              TANK_FILTER_CONFIGS,
                                              backproject_to_world)
    from effi_mvs_plus_tpu.fuse.ply import write_ply

    split = "intermediate" if scene in TANK_INTERMEDIATE else "advanced"
    pair = read_pair_file(
        os.path.join(args.testpath, split, scene, "pair.txt"))
    out_folder = os.path.join(args.outdir, scene)
    from effi_mvs_plus_tpu.config import TankParams
    params = TANK_FILTER_CONFIGS.get(scene, TankParams())
    overrides = {k: getattr(args, k) for k in
                 ("dist_filter", "depth_filter", "prob_threshold",
                  "dh_view_num") if getattr(args, k, None) is not None}
    if overrides:
        import dataclasses
        params = dataclasses.replace(params, **overrides)

    # each view is read ~10x per scene (once per ref using it as source);
    # cache decoded views, bounded so a 1920x1056 scene stays ~400 MB
    import functools

    @functools.lru_cache(maxsize=48)
    def load_view(vid):
        cam = read_cam_file(
            os.path.join(out_folder, "cams", f"{vid:08d}_cam.txt"))
        depth = read_pfm(
            os.path.join(out_folder, "depth_est", f"{vid:08d}.pfm"))[0]
        conf = read_pfm(
            os.path.join(out_folder, "confidence", f"{vid:08d}.pfm"))[0]
        if conf.shape != depth.shape:
            # nearest upsample (reference test_tank.py:487-489)
            conf = np.repeat(np.repeat(
                conf, depth.shape[0] // conf.shape[0], 0),
                depth.shape[1] // conf.shape[1], 1)
        img_path = os.path.join(out_folder, "images", f"{vid:08d}.jpg")
        img = None
        if os.path.exists(img_path):
            from PIL import Image
            img = np.array(Image.open(img_path), np.float32) / 255.0
        return {"depth": depth, "conf": conf, "K": cam["intrinsics"],
                "E": cam["extrinsics"], "image": img}

    all_xyz, all_rgb = [], []
    n_src = params.views - 1
    for ref, srcs in pair:
        srcs = srcs[:n_src]
        if len(srcs) < params.dh_view_num + 1:
            continue
        r = load_view(ref)
        sv = [load_view(s) for s in srcs]
        final, fused, geo, photo = consistency_tank(
            jnp.asarray(r["depth"]), jnp.asarray(r["conf"]),
            jnp.asarray(r["K"]), jnp.asarray(r["E"]),
            jnp.asarray(np.stack([s["depth"] for s in sv])),
            jnp.asarray(np.stack([s["K"] for s in sv])),
            jnp.asarray(np.stack([s["E"] for s in sv])), params)
        xyz, (ys, xs) = backproject_to_world(
            np.asarray(fused), np.asarray(final), r["K"], r["E"])
        all_xyz.append(xyz)
        if r["image"] is not None:
            all_rgb.append((r["image"][ys, xs] * 255).astype(np.uint8))
        print(f"{scene} ref {ref:02d} photo/geo/final "
              f"{float(np.asarray(photo).mean()):.3f}/"
              f"{float(np.asarray(geo).mean()):.3f}/"
              f"{float(np.asarray(final).mean()):.3f}", flush=True)

    xyz = np.concatenate(all_xyz, 0)
    rgb = np.concatenate(all_rgb, 0) if len(all_rgb) == len(all_xyz) else None
    savedir = args.savedir or args.outdir
    os.makedirs(savedir, exist_ok=True)
    ply = os.path.join(savedir, f"{scene}.ply")
    write_ply(ply, xyz, rgb)
    print(f"saved {ply} ({len(xyz)} points)", flush=True)


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--profile", default="tank_eval")
    ns, _ = pre.parse_known_args(argv)
    args = build_parser(ns.profile).parse_args(argv)
    # multi-host scene parallelism (same partitioning as test_dtu)
    from effi_mvs_plus_tpu import parallel
    if parallel.initialize():
        import jax
        args.scenes = parallel.partition(args.scenes)
        print(f"process {jax.process_index()}: scenes {args.scenes}")
    if not args.skip_depth:
        save_depths(args)
    if not args.skip_fusion:
        for scene in args.scenes:
            fuse_scene_tank(args, scene)


if __name__ == "__main__":
    main()
