"""DTU inference + dypcd fusion driver.

Counterpart of the reference test_dtu_dypcd.py: saves per-view depth,
confidence, cams and preview images, then fuses each scan with the
dynamic-consistency filter into mvsnetXXX_l3.ply point clouds.  Scene
fusion runs in a process pool like the reference (scan-parallel); depth
inference batches reference views on the chip.

Usage:
  python -m effi_mvs_plus_tpu.cli.test_dtu --testpath <dtu_testing> \
      --testlist lists/dtu/test.txt --loadckpt model_dtu.ckpt --outdir out
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build_parser(profile_name="dtu_eval"):
    from effi_mvs_plus_tpu.config import get_profile, apply_profile_defaults
    p = argparse.ArgumentParser("effi-mvs-plus-tpu test_dtu")
    p.add_argument("--profile", default=profile_name,
                   help="named preset from config.PROFILES")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--ndepths", type=str)
    p.add_argument("--GRUiters", type=str, default="3,3,3")
    p.add_argument("--CostNum", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--interval_scale", type=float)
    p.add_argument("--num_view", type=int)
    p.add_argument("--max_h", type=int)
    p.add_argument("--max_w", type=int)
    # B=6 is the measured throughput sweet spot on v5e (BASELINE.md batch
    # sweep: 14.1 maps/s vs 8.25 at B=1) — the fast path is the default.
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--conf", type=float)
    p.add_argument("--dist_base", type=float)
    p.add_argument("--diff_base", type=float)
    p.add_argument("--num_worker", type=int, default=4)
    p.add_argument("--save_masks", action="store_true",
                   help="dump per-ref photo/geo/final mask PNGs")
    p.add_argument("--skip_depth", action="store_true",
                   help="fuse only (depth maps already saved)")
    p.add_argument("--skip_fusion", action="store_true")
    apply_profile_defaults(p, get_profile(profile_name))
    return p


def save_depths(args, scans):
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.data.datasets import GeneralEvalDataset
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.infer import InferenceEngine
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig
    from effi_mvs_plus_tpu.train.trainer import load_checkpoint

    if args.loadckpt.endswith(".ckpt") and not args.loadckpt.endswith(".pkl"):
        try:
            params = load_torch_checkpoint(args.loadckpt)
            print(f"loaded torch checkpoint {args.loadckpt}")
        except (KeyError, ValueError, RuntimeError, EOFError,
                pickle.UnpicklingError) as e:
            # not a torch-format file (our own trainer also writes .ckpt):
            # KeyError/ValueError = missing 'model' dict / bad state-dict
            # names; UnpicklingError/EOFError/RuntimeError = not a
            # torch-pickle stream at all
            print(f"not a torch checkpoint ({type(e).__name__}); "
                  f"loading as native trainer checkpoint")
            params = load_checkpoint(args.loadckpt)["params"]
    else:
        params = load_checkpoint(args.loadckpt)["params"]

    cfg = EffiMVSConfig(
        ndepths=tuple(int(x) for x in args.ndepths.split(",")),
        gru_iters=tuple(int(x) for x in args.GRUiters.split(",")),
        CostNum=args.CostNum, compute_dtype=jnp.bfloat16)
    engine = InferenceEngine(params, cfg)
    for scan in scans:
        ds = GeneralEvalDataset(args.testpath, [scan], args.num_view,
                                args.numdepth, args.interval_scale,
                                max_h=args.max_h, max_w=args.max_w)
        loader = Loader(ds, args.batch_size, num_workers=4)
        stats = engine.save_scene_depths(loader, args.outdir, verbose=False)
        print(f"{scan}: {stats['maps']} maps, "
              f"{stats['s_per_map']:.3f}s/map", flush=True)


def fuse_scan(args_tuple):
    (testpath, outdir, scan, conf, dist_base, diff_base,
     save_masks) = args_tuple
    from effi_mvs_plus_tpu.data import read_pair_file, read_cam_file
    from effi_mvs_plus_tpu.data.pfm import read_pfm
    from effi_mvs_plus_tpu.fuse import fuse_scene, write_ply, DypcdParams

    pair = read_pair_file(os.path.join(testpath, scan, "pair.txt"))
    out_folder = os.path.join(outdir, scan)

    def load_view(vid):
        cam = read_cam_file(
            os.path.join(out_folder, "cams", f"{vid:08d}_cam.txt"))
        depth = read_pfm(
            os.path.join(out_folder, "depth_est", f"{vid:08d}.pfm"))[0]
        conf_map = read_pfm(
            os.path.join(out_folder, "confidence", f"{vid:08d}.pfm"))[0]
        if conf_map.shape != depth.shape:
            import cv2
            conf_map = cv2.resize(conf_map,
                                  (depth.shape[1], depth.shape[0]))
        img_path = os.path.join(out_folder, "images", f"{vid:08d}.jpg")
        img = None
        if os.path.exists(img_path):
            from PIL import Image
            img = np.array(Image.open(img_path), np.float32) / 255.0
        return {"depth": depth, "conf": conf_map,
                "K": cam["intrinsics"], "E": cam["extrinsics"],
                "image": img}

    xyz, rgb = fuse_scene(pair, load_view,
                          DypcdParams(conf_thresh=conf,
                                      dist_base=dist_base,
                                      diff_base=diff_base),
                          progress=lambda r, p, g, f: print(
                              f"{scan} ref {r:02d} photo/geo/final "
                              f"{p:.3f}/{g:.3f}/{f:.3f}", flush=True),
                          mask_dir=(os.path.join(out_folder, "mask")
                                    if save_masks else None))
    scan_id = int(scan[4:]) if scan.startswith("scan") else 0
    ply_path = os.path.join(outdir, f"mvsnet{scan_id:03d}_l3.ply")
    write_ply(ply_path, xyz, rgb)
    print(f"saved {ply_path} ({len(xyz)} points)", flush=True)


def main(argv=None):
    # two-phase parse: --profile picks the preset the remaining defaults
    # come from, explicit flags still win
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--profile", default="dtu_eval")
    ns, _ = pre.parse_known_args(argv)
    args = build_parser(ns.profile).parse_args(argv)
    with open(args.testlist) as f:
        scans = [ln.strip() for ln in f if ln.strip()]
    # multi-host scene parallelism: each process owns a round-robin share
    # of the scans (inference + fusion are per-scan independent, SURVEY
    # §2.5); single process sees every scan.
    from effi_mvs_plus_tpu import parallel
    if parallel.initialize():
        import jax
        scans = parallel.partition(scans)
        print(f"process {jax.process_index()}: {len(scans)} scans")
    if not args.skip_depth:
        save_depths(args, scans)
    if not args.skip_fusion:
        import multiprocessing as mp
        tasks = [(args.testpath, args.outdir, s, args.conf,
                  args.dist_base, args.diff_base, args.save_masks)
                 for s in scans]
        if args.num_worker <= 1:
            for t in tasks:
                fuse_scan(t)
        else:
            # pooled fusion workers must NOT attach to the TPU: the axon
            # relay serializes clients, so a second device process stalls
            # every fence (one-TPU-process rule); the vectorised ladder
            # runs fine on host CPU.  Spawned children read these at
            # interpreter start, the parent's live jax is unaffected.
            saved = {k: os.environ.get(k)
                     for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["PALLAS_AXON_POOL_IPS"] = ""
            try:
                with mp.get_context("spawn").Pool(args.num_worker) as pool:
                    pool.map(fuse_scan, tasks)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v


if __name__ == "__main__":
    main()
