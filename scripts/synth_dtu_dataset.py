"""Synthetic DTU-layout training tree at the reference resolution.

Renders textured-plane scenes with exactly-known analytic depth into the
on-disk layout `DTUTrainDataset` reads (Rectified/ images per light,
Depths_raw/ PFM + visual mask, Cameras/ txt + pair.txt) so the REAL
training CLI path — reader -> threaded loader -> jitted step — can run a
multi-epoch job without the (absent) DTU data.  The 7 light conditions
are symlinks to one render: lighting does not vary in the synthetic
world, but every meta the reference enumerates (scan x ref x light,
dtu_yao.py:28-51) exists.

Geometry mirrors scripts/train_run_tpu.py's proven-convergent setup: a
fronto-parallel plane at per-scan depth in the DTU 425-935 mm band, a
ring of V cameras (small y-rotations + x-translations), nearest-lookup
world texture, depth_min 425 / interval 2.5 cam files.

Usage:  python scripts/synth_dtu_dataset.py <root> [--scans 39 --refs 16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 640, 512            # the rectified-crop resolution (train.sh:22);
F = 500.0                  # overridable via --img_wh (F scales with W)
N_SRC = 10                 # srcs per ref in pair.txt (DTU uses 10)


def set_resolution(w, h):
    global W, H, F
    W, H, F = w, h, 500.0 * (w / 640.0)


def _scan_cameras(rng, n_views):
    exts = []
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        a = 0.012 * (v - n_views / 2) + rng.uniform(-0.002, 0.002)
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [9.0 * v + rng.uniform(-0.5, 0.5),
                    2.0 * v + rng.uniform(-0.5, 0.5), 0.0]
        exts.append(E)
    return exts


def _render(E, K, dp, tex, cell):
    """Plane z=dp seen from camera (E, K): image (H,W,3) + depth (H,W)."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).T
    rays = np.linalg.inv(K) @ pix
    R, t = E[:3, :3], E[:3, 3]
    cam_origin = -R.T @ t
    dirs = R.T @ rays
    lam = (dp - cam_origin[2]) / dirs[2]
    pts = cam_origin[:, None] + dirs * lam
    u = (np.abs(pts[0] / cell) % 256).astype(int)
    vv = (np.abs(pts[1] / cell) % 256).astype(int)
    img = tex[vv, u].reshape(H, W, 3)
    depth = (R @ pts + t[:, None])[2].reshape(H, W).astype(np.float32)
    return img, depth


def build(root, n_scans=39, n_refs=16, seed=0):
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.data.pfm import save_pfm

    rng = np.random.default_rng(seed)
    K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
    cam_dir = os.path.join(root, "Cameras", "train")
    os.makedirs(cam_dir, exist_ok=True)

    # pair.txt: srcs = the N_SRC nearest views by index
    with open(os.path.join(root, "Cameras", "pair.txt"), "w") as f:
        f.write(f"{n_refs}\n")
        for r in range(n_refs):
            srcs = sorted((s for s in range(n_refs) if s != r),
                          key=lambda s: abs(s - r))[:N_SRC]
            f.write(f"{r}\n{len(srcs)} "
                    + " ".join(f"{s} 10.0" for s in srcs) + "\n")

    # one camera ring shared by all scans (DTU's rig is likewise shared);
    # cam files carry quarter-res intrinsics (dtu_yao cam-file convention)
    exts = _scan_cameras(rng, n_refs)
    K_q = K.copy()
    K_q[:2] /= 4.0
    for v, E in enumerate(exts):
        camio.write_cam_file(os.path.join(cam_dir, f"{v:08d}_cam.txt"),
                             E, K_q, [425.0, 2.5])

    mask_png = np.full((2 * H, 2 * W), 255, np.uint8)
    scans = []
    for si in range(n_scans):
        scan = f"scan{si + 1}"
        scans.append(scan)
        img_dir = os.path.join(root, "Rectified", f"{scan}_train")
        dep_dir = os.path.join(root, "Depths_raw", scan)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(dep_dir, exist_ok=True)
        dp = rng.uniform(500.0, 820.0)
        tex = rng.uniform(0, 1, (256, 256, 3)).astype(np.float32)
        cell = rng.uniform(2.0, 4.0)
        for v, E in enumerate(exts):
            img, depth = _render(E, K, dp, tex, cell)
            base = f"rect_{v + 1:03d}_0_r5000.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(img_dir, base))
            for light in range(1, 7):
                link = os.path.join(img_dir,
                                    f"rect_{v + 1:03d}_{light}_r5000.png")
                if not os.path.exists(link):
                    os.symlink(base, link)
            # GT at 2x so the reader's half+crop path is exercised and
            # returns exactly the rendered depth (nearest half of repeat-2)
            save_pfm(os.path.join(dep_dir, f"depth_map_{v:04d}.pfm"),
                     np.repeat(np.repeat(depth, 2, 0), 2, 1))
            Image.fromarray(mask_png).save(
                os.path.join(dep_dir, f"depth_visual_{v:04d}.png"))
        print(f"{scan}: plane z={dp:.1f} cell={cell:.2f}", flush=True)
    return scans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--scans", type=int, default=39)
    ap.add_argument("--refs", type=int, default=16)
    ap.add_argument("--val_scans", type=int, default=2,
                    help="last N scans go to the val list")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--img_wh", default=None,
                    help="render resolution 'W,H' (default 640,512)")
    args = ap.parse_args()

    if args.img_wh:
        w, h = (int(x) for x in args.img_wh.split(","))
        set_resolution(w, h)
    scans = build(args.root, args.scans, args.refs, args.seed)
    n_val = args.val_scans
    with open(os.path.join(args.root, "train.txt"), "w") as f:
        f.write("\n".join(scans[:-n_val]) + "\n")
    with open(os.path.join(args.root, "val.txt"), "w") as f:
        f.write("\n".join(scans[-n_val:]) + "\n")
    print(f"built {len(scans)} scans under {args.root}")


if __name__ == "__main__":
    main()
