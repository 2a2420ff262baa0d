"""Measure the reference torch model's CPU forward at the DTU eval config
AND the T&T config on this machine.  The ratio transfers the pinned DTU
GPU denominator (0.145 s/map on a 2080 Ti, BASELINE.md) to a T&T GPU
denominator with measured provenance — the reference repo records no T&T
runtime (its driver prints s/map at runtime, test_tank.py:244-252, but no
value is committed).

CPU-only (torch), safe to run alongside TPU work.
"""

import sys
import time
import types

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

# the image lacks torchvision and the reference's utils.py pulls it (and
# local_pcd) at import — stub both, same trick as tests/conftest.py
tv = types.ModuleType("torchvision")
tf = types.ModuleType("torchvision.transforms")
tf.Compose = tf.ToTensor = tf.Normalize = lambda *a, **k: None
tv.transforms = tf
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.transforms", tf)
stub = types.ModuleType("utils")
stub.local_pcd = lambda *a, **k: None
sys.modules.setdefault("utils", stub)


def build_model(ndepths, ckpt):
    from models import Effi_MVS_plus

    class Args:
        pass

    a = Args()
    a.ndepths = ndepths                 # e.g. "48,8,8" / "96,8,8"
    a.depth_interals_ratio = "4,2,1"
    a.cr_base_chs = "8,8,8"
    a.mode = "test"
    a.GRUiters = "3,3,3"
    a.CostNum = 3
    model = Effi_MVS_plus(a)
    sd = torch.load(ckpt, map_location="cpu")
    model.load_state_dict(sd["model"] if "model" in sd else sd, strict=False)
    model.eval()
    return model


def make_inputs(H, W, V, numdepth=384):
    rng = np.random.default_rng(0)
    imgs = torch.from_numpy(
        rng.uniform(0, 1, (1, V, 3, H, W)).astype(np.float32))
    f = 1.3 * W / 8
    K = np.array([[f, 0, W / 16], [0, f, H / 16], [0, 0, 1]], np.float32)
    projs = {}
    stages = {"stage1": 1, "stage2": 2, "stage3": 4, "stage4": 8}
    mats = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        mats.append(E)
    for k, scale in stages.items():
        ms = []
        for E in mats:
            m = np.zeros((2, 4, 4), np.float32)
            m[0] = E
            m[1] = np.eye(4, dtype=np.float32)
            m[1, :3, :3] = K.copy()
            m[1, :2] *= scale
            ms.append(m)
        projs[k] = torch.from_numpy(np.stack(ms)[None])
    dmin, dmax = 425.0, 935.0
    inv = np.linspace(1 / dmin, 1 / dmax, numdepth, dtype=np.float32)
    dv = torch.from_numpy((1.0 / inv)[None])
    return imgs, projs, dv


def run(tag, H, W, V, ndepths, ckpt, iters=2):
    model = build_model(ndepths, ckpt)
    imgs, projs, dv = make_inputs(H, W, V)
    with torch.no_grad():
        t0 = time.perf_counter()
        model(imgs, projs, dv)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            model(imgs, projs, dv)
        dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt:.2f} s/map (first {warm:.2f})", flush=True)
    return dt


def main():
    ck = "/root/reference/checkpoints/Effi_MVS_plus"
    d = run("DTU 1152x864 V5 48,8,8", 864, 1152, 5, "48,8,8",
            f"{ck}/model_dtu.ckpt")
    t = run("T&T 1920x1056 V11 96,8,8", 1056, 1920, 11, "96,8,8",
            f"{ck}/model_tank.ckpt")
    print(f"ratio T&T/DTU = {t / d:.3f}", flush=True)
    print(f"implied T&T GPU denominator = 0.145 * {t/d:.3f} = "
          f"{0.145 * t / d:.3f} s/map "
          f"-> {1 / (0.145 * t / d):.2f} maps/s; 2x bound = "
          f"{2 / (0.145 * t / d):.2f} maps/s", flush=True)


if __name__ == "__main__":
    main()
