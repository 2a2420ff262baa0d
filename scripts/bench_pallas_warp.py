"""TPU A/B: pallas fused warp+correlate vs the XLA gather path, at the
three stage shapes of the DTU eval config (1152x864, 5 views)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, warmup=2, iters=10):
    import jax
    import jax.numpy as jnp

    def _fence(r):
        return float(jax.device_get(jnp.sum(r.astype(jnp.float32))))

    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.ops import warp as xw
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    for name, (H, W, C, D) in [
        ("stage1 108x144 C32 D48", (108, 144, 32, 48)),
        ("stage2 216x288 C16 D8", (216, 288, 16, 8)),
        ("stage3 432x576 C8  D8", (432, 576, 8, 8)),
    ]:
        B = 1
        ref = jax.random.uniform(key, (B, H, W, C), jnp.bfloat16)
        src = jax.random.uniform(key, (B, H, W, C), jnp.bfloat16)
        # realistic calibrated-rig relative projection
        f = 1.3 * W
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        E_src = np.eye(4, dtype=np.float32)
        a_ = 0.04
        c_, s_ = np.cos(a_), np.sin(a_)
        E_src[:3, :3] = np.array([[c_, 0, s_], [0, 1, 0], [-s_, 0, c_]],
                                 np.float32)
        E_src[:3, 3] = [30.0, 8.0, 5.0]

        def P(E):
            out = np.eye(4, dtype=np.float32)
            out[:3, :4] = K @ E[:3, :4]
            return out

        rot, tr = geometry.relative_projection(
            jnp.asarray(P(E_src))[None], jnp.asarray(P(np.eye(4,
                dtype=np.float32)))[None])
        depth = jnp.asarray(np.broadcast_to(
            np.linspace(425, 935, D, dtype=np.float32)[None, :, None, None],
            (B, D, H, W)).copy())

        fx = jax.jit(lambda r, s: xw.warp_correlate(r, s, rot, tr, depth, 1))
        fp = jax.jit(
            lambda r, s: pw.warp_correlate_fused(r, s, rot, tr, depth, 1))
        # correctness on-device first
        a = np.asarray(fx(ref, src)).astype(np.float32)
        b = np.asarray(fp(ref, src)).astype(np.float32)
        err = np.abs(a - b).max()
        tx = timeit(fx, ref, src)
        tp = timeit(fp, ref, src)
        print(f"{name}: xla {tx*1e3:8.2f} ms   pallas {tp*1e3:8.2f} ms  "
              f"({tx/tp:5.1f}x)  maxdiff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
