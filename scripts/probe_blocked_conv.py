"""On-chip probe: is a space-to-depth BLOCKED conv faster than the plain
small-channel conv XLA emits today?

The T&T profile (round 4, xplane) shows the 2-D conv stack at 0.1-11
TF/s: with C_in/C_out in {1,8,16}, the implicit-matmul conv uses <13% of
the MXU's 128 lanes.  Folding a (bh, bw) pixel block into channels makes
the SAME conv an (bh*bw*C)-channel conv — bh*bw x the FLOPs, but a
full-lane MXU shape.  This probes the raw XLA conv at both layouts for
the hot shapes from the T&T trace before we commit to the transform.

Run: timeout 1800 python scripts/probe_blocked_conv.py > /tmp/probe_blocked.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def block_weight_s1(w, bh, bw):
    """(kh,kw,I,O) stride-1 'same' -> (KH,KW, bh*bw*I, bh*bw*O) blocked."""
    kh, kw, I, O = w.shape
    ph, pw = kh // 2, kw // 2
    # u = bh*(bu-Bh) + pi - di + ph  must be in [0, kh)
    lo = -(bh - 1) - ph
    hi = (kh - 1) + (bh - 1) - ph
    Bh = -(lo // bh) if lo < 0 else 0
    KH = Bh + hi // bh + 1
    lo_w = -(bw - 1) - pw
    hi_w = (kw - 1) + (bw - 1) - pw
    Bw = -(lo_w // bw) if lo_w < 0 else 0
    KW = Bw + hi_w // bw + 1
    wb = np.zeros((KH, KW, bh * bw * I, bh * bw * O), w.dtype)
    for bu in range(KH):
        for bv in range(KW):
            for pi in range(bh):
                for pj in range(bw):
                    for di in range(bh):
                        for dj in range(bw):
                            u = bh * (bu - Bh) + pi - di + ph
                            v = bw * (bv - Bw) + pj - dj + pw
                            if 0 <= u < kh and 0 <= v < kw:
                                wb[bu, bv,
                                   (pi * bw + pj) * I:(pi * bw + pj + 1) * I,
                                   (di * bw + dj) * O:(di * bw + dj + 1) * O] \
                                    = w[u, v]
    return wb, Bh, Bw


def s2d(x, bh, bw):
    B, H, W, C = x.shape
    return x.reshape(B, H // bh, bh, W // bw, bw, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // bh, W // bw, bh * bw * C)


def d2s(x, bh, bw, C):
    B, Hb, Wb, _ = x.shape
    return x.reshape(B, Hb, Wb, bh, bw, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, Hb * bh, Wb * bw, C)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    def conv(x, w, pad):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    rng = np.random.default_rng(0)

    # (label, N, H, W, I, O, k) — the hot conv shapes from the T&T trace
    cases = [
        ("conv0.1 full-res", 11, 1056, 1920, 8, 8, 3),
        ("conv1.1 half-res", 11, 528, 960, 16, 16, 3),
        ("conv2.1 quarter",  11, 264, 480, 32, 32, 3),
        ("out3 FPN head",    11, 528, 960, 64, 8, 3),
        ("convd1 7x7 C1",    1, 528, 960, 1, 16, 7),
    ]
    for label, N, H, W, I, O, k in cases:
        x = jnp.asarray(rng.standard_normal((N, H, W, I)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, I, O)) * 0.1, jnp.bfloat16)
        gflop = N * H * W * k * k * I * O * 2 / 1e9

        # correctness first (small fp32 CPU-side check is in tests; here
        # just max-diff on-chip at one block config)
        rows = []
        for bh, bw in [(1, 1), (2, 2), (2, 4), (4, 4), (1, 8)]:
            if H % bh or W % bw:
                continue
            if bh * bw * max(I, O) > 512:
                continue
            if bh == 1 and bw == 1:
                f = jax.jit(lambda x, w, pad=k // 2: conv(x, w, pad))
                args = (x, w)
            else:
                wbn, Bh, Bw = block_weight_s1(
                    np.asarray(w, np.float32), bh, bw)
                wb = jnp.asarray(wbn, jnp.bfloat16)
                xb = s2d(x, bh, bw)

                def f(xb, wb, Bh=Bh, Bw=Bw):
                    return lax.conv_general_dilated(
                        xb, wb, window_strides=(1, 1),
                        padding=[(Bh, Bh), (Bw, Bw)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                f = jax.jit(f)
                args = (xb, wb)
            y = f(*args)
            fence(y)
            t0 = time.perf_counter()
            for _ in range(10):
                y = f(*args)
            fence(y)
            dt = (time.perf_counter() - t0) / 10
            eff_gflop = gflop * (bh * bw)
            rows.append((bh, bw, dt * 1e3, eff_gflop / dt / 1e9))
            print(f"{label:18s} b=({bh},{bw}) {dt*1e3:7.2f} ms "
                  f"{eff_gflop/dt/1e9:7.1f} TF/s (real {gflop/dt/1e9:6.1f})",
                  flush=True)
        # numerics check at (2,4) or the last blocked config vs plain
        bh, bw = 2, 4
        if H % bh == 0 and W % bw == 0 and bh * bw * max(I, O) <= 512:
            wbn, Bh, Bw = block_weight_s1(np.asarray(w, np.float32), bh, bw)
            yb = lax.conv_general_dilated(
                s2d(x, bh, bw), jnp.asarray(wbn, jnp.bfloat16),
                window_strides=(1, 1), padding=[(Bh, Bh), (Bw, Bw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y0 = conv(x, w, k // 2)
            d = jnp.abs(d2s(yb, bh, bw, O).astype(jnp.float32)
                        - y0.astype(jnp.float32)).max()
            print(f"{label:18s} maxdiff blocked-vs-plain: {fence(d):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
