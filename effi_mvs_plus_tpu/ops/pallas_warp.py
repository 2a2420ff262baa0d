"""Pallas TPU kernel: fused plane-sweep warp + group correlation.

Replaces the gather-based ``warp_correlate`` on the hot path (the
reference's ``homo_warping_new`` + per-view correlation,
/root/reference/models/module.py:303-344, Effi_MVS_plus.py:38-40).
Profiled on TPU v5e, XLA's gather runs ~100x off HBM speed-of-light and is
~2/3 of the whole forward pass (BASELINE.md) — so the sampling is
re-expressed as matmuls, the shape the MXU wants.

For one (spatial tile, depth hypothesis) the projected sample coordinates
span a *bounded* source region (a union of short epipolar segments — the
plane-sweep disparity range is tens of pixels).  Everything is laid out
lane-major in P = tile pixels:

1. the region (channel-packed rows ``src_packed[y*C+c, x]``) is DMA'd into
   VMEM once per tile and *reused across depth steps* — the grid iterates
   depth fastest and the kernel skips the copy whenever the region origin
   is unchanged (plane-sweep origins move by a few pixels across the whole
   sweep, so nearly all steps skip),
2. separable bilinear weights are built on the VPU directly in their
   matmul layouts: WxT[qc, p] and Wy[qr, p],
3. MXU:  A[qr*C+c, p] = sum_qc region[qr*C+c, qc] * WxT[qc, p],
4. VPU:  S[c, p]      = sum_qr A[qr*C+c, p] * Wy[qr, p]   (static sublane
   slices),
5. correlation: corr[1, p] = mean_c refT[c, p] * S[c, p] — a sublane
   reduction, emitted as a full-lane row.

torch-grid_sample ``zeros`` padding falls out naturally: the weight rows
only cover real in-image pixels, so any tap outside the image contributes
exactly zero.  Samples whose 2-tap support falls outside the *region*
(geometry wilder than the configured margins) drop to zero — the wrapper
anchors each region at the projected support minimum, and ``region_fits``
validates a camera setup up front.

The backward pass has its own Pallas kernel (same tile/region scheme,
run-deferred scatter of the source gradient); the projected grid is
stop_gradient like the reference's no_grad block (module.py:313), so
gradients flow only through ref/src features.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from effi_mvs_plus_tpu.core import geometry
from effi_mvs_plus_tpu.ops import warp as xla_warp

# Tile / region defaults (see BASELINE.md profile; margins sized for the
# DTU/T&T camera geometry — ~12 px disparity span at 1/8 resolution).
TILE_ROWS = 8
# The horizontal window is THE speed-of-light lever: the kernel matmul is
# (region_rows*C) x region_cols x lanes, so Qc scales every stage's MXU
# FLOPs linearly.  The window must cover ALIGN_X-1 columns of origin
# alignment slack plus the tile's projected span; Mosaic requires
# lane-dim slice offsets divisible by 128, so the slack is fixed at 127
# and the only way below 3 lane tiles of window is a NARROWER TILE:
# 64-col tiles shrink the span to ~tile+parallax = ~85 px at both rigs
# (scripts/probe_span_stats.py), making a 2-lane-tile window (budget
# 256-3-127 = 126) fit with margin.  The ladder demotes any launch whose
# geometry does not.  Env overrides are for A/B probes.
TILE_COLS = int(os.environ.get("EFFI_TILE_COLS", "128"))
# Rung-1 region rows (rung 0 always tries 16).  The vertical budget is
# rows - 1 - ANCHOR_BACKOFF (align_y=1 for C in {8,16,32}); measured
# chunked spans at the T&T rig are 13.1-15.5 raw, so with backoff 0 the
# 16-row rung-0 (budget 15) covers most chunks and the 20/24-row rung-1
# backs up the tall ones — the sparse patch + XLA rungs still back-stop
# anything taller.
REGION_ROWS = int(os.environ.get("EFFI_REGION_ROWS", "24"))
REGION_COLS = int(os.environ.get("EFFI_REGION_COLS", "384"))
PATCH_ENABLED = True       # sparse overflow patch rungs (debug kill-switch)
LADDER_PATCH16 = os.environ.get("EFFI_LADDER", "legacy") == "patch16"
                           # ladder shape A/B (round 5).  'patch16':
                           # rows16 with escalating patch tiers BEFORE
                           # any taller kernel — [16, 16+ps, 16+pb,
                           # rows1+pb, XLA].  MEASURED AND REJECTED as
                           # default (2026-08-20, multi-depth occlusion
                           # scene at the T&T rig): 2.109 vs legacy
                           # 2.204 maps/s.  The patch gather cost scales
                           # with static CAPACITY; at the measured 4-6%
                           # overflow the big tier (12.5%) costs more
                           # than the 25-50% larger rows20/24 matmul it
                           # avoids (stage-3 full-gather path is ~60
                           # ms/view vs ~2 ms kernel, so even a 4.5%
                           # patch ≈ 27 ms/view-set > the 4.5 ms FLOP
                           # saving).  'legacy' ([16, rows1, rows1+ps,
                           # rows1+pb, XLA]) stays the default; knob kept
                           # for future re-evaluation at other rigs.
DISPATCH_RECOMPUTE_FIELDS = False  # inert since the round-5 tiled-field
                                   # dispatch (kept so probe scripts that
                                   # set it keep running); the historical
                                   # A/B: recompute-in-branch regressed
                                   # 343->349 ms/map on the raw-field
                                   # dispatch.  probe_dispatch_cost.py
                                   # 2026-08-20 (post-backoff-0) measured
                                   # the ladder's total dispatch overhead
                                   # at ~zero: ladder 0.3046 s/map vs
                                   # FORCE_RUNG=0 0.3072 at the T&T B=1
                                   # point.
FORCE_RUNG = None          # trace-time ladder override (profiling only):
                           # 0=rows16, 1=rows24, 4=XLA — skips the traced
                           # predicates AND the lax.switch, so a bench
                           # with FORCE_RUNG=0 isolates the dispatch cost
                           # (predicate compute + switch operand copies).
                           # UNSAFE for wild geometry; never set in
                           # production paths.
ALIGN_X = 128              # region-origin x granule.  Mosaic can only
                           # prove lane-dim slice offsets divisible by
                           # the 128 lane tiling — sub-128 granules fail
                           # to compile ("tile index in dimension 2"),
                           # so narrowing the window means narrowing
                           # TILE_COLS, not the alignment.
ALIGN_Y = 8                # sublane granule: oy*C must be a multiple of 8
ANCHOR_BACKOFF = int(os.environ.get("EFFI_ANCHOR_BACKOFF", "0"))
                           # rows/cols the region origin backs off below
                           # floor(min contributing tap).  0 is exact: the
                           # leftmost/topmost bilinear tap IS floor(min),
                           # and the kernel + fit predicate + patch all
                           # share the same px/py buffer and the same
                           # floor/origin arithmetic, so no slack is
                           # needed for consistency.  Each back-off row
                           # costs one row of vertical fit budget — at
                           # the T&T rig the old value (2) was exactly
                           # what pushed every stage off the 16-row rung
                           # onto rows20/24 (+25-50% warp matmul FLOPs,
                           # round-5 trace).  Env knob for A/B probes.


def _pad_to(x, mults, mode="edge"):
    """Pad dims of x up to multiples of `mults` ({axis: multiple})."""
    pads = [(0, 0)] * x.ndim
    changed = False
    for ax, m in mults.items():
        size = x.shape[ax]
        target = -(-size // m) * m
        if target != size:
            pads[ax] = (0, target - size)
            changed = True
    return jnp.pad(x, pads, mode=mode) if changed else x


def _tile_flat(x, tile_rows, tile_cols):
    """(D, Hp, Wp) -> (D, T, P): tiles flattened row-major."""
    D, Hp, Wp = x.shape
    Th, Tw = Hp // tile_rows, Wp // tile_cols
    x = x.reshape(D, Th, tile_rows, Tw, tile_cols)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(D, Th * Tw, tile_rows * tile_cols)


def _tile_unflat(x, Hp, Wp, tile_rows, tile_cols):
    """(D, T, P) -> (D, Hp, Wp)."""
    D = x.shape[0]
    Th, Tw = Hp // tile_rows, Wp // tile_cols
    x = x.reshape(D, Th, Tw, tile_rows, tile_cols)
    return x.transpose(0, 1, 3, 2, 4).reshape(D, Hp, Wp)


def _align_down(v, m):
    return (v // m) * m


_DB_CAP = int(os.environ.get("EFFI_DB_CAP", "8"))

# Any window knob in the env freezes the per-shape policy to the module
# constants (probe mode); otherwise each launch picks its window
# statically from its shape at trace time — zero runtime cost.
_ENV_WINDOW_OVERRIDE = any(k in os.environ for k in (
    "EFFI_TILE_COLS", "EFFI_REGION_COLS", "EFFI_REGION_ROWS"))


def _window_policy(C, D):
    """Static per-launch window (tile_cols, region_cols, rows_rung1).

    Measured on v5e (scripts/ab_region_window.py + probe_rungs.py,
    2026-08-20):
      - deep initial sweeps (C>=32 or D>8): the region is already
        width-clamped to 256 cols at the deployment widths, so narrower
        tiles only add grid steps; the rung-1 win is ROWS 24->20
        (M = 20*32 = 640 stays a 128 multiple): stage-1 unit 94.3 ->
        84.7 ms at the T&T rig.
      - refinement stages (C in {8,16}, D=8): 64-col tiles shrink the
        per-tile span so a 2-lane-tile window (256 cols) fits AND the
        16-row rung-0 becomes reachable at metric scale: stage-2 unit
        26.5 -> 20.5 ms, DTU B=6 forward 18.31 -> 19.10 maps/s.
        rows_rung1 stays 24 — 20 rows REGRESSED C=8 (unit 66 -> 85;
        M = 160 is not a 128 multiple).
    """
    if _ENV_WINDOW_OVERRIDE:
        return TILE_COLS, REGION_COLS, REGION_ROWS
    if C >= 32 or D > 8:
        return 128, 384, 20
    return 64, 256, 24


def _auto_depth_chunk(D, C, P, budget_bytes=13 * 1024 * 1024,
                      region_rows=REGION_ROWS):
    """Depth planes fused per kernel step.  Larger chunks amortize the
    per-step fixed cost (grid step, origin check, out/px/py block DMAs) —
    measured ~5-7 us/step of the 11.3 us stage-3 step time — but grow the
    in-kernel (Qr*C, DB*P) f32 accumulator (cap at `budget_bytes`) AND
    the per-chunk support span the shared region must cover (planes in a
    chunk share one origin, so more planes -> more disparity drift ->
    likelier rung demotion; _DB_CAP is the A/B knob for that trade).
    `region_rows` must be the SAME value the kernel will run with (the
    accumulator height is region_rows*C — ADVICE r2 #4)."""
    qrc = region_rows * C
    for db in (8, 6, 5, 4, 3, 2, 1):
        if db > _DB_CAP:
            continue
        if D % db == 0 and qrc * db * P * 4 <= budget_bytes:
            return db
    return 1


def _chunk_planes(x, BV, D, DB):
    """(BV*D, T, P) tile-flat -> (BV, D/DB, T, DB*P): the DB planes of a
    chunk laid side by side along the lane axis (plane-major), done on the
    XLA side because cross-lane reshapes are illegal in-kernel."""
    BVD, T, P = x.shape
    Dc = D // DB
    return (x.reshape(BV, Dc, DB, T, P)
             .transpose(0, 1, 3, 2, 4)
             .reshape(BV, Dc, T, DB * P))


def _origin_xy(px, py, Hs, Ws, region_rows, region_cols, C,
               H_img=None, W_img=None):
    """Aligned region origins anchored at each (depth, tile)'s projected
    support minimum (so the alignment round-down only ADDS coverage),
    clamped to keep the static-size region inside the image.

    The minimum is taken over CONTRIBUTING samples only: a sample fully
    outside the image reads grid_sample zeros whether or not the region
    covers it, so it must not drag the anchor away from the in-image
    support (border tiles of wide-FOV scenes would otherwise overflow and
    demote the launch — measured 160 ms/step of patch gathers at the T&T
    point, round 4).  The kernel and the fit predicate share this anchor,
    so dropping those samples stays exactly grid_sample-correct.  NaNs in
    px/py (guarded upstream like the reference module.py:331) fail the
    validity compare and are likewise ignored.

    px, py: (..., T, P) tile-flat coords.  Returns (ox, oy) int32 with the
    trailing P axis reduced away.
    """
    if H_img is None:
        H_img = Hs
    if W_img is None:
        W_img = Ws
    valid = (px > -1.0) & (px < W_img) & (py > -1.0) & (py < H_img)
    big = jnp.asarray(1e6, px.dtype)
    mx = jnp.where(valid, px, big).min(axis=-1)
    my = jnp.where(valid, py, big).min(axis=-1)
    ox = jnp.clip(jnp.floor(jnp.clip(mx, -big, big)).astype(jnp.int32)
                  - ANCHOR_BACKOFF, 0, max(Ws - region_cols, 0))
    oy = jnp.clip(jnp.floor(jnp.clip(my, -big, big)).astype(jnp.int32)
                  - ANCHOR_BACKOFF, 0, max(Hs - region_rows, 0))
    ox = _align_down(ox, ALIGN_X)
    align_y = max(1, ALIGN_Y // np.gcd(ALIGN_Y, C))
    oy = _align_down(oy, align_y)
    return ox, oy


def _compute_origins(px, py, Hs, Ws, region_rows, region_cols, C,
                     view_ids=None, H_img=None, W_img=None):
    """Origins packed ((v*1024 + oy) << 16 | ox) so equal-origin steps of
    DIFFERENT views never compare equal in the DMA-skip check.

    view_ids broadcastable to the leading dims (0 when absent).
    Returns flat int32.
    """
    ox, oy = _origin_xy(px, py, Hs, Ws, region_rows, region_cols, C,
                        H_img=H_img, W_img=W_img)
    # the tag only has to CHANGE between grid-adjacent steps of different
    # (batch, view) slices — mod 16 keeps the packed value inside int32
    tag = 0 if view_ids is None else view_ids % 16
    # SMEM lane-pads the last dim to 128 -> pack to one scalar per step
    return ((tag * 1024 + oy) * 65536 + ox).reshape(-1)


def _support_fits_traced(px, py, H, W, Hs, Ws, C,
                         tile_rows=TILE_ROWS, tile_cols=TILE_COLS,
                         region_rows=REGION_ROWS, region_cols=REGION_COLS,
                         depth_chunk=1):
    """Traced geometry-safety predicate: True iff, with the EXACT origins
    the kernel will use, every in-image bilinear tap of every (view, depth,
    tile) sample lands inside its static region.

    The kernel zeroes any tap outside its region.  For taps outside the
    source IMAGE that equals grid_sample's zeros padding and is correct;
    for in-image taps it would silently drop correlation mass — this
    predicate detects exactly that case, so the caller can fall back to
    the XLA gather path for wild geometry (VERDICT r1 weak #2).

    px, py: (BV, D, H, W) projected source-pixel coords (unpadded).
    H, W: source image size.  Hs, Ws: the sizes the kernel clamps origins
    against (H and the lane-padded width).  Left-side taps are always
    covered by construction (origins anchor at the support minimum and
    clamping only moves them down), so only the region's far edge can cut
    off in-image taps.  `depth_chunk` must equal the kernel's plane
    fusion factor — a chunk shares one origin (the min over its planes).
    """
    return jnp.all(_support_fit_mask(
        px, py, H, W, Hs, Ws, C, tile_rows, tile_cols, region_rows,
        region_cols, depth_chunk))


def _support_fit_mask(px, py, H, W, Hs, Ws, C,
                      tile_rows=TILE_ROWS, tile_cols=TILE_COLS,
                      region_rows=REGION_ROWS, region_cols=REGION_COLS,
                      depth_chunk=1):
    """Unreduced form of `_support_fits_traced`: per-(sample-chunk, tile)
    fit booleans — (BV, Dc, T) when chunked, (BV*D, T) otherwise.  The
    per-tile granularity feeds the sparse overflow patch
    (`_patch_overflow_tiles`): one wild tile no longer demotes the whole
    launch to the XLA gather path."""
    BV, D = px.shape[:2]
    pxp = _pad_to(px.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    pyp = _pad_to(py.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    pxf = _tile_flat(pxp, tile_rows, tile_cols)      # (BV*D, T, P)
    pyf = _tile_flat(pyp, tile_rows, tile_cols)
    if depth_chunk > 1:
        # per-chunk granularity: (BV, Dc, T, DB*P); the axis=-1 reductions
        # below then aggregate over a whole chunk, matching the kernel
        pxf = _chunk_planes(pxf, BV, D, depth_chunk)
        pyf = _chunk_planes(pyf, BV, D, depth_chunk)
    return _fit_mask_from_tiled(pxf, pyf, H, W, Hs, Ws, C,
                                region_rows, region_cols)


def _fit_mask_from_tiled(pxf, pyf, H, W, Hs, Ws, C, region_rows,
                         region_cols):
    """Fit flags from tile-flat (optionally chunked) projection fields:
    last axis is the sample axis; returns the mask with it reduced."""
    ox, oy = _origin_xy(pxf, pyf, Hs, Ws, region_rows, region_cols, C,
                        H_img=H, W_img=W)
    # rightmost in-image tap column/row each sample needs covered
    col = jnp.where((pxf > -1.0) & (pxf < W),
                    jnp.clip(jnp.floor(pxf).astype(jnp.int32) + 1, 0, W - 1),
                    0).max(axis=-1)
    row = jnp.where((pyf > -1.0) & (pyf < H),
                    jnp.clip(jnp.floor(pyf).astype(jnp.int32) + 1, 0, H - 1),
                    0).max(axis=-1)
    return ((col <= ox + region_cols - 1)
            & (row <= oy + region_rows - 1))


def support_fits(rots, transs, depth, H, W, C, depth_chunk=None,
                 px=None, py=None, region_rows=None,
                 per_tile=False, tile_cols=None, region_cols=None,
                 pxf=None, pyf=None):
    """Public traced/jittable form of the safety predicate for an all-views
    batch: rots (B,V,3,3), transs (B,V,3), depth (B,D,H,W) -> bool[].
    Used inside `warp_correlate_views_fused`'s automatic dispatch and as a
    standalone diagnostic.  Unspecified window knobs (tile_cols,
    region_cols, region_rows) default to `_window_policy(C, D)` — the SAME
    window the forward dispatch will actually run with (ADVICE r4 #2:
    module-constant defaults could predict a different rung than the one
    `_views_fwd_impl` executes); explicit values override.  `depth_chunk`
    defaults to the same auto choice the forward kernel makes FOR THE
    GIVEN region_rows (chunk-fits implies per-plane-fits, so this
    predicate is also valid for the per-plane backward kernel).  Pass
    px/py to reuse an already-computed projection field.  With
    ``per_tile=True`` returns the (B*V, T) per-tile fit flags instead of
    the global bool (the sparse-patch dispatch granularity)."""
    D = depth.shape[1]
    tc_pol, rc_pol, rows1_pol = _window_policy(C, D)
    if tile_cols is None:
        tile_cols = tc_pol
    if region_cols is None:
        region_cols = rc_pol
    if region_rows is None:
        region_rows = rows1_pol
    Wa = max(ALIGN_X, -(-W // ALIGN_X) * ALIGN_X)
    region_rows = min(region_rows, H)
    if pxf is not None and pyf is not None:
        # already-tiled chunked fields (BV, Dc, T, DB*P) from
        # `_project_views_tiled` — the caller guarantees the chunk layout
        # matches the kernel's depth_chunk
        mask = _fit_mask_from_tiled(
            pxf, pyf, H, W, H, Wa, C, region_rows,
            min(region_cols, Wa))                             # (BV, Dc, T)
        if not per_tile:
            return jnp.all(mask)
        return mask.all(axis=1)                               # (BV, T)
    if px is None or py is None:
        px, py = _project_views(rots, transs, depth, H, W)
    if depth_chunk is None:
        depth_chunk = _auto_depth_chunk(D, C, TILE_ROWS * tile_cols,
                                        region_rows=region_rows)
    mask = _support_fit_mask(
        px, py, H, W, H, Wa, C, tile_cols=tile_cols,
        region_rows=region_rows, region_cols=min(region_cols, Wa),
        depth_chunk=depth_chunk)
    if not per_tile:
        return jnp.all(mask)
    BV = px.shape[0]
    return mask.reshape(BV, -1, mask.shape[-1]).all(axis=1)   # (BV, T)


def region_fits(px, py, region_rows=REGION_ROWS, region_cols=REGION_COLS,
                tile_rows=TILE_ROWS, tile_cols=TILE_COLS, C=8):
    """Host-side diagnostic: True iff every tile's projected support fits
    the configured region under worst-case origin alignment.
    px, py: (D, H, W) projected coords.  NOTE: the deployed dispatch is a
    ladder that tries region_rows=16 before the default — pass
    region_rows=16 to ask which rung a rig will take (ADVICE r2 #3)."""
    px = _pad_to(jnp.asarray(px), {1: tile_rows, 2: tile_cols})
    py = _pad_to(jnp.asarray(py), {1: tile_rows, 2: tile_cols})
    pxf = np.asarray(_tile_flat(px, tile_rows, tile_cols))
    pyf = np.asarray(_tile_flat(py, tile_rows, tile_cols))
    span_x = pxf.max(axis=2) - pxf.min(axis=2)
    span_y = pyf.max(axis=2) - pyf.min(axis=2)
    align_y = max(1, ALIGN_Y // np.gcd(ALIGN_Y, C))
    slack = 1 + ANCHOR_BACKOFF           # bilinear far tap + anchor back-off
    return bool((span_x <= region_cols - slack - (ALIGN_X - 1)).all()
                and (span_y <= region_rows - slack - (align_y - 1)).all())


def _kernel(origins_ref, px_ref, py_ref, ref_ref, src_ref, out_ref,
            region, state, sem, *, C, P, region_rows, region_cols):
    v = pl.program_id(0)
    t = pl.program_id(1)
    d = pl.program_id(2)
    T = pl.num_programs(1)
    Dc = pl.num_programs(2)
    nsteps = pl.num_programs(0) * T * Dc
    step = (v * T + t) * Dc + d
    packed = origins_ref[step]
    hi = packed // 65536
    ox = packed - hi * 65536
    oy = hi % 1024

    def _copy(view, pk, buf):
        phi = pk // 65536
        pox = pk - phi * 65536
        poy = phi % 1024
        return pltpu.make_async_copy(
            src_ref.at[view,
                       pl.ds(pl.multiple_of(poy * C, 8), region_rows * C),
                       pl.ds(pl.multiple_of(pox, ALIGN_X), region_cols)],
            region.at[buf], sem)

    # Double-buffered region pipeline: origins are scalar-prefetched, so
    # each step issues the NEXT step's region copy before computing and the
    # synchronous wait disappears behind the MXU/VPU work (the old
    # start();wait() per origin change stalled stages 2/3, whose origins
    # change every step).  state: [0]=current buffer, [1]=prefetch pending.
    first = step == 0

    @pl.when(first)
    def _():
        state[0] = 0
        state[1] = 0
        dma = _copy(v, packed, 0)
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(jnp.logical_not(first), state[1] == 1))
    def _():
        # the prefetch issued last step was for THIS step's origin
        nxt_buf = 1 - state[0]
        _copy(v, packed, nxt_buf).wait()
        state[0] = nxt_buf
        state[1] = 0

    cur = state[0]
    nxt = origins_ref[jnp.minimum(step + 1, nsteps - 1)]

    @pl.when(jnp.logical_and(step + 1 < nsteps, nxt != packed))
    def _():
        _copy((step + 1) // (T * Dc), nxt, 1 - cur).start()
        state[1] = 1

    px = px_ref[0, 0, 0]                                # (1, P) f32 rows
    py = py_ref[0, 0, 0]
    lx = px - ox.astype(jnp.float32)                    # (1, P)
    ly = py - oy.astype(jnp.float32)
    qc = lax.broadcasted_iota(jnp.int32, (region_cols, P), 0).astype(
        jnp.float32)
    qr = lax.broadcasted_iota(jnp.int32, (region_rows, P), 0).astype(
        jnp.float32)
    wxT = jnp.maximum(1.0 - jnp.abs(lx - qc), 0.0)      # (Qc, P)
    wy = jnp.maximum(1.0 - jnp.abs(ly - qr), 0.0)       # (Qr, P)

    A = jax.lax.dot_general(
        region[cur], wxT.astype(region.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (Qr*C, P)

    S = jnp.zeros((C, P), jnp.float32)
    for r in range(region_rows):                        # static unroll
        S = S + A[r * C:(r + 1) * C, :] * wy[r:r + 1, :]

    refT = ref_ref[0, 0].astype(jnp.float32)            # (C, P)
    corr = jnp.sum(S * refT, axis=0, keepdims=True) / C
    out_ref[0, 0, 0] = corr.astype(out_ref.dtype)       # (1, P)


def _project_views(rots, transs, depth, H, W):
    """Per-view projected source coords (BV, D, H, W), stop-gradient (the
    reference computes the warp grid under no_grad, module.py:313)."""
    B, V = rots.shape[:2]
    D = depth.shape[1]
    BV = B * V
    px, py = geometry.project_to_src(
        rots.reshape(BV, 3, 3), transs.reshape(BV, 3),
        jnp.broadcast_to(depth[:, None], (B, V, D, H, W)).reshape(
            BV, D, H, W), H, W)
    return lax.stop_gradient(px), lax.stop_gradient(py)


def _tiled_coords(H, W, tile_rows, tile_cols, dtype=jnp.float32):
    """Ref pixel coordinates directly in tile-flat layout: (x, y) each
    (T, P), CLAMPED to the last real row/column — identical values to
    edge-padding the raw coordinate field (`_pad_to(..., mode='edge')`),
    so downstream projections are bitwise equal to the raw-field path."""
    Hp = -(-H // tile_rows) * tile_rows
    Wp = -(-W // tile_cols) * tile_cols
    Th, Tw = Hp // tile_rows, Wp // tile_cols
    T, P = Th * Tw, tile_rows * tile_cols
    t_idx = lax.broadcasted_iota(jnp.int32, (T, P), 0)
    p_idx = lax.broadcasted_iota(jnp.int32, (T, P), 1)
    x = (t_idx % Tw) * tile_cols + p_idx % tile_cols
    y = (t_idx // Tw) * tile_rows + p_idx // tile_cols
    x = jnp.minimum(x, W - 1).astype(dtype)
    y = jnp.minimum(y, H - 1).astype(dtype)
    return x, y


def _project_views_tiled(rots, transs, depth, H, W, tile_rows, tile_cols,
                         DB):
    """Projected source coords computed DIRECTLY in the kernel's chunked
    tile layout — (pxf, pyf) each (BV, Dc, T, DB*P) float32.

    Bitwise-identical samples to `_project_views` + pad/tile/chunk (the
    clamped tiled grid reproduces the edge-padding, and the per-sample
    arithmetic — HIGHEST-precision rot@grid then ray*depth+trans — is
    the same expression), but skips materializing the (B,V,D,H,W) depth
    broadcast and the (BV,D,H,W)->tiled transposes of BOTH fields:
    ~2/3 of the projection-stage HBM traffic at the T&T shapes (round-5
    trace: the broadcast_in_dim/reshape/copy ops around `_project_views`
    cost ~30-40 ms/map at B=3).  Only `depth` (B-sized, not BV-sized) is
    relayouted.
    """
    B, V = rots.shape[:2]
    D = depth.shape[1]
    BV = B * V
    Dc = D // DB
    gx, gy = _tiled_coords(H, W, tile_rows, tile_cols, depth.dtype)
    T, P = gx.shape
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], 0)        # (3, T, P)
    ray = jnp.einsum("bvij,jtp->bvitp", rots, grid,
                     precision=geometry._PREC)              # (B,V,3,T,P)
    # depth -> chunked tile layout, kept 5-D so ray broadcasts over
    # (Dc, DB) without materializing a V- or D-fold copy
    dep = _pad_to(depth, {2: tile_rows, 3: tile_cols})
    dep = _tile_flat(dep.reshape(B * D, *dep.shape[2:]),
                     tile_rows, tile_cols).reshape(B, Dc, DB, T, P) \
        .transpose(0, 1, 3, 2, 4)                           # (B,Dc,T,DB,P)
    dep = dep[:, None]                                      # (B,1,Dc,T,DB,P)
    ray = ray[:, :, :, None, :, None, :]                    # (B,V,3,1,T,1,P)
    tr = transs[:, :, :, None, None, None, None]            # (B,V,3,1,1,1,1)
    z = ray[:, :, 2] * dep + tr[:, :, 2]
    z = jnp.where(z == 0, z + 1e-8, z)
    px = (ray[:, :, 0] * dep + tr[:, :, 0]) / z             # (B,V,Dc,T,DB,P)
    py = (ray[:, :, 1] * dep + tr[:, :, 1]) / z
    px = px.reshape(BV, Dc, T, DB * P)                      # free merges
    py = py.reshape(BV, Dc, T, DB * P)
    return lax.stop_gradient(px), lax.stop_gradient(py)


def _plane_sweep_correlate_views(ref_fea, src_feas, rots, transs, depth,
                                 tile_rows=TILE_ROWS, tile_cols=TILE_COLS,
                                 region_rows=REGION_ROWS,
                                 region_cols=REGION_COLS,
                                 interpret=False, depth_chunk=None,
                                 px=None, py=None, pxf=None, pyf=None):
    """Batched fused warp+correlate over all source views (G=1).

    ref_fea: (B, H, W, C); src_feas: (B, V, H, W, C); rots (B,V,3,3);
    transs (B,V,3); depth: (B, D, H, W) actual depths.
    Returns corr (B, V, D, H, W) float32.  ONE pallas_call covers every
    (batch, view, tile, depth-chunk) — ref tiles are shared across a
    sample's views, the per-tile source region is reused across the depth
    sweep (depth-fastest grid with origin-change detection), and DB depth
    planes share each grid step (laid side by side along the lane axis)
    so the per-step fixed cost amortizes DB-fold.
    """
    B, H, W, C = ref_fea.shape
    V = src_feas.shape[1]
    D = depth.shape[1]
    region_rows = min(region_rows, H)   # DMA region must fit the source
    Wa = max(ALIGN_X, -(-W // ALIGN_X) * ALIGN_X)   # x-padded source width
    region_cols = min(region_cols, Wa)
    P = tile_rows * tile_cols
    BV = B * V
    DB = depth_chunk or _auto_depth_chunk(D, C, P, region_rows=region_rows)
    Dc = D // DB
    PP = DB * P                         # lanes per step

    refp = _pad_to(ref_fea, {1: tile_rows, 2: tile_cols})
    Hp = -(-H // tile_rows) * tile_rows
    Wp = -(-W // tile_cols) * tile_cols
    Th, Tw = Hp // tile_rows, Wp // tile_cols
    T = Th * Tw

    # plane-chunked lane layout (XLA-side; cross-lane reshapes are illegal
    # in-kernel): (BV, Dc, T, DB*P), chunk planes side by side.  Prefer
    # caller-supplied tiled fields (computed IN layout by
    # `_project_views_tiled` — no (BV,D,H,W) materialization); fall back
    # to relayouting raw px/py for legacy callers (backward kernel,
    # single-view tests).
    if pxf is not None and pyf is not None:
        assert pxf.shape == (BV, Dc, T, PP), (pxf.shape, (BV, Dc, T, PP))
        pxf = pxf.reshape(BV, Dc, T, 1, PP)
        pyf = pyf.reshape(BV, Dc, T, 1, PP)
    else:
        if px is None or py is None:
            px, py = _project_views(rots, transs, depth, H, W)
        pxp = _pad_to(px.reshape(BV * D, H, W),
                      {1: tile_rows, 2: tile_cols})
        pyp = _pad_to(py.reshape(BV * D, H, W),
                      {1: tile_rows, 2: tile_cols})
        pxf = _chunk_planes(_tile_flat(pxp, tile_rows, tile_cols), BV, D,
                            DB).reshape(BV, Dc, T, 1, PP)
        pyf = _chunk_planes(_tile_flat(pyp, tile_rows, tile_cols), BV, D,
                            DB).reshape(BV, Dc, T, 1, PP)
    # ref tiles transposed to (B, T, C, P), shared across a sample's views,
    # replicated along lanes per chunk plane
    reff = refp.reshape(B, Th, tile_rows, Tw, tile_cols, C) \
        .transpose(0, 1, 3, 5, 2, 4).reshape(B, T, C, P)
    if DB > 1:
        reff = jnp.concatenate([reff] * DB, axis=-1)    # (B, T, C, DB*P)

    # channel-packed rows: src_packed[bv, y*C + c, x] = src[b, v, y, x, c],
    # x-padded with zeros so lane-aligned region slices stay in bounds
    # (the zero columns double as grid_sample zeros padding)
    src_packed = jnp.transpose(src_feas, (0, 1, 2, 4, 3)).reshape(
        BV, H * C, W)
    if Wa != W:
        src_packed = jnp.pad(src_packed, ((0, 0), (0, 0), (0, Wa - W)))
    # origins laid out (BV, T, Dc) to match the grid iteration order; one
    # origin per chunk (min over its planes); clamp against the PADDED
    # width (a region may cover the zero columns — right-edge support
    # would be cut off otherwise)
    tags = jnp.arange(BV, dtype=jnp.int32)[:, None, None]
    origins = _compute_origins(
        pxf[..., 0, :].transpose(0, 2, 1, 3),           # (BV, T, Dc, PP)
        pyf[..., 0, :].transpose(0, 2, 1, 3),
        H, Wa, region_rows, region_cols, C,
        view_ids=jnp.broadcast_to(tags, (BV, T, Dc)), H_img=H, W_img=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BV, T, Dc),                               # depth fastest
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, PP),
                         lambda bv, t, d, s: (bv, d, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, PP),
                         lambda bv, t, d, s: (bv, d, t, 0, 0)),
            pl.BlockSpec((1, 1, C, PP),
                         lambda bv, t, d, s, _V=V: (bv // _V, t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),          # src stays put
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 1, PP),
                               lambda bv, t, d, s: (bv, d, t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, region_rows * C, region_cols), src_feas.dtype),
            pltpu.SMEM((2,), jnp.int32),    # current buffer, prefetch flag
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kernel = functools.partial(
        _kernel, C=C, P=PP, region_rows=region_rows, region_cols=region_cols)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BV, Dc, T, 1, PP), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(origins, pxf, pyf, reff, src_packed)
    # un-chunk: (BV, Dc, T, DB, P) -> (BV*D, T, P)
    out = out.reshape(BV, Dc, T, DB, P).transpose(0, 1, 3, 2, 4) \
        .reshape(BV * D, T, P)
    out = _tile_unflat(out, Hp, Wp, tile_rows, tile_cols)
    return out.reshape(B, V, D, Hp, Wp)[..., :H, :W]


def _supported(H, W, C, D, groups):
    # narrow maps are padded up to one 128-wide tile; tiny test shapes
    # (< one tile row of real content) keep the XLA path
    return (groups == 1 and C in (8, 16, 32, 64)
            and H >= TILE_ROWS and W >= 64)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def warp_correlate_fused(ref_fea, src_fea, rot, trans, depth, groups=1,
                         interpret=False):
    """Fused warp + correlation for one source view, Pallas-accelerated.

    Same contract as ops.warp.warp_correlate with G=1:
    ref_fea/src_fea (B,H,W,C), rot (B,3,3), trans (B,3),
    depth (B,D,H,W) -> (B,D,H,W,1).  Falls back to the XLA gather path for
    unsupported shapes.
    """
    return _fwd_impl(ref_fea, src_fea, rot, trans, depth, groups, interpret)


def _fwd_impl(ref_fea, src_fea, rot, trans, depth, groups, interpret):
    B, H, W, C = ref_fea.shape
    D = depth.shape[1]
    if not _supported(H, W, C, D, groups):
        return xla_warp.warp_correlate(ref_fea, src_fea, rot, trans, depth,
                                       groups)
    out = _views_fwd_impl(ref_fea, src_fea[:, None], rot[:, None],
                          trans[:, None], depth, groups, interpret)
    return out[:, 0][..., None].astype(ref_fea.dtype)


def _fwd(ref_fea, src_fea, rot, trans, depth, groups, interpret):
    out = _fwd_impl(ref_fea, src_fea, rot, trans, depth, groups, interpret)
    return out, (ref_fea, src_fea, rot, trans, depth)


def _bwd(groups, interpret, res, g):
    """Backward for the single-view API: pallas kernel when supported (with
    the same geometry-safety cond as forward), XLA gather path otherwise
    (grid is stop_gradient like the reference's no_grad block, so only
    feature grads flow)."""
    ref_fea, src_fea, rot, trans, depth = res
    B, H, W, C = ref_fea.shape
    D = depth.shape[1]
    if _supported(H, W, C, D, groups):
        d_ref, d_src, *_ = _views_bwd(
            groups, interpret,
            (ref_fea, src_fea[:, None], rot[:, None], trans[:, None], depth),
            g[..., 0][:, None])
        return d_ref, d_src[:, 0], None, None, None
    _, vjp = jax.vjp(
        lambda rf, sf: xla_warp.warp_correlate(rf, sf, rot, trans, depth,
                                               groups),
        ref_fea, src_fea)
    d_ref, d_src = vjp(g)
    return d_ref, d_src, None, None, None


warp_correlate_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Backward kernel: d_ref and d_src without the XLA gather/scatter path
# (whose (...,2,2,C) blocks pad 64x on TPU and OOM HBM at training shapes).
# Same tile/region decomposition as the forward; per step it recomputes the
# sampled features (region already in VMEM), accumulates
#   d_ref[c,p] += g[p]/C * sampled[c,p]          across (view, depth)
#   d_region[qr*C+c, qc] = sum_p U[qr*C+c,p] * WxT[qc,p]   (MXU)
# with U = tile(refT) * wy_full * g/C.  d_region accumulates in a VMEM
# scratch across the run of consecutive steps sharing one region origin
# (the depth-fastest grid makes such runs long — the sweep moves origins
# by a few aligned pixels), and is flushed into the packed source gradient
# with ONE read-modify-write DMA per run instead of per step; the grid is
# sequential, so the accumulation is race-free.
# ---------------------------------------------------------------------------


def _bwd_kernel(origins_ref, g_ref, px_ref, py_ref, ref_ref, src_ref,
                dsrc_in, dref_out, dsrc_ref, region, dacc, facc, state, sem,
                wsem, *, C, P, V, D, region_rows, region_cols):
    del dsrc_in                       # aliased to dsrc_ref (the output)
    b = pl.program_id(0)
    t = pl.program_id(1)
    v = pl.program_id(2)
    d = pl.program_id(3)
    T = pl.num_programs(1)
    nsteps = pl.num_programs(0) * T * V * D
    step = ((b * T + t) * V + v) * D + d
    packed = origins_ref[step]
    hi = packed // 65536
    ox = packed - hi * 65536
    oy = hi % 1024
    bv = b * V + v
    QrC = region_rows * C

    # state: [0] = origin of the accumulation run in flight, [1] = its bv
    stale = jnp.logical_or(step == 0, packed != state[0])

    def _flush(pk, pbv):
        """One read-modify-write of dacc into dsrc at run origin (pk, pbv)."""
        phi = pk // 65536
        pox = pk - phi * 65536
        poy = phi % 1024
        tgt = dsrc_ref.at[pbv, pl.ds(pl.multiple_of(poy * C, 8), QrC),
                          pl.ds(pl.multiple_of(pox, ALIGN_X), region_cols)]
        rd = pltpu.make_async_copy(tgt, facc, wsem)
        rd.start()
        rd.wait()
        facc[...] = facc[...] + dacc[...]
        wr = pltpu.make_async_copy(facc, tgt, wsem)
        wr.start()
        wr.wait()

    def _region_copy():
        return pltpu.make_async_copy(
            src_ref.at[bv,
                       pl.ds(pl.multiple_of(oy * C, 8), QrC),
                       pl.ds(pl.multiple_of(ox, ALIGN_X), region_cols)],
            region, sem)

    @pl.when(stale)
    def _():
        _region_copy().start()      # overlaps the flush RMW below

    @pl.when(jnp.logical_and(stale, step > 0))
    def _():
        _flush(state[0], state[1])

    @pl.when(stale)
    def _():
        _region_copy().wait()
        dacc[...] = jnp.zeros_like(dacc)
        state[0] = packed
        state[1] = bv

    px = px_ref[0, 0, 0, 0]                             # (1, P) f32
    py = py_ref[0, 0, 0, 0]
    g = g_ref[0, 0, 0, 0].astype(jnp.float32) / C       # (1, P)
    lx = px - ox.astype(jnp.float32)
    ly = py - oy.astype(jnp.float32)
    QrC = region_rows * C
    qc = lax.broadcasted_iota(jnp.int32, (region_cols, P), 0).astype(
        jnp.float32)
    qr_full = (lax.broadcasted_iota(jnp.int32, (QrC, P), 0)
               // C).astype(jnp.float32)
    wxT = jnp.maximum(1.0 - jnp.abs(lx - qc), 0.0)      # (Qc, P)
    wy_full = jnp.maximum(1.0 - jnp.abs(ly - qr_full), 0.0)   # (QrC, P)

    refT = ref_ref[0, 0].astype(jnp.float32)            # (C, P)
    # sampled: A = region @ wxT  -> (QrC, P); S[c,p] = sum_qr A*wy
    A = jax.lax.dot_general(
        region[...], wxT.astype(region.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    Aw = A * wy_full
    S = jnp.zeros((C, P), jnp.float32)
    for r in range(region_rows):                        # static unroll
        S = S + Aw[r * C:(r + 1) * C, :]

    # d_ref accumulation over this (b, t) group's (v, d) steps
    @pl.when((v == 0) & (d == 0))
    def _():
        dref_out[0, 0] = jnp.zeros((C, P), dref_out.dtype)
    dref_out[0, 0] += (S * g).astype(dref_out.dtype)

    # d_region = U @ wxT^T with U = tile(refT) * wy_full * g; accumulate in
    # VMEM — the flush to HBM happens once per origin run, not per step
    refT_full = jnp.concatenate([refT] * region_rows, axis=0)   # (QrC, P)
    U = (refT_full * wy_full * g).astype(jnp.float32)
    dacc[...] += jax.lax.dot_general(
        U, wxT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (QrC, Qc)

    @pl.when(step == nsteps - 1)
    def _():
        _flush(packed, bv)


def _plane_sweep_correlate_views_bwd(ref_fea, src_feas, rots, transs,
                                     depth, g,
                                     tile_rows=TILE_ROWS,
                                     tile_cols=TILE_COLS,
                                     region_rows=REGION_ROWS,
                                     region_cols=REGION_COLS,
                                     interpret=False, px=None, py=None):
    """Pallas backward: returns (d_ref (B,H,W,C), d_src (B,V,H,W,C)).

    g: (B, V, D, H, W) cotangent of the correlations.
    """
    B, H, W, C = ref_fea.shape
    V = src_feas.shape[1]
    D = depth.shape[1]
    region_rows = min(region_rows, H)
    Wa = max(ALIGN_X, -(-W // ALIGN_X) * ALIGN_X)
    region_cols = min(region_cols, Wa)
    P = tile_rows * tile_cols
    BV = B * V

    if px is None or py is None:
        px, py = _project_views(rots, transs, depth, H, W)

    pxp = _pad_to(px.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    pyp = _pad_to(py.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    # cotangent zero-padded: padded pixels must not contribute gradients
    gp = _pad_to(g.reshape(BV * D, H, W).astype(jnp.float32),
                 {1: tile_rows, 2: tile_cols}, mode="constant")
    refp = _pad_to(ref_fea, {1: tile_rows, 2: tile_cols})
    Hp, Wp = pxp.shape[1], pxp.shape[2]
    Th, Tw = Hp // tile_rows, Wp // tile_cols
    T = Th * Tw

    # layouts ordered (B, T, V, D) so each (b, t) group's d_ref
    # accumulates across consecutive (v, d) steps
    pxf = _tile_flat(pxp, tile_rows, tile_cols).reshape(B, V, D, T, 1, P) \
        .transpose(0, 3, 1, 2, 4, 5)                    # (B,T,V,D,1,P)
    pyf = _tile_flat(pyp, tile_rows, tile_cols).reshape(B, V, D, T, 1, P) \
        .transpose(0, 3, 1, 2, 4, 5)
    gf = _tile_flat(gp, tile_rows, tile_cols).reshape(B, V, D, T, 1, P) \
        .transpose(0, 3, 1, 2, 4, 5)
    reff = refp.reshape(B, Th, tile_rows, Tw, tile_cols, C) \
        .transpose(0, 1, 3, 5, 2, 4).reshape(B, T, C, P)

    src_packed = jnp.transpose(src_feas, (0, 1, 2, 4, 3)).reshape(
        BV, H * C, W)
    if Wa != W:
        src_packed = jnp.pad(src_packed, ((0, 0), (0, 0), (0, Wa - W)))

    tags = jnp.arange(BV, dtype=jnp.int32).reshape(B, V)
    origins = _compute_origins(
        pxf[..., 0, :], pyf[..., 0, :],                 # (B,T,V,D,P)
        H, Wa, region_rows, region_cols, C,
        view_ids=jnp.broadcast_to(tags[:, None, :, None], (B, T, V, D)),
        H_img=H, W_img=W)

    dsrc_zeros = jnp.zeros((BV, H * C, Wa), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T, V, D),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, 1, P),
                         lambda b, t, v, d, s: (b, t, v, d, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, 1, P),
                         lambda b, t, v, d, s: (b, t, v, d, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, 1, P),
                         lambda b, t, v, d, s: (b, t, v, d, 0, 0)),
            pl.BlockSpec((1, 1, C, P),
                         lambda b, t, v, d, s: (b, t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),       # src
            pl.BlockSpec(memory_space=pl.ANY),       # dsrc (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, P),
                         lambda b, t, v, d, s: (b, t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),       # dsrc out
        ],
        scratch_shapes=[
            pltpu.VMEM((region_rows * C, region_cols), src_feas.dtype),
            pltpu.VMEM((region_rows * C, region_cols), jnp.float32),  # dacc
            pltpu.VMEM((region_rows * C, region_cols), jnp.float32),  # facc
            pltpu.SMEM((2,), jnp.int32),    # run origin, run bv
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kernel = functools.partial(
        _bwd_kernel, C=C, P=P, V=V, D=D, region_rows=region_rows,
        region_cols=region_cols)

    dref_tiles, dsrc_packed = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, T, C, P), jnp.float32),
                   jax.ShapeDtypeStruct((BV, H * C, Wa), jnp.float32)),
        grid_spec=grid_spec,
        input_output_aliases={6: 1},    # dsrc zeros -> dsrc out (after the
                                        # scalar-prefetch operand)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(origins, gf, pxf, pyf, reff, src_packed, dsrc_zeros)

    # un-tile d_ref: (B, T, C, P) -> (B, Hp, Wp, C)
    d_ref = dref_tiles.reshape(B, Th, Tw, C, tile_rows, tile_cols) \
        .transpose(0, 1, 4, 2, 5, 3).reshape(B, Hp, Wp, C)[:, :H, :W]
    # un-pack d_src: (BV, H*C, Wa) -> (B, V, H, W, C)
    d_src = dsrc_packed[:, :, :W].reshape(B, V, H, C, W) \
        .transpose(0, 1, 2, 4, 3)
    return d_ref.astype(ref_fea.dtype), d_src.astype(src_feas.dtype)


# ---------------------------------------------------------------------------
# All-views variant: one kernel launch per (batch, stage) covering every
# source view — shared ref tiles, depth-fastest region reuse.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def warp_correlate_views_fused(ref_fea, src_feas, rots, transs, depth,
                               groups=1, interpret=False):
    """Fused warp + correlation over all source views.

    ref_fea (B,H,W,C), src_feas (B,V,H,W,C), rots (B,V,3,3),
    transs (B,V,3), depth (B,D,H,W) -> (B,V,D,H,W) correlations (G=1).
    Falls back to the XLA gather path per view for unsupported shapes.
    """
    return _views_fwd_impl(ref_fea, src_feas, rots, transs, depth, groups,
                           interpret)


def _views_xla(ref_fea, src_feas, rots, transs, depth, groups):
    V = src_feas.shape[1]
    return jnp.stack(
        [xla_warp.warp_correlate(ref_fea, src_feas[:, v], rots[:, v],
                                 transs[:, v], depth, groups)[..., 0]
         for v in range(V)], axis=1)


def _patch_capacities(n_tiles):
    """(small, big) patch capacities for a launch with n_tiles (view,
    tile)s.  Small covers the common case (a few depth-edge tiles per
    scene — ~1.5% budget) at ~1/8 the gather cost of big (12.5%), which
    remains the last rung before full XLA demotion."""
    return (int(min(n_tiles, max(8, n_tiles // 64))),
            int(min(n_tiles, max(8, n_tiles // 8))))


def _tile_select(px, py, flags, capacity, H, W,
                 tile_rows=TILE_ROWS, tile_cols=TILE_COLS):
    """Pick up to ``capacity`` flagged (view, tile)s via lax.top_k.

    Returns (bv, t, px_sel, py_sel, T): selected batch*view / tile
    indices and their (K, D, P) projection fields.  When fewer than
    ``capacity`` tiles are flagged the surplus selections land on
    FITTING tiles — harmless for the forward (exact == kernel there)
    but the backward must mask their cotangents (see _views_bwd).
    """
    BV, D = px.shape[:2]
    P = tile_rows * tile_cols
    pxp = _pad_to(px.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    pyp = _pad_to(py.reshape(BV * D, H, W), {1: tile_rows, 2: tile_cols})
    pxf = _tile_flat(pxp, tile_rows, tile_cols).reshape(BV, D, -1, P)
    pyf = _tile_flat(pyp, tile_rows, tile_cols).reshape(BV, D, -1, P)
    T = pxf.shape[2]
    _, sel = lax.top_k((~flags).astype(jnp.int32).reshape(-1), capacity)
    bv = sel // T
    t = sel % T
    return bv, t, pxf[bv, :, t], pyf[bv, :, t], T


def _exact_tiles_corr(ref_fea, src_feas, px_sel, py_sel, bv, t,
                      tile_rows=TILE_ROWS, tile_cols=TILE_COLS):
    """Exact 4-tap correlations for selected tiles: (K, D, P).

    Pure and differentiable in (ref_fea, src_feas) — the backward patch
    rung takes jax.vjp through this same function, so forward values and
    gradients agree by construction.
    """
    B, H, W, C = ref_fea.shape
    V = src_feas.shape[1]
    x0f = jnp.floor(px_sel)
    y0f = jnp.floor(py_sel)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    dtp = src_feas.dtype
    wx = (px_sel - x0f).astype(dtp)[..., None]
    wy = (py_sel - y0f).astype(dtp)[..., None]

    src_flat = src_feas.reshape(B * V * H * W, C)
    base = (bv * (H * W))[:, None, None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.where(inb, base + yi * W + xi, 0)
        v = jnp.take(src_flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (C,))
        return jnp.where(inb[..., None], v, 0)

    warped = (tap(x0, y0) * (1 - wx) * (1 - wy)
              + tap(x0 + 1, y0) * wx * (1 - wy)
              + tap(x0, y0 + 1) * (1 - wx) * wy
              + tap(x0 + 1, y0 + 1) * wx * wy)           # (K, D, P, C)

    refp = _pad_to(ref_fea, {1: tile_rows, 2: tile_cols})
    Hp, Wp = refp.shape[1], refp.shape[2]
    Tq = (Hp // tile_rows) * (Wp // tile_cols)
    P = tile_rows * tile_cols
    ref_tf = refp.reshape(B, Hp // tile_rows, tile_rows,
                          Wp // tile_cols, tile_cols, C)
    ref_tf = ref_tf.transpose(0, 1, 3, 2, 4, 5).reshape(B, Tq, P, C)
    ref_sel = ref_tf[bv // V, t]                         # (K, P, C)
    return jnp.mean(warped * ref_sel[:, None].astype(dtp), axis=-1)


def _tile_select_from_tiled(pxf, pyf, flags, capacity, DB):
    """`_tile_select` from the chunked tiled fields (BV, Dc, T, DB*P):
    returns (bv, t, px_sel (K, D, P), py_sel, T) without ever
    materializing a (BV, D, H, W) raw field."""
    BV, Dc, T, PP = pxf.shape
    P = PP // DB
    _, sel = lax.top_k((~flags).astype(jnp.int32).reshape(-1), capacity)
    bv = sel // T
    t = sel % T
    # chunk layout: plane d = dc*DB + db sits at chunk dc, lane-block db
    px_sel = pxf[bv, :, t].reshape(-1, Dc * DB, P)
    py_sel = pyf[bv, :, t].reshape(-1, Dc * DB, P)
    return bv, t, px_sel, py_sel, T


def _patch_overflow_tiles(out, ref_fea, src_feas, px, py, flags, capacity,
                          tile_rows=TILE_ROWS, tile_cols=TILE_COLS,
                          pxf=None, pyf=None, depth_chunk=None):
    """Recompute up to ``capacity`` non-fitting (view, tile)s with the
    exact 4-tap gather math and scatter the results over the kernel's
    (tap-dropped) values.

    The region kernel zeroes taps outside its static region, so a tile
    whose projected support overflows (a depth edge at metric scale, a
    wild refined hypothesis) computes a wrong correlation THERE and only
    there.  Instead of demoting the whole launch to the XLA gather path
    (60 ms/view at the T&T stage-3 shape vs ~2 ms pallas), this recomputes
    just the flagged tiles: gather cost scales with `capacity`, shapes
    stay static, and `lax.top_k` picks the flagged (view, tile)s.

    out: (B, V, D, H, W) kernel output; px/py: (B*V, D, H, W) projection
    field (shared with the kernel); flags: (B*V, T) True = tile fits.
    """
    B, H, W, C = ref_fea.shape
    V = src_feas.shape[1]
    BV = B * V
    D = out.shape[2]
    if pxf is not None and pyf is not None:
        bv, t, px_sel, py_sel, T = _tile_select_from_tiled(
            pxf, pyf, flags, capacity, depth_chunk)
    else:
        bv, t, px_sel, py_sel, T = _tile_select(px, py, flags, capacity,
                                                H, W, tile_rows, tile_cols)
    corr = _exact_tiles_corr(ref_fea, src_feas, px_sel, py_sel, bv, t,
                             tile_rows, tile_cols)

    outp = _pad_to(out.reshape(BV, D, H, W).astype(jnp.float32),
                   {2: tile_rows, 3: tile_cols})
    Hp, Wp = outp.shape[2], outp.shape[3]
    o = outp.reshape(BV, D, Hp // tile_rows, tile_rows,
                     Wp // tile_cols, tile_cols)
    o = o.transpose(0, 1, 2, 4, 3, 5).reshape(BV, D, T,
                                              tile_rows * tile_cols)
    o = o.at[bv, :, t].set(corr.astype(jnp.float32))
    o = o.reshape(BV, D, Hp // tile_rows, Wp // tile_cols, tile_rows,
                  tile_cols).transpose(0, 1, 2, 4, 3, 5)
    o = o.reshape(BV, D, Hp, Wp)[:, :, :H, :W]
    return o.reshape(B, V, D, H, W)


def _views_fwd_impl(ref_fea, src_feas, rots, transs, depth, groups,
                    interpret):
    B, H, W, C = ref_fea.shape
    D = depth.shape[1]
    if not _supported(H, W, C, D, groups):
        return _views_xla(ref_fea, src_feas, rots, transs, depth, groups)
    # geometry-safety dispatch, a 4-rung ladder (round-3, BASELINE.md):
    # the 16-row region cuts the kernel's matmul FLOPs (QrC 24C -> 16C)
    # for a measured 1.4x at every stage, so try it first; sweeps whose
    # vertical support overflows 16 rows take the 24-row kernel; launches
    # where only a bounded MINORITY of (view, tile)s overflow 24 rows run
    # the 24-row kernel and sparse-patch just those tiles with the exact
    # gather math (one depth-edge tile no longer demotes the whole launch
    # — at T&T metric scale that demotion cost ~60 ms/view); only
    # geometry wilder than that takes the full XLA path.  All rungs
    # compile once; one executes per batch.  The projection field is
    # computed ONCE and shared by predicates, kernels and the patch.
    tc, rc, rows1 = _window_policy(C, D)
    # ONE chunked tiled projection field serves every rung + predicate +
    # patch: DB is unified across the rows16/rows1 kernels (chosen at the
    # rows16 accumulator size; the rows1 kernel's larger accumulator at
    # the same DB stays well inside the 100 MB VMEM budget).  Computed
    # directly in-layout (`_project_views_tiled`) — no (BV, D, H, W)
    # materialization, no broadcast of depth over views, no tile-flat
    # transposes of the two fields (round-5 trace: that relayout traffic
    # cost ~30-40 ms/map at the T&T point).
    DB = _auto_depth_chunk(D, C, TILE_ROWS * tc, region_rows=16)
    dep32 = depth.astype(jnp.float32)
    pxf, pyf = _project_views_tiled(rots, transs, dep32, H, W,
                                    TILE_ROWS, tc, DB)

    def _kernel_out(rows):
        return _plane_sweep_correlate_views(
            ref_fea, src_feas, rots, transs, dep32,
            tile_cols=tc, region_rows=rows, region_cols=rc,
            interpret=interpret, depth_chunk=DB, pxf=pxf, pyf=pyf)

    def _flags(rows):
        return support_fits(rots, transs, depth, H, W, C,
                            region_rows=rows, tile_cols=tc,
                            region_cols=rc, per_tile=True,
                            pxf=pxf, pyf=pyf)             # (B*V, T)

    if FORCE_RUNG is not None:
        if FORCE_RUNG in (0, "pred0"):
            out = _kernel_out(16).astype(ref_fea.dtype)
            if FORCE_RUNG == "pred0":
                # keep the predicate compute live (profiling: isolates
                # predicate cost from switch operand/result copies)
                eps = (jnp.all(_flags(16)).astype(out.dtype)
                       + jnp.sum(~_flags(rows1)).astype(out.dtype)) \
                    * jnp.asarray(0, out.dtype)
                out = out + eps
            return out
        if FORCE_RUNG == 1:
            return _kernel_out(rows1).astype(ref_fea.dtype)
        return _views_xla(ref_fea, src_feas, rots, transs, depth,
                          groups).astype(ref_fea.dtype)

    def _patched(rows, flags, cap):
        return _patch_overflow_tiles(
            _kernel_out(rows), ref_fea, src_feas, None, None, flags, cap,
            tile_cols=tc, pxf=pxf, pyf=pyf, depth_chunk=DB)

    flags16 = _flags(16)
    flags24 = _flags(rows1)
    cap_small, cap_big = _patch_capacities(flags24.size)
    if LADDER_PATCH16 and PATCH_ENABLED:
        # A/B'd and REJECTED as default (see LADDER_PATCH16 above)
        n16 = jnp.sum(~flags16)
        n1 = jnp.sum(~flags24)
        rung = jnp.where(n16 == 0, 0,
                         jnp.where(n16 <= cap_small, 1,
                                   jnp.where(n16 <= cap_big, 2,
                                             jnp.where(n1 <= cap_big,
                                                       3, 4))))
        return lax.switch(rung, [
            lambda: _kernel_out(16).astype(ref_fea.dtype),
            lambda: _patched(16, flags16, cap_small).astype(ref_fea.dtype),
            lambda: _patched(16, flags16, cap_big).astype(ref_fea.dtype),
            lambda: _patched(rows1, flags24, cap_big).astype(
                ref_fea.dtype),
            lambda: _views_xla(ref_fea, src_feas, rots, transs, depth,
                               groups).astype(ref_fea.dtype)])

    fits16 = jnp.all(flags16)
    fits24 = jnp.all(flags24)
    n_bad = jnp.sum(~flags24)
    # two patch tiers: the gather cost is proportional to capacity, and
    # real depth edges flag only a few tiles — pay the small tier for
    # them, keep the big tier as the middle ground before full demotion
    patch_small = n_bad <= cap_small if PATCH_ENABLED else False
    patch_big = n_bad <= cap_big if PATCH_ENABLED else False
    rung = jnp.where(fits16, 0,
                     jnp.where(fits24, 1,
                               jnp.where(patch_small, 2,
                                         jnp.where(patch_big, 3, 4))))
    return lax.switch(rung, [
        lambda: _kernel_out(16).astype(ref_fea.dtype),
        lambda: _kernel_out(rows1).astype(ref_fea.dtype),
        lambda: _patched(rows1, flags24, cap_small).astype(ref_fea.dtype),
        lambda: _patched(rows1, flags24, cap_big).astype(ref_fea.dtype),
        lambda: _views_xla(ref_fea, src_feas, rots, transs, depth,
                           groups).astype(ref_fea.dtype)])


def _views_fwd(ref_fea, src_feas, rots, transs, depth, groups, interpret):
    out = _views_fwd_impl(ref_fea, src_feas, rots, transs, depth, groups,
                          interpret)
    return out, (ref_fea, src_feas, rots, transs, depth)


def _views_bwd(groups, interpret, res, g):
    ref_fea, src_feas, rots, transs, depth = res
    B, H, W, C = ref_fea.shape
    D = depth.shape[1]

    def xla_grads():
        _, vjp = jax.vjp(
            lambda rf, sf: _views_xla(rf, sf, rots, transs, depth, groups),
            ref_fea, src_feas)
        d_ref, d_src = vjp(g.astype(ref_fea.dtype))
        return d_ref.astype(ref_fea.dtype), d_src.astype(src_feas.dtype)

    if _supported(H, W, C, D, groups):
        # pallas backward — the XLA gather/scatter fallback pads its
        # (...,2,2,C) blocks 64x on TPU and OOMs HBM at training shapes —
        # under the same 4-rung geometry ladder as the forward (the bwd
        # kernel is per-plane, and chunk-fits implies plane-fits, so the
        # forward predicates are valid here); one shared projection field
        # for predicates + kernels.  Rung 2 mirrors the forward's sparse
        # overflow patch (ADVICE r3): grads for the bounded minority of
        # overflowing tiles go through jax.vjp of the SAME exact-gather
        # function the forward patched with, the kernel sees their
        # cotangent zeroed — so one wild tile no longer demotes the whole
        # backward to the OOM-prone XLA path.
        V = src_feas.shape[1]
        tc, rc, rows1 = _window_policy(C, D)
        px, py = _project_views(rots, transs, depth.astype(jnp.float32),
                                H, W)
        fits16 = support_fits(rots, transs, depth, H, W, C, px=px, py=py,
                              region_rows=16, tile_cols=tc, region_cols=rc)
        flags24 = support_fits(rots, transs, depth, H, W, C, px=px, py=py,
                               per_tile=True, tile_cols=tc,
                               region_rows=rows1, region_cols=rc)  # (BV,T)
        fits24 = jnp.all(flags24)
        n_bad = jnp.sum(~flags24)
        cap_small, cap_big = _patch_capacities(flags24.size)
        patch_small = n_bad <= cap_small if PATCH_ENABLED else False
        patch_big = n_bad <= cap_big if PATCH_ENABLED else False
        rung = jnp.where(fits16, 0,
                         jnp.where(fits24, 1,
                                   jnp.where(patch_small, 2,
                                             jnp.where(patch_big, 3, 4))))

        def patched_grads(capacity, rows=None, flags=None):
            rows = rows1 if rows is None else rows
            flags = flags24 if flags is None else flags
            P = TILE_ROWS * tc
            gf32 = g.astype(jnp.float32)
            # per-pixel fit mask from the per-tile flags
            Hp = -(-H // TILE_ROWS) * TILE_ROWS
            Wp = -(-W // tc) * tc
            Th, Tw = Hp // TILE_ROWS, Wp // tc
            m = flags.reshape(B * V, Th, 1, Tw, 1)
            m = jnp.broadcast_to(m, (B * V, Th, TILE_ROWS, Tw, tc))
            m = m.reshape(B * V, Hp, Wp)[:, :H, :W] \
                .reshape(B, V, 1, H, W)
            d_ref_k, d_src_k = _plane_sweep_correlate_views_bwd(
                ref_fea, src_feas, rots, transs, depth.astype(jnp.float32),
                jnp.where(m, gf32, 0.0), tile_cols=tc, region_rows=rows,
                region_cols=rc, interpret=interpret, px=px, py=py)
            bv, t, px_sel, py_sel, T = _tile_select(
                px, py, flags, capacity, H, W, tile_cols=tc)
            gp = _pad_to(gf32.reshape(B * V * D, H, W),
                         {1: TILE_ROWS, 2: tc}, mode="constant")
            gtf = _tile_flat(gp, TILE_ROWS, tc).reshape(
                B * V, D, T, P)
            g_sel = gtf[bv, :, t]                          # (K, D, P)
            # zero surplus selections that landed on fitting tiles (their
            # gradient already went through the kernel)
            sel_flagged = ~flags.reshape(-1)[bv * T + t]
            g_sel = jnp.where(sel_flagged[:, None, None], g_sel, 0.0)
            corr, vjp = jax.vjp(
                lambda rf, sf: _exact_tiles_corr(rf, sf, px_sel, py_sel,
                                                 bv, t, tile_cols=tc),
                ref_fea, src_feas)
            d_ref_p, d_src_p = vjp(g_sel.astype(corr.dtype))
            return (d_ref_k + d_ref_p.astype(d_ref_k.dtype),
                    d_src_k + d_src_p.astype(d_src_k.dtype))

        def bwd_kernel(rows):
            return _plane_sweep_correlate_views_bwd(
                ref_fea, src_feas, rots, transs, depth.astype(jnp.float32),
                g.astype(jnp.float32), tile_cols=tc, region_rows=rows,
                region_cols=rc, interpret=interpret, px=px, py=py)

        if LADDER_PATCH16 and PATCH_ENABLED:
            # mirror of _views_fwd_patch16 (same rung thresholds, so
            # forward values and gradients take matching paths)
            flags16 = support_fits(rots, transs, depth, H, W, C, px=px,
                                   py=py, per_tile=True, region_rows=16,
                                   tile_cols=tc, region_cols=rc)
            n16 = jnp.sum(~flags16)
            n1 = jnp.sum(~flags24)
            rung16 = jnp.where(
                n16 == 0, 0,
                jnp.where(n16 <= cap_small, 1,
                          jnp.where(n16 <= cap_big, 2,
                                    jnp.where(n1 <= cap_big, 3, 4))))
            d_ref, d_src = lax.switch(rung16, [
                lambda: bwd_kernel(16),
                lambda: patched_grads(cap_small, rows=16, flags=flags16),
                lambda: patched_grads(cap_big, rows=16, flags=flags16),
                lambda: patched_grads(cap_big),
                xla_grads])
            return d_ref, d_src, None, None, None

        d_ref, d_src = lax.switch(rung, [
            lambda: bwd_kernel(16),
            lambda: bwd_kernel(rows1),
            lambda: patched_grads(cap_small),
            lambda: patched_grads(cap_big),
            xla_grads])
        return d_ref, d_src, None, None, None
    d_ref, d_src = xla_grads()
    return d_ref, d_src, None, None, None


warp_correlate_views_fused.defvjp(_views_fwd, _views_bwd)
