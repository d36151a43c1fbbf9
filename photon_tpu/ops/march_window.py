"""Windowed fused march: the dense chief-ray march at ANY volume size.

The fused dense march (ops.march_dense_fused) contracts each ray block
against the FULL (W*4, 2H) slab pair — O(W*H) MXU work per ray per
stage, affordable to ~256^2 slabs and hopeless at 512^2 (a 16x per-ray
blowup; the round-3 fallback was the XLA voxel-tube march at ~9 M
rays/s, a 34x cliff).  This module removes the volume-size term from
the per-ray cost entirely:

* rays are sorted in serpentine tile order of their straight-track
  position at mid-volume depth (host side, once per scene) so each
  1024-ray block is LATERALLY COMPACT — chief rays of neighboring particles
  converge toward the same lens center, so a block's footprint stays a
  few dozen voxels across the whole traversal;
* for each (ray block g, slab s) the kernel DMAs only a static
  (Ww*4, 2*Hw) WINDOW of the slab pair from HBM into VMEM scratch, at
  a per-(g, s) origin that follows the block's track (planned host
  side from the straight chief lines — the marched rays deflect by
  micro-radians, bounded by the plan's margin); the [lo | hi] halves
  are two DMA slices;
* interpolation weights are built in LOCAL window coordinates.  The
  clip semantics of the dense weights are position-invariant (a clamped
  ray is assigned to a border window, where the local clip coincides
  with the global one); the cubic border FOLDS are gated by whether the
  window touches the global border.

Per-ray cost is then O(Ww*Hw) regardless of volume size — with ~64^2
windows it equals the 64^3 dense march's, at any W x H.  The march
itself (z-slab planes, integrator menu, entry advance, in-band gating)
is bit-compatible with march_dense_fused / march_chief_dense.

Contract: the marched rays must stay within the plan's margin
(_MARGIN - _SUPPORT voxels) of their straight chief track — true for
any physical BOS/PIV medium (micro-radian deflections, micron-scale
lateral drift).  Media refractive enough to bend chief rays multiple
voxels sideways violate the plan and must route through the exact
marcher.

Differentiable: a custom_vjp backward marches the slabs in reverse and
accumulates each (block, slab) step's WINDOW-LOCAL field cotangent in
VMEM, then read-modify-writes it into the global field-cotangent tensor
in HBM (the transpose of the window DMA; the TPU grid is sequential, so
overlapping windows accumulate race-free, and the RMW DMAs overlap the
VJP chain's compute).  Two state-reconstruction flavors mirror
march_dense_fused: the default streams the forward's saved per-stage
states (the A/B-measured winner), and marches whose stage residual
would not fit the PHOTON_TRAJ_MAX_BYTES budget reconstruct states by
reverse re-march with defect corrections.  The 2 GB field cotangent at
512^3 is ONE HBM tensor, input/output-aliased through the kernel.

The plan's drift contract is enforced at run time: the kernel flags any
in-band ray whose interpolation taps would clamp to a window edge that
is not the global border (possible only when the marched ray drifts
beyond the plan's margin off its straight track), and the renderer
raises instead of shipping silently wrong samples.

Reference parity: evaluation of the eikonal marcher C13 for volumes
beyond VMEM (SURVEY.md; trace_rays_through_density_gradients.h:
1455-1544 marches any texture size — in both directions here); routing
in models.render_fast.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photon_tpu.ops.march_dense_pallas import _b3, _dot_split

_SUPPORT = 3              # cubic tap reach (+1 drift/rounding margin)
_MARGIN = 6               # window slack: support + deflection + rounding
# cap on the kernel's window-proportional VMEM terms (derived per plan
# in plan_windows); the per-kernel vmem_limit_bytes is 64 MB, and the
# gap is Mosaic's scheduling headroom plus the B-sized VJP transients
# of the backward kernel
_WIN_VMEM_MAX = 24 << 20


class WindowPlan(NamedTuple):
    """Host-side plan: ray permutation + per-(block, slab) windows.

    ``two_copy`` (the lane-snap reclaim): window x-origins snap to 16
    voxels instead of 32 by reading from one of TWO field copies — the
    natural layout and a 16-voxel x-shifted twin (built device-side by
    the march wrapper).  ``ox`` then holds the 32-aligned DMA offset
    into copy ``oxc`` and the GLOBAL origin is ``ox + 16 * oxc``; the
    halved snap slack shrinks the static window width by a 32-voxel
    step on scenes whose extents straddle the boundary (the 512^3 bench:
    128 -> 96, -25%% MXU work).  With ``two_copy`` False, ``oxc`` is
    all zeros and ``ox`` is the global 32-aligned origin."""

    perm: np.ndarray          # (G*B,) int32 ray index per padded slot
    valid: np.ndarray         # (G*B,) bool — False for padded slots
    ox: np.ndarray            # (G, S) int32 window x DMA offset (voxels)
    oxc: np.ndarray           # (G, S) int32 field-copy index (0/1)
    oy: np.ndarray            # (G, S) int32 window y-origin (voxels)
    win_w: int                # static window width (voxels)
    win_h: int                # static window height (voxels)
    two_copy: bool            # 16-voxel x-snap via shifted field copy


def _serpentine_order(ux_mid, uy_mid, w, h, block):
    """Sort rays by serpentine (boustrophedon) tile order.

    Unlike a Morton sort (whose curve jumps across quadrant boundaries,
    so a contiguous block of sorted rays can span the full axis), the
    serpentine tile walk makes CONSECUTIVE tiles spatially adjacent:
    any contiguous ray block straddles at most one tile boundary, so
    its footprint is bounded by two adjacent tiles plus track drift.
    Tile side ~ sqrt(block / density) targets one to two tiles per
    block."""
    P = ux_mid.shape[0]
    span_x = max(float(ux_mid.max() - ux_mid.min()), 1.0)
    span_y = max(float(uy_mid.max() - uy_mid.min()), 1.0)
    density = max(P / (span_x * span_y), 1e-12)
    # anisotropic tiles: a block's y-extent is bounded by 2*Ty (at most
    # one row straddle) and its x-extent by ~block/(density*Ty) + Tx
    # (the run of tiles it spans along the row) — balancing the two
    # gives Ty = sqrt(block / (2 density)), with Tx small so the x run
    # quantizes finely
    Ty = max(8, int(np.sqrt(block / (2.0 * density))))
    Tx = max(4, Ty // 3)
    tx = np.floor(ux_mid / Tx).astype(np.int64)
    ty = np.floor(uy_mid / Ty).astype(np.int64)
    ntx = max(1, -(-w // Tx))
    serp_x = np.where(ty % 2 == 0, tx, ntx - 1 - tx)
    return np.argsort(ty * ntx + serp_x, kind="stable").astype(np.int32)


@functools.partial(jax.jit, static_argnums=(8, 9))
def _track_bounds(xs, ys, zs, dcx, dcy, dcz, valid, z_evals, geom, block):
    """Per-(block, slab) straight-track bounds over each STEP INTERVAL.

    z_evals carries z_max followed by the S landing planes; the track
    is linear in z, so the bound over step s (entry at plane s-1 / the
    volume top, exit at plane s) is the union of the endpoint bounds —
    integrator stages sample anywhere inside the interval, not just at
    the landing plane.  ``valid`` must already exclude rays that never
    march (padding and dcz >= 0): their clipped pseudo-tracks would
    inflate the extents to the full slab.
    """
    min_x0, min_y0, sx, sy, w, h = geom
    t = jnp.maximum((z_evals[None, :] - zs[:, None]) / dcz[:, None], 0.0)
    ux = jnp.clip(0.5 + (xs[:, None] + dcx[:, None] * t - min_x0) / sx,
                  0.0, w - 1.0)
    uy = jnp.clip(0.5 + (ys[:, None] + dcy[:, None] * t - min_y0) / sy,
                  0.0, h - 1.0)
    G = xs.shape[0] // block
    S1 = z_evals.shape[0]
    ux = ux.reshape(G, block, S1)
    uy = uy.reshape(G, block, S1)
    vm = valid.reshape(G, block, 1)
    big = jnp.float32(1e9)
    mnx = jnp.where(vm, ux, big).min(1)
    mxx = jnp.where(vm, ux, -big).max(1)
    mny = jnp.where(vm, uy, big).min(1)
    mxy = jnp.where(vm, uy, -big).max(1)
    # step s spans evaluation points s (entry) and s+1 (landing)
    return (jnp.minimum(mnx[:, :-1], mnx[:, 1:]),
            jnp.maximum(mxx[:, :-1], mxx[:, 1:]),
            jnp.minimum(mny[:, :-1], mny[:, 1:]),
            jnp.maximum(mxy[:, :-1], mxy[:, 1:]))


def _padded_dims(w: int, h: int):
    """Tile-padded lateral dims for the window DMA.

    When a dim is not a multiple of its DMA granularity (x: 32 voxels =
    128 lanes at 4 channels; y: 8 sublanes) the field is padded with
    BORDER-REPLICATED voxels, by at least 2 * _SUPPORT so clamped-tap
    semantics hold without border folds on the padded side: the kernel
    clips padded-axis coordinates to n - 1 - _SUPPORT, placing the
    tricubic stencil's lowest tap at n - 1 - 2 * _SUPPORT + 1 — with
    only _SUPPORT pad voxels that tap would land on the REAL voxel
    w - 2 and blend it, where the dense kernel's fold semantics yield
    exactly the border value w - 1; >= 2 * _SUPPORT pad puts every tap
    of a clipped ray on replicated border voxels.
    """
    w_pad = w if w % 32 == 0 else -(-(w + 2 * _SUPPORT) // 32) * 32
    h_pad = h if h % 8 == 0 else -(-(h + 2 * _SUPPORT) // 8) * 8
    return w_pad, h_pad


def plan_windows(vol, xs, ys, zs, dcx, dcy, dcz,
                 block: Optional[int] = None,
                 require_profit: bool = True,
                 force_win=None) -> Optional[WindowPlan]:
    """Build the sort + window plan from straight chief tracks (numpy).

    Returns None when windows would not beat the dense march (volume
    already small) or would not fit the VMEM budget (pathologically
    spread blocks) — callers then fall back to the tube path.
    All inputs are HOST arrays: the plan must be computed before jit
    (window origins become static-shaped operands of the kernel).

    ``block`` / ``force_win``: override the auto-chosen ray-block size
    and window dims — the multi-chip path harmonizes per-shard plans to
    one static kernel configuration with these (models.render_fast).
    A forced window smaller than a shard's track extents fails the
    coverage check and returns None like any other uncoverable plan.
    """
    w, h, d = (int(s) for s in vol.sizes)
    S = d - 1
    mn = np.asarray(vol.min_bound, np.float64)
    mx = np.asarray(vol.max_bound, np.float64)
    sx = (mx[0] - mn[0]) / (w - 2.0)
    sy = (mx[1] - mn[1]) / (h - 2.0)
    z_min, z_max = mn[2], mx[2]
    dz_slab = (z_max - z_min) / (d - 2.0)

    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    zs = np.asarray(zs, np.float64)
    dcx = np.asarray(dcx, np.float64)
    dcy = np.asarray(dcy, np.float64)
    dcz = np.asarray(dcz, np.float64)
    P = xs.shape[0]

    # the fused kernel's ux/uy convention: 0.5 + (x - min)/spacing.
    # Mid-plane positions (host, one plane) drive the sort; the FULL
    # (P, S) track-bound sweep runs ON DEVICE (_track_bounds below) —
    # at bench scale it is ~60M ops, 20 s of host numpy vs milliseconds
    # on the accelerator, and the plan runs per render call.
    ks = np.arange(S - 1, -1, -1, dtype=np.float64)
    z_planes = np.maximum(z_min + (ks - 0.5) * dz_slab, z_min)   # (S,)
    safe_dcz = np.where(dcz < 0, dcz, -1.0)
    mid = S // 2
    t_mid = np.maximum((z_planes[mid] - zs) / safe_dcz, 0.0)
    ux_mid = np.clip(0.5 + (xs + dcx * t_mid - mn[0]) / sx, 0.0, w - 1.0)
    uy_mid = np.clip(0.5 + (ys + dcy * t_mid - mn[1]) / sy, 0.0, h - 1.0)

    # serpentine tile sort on mid-volume position.  Block size scales
    # with ray density: a block's lateral footprint is ~block/density
    # voxels^2 and sets the window area (= per-ray MXU cost), so sparse
    # scenes take smaller blocks (lane floor 256).
    if block is None:
        span_x = max(float(ux_mid.max() - ux_mid.min()), 1.0)
        span_y = max(float(uy_mid.max() - uy_mid.min()), 1.0)
        density = P / (span_x * span_y)
        block = 1024 if density >= 1.0 else (512 if density >= 0.25
                                             else 256)
    order = _serpentine_order(ux_mid, uy_mid, w, h, block)

    G = -(-P // block)
    pad = G * block - P
    perm = np.concatenate([order, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(P, bool), np.zeros(pad, bool)])

    # per-(block, step-interval) track bounds, computed on device; rays
    # that never march (dcz >= 0 — inside requires a downward ray) are
    # masked out of the bounds so one stray upward ray cannot blow up a
    # block's window / veto the whole plan
    geom = (float(mn[0]), float(mn[1]), float(sx), float(sy),
            float(w), float(h))
    marches = np.concatenate([dcz < 0, np.zeros(pad, bool)])
    z_evals = np.concatenate([[z_max], z_planes])
    min_x, max_x, min_y, max_y = (
        np.asarray(a) for a in _track_bounds(
            jnp.asarray(xs[perm], jnp.float32),
            jnp.asarray(ys[perm], jnp.float32),
            jnp.asarray(zs[perm], jnp.float32),
            jnp.asarray(dcx[perm], jnp.float32),
            jnp.asarray(dcy[perm], jnp.float32),
            jnp.asarray(safe_dcz[perm], jnp.float32),
            jnp.asarray(valid & marches),
            jnp.asarray(z_evals, jnp.float32),
            geom, block))
    if not (valid & marches).any():
        return None                    # nothing marches: use fallback

    ext_x = float((max_x - min_x).max())
    ext_y = float((max_y - min_y).max())
    # volumes whose dims are not multiples of the DMA tile granularity
    # are border-REPLICATED up to the next multiple by the kernel
    # wrapper (replicated pads reproduce clamped-tap semantics without
    # folds — see march_chief_windowed); plan against the padded dims
    w_pad, h_pad = _padded_dims(w, h)
    # window sizes: extent + taps + drift margin, rounded to the VMEM
    # tile granularities (rows = Ww*4 mult of 8 -> Ww even; Hw in
    # 32-lane steps — the lo/hi halves are separate buffers, so no
    # 128-lane column-offset constraint)
    # HBM DMA alignment (the pair tensor is the field's natural
    # (D, H, W*4) reshape): x rides the 128-lane axis -> ox and Ww in
    # 32-voxel steps (x4 channels = 128 lanes); y rides the 8-sublane
    # row axis -> oy and Hw in 8-voxel steps.  Origins snap DOWN, so
    # the window carries the snap slack on top of extent + margins.
    if force_win is not None:
        win_w, win_h = int(force_win[0]), int(force_win[1])
        two_copy = bool(len(force_win) > 2 and force_win[2])
    else:
        # x window width: DMA slices ride the 128-lane axis, so the
        # WIDTH is always a 32-voxel multiple; the ORIGIN snap is 32
        # voxels in the single-copy layout and 16 with the shifted twin
        # (two_copy) — take the twin exactly when it saves a width step
        win_w32 = min(w_pad, int(-(-(ext_x + 2 * _MARGIN + 31) // 32) * 32))
        win_w16 = min(w_pad, int(-(-(ext_x + 2 * _MARGIN + 15) // 32) * 32))
        two_copy = win_w16 < win_w32 and win_w16 + 32 <= w_pad
        win_w = win_w16 if two_copy else win_w32
        win_h = min(h_pad, int(-(-(ext_y + 2 * _MARGIN + 7) // 8) * 8))
    # window-proportional VMEM terms of the kernel (per-byte):
    #   * double-buffered DMA scratch: 2 slots x 2 halves x (Hw, Ww*4) f32
    #   * bf16-split compute copies of the (2Hw, Ww*4) view: a_hi + a_lo
    #     at the default passes=2 (one copy at passes=1 — budget assumes 2)
    #   * the A contraction result (Ww*4, B) and the weight rows
    #     ((Ww, B) + wy_cat (2Hw, B) + its (Hw, B) factor)
    # The 64 MB per-kernel vmem_limit leaves Mosaic headroom for its own
    # scheduling copies; _WIN_VMEM_MAX caps the explicit terms well below.
    win_bytes = (2 * 2 * win_h * win_w * 4 * 4          # DMA scratch
                 + 2 * 2 * win_h * win_w * 4 * 4        # split copies
                 + win_w * 4 * block * 4                # A
                 + (win_w + 3 * win_h) * block * 4)     # weight rows
    if win_bytes > _WIN_VMEM_MAX:
        return None
    if require_profit and win_w * win_h * 4 >= w_pad * h_pad:
        return None                    # windows would not beat dense

    # min-edge-based snapped origins: floor(min - support) to the snap
    # grid guarantees the left taps, and the window's size slack (the
    # +31/+15/+7 terms above) guarantees the right — a center-based
    # origin can snap OUT of the valid interval when rounding eats the
    # slack.  Snap AFTER the clip so the kernel's pl.multiple_of claims
    # hold even when w/h are not multiples of the tile granularity; if
    # the re-snap un-covers a right-edge block, the coverage check below
    # vetoes the plan (tube fallback) rather than shipping a lie
    snap = 16 if two_copy else 32
    gx = (np.clip(np.floor(min_x - _SUPPORT), 0, w_pad - win_w)
          .astype(np.int64) // snap * snap)
    oxc = ((gx // 16) % 2).astype(np.int32) if two_copy \
        else np.zeros(gx.shape, np.int32)
    ox = (gx - 16 * oxc).astype(np.int32)      # 32-aligned DMA offset
    oy = (np.clip(np.floor(min_y - _SUPPORT), 0, h_pad - win_h)
          .astype(np.int64) // 8 * 8).astype(np.int32)

    # exact coverage check incl. tap support (must hold by construction;
    # belt and braces against rounding) — against the GLOBAL origin
    bad = ((min_x - _SUPPORT < gx - 1e-6) & (gx > 0)) \
        | ((max_x + _SUPPORT > gx + win_w - 1 + 1e-6)
           & (gx + win_w < w_pad)) \
        | ((min_y - _SUPPORT < oy - 1e-6) & (oy > 0)) \
        | ((max_y + _SUPPORT > oy + win_h - 1 + 1e-6)
           & (oy + win_h < h_pad))
    if bad.any():
        return None
    return WindowPlan(perm=perm, valid=valid, ox=ox, oxc=oxc, oy=oy,
                      win_w=win_w, win_h=win_h, two_copy=two_copy)


def plan_windows_sharded(vol, xs, ys, zs, dcx, dcy, dcz, n_shards: int):
    """Per-shard window plans harmonized to ONE static kernel config.

    The multi-chip renderer shards particles in ``n_shards`` contiguous
    chunks (models.render_fast's NamedSharding split); each shard plans
    its own serpentine sort + windows over ITS chiefs, then all plans
    are forced to a common (block, win_w, win_h, G) so the shard_map
    body compiles once: window dims take the max over shards (re-planned
    with ``force_win``), short shards pad with invalid blocks.

    Returns ``(perm, valid, ox, oy, (win_w, win_h))`` with the arrays
    stacked on the shard axis — ``perm``/``valid`` as (n_shards * G*B,)
    with SHARD-LOCAL ray indices, ``ox``/``oy`` as (n_shards * G, S) —
    ready to shard over the mesh's particle axis; or None when any
    shard's plan declines (callers fall back to the tube path on every
    shard, keeping the compiled program uniform).
    """
    P = np.asarray(xs).shape[0]
    if P % n_shards != 0:
        raise ValueError(f"particle count {P} not divisible by "
                         f"{n_shards} shards — pad first")
    per = P // n_shards
    subs = [tuple(np.asarray(a)[i * per:(i + 1) * per]
                  for a in (xs, ys, zs, dcx, dcy, dcz))
            for i in range(n_shards)]
    first = plan_windows(vol, *subs[0])
    if first is None:
        return None
    B = first.perm.shape[0] // first.ox.shape[0]
    plans = [first] + [plan_windows(vol, *s, block=B) for s in subs[1:]]
    if any(p is None for p in plans):
        return None
    win_w = max(p.win_w for p in plans)
    win_h = max(p.win_h for p in plans)
    two_copy = all(p.two_copy for p in plans)
    if any((p.win_w, p.win_h, p.two_copy) != (win_w, win_h, two_copy)
           for p in plans):
        plans = [plan_windows(vol, *s, block=B,
                              force_win=(win_w, win_h, two_copy))
                 for s in subs]
        if any(p is None for p in plans):
            return None
    G = max(p.ox.shape[0] for p in plans)
    S = plans[0].ox.shape[1]

    def pad_plan(p):
        g0 = p.ox.shape[0]
        if g0 == G:
            return p
        gpad = G - g0
        zgs = np.zeros((gpad, S), np.int32)
        return WindowPlan(
            perm=np.concatenate([p.perm, np.zeros(gpad * B, np.int32)]),
            valid=np.concatenate([p.valid, np.zeros(gpad * B, bool)]),
            ox=np.concatenate([p.ox, zgs]),
            oxc=np.concatenate([p.oxc, zgs]),
            oy=np.concatenate([p.oy, zgs]),
            win_w=win_w, win_h=win_h, two_copy=two_copy)

    plans = [pad_plan(p) for p in plans]
    return (np.concatenate([p.perm for p in plans]),
            np.concatenate([p.valid for p in plans]),
            np.concatenate([p.ox for p in plans]),
            np.concatenate([p.oxc for p in plans]),
            np.concatenate([p.oy for p in plans]),
            (win_w, win_h, two_copy))


def plan_drift_ok(vol, xs, ys, zs, dcx, dcy, dcz, *,
                  algorithm: int = 2, interpolation_scheme: int = 1,
                  substeps=None, sample: int = 1024) -> bool:
    """Plan-time drift-contract probe: march a chief subsample through a
    subsample-local windowed plan and check the kernel's violation
    flags.  The subsample's windows are at least as tight as the full
    plan's, so a clean probe implies the full plan samples exactly; a
    flagged probe routes the scene to the exact/tube marcher before any
    wrong sample ships (the graceful half of the contract enforcement —
    the per-render flags remain as the loud half)."""
    P = np.asarray(xs).shape[0]
    if P > sample:
        idx = np.linspace(0, P - 1, sample).astype(np.int64)
    else:
        idx = np.arange(P)
    sub = [np.asarray(a, np.float32)[idx]
           for a in (xs, ys, zs, dcx, dcy, dcz)]
    plan = plan_windows(vol, *sub, require_profit=False)
    if plan is None:
        # degenerate subsample (e.g. nothing marches): nothing to check
        return True
    out = march_chief_windowed(vol, plan, *map(jnp.asarray, sub),
                               algorithm=algorithm,
                               interpolation_scheme=interpolation_scheme,
                               substeps=substeps, return_violations=True)
    return float(np.asarray(out[6]).sum()) == 0.0


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _weights_T_win(u_row, n: int, scheme: int, gl, gr, padded: bool):
    """Window-local dense weights: _weights_T with the cubic border
    folds gated by whether the window touches the global border (gl/gr
    are 0/1 scalars).  The clip semantics need no gating — a globally
    clamped ray is assigned to a border window where local and global
    clips coincide, and inner-window rays never reach the local clip
    (plan invariant).

    ``padded``: this axis carries >= _SUPPORT border-replicated pad
    voxels (non-tile-multiple volume dims).  Clamped-outside rays then
    clip to n-1-_SUPPORT so every tap lands on replicated border
    values — numerically identical to the fold/clamp semantics — and
    the right fold never fires (gr compares window edge to the PADDED
    width, which is never the true border)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    hi_t = float(n - 1 - _SUPPORT) if padded else float(n - 1)
    hi_c = float(n - 1 - _SUPPORT) if padded else float(n + 1)
    if scheme == 2:
        uc = jnp.clip(u_row, -2.0, hi_c)
        wt = _b3(uc - iota)
        fold_l = _b3(uc + 1.0) + _b3(uc + 2.0) + _b3(uc + 3.0)
        fold_r = _b3(uc - n) + _b3(uc - (n + 1.0)) + _b3(uc - (n + 2.0))
        wt = wt + jnp.where(iota == 0.0, gl * fold_l, 0.0) \
            + jnp.where(iota == n - 1.0, gr * fold_r, 0.0)
        return wt
    uc = jnp.clip(u_row, 0.0, hi_t)
    return jnp.maximum(0.0, 1.0 - jnp.abs(uc - iota))


def _weights_T_win_du(u_row, n: int, scheme: int, gl, gr, padded: bool):
    """d(window weights)/du: the _weights_T_du twin of
    :func:`_weights_T_win` — same clip bounds, same gl/gr fold gating
    (the fold derivative terms scale by the same 0/1 border scalars)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    from photon_tpu.ops.march_dense_pallas import _b3_d
    hi_t = float(n - 1 - _SUPPORT) if padded else float(n - 1)
    hi_c = float(n - 1 - _SUPPORT) if padded else float(n + 1)
    if scheme == 2:
        uc = jnp.clip(u_row, -2.0, hi_c)
        mask = ((u_row > -2.0) & (u_row < hi_c)).astype(jnp.float32)
        d = _b3_d(uc - iota)
        fold_l = _b3_d(uc + 1.0) + _b3_d(uc + 2.0) + _b3_d(uc + 3.0)
        fold_r = _b3_d(uc - n) + _b3_d(uc - (n + 1.0)) + _b3_d(uc - (n + 2.0))
        d = d + jnp.where(iota == 0.0, gl * fold_l, 0.0) \
            + jnp.where(iota == n - 1.0, gr * fold_r, 0.0)
        return d * mask
    uc = jnp.clip(u_row, 0.0, hi_t)
    mask = ((u_row > 0.0) & (u_row < hi_t)).astype(jnp.float32)
    diff = uc - iota
    live = (jnp.abs(diff) < 1.0).astype(jnp.float32)
    return -jnp.sign(diff) * live * mask


def _drift_violation(ux, uy, gl_x, gr_x, gl_y, gr_y, in_band,
                     *, Ww: int, Hw: int, scheme: int,
                     padded_x: bool, padded_y: bool):
    """(1, B) 0/1 flag: taps of this LOCAL coordinate would clamp to a
    window edge that is NOT the global border — i.e. the marched ray
    drifted beyond the plan's margin and the sample is wrong.  Straight
    in-plan tracks sit >= _SUPPORT voxels inside the window by
    construction (plan coverage check), so this never fires for media
    honoring the drift contract."""
    def ax(u, n, gl, gr, padded):
        if padded:
            hi = float(n - 1 - _SUPPORT)      # clip bound (see weights)
        else:
            hi = float(n - 2) if scheme == 2 else float(n - 1)
        lo = 1.0 if scheme == 2 else 0.0
        eps = 1e-3
        return (((u < lo - eps) & (gl == 0.0))
                | ((u > hi + eps) & (gr == 0.0)))
    bad = ax(ux, Ww, gl_x, gr_x, padded_x) \
        | ax(uy, Hw, gl_y, gr_y, padded_y)
    return jnp.where(bad & in_band, 1.0, 0.0)


def _window_kernel(params_ref, ox_ref, oxc_ref, oy_ref, state_ref,
                   pairs_hbm, out_ref, viol_ref, scratch, win, sem, **kw):
    return _window_kernel_impl(params_ref, ox_ref, oxc_ref, oy_ref,
                               state_ref, pairs_hbm, out_ref, viol_ref,
                               None, scratch, win, sem, **kw)


def _window_kernel_traj(params_ref, ox_ref, oxc_ref, oy_ref, state_ref,
                        pairs_hbm, out_ref, viol_ref, traj_ref, scratch,
                        win, sem, **kw):
    return _window_kernel_impl(params_ref, ox_ref, oxc_ref, oy_ref,
                               state_ref, pairs_hbm, out_ref, viol_ref,
                               traj_ref, scratch, win, sem, **kw)


def _window_kernel_impl(params_ref, ox_ref, oxc_ref, oy_ref, state_ref,
                        pairs_hbm, out_ref, viol_ref, traj_ref, scratch,
                        win, sem,
                        *, W: int, H: int, S: int, Ww: int, Hw: int, B: int,
                        scheme: int, algorithm: int, substeps: int,
                        passes: int, padded_x: bool, padded_y: bool,
                        two_copy: bool):
    """One (ray block g, slab s) step of the windowed march.

    pairs_hbm: the field's natural (D, H, W*4) reshape in ANY/HBM
    space (zero-copy even at 512^3); the kernel DMAs the (Hw, Ww*4) lo
    and hi halves of its window into ``win``.
    ox_ref/oy_ref: (G, S) SMEM window origins (voxels).
    viol_ref: (1, 1, B) drift-contract flags, OR-accumulated over steps
    (see :func:`_drift_violation`).
    traj_ref: optional (1, 1, rows, B) per-(g, s) STAGE-STATE residual —
    the input state of each RK4 stage (just s1 for Euler), the windowed
    backward kernel's linearization points (march_dense_fused's design).
    """
    g = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        scratch[:] = state_ref[0]
        viol_ref[0] = jnp.zeros((1, B), jnp.float32)

    # slab step s consumes field depth rows S-1-s (lo) and S-s (hi) —
    # no packed duplicate of the multi-GB field is ever materialized.
    # The plan guarantees the tile alignments; Mosaic needs the proofs
    # spelled out via multiple_of.  Windows are DOUBLE-BUFFERED: step s
    # computes on slot s%2 while the DMAs for step s+1 fill the other
    # slot (the slot last used at s-1, whose compute is complete).
    def win_dmas(step, slot):
        oxw = ox_ref[g, step]
        oyw = oy_ref[g, step]
        ox4 = pl.multiple_of(oxw * 4, 128)
        oy8 = pl.multiple_of(oyw, 8)
        if two_copy:
            c = oxc_ref[g, step]
            src_lo = pairs_hbm.at[c, S - 1 - step, pl.ds(oy8, Hw),
                                  pl.ds(ox4, Ww * 4)]
            src_hi = pairs_hbm.at[c, S - step, pl.ds(oy8, Hw),
                                  pl.ds(ox4, Ww * 4)]
        else:
            src_lo = pairs_hbm.at[S - 1 - step, pl.ds(oy8, Hw),
                                  pl.ds(ox4, Ww * 4)]
            src_hi = pairs_hbm.at[S - step, pl.ds(oy8, Hw),
                                  pl.ds(ox4, Ww * 4)]
        lo = pltpu.make_async_copy(src_lo, win.at[slot, 0], sem.at[slot, 0])
        hi = pltpu.make_async_copy(src_hi, win.at[slot, 1], sem.at[slot, 1])
        return lo, hi

    slot = jax.lax.rem(s, 2)

    @pl.when(s == 0)
    def _():
        lo, hi = win_dmas(s, slot)
        lo.start()
        hi.start()

    @pl.when(s + 1 < S)
    def _():
        lo, hi = win_dmas(s + 1, 1 - slot)
        lo.start()
        hi.start()

    min_x = params_ref[0]
    min_y = params_ref[1]
    sx = params_ref[2]
    sy = params_ref[3]
    z_min = params_ref[4]
    dz_slab = params_ref[5]

    x = scratch[0:1]
    y = scratch[1:2]
    z = scratch[2:3]
    Tx = scratch[3:4]
    Ty = scratch[4:5]
    Tz = scratch[5:6]
    inside = scratch[6:7]

    ks = jnp.float32(S - 1) - s.astype(jnp.float32)
    z_plane = jnp.maximum(z_min + (ks - 0.5) * dz_slab, z_min)
    in_band = (inside > 0.0) & (z > z_plane)
    hstep = -(z - z_plane)

    ox = ox_ref[g, s]
    gx = ox + 16 * oxc_ref[g, s] if two_copy else ox   # GLOBAL origin
    oy = oy_ref[g, s]
    oxf = gx.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    gl_x = jnp.where(gx == 0, 1.0, 0.0)
    gr_x = jnp.where(gx + Ww == W, 1.0, 0.0)
    gl_y = jnp.where(oy == 0, 1.0, 0.0)
    gr_y = jnp.where(oy + Hw == H, 1.0, 0.0)

    # drift-contract check on the step's ENTRY state (stage positions
    # stay within the entry/exit track bounds the plan unioned; the
    # contract-relevant quantity — deviation from the straight track —
    # varies smoothly, so per-step entry sampling bounds it to within
    # one step's micro-voxel drift increment)
    ux0 = 0.5 + (x - min_x) / sx - oxf
    uy0 = 0.5 + (y - min_y) / sy - oyf
    viol_ref[0] = jnp.maximum(
        viol_ref[0],
        _drift_violation(ux0, uy0, gl_x, gr_x, gl_y, gr_y, in_band,
                         Ww=Ww, Hw=Hw, scheme=scheme,
                         padded_x=padded_x, padded_y=padded_y))

    lo_cur, hi_cur = win_dmas(s, slot)
    lo_cur.wait()
    hi_cur.wait()

    def rhs(px, py, tx, ty, tz, z_at):
        uz = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx - oxf
        uy = 0.5 + (py - min_y) / sy - oyf
        wx = _weights_T_win(ux, Ww, scheme, gl_x, gr_x, padded_x)
        wy = _weights_T_win(uy, Hw, scheme, gl_y, gr_y, padded_y)
        dn0 = (((0,), (0,)), ((), ()))   # win (2Hw, Ww*4) x wy (2Hw, B)
        # one full-depth contraction: the (2, Hw, Ww4) buffer reads as
        # (2Hw, Ww4) rows [lo | hi], halving the MXU pass count vs two
        # half-K dots (same MACs, deeper systolic fill)
        wy_cat = jnp.concatenate([wy * (1.0 - uz), wy * uz], axis=0)
        A = _dot_split(win[slot].reshape(2 * Hw, Ww * 4), wy_cat, dn0,
                       passes)
        s4 = jnp.sum(A.reshape(Ww, 4, B) * wx[:, None, :], axis=0)
        gx, gy, gz, nm1 = s4[0:1], s4[1:2], s4[2:3], s4[3:4]
        inv_tz = 1.0 / tz
        gfac = (1.0 + nm1) * inv_tz
        return (tx * inv_tz, ty * inv_tz, gfac * gx, gfac * gy, gfac * gz)

    def rk4_sub(st, hh, z0):
        k1 = rhs(*st, z0)
        h2 = hh / 2.0
        k2 = rhs(*(tuple(v + h2 * k for v, k in zip(st, k1))), z0 + h2)
        k3 = rhs(*(tuple(v + h2 * k for v, k in zip(st, k2))), z0 + h2)
        k4 = rhs(*(tuple(v + hh * k for v, k in zip(st, k3))), z0 + hh)
        s6 = hh / 6.0
        return tuple(v + s6 * (a + 2 * b + 2 * c + dd)
                     for v, a, b, c, dd in zip(st, k1, k2, k3, k4))

    st = (x, y, Tx, Ty, Tz)
    if algorithm == 1:
        k1 = rhs(x, y, Tx, Ty, Tz, z)
        new = tuple(v + hstep * k for v, k in zip(st, k1))
        if traj_ref is not None:
            traj_ref[0, 0] = jnp.concatenate(
                list(st) + [jnp.zeros((3, B), jnp.float32)], axis=0)
    elif substeps == 1:
        if traj_ref is not None:
            h2 = hstep / 2.0
            k1 = rhs(*st, z)
            s2 = tuple(v + h2 * k for v, k in zip(st, k1))
            k2 = rhs(*s2, z + h2)
            s3 = tuple(v + h2 * k for v, k in zip(st, k2))
            k3 = rhs(*s3, z + h2)
            s4v = tuple(v + hstep * k for v, k in zip(st, k3))
            k4 = rhs(*s4v, z + hstep)
            s6 = hstep / 6.0
            new = tuple(v + s6 * (a + 2 * b + 2 * c + dd)
                        for v, a, b, c, dd in zip(st, k1, k2, k3, k4))
            traj_ref[0, 0] = jnp.concatenate(
                list(st) + list(s2) + list(s3) + list(s4v)
                + [jnp.zeros((4, B), jnp.float32)], axis=0)
        else:
            new = rk4_sub(st, hstep, z)
    else:
        hs = hstep / substeps
        new = st
        for si in range(substeps):
            new = rk4_sub(new, hs, z + si * hs)

    sel = in_band
    scratch[0:1] = jnp.where(sel, new[0], x)
    scratch[1:2] = jnp.where(sel, new[1], y)
    scratch[2:3] = jnp.where(sel, jnp.full_like(z, 1.0) * z_plane, z)
    scratch[3:4] = jnp.where(sel, new[2], Tx)
    scratch[4:5] = jnp.where(sel, new[3], Ty)
    scratch[5:6] = jnp.where(sel, new[4], Tz)

    @pl.when(s == S - 1)
    def _():
        out_ref[0] = scratch[:]


def _stack_copies(pairs, two_copy: bool):
    """(D, Hp, Wp*4) -> (2, D, Hp, Wp*4): the natural layout plus its
    16-voxel x-shifted twin (copy-1 element x = base element x+16; the
    64-element tail pad is never read — window DMA offsets into copy 1
    stay 16 voxels short of the edge by construction)."""
    if not two_copy:
        return pairs
    shifted = jnp.pad(pairs[:, :, 64:], ((0, 0), (0, 0), (0, 64)),
                      mode="edge")
    return jnp.stack([pairs, shifted], axis=0)


def _window_call(static, params, ox, oxc, oy, state, pairs,
                 save_traj: bool = False):
    """state: (G, 8, B); pairs: (D, Hp, Wp*4) in ANY/HBM space.

    Returns (out, viol) — plus the (G, S, rows, B) stage residual with
    ``save_traj`` (the windowed backward kernel's linearization points).
    """
    (W, H, S, Ww, Hw, B, scheme, algorithm, substeps, interpret,
     passes, padded_x, padded_y) = static[:13]
    two_copy = bool(static[14])
    G = state.shape[0]
    pairs = _stack_copies(pairs, two_copy)
    kern = functools.partial(
        _window_kernel_traj if save_traj else _window_kernel,
        W=W, H=H, S=S, Ww=Ww, Hw=Hw, B=B, scheme=scheme,
        algorithm=algorithm, substeps=substeps, passes=passes,
        padded_x=padded_x, padded_y=padded_y, two_copy=two_copy)
    out_specs = [pl.BlockSpec((1, 8, B), lambda g, s: (g, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, B), lambda g, s: (g, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((G, 8, B), jnp.float32),
                 jax.ShapeDtypeStruct((G, 1, B), jnp.float32)]
    if save_traj:
        rows = _stage_rows_win(algorithm)
        out_specs.append(pl.BlockSpec((1, 1, rows, B),
                                      lambda g, s: (g, s, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((G, S, rows, B), jnp.float32))
    return pl.pallas_call(
        kern,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, B), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, B), jnp.float32),
                        pltpu.VMEM((2, 2, Hw, Ww * 4), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, ox, oxc, oy, state, pairs)


def _stage_rows_win(algorithm: int) -> int:
    """Sublane rows of the stage-state residual (padded to 8s)."""
    return 8 if algorithm == 1 else 24


# ---------------------------------------------------------------------------
# Backward kernel: reverse slab sweep with windowed field-cotangent RMW
# ---------------------------------------------------------------------------

# rays per backward kernel call: bounds the (G, 8, B) prim/ct VMEM
# register files (march_dense_fused's cap; chunks chain through the
# aliased field-cotangent tensor)
_BWD_WIN_MAX_RAYS = 64 * 1024


def _bwd_window_kernel(params_ref, ox_ref, oxc_ref, oy_ref, out_ref,
                       traj_ref, pairs_hbm, ct_in_ref, ctf_in,
                       dfield_ref, dstate_ref,
                       prim_scratch, ct_scratch, win, ctwin,
                       sem, ctsem, ldsem,
                       *, W: int, H: int, S: int, G: int, Ww: int, Hw: int,
                       B: int, scheme: int, algorithm: int,
                       defect_iters: int, padded_x: bool, padded_y: bool,
                       has_traj: bool, two_copy: bool):
    """One (reversed slab si, ray block g) step of the windowed backward.

    The slab axis is OUTER and reversed (forward step s = S-1-si); two
    (G, 8, B) VMEM register files persist across the sweep: the PRIMAL
    state (streamed stage states when ``has_traj``, else reconstructed
    by reverse re-march like march_dense_fused._bwd_fused_kernel) and
    the cotangent state.

    The field cotangent lives in ``dfield_ref`` — the full (D, Hp, Wp*4)
    HBM tensor, input/output-aliased with ``ctf_in`` (zeros from the
    wrapper, or the running accumulator when ray chunks chain).  Each
    step DMAs its (2, Hw, Ww*4) window of it into ``ctwin``, adds the
    step's local ct_pair, and writes it back: the TPU grid is
    sequential, so overlapping windows of consecutive steps accumulate
    race-free — the write is waited before the NEXT step's read (both
    overlap that step's VJP-chain compute, so the serialization costs
    only the read's ~2 us tail against a ~10 us compute body).
    """
    si = pl.program_id(0)
    g = pl.program_id(1)
    s = S - 1 - si                      # forward step index

    min_x = params_ref[0]
    min_y = params_ref[1]
    sx = params_ref[2]
    sy = params_ref[3]
    z_min = params_ref[4]
    dz_slab = params_ref[5]

    ks = si.astype(jnp.float32)
    z_plane = jnp.maximum(z_min + (ks - 0.5) * dz_slab, z_min)
    plane_prev = z_min + (ks + 0.5) * dz_slab

    @pl.when(si == 0)
    def _():
        ld1 = pltpu.make_async_copy(out_ref.at[g], prim_scratch.at[g],
                                    ldsem)
        ld1.start()
        ld1.wait()
        ld2 = pltpu.make_async_copy(ct_in_ref.at[g], ct_scratch.at[g],
                                    ldsem)
        ld2.start()
        ld2.wait()

    # ---- field window DMA (double-buffered across the g axis) ---------
    # The backward reads the BASE field only (no shifted twin: the one
    # ct tensor cannot have a copy — writes would alias — and the
    # backward is latency-bound, not MXU-bound, so the wider window
    # costs little).  Under two_copy the plan's 16-snapped global
    # origins are covered by re-widening to Wwb = Ww + 32 at the
    # 32-aligned offset min(ox, W - Wwb): [ox32, ox32 + Wwb) always
    # contains [gx, gx + Ww) with the fold rows landing exactly on the
    # global borders, so ALL window-local semantics (weights, folds,
    # ct RMW) work verbatim at (Wwb, ox32).
    Wwb = Ww + 32 if two_copy else Ww

    def bwd_ox(gi, step):
        oxw = ox_ref[gi, step]
        if two_copy:
            oxw = jnp.minimum(oxw, W - Wwb)
        return oxw

    def win_dmas(step, gi, slot):
        oxw = bwd_ox(gi, step)
        oyw = oy_ref[gi, step]
        ox4 = pl.multiple_of(oxw * 4, 128)
        oy8 = pl.multiple_of(oyw, 8)
        lo = pltpu.make_async_copy(
            pairs_hbm.at[S - 1 - step, pl.ds(oy8, Hw),
                         pl.ds(ox4, Wwb * 4)],
            win.at[slot, 0], sem.at[slot, 0])
        hi = pltpu.make_async_copy(
            pairs_hbm.at[S - step, pl.ds(oy8, Hw), pl.ds(ox4, Wwb * 4)],
            win.at[slot, 1], sem.at[slot, 1])
        return lo, hi

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        lo, hi = win_dmas(s, g, slot)
        lo.start()
        hi.start()

    @pl.when(g + 1 < G)
    def _():
        lo, hi = win_dmas(s, g + 1, 1 - slot)
        lo.start()
        hi.start()

    ox = bwd_ox(g, s)                # widened-window global origin
    oy = oy_ref[g, s]
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    gl_x = jnp.where(ox == 0, 1.0, 0.0)
    gr_x = jnp.where(ox + Wwb == W, 1.0, 0.0)
    gl_y = jnp.where(oy == 0, 1.0, 0.0)
    gr_y = jnp.where(oy + Hw == H, 1.0, 0.0)

    prim = prim_scratch[g]
    inside = prim[6:7]
    z0 = prim[7:8]
    z_entry = jnp.minimum(z0, plane_prev)
    in_band = (inside > 0.0) & (z_entry > z_plane)
    h = z_plane - z_entry               # forward hstep (negative)

    ct = ct_scratch[g]
    ct_x, ct_y, ct_z = ct[0:1], ct[1:2], ct[2:3]
    ct_Tx, ct_Ty, ct_Tz = ct[3:4], ct[4:5], ct[5:6]

    zero = jnp.zeros_like(ct_x)
    gate = in_band.astype(jnp.float32)
    d_new = (ct_x * gate, ct_y * gate, ct_Tx * gate, ct_Ty * gate,
             ct_Tz * gate)

    lo_cur, hi_cur = win_dmas(s, g, slot)
    lo_cur.wait()
    hi_cur.wait()
    win2d = win[slot].reshape(2 * Hw, Wwb * 4)

    dn_A = (((0,), (0,)), ((), ()))     # win2d (2Hw, Ww4) x wy (2Hw, B)
    dn_ctp = (((1,), (1,)), ((), ()))   # wy_cat (2Hw, B) x d_A (Ww4, B)
    dn_dwy = (((1,), (0,)), ((), ()))   # win2d (2Hw, Ww4) x d_A (Ww4, B)

    def dot1(a, b, dn):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)

    def add5(a, c, b):
        return tuple(ai + c * bi for ai, bi in zip(a, b))

    def dot5(a, b):
        return sum(ai * bi for ai, bi in zip(a, b))

    def coords(px, py, z_at):
        uz_raw = (z_at - z_plane) / dz_slab
        uz = jnp.clip(uz_raw, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx - oxf
        uy = 0.5 + (py - min_y) / sy - oyf
        return ux, uy, uz, uz_raw

    def rhs(st, z_at):
        """Single-pass window-local stage RHS (gated 1/tz — see
        march_dense_fused._bwd_fused_kernel.rhs for the rationale)."""
        px, py, tx, ty, tz = st
        ux, uy, uz, _ = coords(px, py, z_at)
        wx = _weights_T_win(ux, Wwb, scheme, gl_x, gr_x, padded_x)
        vals = _weights_T_win(uy, Hw, scheme, gl_y, gr_y, padded_y)
        wy_cat = jnp.concatenate([vals * (1.0 - uz), vals * uz], axis=0)
        A = dot1(win2d, wy_cat, dn_A)
        s4c = jnp.sum(A.reshape(Wwb, 4, B) * wx[:, None, :], axis=0)
        gx, gy, gz, nm1 = s4c[0:1], s4c[1:2], s4c[2:3], s4c[3:4]
        inv = jnp.where(in_band, 1.0 / tz, 0.0)
        gfac = (1.0 + nm1) * inv
        return (tx * inv, ty * inv, gfac * gx, gfac * gy, gfac * gz)

    def vjp_stage(st, z_at, d5):
        """One merged sample-recompute + cotangent unit (window-local
        twin of march_dense_fused._bwd_stage_kernel.vjp_stage)."""
        px, py, tx, ty, tz = st
        ux, uy, uz, uz_raw = coords(px, py, z_at)
        wx = _weights_T_win(ux, Wwb, scheme, gl_x, gr_x, padded_x)
        vals = _weights_T_win(uy, Hw, scheme, gl_y, gr_y, padded_y)
        wy_cat = jnp.concatenate([vals * (1.0 - uz), vals * uz], axis=0)
        A_r = dot1(win2d, wy_cat, dn_A).reshape(Wwb, 4, B)
        s4c = jnp.sum(A_r * wx[:, None, :], axis=0)
        gx, gy, gz, nm1 = s4c[0:1], s4c[1:2], s4c[2:3], s4c[3:4]
        inv = jnp.where(in_band, 1.0 / tz, 0.0)
        gfac = (1.0 + nm1) * inv
        k = (tx * inv, ty * inv, gfac * gx, gfac * gy, gfac * gz)

        d0, d1, d2, d3, d4 = d5
        d_gx = d2 * gfac
        d_gy = d3 * gfac
        d_gz = d4 * gfac
        d_gfac = d2 * gx + d3 * gy + d4 * gz
        d_nm1 = d_gfac * inv
        d_inv = d0 * tx + d1 * ty + d_gfac * (1.0 + nm1)
        d_tx = d0 * inv
        d_ty = d1 * inv
        d_tz = -(inv * inv) * d_inv
        d_s4 = jnp.concatenate([d_gx, d_gy, d_gz, d_nm1], axis=0)
        d_A = (wx[:, None, :] * d_s4[None]).reshape(Wwb * 4, B)
        d_wx = jnp.sum(A_r * d_s4[None], axis=1)
        d_ux = jnp.sum(
            d_wx * _weights_T_win_du(ux, Wwb, scheme, gl_x, gr_x,
                                     padded_x),
            axis=0, keepdims=True)
        ct_pair = dot1(wy_cat, d_A, dn_ctp)            # (2Hw, Ww4)
        d_wy_cat = dot1(win2d, d_A, dn_dwy)            # (2Hw, B)
        d_wy = d_wy_cat[:Hw] * (1.0 - uz) + d_wy_cat[Hw:] * uz
        d_uy = jnp.sum(
            d_wy * _weights_T_win_du(uy, Hw, scheme, gl_y, gr_y, padded_y),
            axis=0, keepdims=True)
        d_uz = jnp.sum((d_wy_cat[Hw:] - d_wy_cat[:Hw]) * vals,
                       axis=0, keepdims=True)
        mask = ((uz_raw >= 0.0) & (uz_raw <= 1.0)).astype(jnp.float32)
        d_z_at = d_uz * mask / dz_slab
        d_state = (d_ux / sx, d_uy / sy, d_tx, d_ty, d_tz)
        return d_state, d_z_at, ct_pair, k

    # ---- stage states: streamed residual or reverse reconstruction ----
    if has_traj:
        t = traj_ref[0, 0]
        # gate saved stage states by in_band (out-of-band lanes carry
        # pass-through values computed with UNGATED 1/tz in the forward;
        # the ct_pair contraction sums over the ray axis, so one
        # poisoned lane would NaN the whole field gradient)
        stages = [tuple(jnp.where(in_band, t[5 * i + j:5 * i + j + 1], 0.0)
                        for j in range(5))
                  for i in range(1 if algorithm == 1 else 4)]
        if algorithm == 1:
            s1 = stages[0]
        else:
            s1, s2, s3, s4v = stages
    else:
        x, y = prim[0:1], prim[1:2]
        Tx, Ty, Tz = prim[3:4], prim[4:5], prim[5:6]
        st_exit = (x, y, Tx, Ty, Tz)
        if algorithm == 1:
            # fixed-point inverse of the forward Euler step; on coarse-z
            # anisotropic grids the contraction is slow, so the defect
            # ladder extends the iteration count (measured: tricubic on
            # a 37x-anisotropic grid needs the extra trips for gradient
            # parity with the stage path)
            k_e = rhs(st_exit, z_plane)
            guess = add5(st_exit, -h, k_e)
            for _ in range(2 + 2 * defect_iters):
                k_g = rhs(guess, z_entry)
                guess = add5(st_exit, -h, k_g)
            st_rec = guess
        else:
            def rk4(stv, hh, z_at):
                k1 = rhs(stv, z_at)
                h2 = hh / 2.0
                k2 = rhs(add5(stv, h2, k1), z_at + h2)
                k3 = rhs(add5(stv, h2, k2), z_at + h2)
                k4 = rhs(add5(stv, hh, k3), z_at + hh)
                return tuple(v + hh / 6.0 * (a + 2 * b + 2 * c + d)
                             for v, a, b, c, d in zip(stv, k1, k2, k3, k4))
            st_rec = rk4(st_exit, -h, z_plane)
            for _ in range(defect_iters):
                fwd_rec = rk4(st_rec, h, z_entry)
                st_rec = tuple(e - (f - xv)
                               for e, f, xv in zip(st_rec, fwd_rec,
                                                   st_exit))
        s1 = tuple(jnp.where(in_band, r, v)
                   for r, v in zip(st_rec, st_exit))
        if algorithm != 1:
            h2r = h / 2.0
            k1r = rhs(s1, z_entry)
            s2 = add5(s1, h2r, k1r)
            k2r = rhs(s2, z_entry + h2r)
            s3 = add5(s1, h2r, k2r)
            k3r = rhs(s3, z_entry + h2r)
            s4v = add5(s1, h, k3r)

    # ---- cotangent chain (identical structure to the dense kernels) ---
    if algorithm == 1:
        d_k1 = tuple(h * d for d in d_new)
        v1, d_z1, ctp, k1 = vjp_stage(s1, z_entry, d_k1)
        d_st = add5(d_new, 1.0, v1)
        d_h = dot5(d_new, k1)
        d_z = d_z1 - d_h
    else:
        h2 = h / 2.0
        d_k4 = tuple((h / 6.0) * d for d in d_new)
        v4, d_z4, ctp4, k4 = vjp_stage(s4v, z_entry + h, d_k4)
        d_k3 = add5(tuple((h / 3.0) * d for d in d_new), h, v4)
        v3, d_z3, ctp3, k3 = vjp_stage(s3, z_entry + h2, d_k3)
        d_k2 = add5(tuple((h / 3.0) * d for d in d_new), h2, v3)
        v2, d_z2, ctp2, k2 = vjp_stage(s2, z_entry + h2, d_k2)
        d_k1 = add5(tuple((h / 6.0) * d for d in d_new), h2, v2)
        v1, d_z1, ctp1, k1 = vjp_stage(s1, z_entry, d_k1)

        d_st = add5(add5(add5(add5(d_new, 1.0, v4), 1.0, v3), 1.0, v2),
                    1.0, v1)
        combo = tuple(a + 2.0 * b + 2.0 * c + d
                      for a, b, c, d in zip(k1, k2, k3, k4))
        d_h = (dot5(d_new, combo) / 6.0 + dot5(v4, k3) + d_z4
               + 0.5 * dot5(v3, k2) + 0.5 * d_z3
               + 0.5 * dot5(v2, k1) + 0.5 * d_z2)
        d_z = d_z4 + d_z3 + d_z2 + d_z1 - d_h
        ctp = ctp1 + ctp2 + ctp3 + ctp4

    # ---- RMW the window of the global field cotangent -----------------
    # wait the PREVIOUS step's write before reading the (possibly
    # overlapping) current window; the wait lands after this step's
    # compute, so the in-flight write overlapped it entirely
    @pl.when((si > 0) | (g > 0))
    def _():
        pg = jnp.where(g > 0, g - 1, G - 1)
        psi = jnp.where(g > 0, si, si - 1)
        ps = S - 1 - psi
        pox = pl.multiple_of(bwd_ox(pg, ps) * 4, 128)
        poy = pl.multiple_of(oy_ref[pg, ps], 8)
        w_lo = pltpu.make_async_copy(
            ctwin.at[0], dfield_ref.at[S - 1 - ps, pl.ds(poy, Hw),
                                       pl.ds(pox, Wwb * 4)], ctsem.at[0])
        w_hi = pltpu.make_async_copy(
            ctwin.at[1], dfield_ref.at[S - ps, pl.ds(poy, Hw),
                                       pl.ds(pox, Wwb * 4)], ctsem.at[1])
        w_lo.wait()
        w_hi.wait()

    ox4 = pl.multiple_of(ox * 4, 128)
    oy8 = pl.multiple_of(oy, 8)
    r_lo = pltpu.make_async_copy(
        dfield_ref.at[S - 1 - s, pl.ds(oy8, Hw), pl.ds(ox4, Wwb * 4)],
        ctwin.at[0], ctsem.at[0])
    r_hi = pltpu.make_async_copy(
        dfield_ref.at[S - s, pl.ds(oy8, Hw), pl.ds(ox4, Wwb * 4)],
        ctwin.at[1], ctsem.at[1])
    r_lo.start()
    r_hi.start()
    r_lo.wait()
    r_hi.wait()
    ctp3d = ctp.reshape(2, Hw, Wwb * 4)
    ctwin[0] = ctwin[0] + ctp3d[0]
    ctwin[1] = ctwin[1] + ctp3d[1]
    w_lo = pltpu.make_async_copy(
        ctwin.at[0], dfield_ref.at[S - 1 - s, pl.ds(oy8, Hw),
                                   pl.ds(ox4, Wwb * 4)], ctsem.at[0])
    w_hi = pltpu.make_async_copy(
        ctwin.at[1], dfield_ref.at[S - s, pl.ds(oy8, Hw),
                                   pl.ds(ox4, Wwb * 4)], ctsem.at[1])
    w_lo.start()
    w_hi.start()

    @pl.when((si == S - 1) & (g == G - 1))
    def _():
        w_lo2 = pltpu.make_async_copy(
            ctwin.at[0], dfield_ref.at[S - 1 - s, pl.ds(oy8, Hw),
                                       pl.ds(ox4, Wwb * 4)], ctsem.at[0])
        w_hi2 = pltpu.make_async_copy(
            ctwin.at[1], dfield_ref.at[S - s, pl.ds(oy8, Hw),
                                       pl.ds(ox4, Wwb * 4)], ctsem.at[1])
        w_lo2.wait()
        w_hi2.wait()

    # ---- update the register files ------------------------------------
    sel = in_band
    if not has_traj:
        new_prim = jnp.concatenate([
            s1[0], s1[1], jnp.where(sel, z_entry, prim[2:3]),
            s1[2], s1[3], s1[4], inside, z0], axis=0)
        prim_scratch[g] = new_prim

    new_ct = jnp.concatenate([
        jnp.where(sel, d_st[0], ct_x), jnp.where(sel, d_st[1], ct_y),
        jnp.where(sel, d_z, ct_z), jnp.where(sel, d_st[2], ct_Tx),
        jnp.where(sel, d_st[3], ct_Ty), jnp.where(sel, d_st[4], ct_Tz),
        zero, zero], axis=0)
    ct_scratch[g] = new_ct

    @pl.when(si == S - 1)
    def _():
        stc = pltpu.make_async_copy(ct_scratch.at[g], dstate_ref.at[g],
                                    ldsem)
        stc.start()
        stc.wait()


def _bwd_window_kernel_traj(params_ref, ox_ref, oxc_ref, oy_ref, out_ref,
                            traj_ref, pairs_hbm, ct_in_ref, ctf_in,
                            dfield_ref, dstate_ref, prim_scratch,
                            ct_scratch, win, ctwin, sem, ctsem, ldsem,
                            **kw):
    return _bwd_window_kernel(params_ref, ox_ref, oxc_ref, oy_ref, out_ref,
                              traj_ref, pairs_hbm, ct_in_ref, ctf_in,
                              dfield_ref, dstate_ref, prim_scratch,
                              ct_scratch, win, ctwin, sem, ctsem, ldsem,
                              has_traj=True, **kw)


def _bwd_window_kernel_rec(params_ref, ox_ref, oxc_ref, oy_ref, out_ref,
                           pairs_hbm, ct_in_ref, ctf_in, dfield_ref,
                           dstate_ref, prim_scratch, ct_scratch, win,
                           ctwin, sem, ctsem, ldsem, **kw):
    return _bwd_window_kernel(params_ref, ox_ref, oxc_ref, oy_ref, out_ref,
                              None, pairs_hbm, ct_in_ref, ctf_in,
                              dfield_ref, dstate_ref, prim_scratch,
                              ct_scratch, win, ctwin, sem, ctsem, ldsem,
                              has_traj=False, **kw)


def _bwd_window_call(static, params, ox, oxc, oy, out, traj, pairs,
                     ct_out, ct_field):
    """Run the windowed backward kernel over one ray-block chunk.

    ``ct_field`` is the running field-cotangent accumulator — aliased to
    the ``dfield`` output, so chunked marches chain it without ever
    materializing a second (D, Hp, Wp*4) tensor.  Returns
    (dfield, dstate)."""
    (W, H, S, Ww, Hw, B, scheme, algorithm, substeps, interpret,
     passes, padded_x, padded_y) = static[:13]
    defect_iters = static[13]
    two_copy = bool(static[14])
    G = out.shape[0]
    has_traj = traj is not None
    kw = dict(W=W, H=H, S=S, G=G, Ww=Ww, Hw=Hw, B=B, scheme=scheme,
              algorithm=algorithm, defect_iters=defect_iters,
              padded_x=padded_x, padded_y=padded_y, two_copy=two_copy)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),       # params
        pl.BlockSpec(memory_space=pltpu.SMEM),       # ox
        pl.BlockSpec(memory_space=pltpu.SMEM),       # oxc
        pl.BlockSpec(memory_space=pltpu.SMEM),       # oy
        pl.BlockSpec(memory_space=pl.ANY),           # out (exit states)
    ]
    args = [params, ox, oxc, oy, out]
    if has_traj:
        rows = _stage_rows_win(algorithm)
        in_specs.append(
            pl.BlockSpec((1, 1, rows, B), lambda si, g: (g, S - 1 - si,
                                                         0, 0),
                         memory_space=pltpu.VMEM))
        args.append(traj)
        kern = functools.partial(_bwd_window_kernel_traj, **kw)
    else:
        kern = functools.partial(_bwd_window_kernel_rec, **kw)
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),           # pairs (field)
        pl.BlockSpec(memory_space=pl.ANY),           # ct_out
        pl.BlockSpec(memory_space=pl.ANY),           # ct_field (aliased)
    ]
    args += [pairs, ct_out, ct_field]
    n_in = len(args)
    Wwb = Ww + 32 if two_copy else Ww
    dfield, dstate = pl.pallas_call(
        kern,
        grid=(S, G),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(ct_field.shape, jnp.float32),
            jax.ShapeDtypeStruct((G, 8, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.VMEM((2, 2, Hw, Wwb * 4), jnp.float32),
                        pltpu.VMEM((2, Hw, Wwb * 4), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
        input_output_aliases={n_in - 1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dfield, dstate


def _bwd_window_eligible(static) -> bool:
    algorithm, substeps = static[7], static[8]
    return algorithm in (1, 2) and substeps == 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _window_march(static, params, ox, oxc, oy, state, pairs):
    out, viol = _window_call(static, params, ox, oxc, oy, state, pairs)
    return out, viol


def _win_traj_max_bytes() -> int:
    """Stage-residual budget for the WINDOWED march (trace-time env).

    Defaults higher than the dense march's (6 GB vs 2 GB): the windowed
    case IS the large-volume case, where the residual (e.g. 5.9 GB for
    120k chiefs x 511 slabs) plus the base field and the ct tensor
    still fit a 16 GB chip and buy a ~2x faster backward than the
    reverse-re-march reconstruction (4 VJP units/step vs 11)."""
    import os
    return int(os.environ.get("PHOTON_TRAJ_MAX_BYTES", 6 << 30))


def _window_march_fwd(static, params, ox, oxc, oy, state, pairs):
    S, B, algorithm = static[2], static[5], static[7]
    G = state.shape[0]
    if _bwd_window_eligible(static):
        traj_bytes = G * S * _stage_rows_win(algorithm) * B * 4
        if traj_bytes <= _win_traj_max_bytes():
            out, viol, traj = _window_call(static, params, ox, oxc, oy,
                                           state, pairs, save_traj=True)
            return (out, viol), (params, ox, oxc, oy, out, pairs, traj)
    out, viol = _window_call(static, params, ox, oxc, oy, state, pairs)
    return (out, viol), (params, ox, oxc, oy, out, pairs, None)


def _window_march_bwd(static, res, cts):
    """Backward dispatch: the stage cotangent sweep over saved per-stage
    states when the residual fit the PHOTON_TRAJ_MAX_BYTES budget, else
    the reverse-re-march reconstruction — both through the same
    windowed RMW kernel.  The drift-violation output is a diagnostic
    (zero cotangent)."""
    ct_out, _ct_viol = cts
    params, ox, oxc, oy, out, pairs, traj = res
    if not _bwd_window_eligible(static):
        raise NotImplementedError(
            "windowed march gradients support Euler/RK4 with substeps=1; "
            "for substep marches route gradients through the exact/tube "
            "path (dense_march=False)")
    B = static[5]
    G = out.shape[0]
    max_g = max(1, _BWD_WIN_MAX_RAYS // B)
    ct_field = jnp.zeros_like(pairs)
    d_states = []
    for i in range(0, G, max_g):
        tr = None if traj is None else traj[i:i + max_g]
        ct_field, ds = _bwd_window_call(
            static, params, ox[i:i + max_g], oxc[i:i + max_g],
            oy[i:i + max_g], out[i:i + max_g], tr, pairs,
            ct_out[i:i + max_g], ct_field)
        d_states.append(ds)
    d_state = (d_states[0] if len(d_states) == 1
               else jnp.concatenate(d_states, axis=0))
    zi = functools.partial(np.zeros, dtype=jax.dtypes.float0)
    return (jnp.zeros_like(params), zi(ox.shape), zi(oxc.shape),
            zi(oy.shape), d_state, ct_field)


_window_march.defvjp(_window_march_fwd, _window_march_bwd)


def march_chief_windowed(vol, plan: WindowPlan, xs, ys, zs, dcx, dcy, dcz,
                         *, algorithm: int = 2,
                         interpolation_scheme: int = 1,
                         substeps=None, interpret=None,
                         passes: int = 2, return_violations: bool = False):
    """Windowed twin of march_dense_fused.march_chief_fused.

    ``plan`` comes from :func:`plan_windows` on the SAME (host) chief
    states.  Same contract: (P,) chief states in, post-traversal
    (x, y, z, dirx, diry, dirz) out; rays missing the volume pass
    through unchanged.  Differentiable for Euler/RK4 (substeps=1) via
    the windowed backward kernel (see module docstring).

    ``return_violations``: also return a (P,) 0/1 array flagging rays
    that drifted beyond the plan's margin (their samples clamped to a
    non-border window edge and are WRONG — the drift contract's runtime
    enforcement; see _drift_violation).
    """
    from photon_tpu.ops.march_dense import bspline_prefilter_jax

    w, h, d = (int(s) for s in vol.sizes)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    field = vol.field
    if interpolation_scheme == 2:
        field = bspline_prefilter_jax(field)

    sx = (vol.max_bound[0] - vol.min_bound[0]) / (w - 2.0)
    sy = (vol.max_bound[1] - vol.min_bound[1]) / (h - 2.0)
    z_max = vol.max_bound[2]
    z_min = vol.min_bound[2]
    dz_slab = (z_max - z_min) / (d - 2.0)

    t_entry = (z_max - zs) / dcz
    above = zs >= z_max
    adv = jnp.where(above, jnp.maximum(t_entry, 0.0), 0.0)
    x = xs + dcx * adv
    y = ys + dcy * adv
    z = jnp.where(above, jnp.full_like(zs, 1.0) * z_max, zs + dcz * adv)
    inside = (z <= z_max) & (z >= z_min) & (dcz < 0)

    n0 = 1.0 + vol.data_min
    Tx = n0 * dcx
    Ty = n0 * dcy
    Tz = n0 * dcz

    perm = jnp.asarray(plan.perm)
    vmask = jnp.asarray(plan.valid)
    G = plan.ox.shape[0]
    B = plan.perm.shape[0] // G

    def blocked(a, fill=0.0):
        a = jnp.where(vmask, a.astype(jnp.float32)[perm],
                      jnp.float32(fill))
        return a

    state = jnp.stack([
        blocked(x), blocked(y), blocked(z), blocked(Tx), blocked(Ty),
        blocked(Tz, -1.0), blocked(inside.astype(jnp.float32)),
        blocked(z)], axis=0)
    state = jnp.transpose(state.reshape(8, G, B), (1, 0, 2))

    params = jnp.stack([
        jnp.float32(vol.min_bound[0]), jnp.float32(vol.min_bound[1]),
        jnp.float32(sx), jnp.float32(sy), jnp.float32(z_min),
        jnp.float32(dz_slab), jnp.float32(0.0), jnp.float32(0.0)])

    # non-tile-multiple lateral dims: border-replicate up to the DMA
    # granularity (the plan was built against the same padded dims)
    w_pad, h_pad = _padded_dims(w, h)
    if (w_pad, h_pad) != (w, h):
        field = jnp.pad(field, ((0, 0), (0, h_pad - h), (0, w_pad - w),
                                (0, 0)), mode="edge")
    field_hbm = field.reshape(field.shape[0], h_pad, w_pad * 4)
    if substeps is None:
        substeps = 2 if algorithm == 3 else 1
    substeps = max(1, int(substeps))
    # backward-reconstruction defect iterations for the reverse-re-march
    # fallback, from the grid's static z/lateral anisotropy
    # (march_dense_fused.march_chief_fused's ladder)
    try:
        ratio = float(dz_slab) / max(min(float(sx), float(sy)), 1e-30)
        defect_iters = 0 if ratio <= 4.0 else (1 if ratio <= 16.0 else 3)
    except jax.errors.ConcretizationTypeError:
        defect_iters = 3
    static = (w_pad, h_pad, d - 1, int(plan.win_w), int(plan.win_h),
              int(B), int(interpolation_scheme), int(algorithm), substeps,
              bool(interpret), int(passes), w_pad != w, h_pad != h,
              defect_iters, bool(plan.two_copy))

    out, viol = _window_march(static, params, jnp.asarray(plan.ox),
                              jnp.asarray(plan.oxc),
                              jnp.asarray(plan.oy), state, field_hbm)
    rows = jnp.transpose(out, (1, 0, 2)).reshape(8, G * B)

    # unsort: scatter each slot's result back to its ray (padded slots
    # target index P and are dropped — their perm entry aliases ray 0)
    P = xs.shape[0]
    scatter_idx = jnp.where(vmask, perm, P)
    res = [jnp.zeros((P,), jnp.float32).at[scatter_idx].set(
        rows[i], mode="drop") for i in range(6)]
    x, y, z, Tx, Ty, Tz = res

    Tn = jnp.sqrt(Tx * Tx + Ty * Ty + Tz * Tz)
    dirx_f = jnp.where(inside, Tx / Tn, dcx)
    diry_f = jnp.where(inside, Ty / Tn, dcy)
    dirz_f = jnp.where(inside, Tz / Tn, dcz)
    result = (x, y, z, dirx_f, diry_f, dirz_f)
    if return_violations:
        vrow = viol.reshape(G * B)
        viol_p = jnp.zeros((P,), jnp.float32).at[scatter_idx].set(
            vrow, mode="drop")
        result = result + (viol_p,)
    return result


def chief_deltas_windowed(vol, plan, xs, ys, zs, dcx, dcy, dcz, *,
                          algorithm: int = 2, interpolation_scheme: int = 1,
                          substeps=None, passes: int = 2,
                          return_violations: bool = False):
    """Windowed twin of march_dense.chief_deltas_dense."""
    out = march_chief_windowed(
        vol, plan, xs, ys, zs, dcx, dcy, dcz, algorithm=algorithm,
        interpolation_scheme=interpolation_scheme, substeps=substeps,
        passes=passes, return_violations=return_violations)
    x1, y1, z1, dx1, dy1, dz1 = out[:6]
    t = (z1 - zs) / dcz
    deltas = (z1, x1 - (xs + dcx * t), y1 - (ys + dcy * t),
              dx1 - dcx, dy1 - dcy, dz1 - dcz)
    if return_violations:
        return deltas + (out[6],)
    return deltas
