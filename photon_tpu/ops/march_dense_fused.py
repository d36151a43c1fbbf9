"""Whole-march fused Pallas kernel for the dense chief-ray march.

ops.march_dense drives the z-slab scan from XLA, calling the per-stage
sampler kernel (ops.march_dense_pallas) 4x per slab (RK4) — ~250 kernel
launches per march, with the RK4 combine and the (P,) glue arithmetic
bouncing through HBM between launches.  This module fuses the ENTIRE
march — all slabs x all integrator stages — into ONE ``pallas_call``:

* grid = (ray blocks, slabs); the slab axis iterates fastest, so each
  ray block's state (x, y, z, T) lives in a VMEM scratch register file
  across the whole traversal — zero HBM traffic for the integrator
  state, one (8, B) read at entry and one write at exit per block.
* slab pairs stream in as scanned blocks (the (g, s) index map re-DMAs
  each pair per ray block; a 64^3 pair is 128 KB — ~1 ms of DMA for the
  whole BOS bench march, fully overlapped by Mosaic's double buffering).
* the two half-depth interpolation matmuls of the per-stage kernel
  (lo @ wy0 + hi @ wy1, each K = H) pack into ONE full-depth MXU
  contraction: pair (W*4, 2H) @ wy_cat (2H, B) with the contraction
  axis packed [lo | hi].  For the 64^3
  sample volume 2H = 128 exactly fills the systolic depth — twice the
  MXU utilization of the per-stage kernel.
* the RK4/Euler combine runs on (1, B) rows in VMEM (VPU), not XLA.

Weight construction, clip/fold edge semantics, and the 3-pass bf16-split
matmul (march_dense_pallas._dot3) are bit-identical to the per-stage
kernel, so the fused march matches march_chief_dense to float rounding;
tests drive both (tests/test_dense_fused.py).

Backward: a hand-written transpose kernel with RECOMPUTE-IN-BACKWARD —
the march is z-reversible, so instead of saving the (G, S, 8, B)
per-step trajectory (round-3 design: a ~200 MB HBM round-trip at bench
scale) the backward kernel reconstructs each step's entry state by
reverse-integrating the SAME RK4/Euler step from the exit state inside
the VMEM register file, then replays the forward stages and their
cotangents.  The reconstruction runs reverse-RK4 plus
anisotropy-gated defect corrections against the discrete forward map
(Euler: a 3-eval fixed-point inverse), driving the error far below the
march's own discretization error; gradient parity vs the per-stage
autodiff path is tested to ~1e-4 normalized on fine grids and ~5e-4 on
adversarial coarse-z random fields.  Backward matmuls run single-pass bf16 (the
linearization point moves by ~1e-7 voxel, far below weight curvature).

Supported: algorithms 1 (Euler), 2 (RK4), 3 (RK4 x substeps; default 2),
schemes 1 (trilinear) / 2 (tricubic B-spline over prefiltered
coefficients).  AB4 (algorithm 4) keeps the per-stage path (its
derivative history would add 15 scratch rows for a rarely-used
integrator); algorithm 3's backward recomputes through the per-stage
path.

Reference parity: this is the production evaluation of the eikonal
marcher C13 (SURVEY.md; trace_rays_through_density_gradients.h:1455-1544)
for slabs that fit VMEM; routing in models.render_fast.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from photon_tpu.ops.march_dense_pallas import (_dot3, _dot_split,
                                               _weights_T, _weights_T_du)


def _fwd_passes() -> int:
    """bf16-split pass count of the forward contraction (trace-time).

    Default 2 = the field-corrected split (a_hi @ b_hi + a_lo @ b_hi)
    the windowed march A/B'd: the split error lives in the FIELD
    operand's low bits, so dropping the weight-correction pass keeps
    the end-of-march deflection error ~1e-4 relative (vs ~1e-5 at 3,
    ~2e-3 at 1) while cutting the dominant MXU cost by a third —
    measured 85 -> 64 ms on the bench march.  PHOTON_MARCH_PASSES=3
    restores the round-3/4 near-f32 kernel (tests pin it for
    bit-parity assertions)."""
    return int(os.environ.get("PHOTON_MARCH_PASSES", 2))

# rays per block (lane-major rows).  Smaller blocks at larger slabs keep
# the backward kernel's per-stage VJP transients (A_r, d_A, weight
# matrices — all (·, B)) inside the 16 MB VMEM budget.
_B_FOR_SLAB = ((64 * 64, 1024), (128 * 128, 512), (256 * 256, 256))

# the fused backward holds two (G, 8, B) scratch register files (primal
# state + cotangent state); cap rays per kernel call so they stay ~4 MB
_BWD_MAX_RAYS = 64 * 1024

# slab-area ceiling for the fused backward kernel (beyond it gradients
# route through the windowed march in production).  TPU-validated at
# every forward tier: 64x64 @ B=1024, 128x128 @ B=512, and (round 5)
# 256x256 @ B=256 — 73 ms stage / ~130 ms recompute for 32k chiefs x
# 9 slabs on v5e, stage-vs-recompute gradient cosine 0.99999.
_BWD_FUSED_MAX_SLAB = 256 * 256


def block_size_for_slab(wh: int) -> int:
    for cap, b in _B_FOR_SLAB:
        if wh <= cap:
            return b
    return 256


# backward ray-block sizes — CURRENTLY EQUAL to the forward's table
# (the raised per-kernel vmem_limit_bytes fits the backward at the
# forward's B, and per-step time is dependency-chain-bound, so larger
# blocks divide wall time).  The table is kept separate because the
# reblock machinery in _fused_march_bwd lets the backward drop to a
# smaller B than the forward if its VMEM footprint ever outgrows the
# budget again (exercised by test_fused_bwd_reblock_path).
_BWD_B_FOR_SLAB = ((64 * 64, 1024), (128 * 128, 512), (256 * 256, 256))


def bwd_block_size_for_slab(wh: int) -> int:
    """Backward ray-block size (see the table note above)."""
    for cap, b in _BWD_B_FOR_SLAB:
        if wh <= cap:
            return b
    return 128


# ---------------------------------------------------------------------------
# Interleaved z-blended y-weight rows
# ---------------------------------------------------------------------------


def _weights_zT(u_row, uz, n: int, scheme: int, kind: str = "w"):
    """(2n, B) z-blended weight rows [lo | hi] from (1, B) coordinates.

    Rows [0, n) hold k(u - h) * (1 - uz) (lo slab), rows [n, 2n) hold
    k(u - h) * uz (hi slab) — matching the packed pair layout of
    :func:`pairs_packed`.  kind: 'w' the weights themselves, 'du' their
    derivative w.r.t. u, 'dz' their derivative w.r.t. uz.  The axis
    kernel is evaluated on (n, B) rows ONCE and only the cheap z-factor
    products run at (2n, B) — an interleaved row layout was measured to
    double the backward kernel's VPU time (it evaluates the kernel
    polynomial on duplicated rows).
    """
    if kind == "du":
        wy = _weights_T_du(u_row, n, scheme)
    else:
        wy = _weights_T(u_row, n, scheme)
    if kind == "dz":
        return jnp.concatenate([-wy, wy], axis=0)
    return jnp.concatenate([wy * (1.0 - uz), wy * uz], axis=0)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fused_kernel(params_ref, state_ref, pair_ref, out_ref, scratch,
                  *, W: int, H: int, S: int, B: int, scheme: int,
                  algorithm: int, substeps: int, passes: int):
    return _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref,
                              None, scratch, W=W, H=H, S=S, B=B,
                              scheme=scheme, algorithm=algorithm,
                              substeps=substeps, passes=passes)


def _fused_kernel_traj(params_ref, state_ref, pair_ref, out_ref, traj_ref,
                       scratch, *, W: int, H: int, S: int, B: int,
                       scheme: int, algorithm: int, substeps: int,
                       passes: int):
    return _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref,
                              traj_ref, scratch, W=W, H=H, S=S, B=B,
                              scheme=scheme, algorithm=algorithm,
                              substeps=substeps, passes=passes)


def _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref, traj_ref,
                       scratch, *, W: int, H: int, S: int, B: int,
                       scheme: int, algorithm: int, substeps: int,
                       passes: int):
    """One (ray block g, slab s) grid step of the fused march.

    params_ref (SMEM, (8,)): min_x, min_y, sx, sy, z_min, dz_slab.
    state_ref / out_ref: (1, 8, B) rows
      [x, y, z, Tx, Ty, Tz, inside, z0] (z0 = entry z, carried through
      unchanged — the backward kernel's analytic z reconstruction).
    pair_ref: (W*4, 2H) — slab pair s in the packed-K [lo | hi] layout.
    scratch: (8, B) VMEM register file persisting across the slab axis.
    traj_ref: optional per-(g, s) STAGE-STATE output — the residual the
      stage backward kernel linearizes at.  Rows 5i..5i+5 hold the
      (x, y, Tx, Ty, Tz) input state of RK4 stage i (just s1 for
      Euler), padded to a multiple of 8 sublanes.  At 32 B x stages per
      ray x slab this streams at HBM speed fully overlapped (measured
      free); the alternative reverse re-march reconstruction lengthens
      the backward's per-step dependency chain by 50% and measured ~2x
      slower end to end (see _bwd_fused_kernel).
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        scratch[:] = state_ref[0]

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

    # landing plane for slab step s (top-down; final plane clamps to the
    # reference's inside_box domain — see march_dense for the derivation)
    ks = jnp.float32(S - 1) - s.astype(jnp.float32)
    z_plane = jnp.maximum(z_min + (ks - 0.5) * dz_slab, z_min)

    in_band = (inside > 0.0) & (z > z_plane)
    hstep = -(z - z_plane)

    def rhs(px, py, tx, ty, tz, z_at):
        uz = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)   # (1, B)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)                        # (W, B)
        wy_cat = _weights_zT(uy, uz, H, scheme)               # (2H, B)
        dn = (((1,), (0,)), ((), ()))
        A = _dot_split(pair_ref[0], wy_cat, dn, passes)       # (W*4, B)
        s4 = jnp.sum(A.reshape(W, 4, B) * wx[:, None, :], axis=0)
        gx, gy, gz, nm1 = s4[0:1], s4[1:2], s4[2:3], s4[3:4]
        inv_tz = 1.0 / tz
        g = (1.0 + nm1) * inv_tz
        return (tx * inv_tz, ty * inv_tz, g * gx, g * gy, g * gz)

    def rk4_sub(st, h, z0):
        px, py, tx, ty, tz = st
        k1 = rhs(px, py, tx, ty, tz, z0)
        h2 = h / 2.0
        k2 = rhs(px + h2 * k1[0], py + h2 * k1[1], tx + h2 * k1[2],
                 ty + h2 * k1[3], tz + h2 * k1[4], z0 + h2)
        k3 = rhs(px + h2 * k2[0], py + h2 * k2[1], tx + h2 * k2[2],
                 ty + h2 * k2[3], tz + h2 * k2[4], z0 + h2)
        k4 = rhs(px + h * k3[0], py + h * k3[1], tx + h * k3[2],
                 ty + h * k3[3], tz + h * k3[4], z0 + h)
        s6 = h / 6.0
        return tuple(v + s6 * (a + 2 * b + 2 * c + d)
                     for v, a, b, c, d in zip(st, k1, k2, k3, k4))

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
            s4 = tuple(v + hstep * k for v, k in zip(st, k3))
            k4 = rhs(*s4, z + hstep)
            s6 = hstep / 6.0
            new = tuple(v + s6 * (a + 2 * b + 2 * c + d)
                        for v, a, b, c, d in zip(st, k1, k2, k3, k4))
            traj_ref[0, 0] = jnp.concatenate(
                list(st) + list(s2) + list(s3) + list(s4)
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


def _stage_rows(algorithm: int) -> int:
    """Sublane rows of the stage-state residual (padded to 8s)."""
    return 8 if algorithm == 1 else 24


def _fused_call(static, params, state, pairs, save_traj: bool = False):
    """state: (G, 8, B); pairs: (S, W*4, 2H); params: (8,) f32.

    With ``save_traj`` also returns the (G, S, rows, B) per-step STAGE
    states (the stage backward kernel's residual)."""
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    G = state.shape[0]
    kern = functools.partial(
        _fused_kernel_traj if save_traj else _fused_kernel,
        W=W, H=H, S=S, B=B, scheme=scheme,
        algorithm=algorithm, substeps=substeps,
        passes=int(static[9]) if len(static) > 9 else _fwd_passes())
    out_specs = pl.BlockSpec((1, 8, B), lambda g, s: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((G, 8, B), jnp.float32)
    if save_traj:
        rows = _stage_rows(algorithm)
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, rows, B),
                                  lambda g, s: (g, s, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((G, S, rows, B), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, B), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * 4, 2 * H), lambda g, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, state, pairs)


# ---------------------------------------------------------------------------
# Fused backward kernel: reverse re-march + hand-written RK4/Euler transpose
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(params_ref, out_ref, pair_ref, ct_in_ref,
                      dpair_ref, dstate_ref, prim_scratch, ct_scratch, sem,
                      *, W: int, H: int, S: int, G: int, B: int,
                      scheme: int, algorithm: int, defect_iters: int):
    """One (reversed slab si, ray block g) step of the fused backward.

    Grid is (S, G) with the slab axis OUTER (reversed: forward step
    s = S-1-si) so the d_pair output block for step s stays resident in
    VMEM while the inner g loop accumulates every ray block's
    contribution.  Two (G, 8, B) VMEM register files persist across the
    whole sweep (leading-dim dynamic indexing — tile-aligned address
    arithmetic, unlike a dynamic sublane offset into a (G*8, B)
    layout): the PRIMAL state (reverse-reconstructed, walking the
    march backward from its saved exit state) and the cotangent state.

    out_ref / ct_in_ref / dstate_ref live in ANY (HBM) space and are
    touched only by explicit DMA at the sweep edges — a BlockSpec'd
    input would re-fetch each (8, B) block every slab, which is exactly
    the (G, S, 8, B) residual traffic this design removes.

    Gradients w.r.t. the geometry scalars in params are NOT produced
    (zeros) — volume bounds are never optimization variables here.
    """
    si = pl.program_id(0)
    g = pl.program_id(1)

    min_x = params_ref[0]
    min_y = params_ref[1]
    sx = params_ref[2]
    sy = params_ref[3]
    z_min = params_ref[4]
    dz_slab = params_ref[5]

    # forward step s = S-1-si lands on plane index ks = si
    ks = si.astype(jnp.float32)
    z_plane = jnp.maximum(z_min + (ks - 0.5) * dz_slab, z_min)
    # the previous landing plane (entry ceiling); for the first forward
    # step (si = S-1) this sits half a voxel above z_max, so the min()
    # with z0 below needs no special case
    plane_prev = z_min + (ks + 0.5) * dz_slab

    @pl.when(si == 0)
    def _():
        ld1 = pltpu.make_async_copy(out_ref.at[g],
                                    prim_scratch.at[g], sem)
        ld1.start()
        ld1.wait()
        ld2 = pltpu.make_async_copy(ct_in_ref.at[g],
                                    ct_scratch.at[g], sem)
        ld2.start()
        ld2.wait()

    @pl.when(g == 0)
    def _():
        dpair_ref[:] = jnp.zeros_like(dpair_ref)

    prim = prim_scratch[g]                 # (8, B) exit state of step s
    x, y = prim[0:1], prim[1:2]
    Tx, Ty, Tz = prim[3:4], prim[4:5], prim[5:6]
    inside = prim[6:7]
    z0 = prim[7:8]                         # march entry z (invariant row)
    z_entry = jnp.minimum(z0, plane_prev)
    in_band = (inside > 0.0) & (z_entry > z_plane)
    h = z_plane - z_entry                  # forward hstep (negative)

    ct = ct_scratch[g]                     # (8, B)
    ct_x, ct_y, ct_z = ct[0:1], ct[1:2], ct[2:3]
    ct_Tx, ct_Ty, ct_Tz = ct[3:4], ct[4:5], ct[5:6]

    zero = jnp.zeros_like(x)
    gate = in_band.astype(jnp.float32)
    d_new = (ct_x * gate, ct_y * gate, ct_Tx * gate, ct_Ty * gate,
             ct_Tz * gate)

    dn_fwd = (((1,), (0,)), ((), ()))      # pair (W4, 2H) @ (2H, B)
    dn_ctp = (((1,), (1,)), ((), ()))      # d_A (W4, B) x wy_cat (2H, B)
    dn_dwy = (((0,), (0,)), ((), ()))      # pair (W4, 2H) x d_A (W4, B)

    def dot1(a, b, dn):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)

    def rhs(px, py, tx, ty, tz, z_at):
        """Single-pass stage RHS used for the reverse reconstruction and
        the forward-stage replay.  1/tz is gated so out-of-band rays
        (whose register rows may hold pass-through states with tz ~ 0)
        cannot poison the shared matmul inputs with inf/NaN."""
        uz = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)
        wy_cat = _weights_zT(uy, uz, H, scheme)
        A = dot1(pair_ref[0], wy_cat, dn_fwd)
        s4 = jnp.sum(A.reshape(W, 4, B) * wx[:, None, :], axis=0)
        gx, gy, gz, nm1 = s4[0:1], s4[1:2], s4[2:3], s4[3:4]
        inv = jnp.where(in_band, 1.0 / tz, 0.0)
        gfac = (1.0 + nm1) * inv
        k = (tx * inv, ty * inv, gfac * gx, gfac * gy, gfac * gz)
        return k, (gx, gy, gz, nm1, inv, gfac)

    def add5(a, c, b):
        return tuple(ai + c * bi for ai, bi in zip(a, b))

    def dot5(a, b):
        return sum(ai * bi for ai, bi in zip(a, b))

    def rk4(st, hh, z_at):
        k1, _ = rhs(*st, z_at)
        h2 = hh / 2.0
        k2, _ = rhs(*add5(st, h2, k1), z_at + h2)
        k3, _ = rhs(*add5(st, h2, k2), z_at + h2)
        k4, _ = rhs(*add5(st, hh, k3), z_at + hh)
        return tuple(v + hh / 6.0 * (a + 2 * b + 2 * c + d)
                     for v, a, b, c, d in zip(st, k1, k2, k3, k4))

    # ---- reverse reconstruction: exit state -> entry state ------------
    st_exit = (x, y, Tx, Ty, Tz)
    if algorithm == 1:
        # 3-iteration fixed-point inverse of the forward Euler step
        # (entry = exit - h k(entry)): O(h^4) local error, well below
        # the forward Euler's own O(h^2)
        k_e, _ = rhs(*st_exit, z_plane)
        guess = add5(st_exit, -h, k_e)
        for _ in range(2):
            k_g, _ = rhs(*guess, z_entry)
            guess = add5(st_exit, -h, k_g)
        st_rec = guess
    else:
        # reverse RK4 (step -h from the landing plane), then
        # ``defect_iters`` defect corrections against the DISCRETE
        # forward map (e <- e - (F(e) - exit)): each contracts toward
        # the exact forward-step preimage, killing both the reverse
        # truncation AND the forward map's own O(h^5) flow deviation.
        # The count is chosen statically from the grid's z/lateral
        # anisotropy (march_chief_fused): fine-z grids (the 64^3 bench:
        # ratio 1.7) measure ~5e-7 normalized gradient error with 0
        # iterations, while a 5-slab grid spanning ~60 lateral voxels
        # per step needs 3 (1.2e-2 -> 8e-4 measured on white-noise rho)
        st_rec = rk4(st_exit, -h, z_plane)
        for _ in range(defect_iters):
            fwd_rec = rk4(st_rec, h, z_entry)
            st_rec = tuple(e - (f - x)
                           for e, f, x in zip(st_rec, fwd_rec, st_exit))
    s1 = tuple(jnp.where(in_band, r, v)
               for r, v in zip(st_rec, st_exit))

    # ---- replay the forward stages from the reconstructed entry -------
    def vjp_f(st, z_at, cache, d5):
        """Cotangents of one stage sample; recomputes the weight
        matrices and the contraction in place (keeping 4 stages of
        (W, B)/(2H, B) matrices live was a measured VMEM OOM)."""
        px, py, tx, ty, tz = st
        gx, gy, gz, nm1, inv, gfac = cache
        uz_raw = (z_at - z_plane) / dz_slab
        uz = jnp.clip(uz_raw, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)
        vals = _weights_T(uy, H, scheme)               # (H, B)
        wy_cat = jnp.concatenate([vals * (1.0 - uz), vals * uz], axis=0)
        A_r = dot1(pair_ref[0], wy_cat, dn_fwd).reshape(W, 4, B)
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
        d_s4 = jnp.concatenate([d_gx, d_gy, d_gz, d_nm1], axis=0)  # (4, B)
        d_A = (wx[:, None, :] * d_s4[None]).reshape(W * 4, B)
        d_wx = jnp.sum(A_r * d_s4[None], axis=1)          # (W, B)
        d_ux = jnp.sum(d_wx * _weights_T_du(ux, W, scheme),
                       axis=0, keepdims=True)
        ct_pair = dot1(d_A, wy_cat, dn_ctp)
        d_wy_cat = dot1(pair_ref[0], d_A, dn_dwy)          # (2H, B)
        d_wy = d_wy_cat[:H] * (1.0 - uz) + d_wy_cat[H:] * uz
        d_uy = jnp.sum(d_wy * _weights_T_du(uy, H, scheme),
                       axis=0, keepdims=True)
        d_uz = jnp.sum((d_wy_cat[H:] - d_wy_cat[:H]) * vals,
                       axis=0, keepdims=True)
        mask = ((uz_raw >= 0.0) & (uz_raw <= 1.0)).astype(jnp.float32)
        d_z_at = d_uz * mask / dz_slab
        d_state = (d_ux / sx, d_uy / sy, d_tx, d_ty, d_tz)
        return d_state, d_z_at, ct_pair

    if algorithm == 1:
        k1, c1 = rhs(*s1, z_entry)
        d_st = d_new
        d_h = dot5(d_new, k1)
        d_k1 = tuple(h * d for d in d_new)
        v1, d_z1, ctp = vjp_f(s1, z_entry, c1, d_k1)
        d_st = add5(d_st, 1.0, v1)
        d_z = d_z1 - d_h
    else:
        h2 = h / 2.0
        k1, c1 = rhs(*s1, z_entry)
        s2 = add5(s1, h2, k1)
        k2, c2 = rhs(*s2, z_entry + h2)
        s3 = add5(s1, h2, k2)
        k3, c3 = rhs(*s3, z_entry + h2)
        s4 = add5(s1, h, k3)
        k4, c4 = rhs(*s4, z_entry + h)

        combo = tuple(a + 2.0 * b + 2.0 * c + d
                      for a, b, c, d in zip(k1, k2, k3, k4))
        d_st = d_new
        d_h = dot5(d_new, combo) / 6.0
        d_z = zero

        d_k4 = tuple((h / 6.0) * d for d in d_new)
        v4, d_z4, ctp4 = vjp_f(s4, z_entry + h, c4, d_k4)
        d_st = add5(d_st, 1.0, v4)
        d_h = d_h + dot5(v4, k3) + d_z4
        d_z = d_z + d_z4
        d_k3 = add5(tuple((h / 3.0) * d for d in d_new), h, v4)

        v3, d_z3, ctp3 = vjp_f(s3, z_entry + h2, c3, d_k3)
        d_st = add5(d_st, 1.0, v3)
        d_h = d_h + 0.5 * dot5(v3, k2) + 0.5 * d_z3
        d_z = d_z + d_z3
        d_k2 = add5(tuple((h / 3.0) * d for d in d_new), h2, v3)

        v2, d_z2, ctp2 = vjp_f(s2, z_entry + h2, c2, d_k2)
        d_st = add5(d_st, 1.0, v2)
        d_h = d_h + 0.5 * dot5(v2, k1) + 0.5 * d_z2
        d_z = d_z + d_z2
        d_k1 = add5(tuple((h / 6.0) * d for d in d_new), h2, v2)

        v1, d_z1, ctp1 = vjp_f(s1, z_entry, c1, d_k1)
        d_st = add5(d_st, 1.0, v1)
        d_z = d_z + d_z1
        d_z = d_z - d_h                     # h = z_plane - z_entry
        ctp = ctp1 + ctp2 + ctp3 + ctp4

    dpair_ref[:] += ctp[None]

    sel = in_band
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
        stc = pltpu.make_async_copy(ct_scratch.at[g],
                                    dstate_ref.at[g], sem)
        stc.start()
        stc.wait()


def _bwd_fused_call(static, params, out, pairs, ct_out):
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    G = out.shape[0]
    kern = functools.partial(_bwd_fused_kernel, W=W, H=H, S=S, G=G, B=B,
                             scheme=scheme, algorithm=algorithm,
                             defect_iters=defect_iters)
    dpairs, dstate = pl.pallas_call(
        kern,
        grid=(S, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, W * 4, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        # the per-step transient peak (reverse-march + replay + 4 VJPs)
        # exceeds the compiler's 16 MB default scoped-VMEM budget at
        # B=1024 (measured 21.8 MB); v5e has 128 MB physical VMEM and
        # this kernel's explicit buffers are small, so raise the stack
        # budget instead of shrinking B (B sets MXU efficiency — the
        # backward is matmul-throughput-bound)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, out, pairs, ct_out)
    return dpairs, dstate


# ---------------------------------------------------------------------------
# Stage backward kernel: pure VJP chain over saved per-stage states
# ---------------------------------------------------------------------------


def _bwd_stage_kernel(params_ref, out_ref, traj_ref, pair_ref, ct_in_ref,
                      dpair_ref, dstate_ref, ct_scratch, aux_scratch, sem,
                      *, W: int, H: int, S: int, G: int, B: int,
                      scheme: int, algorithm: int):
    """One (reversed slab si, ray block g) step of the STAGE backward.

    The forward saved every RK4 stage's input state (traj_ref,
    BlockSpec-streamed per step — measured free), so this kernel is a
    pure cotangent chain: per stage ONE sample recompute (A) plus the
    two cotangent contractions, 4 sequential units instead of the
    reverse-re-march kernel's 12 (chain depth sets wall time here: the
    per-step latency is dependency-bound, not throughput-bound).

    ct_scratch (G, 8, B) carries the cotangent state across the sweep
    (rows 6..7 stay zero: march_chief_fused never exposes out rows
    6..7, so their upstream cotangents are identically zero);
    aux_scratch caches the exit state per block for the per-step
    (inside, z0) reads.
    """
    si = pl.program_id(0)
    g = pl.program_id(1)

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
        ld1 = pltpu.make_async_copy(ct_in_ref.at[g], ct_scratch.at[g], sem)
        ld1.start()
        ld1.wait()
        ld2 = pltpu.make_async_copy(out_ref.at[g], aux_scratch.at[g], sem)
        ld2.start()
        ld2.wait()

    @pl.when(g == 0)
    def _():
        dpair_ref[:] = jnp.zeros_like(dpair_ref)

    ct = ct_scratch[g]
    ct_x, ct_y, ct_z = ct[0:1], ct[1:2], ct[2:3]
    ct_Tx, ct_Ty, ct_Tz = ct[3:4], ct[4:5], ct[5:6]
    aux = aux_scratch[g]
    inside = aux[6:7]
    z0 = aux[7:8]
    z_entry = jnp.minimum(z0, plane_prev)
    in_band = (inside > 0.0) & (z_entry > z_plane)
    h = z_plane - z_entry

    zero = jnp.zeros_like(ct_x)
    gate = in_band.astype(jnp.float32)
    d_new = (ct_x * gate, ct_y * gate, ct_Tx * gate, ct_Ty * gate,
             ct_Tz * gate)

    dn_fwd = (((1,), (0,)), ((), ()))
    dn_ctp = (((1,), (1,)), ((), ()))
    dn_dwy = (((0,), (0,)), ((), ()))

    def dot1(a, b, dn):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)

    def add5(a, c, b):
        return tuple(ai + c * bi for ai, bi in zip(a, b))

    def dot5(a, b):
        return sum(ai * bi for ai, bi in zip(a, b))

    t = traj_ref[0, 0]
    # gate the saved stage states by in_band: out-of-band lanes carry
    # pass-through values computed with UNGATED 1/tz in the forward
    # (a grazing dcz ~ 0 ray yields inf/NaN stage coordinates), and the
    # ct_pair contraction below sums over the RAY axis — one poisoned
    # lane would NaN the whole field gradient
    stages = [tuple(jnp.where(in_band, t[5 * i + j:5 * i + j + 1], 0.0)
                    for j in range(5))
              for i in range(1 if algorithm == 1 else 4)]

    def vjp_stage(st, z_at, d5):
        """One merged sample-recompute + cotangent unit.

        Returns (d_state5, d_z_at, ct_pair, k) — k is the stage RHS,
        reconstructed from the same A contraction the cotangents need,
        so no separate forward replay exists anywhere in this kernel.
        """
        px, py, tx, ty, tz = st
        uz_raw = (z_at - z_plane) / dz_slab
        uz = jnp.clip(uz_raw, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)
        vals = _weights_T(uy, H, scheme)
        wy_cat = jnp.concatenate([vals * (1.0 - uz), vals * uz], axis=0)
        A_r = dot1(pair_ref[0], wy_cat, dn_fwd).reshape(W, 4, B)
        s4c = jnp.sum(A_r * wx[:, None, :], axis=0)        # (4, B)
        gx, gy, gz = s4c[0:1], s4c[1:2], s4c[2:3]
        nm1 = s4c[3:4]
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
        d_A = (wx[:, None, :] * d_s4[None]).reshape(W * 4, B)
        d_wx = jnp.sum(A_r * d_s4[None], axis=1)
        d_ux = jnp.sum(d_wx * _weights_T_du(ux, W, scheme),
                       axis=0, keepdims=True)
        ct_pair = dot1(d_A, wy_cat, dn_ctp)
        d_wy_cat = dot1(pair_ref[0], d_A, dn_dwy)
        d_wy = d_wy_cat[:H] * (1.0 - uz) + d_wy_cat[H:] * uz
        d_uy = jnp.sum(d_wy * _weights_T_du(uy, H, scheme),
                       axis=0, keepdims=True)
        d_uz = jnp.sum((d_wy_cat[H:] - d_wy_cat[:H]) * vals,
                       axis=0, keepdims=True)
        mask = ((uz_raw >= 0.0) & (uz_raw <= 1.0)).astype(jnp.float32)
        d_z_at = d_uz * mask / dz_slab
        d_state = (d_ux / sx, d_uy / sy, d_tx, d_ty, d_tz)
        return d_state, d_z_at, ct_pair, k

    if algorithm == 1:
        s1 = stages[0]
        d_k1 = tuple(h * d for d in d_new)
        v1, d_z1, ctp, k1 = vjp_stage(s1, z_entry, d_k1)
        d_st = add5(d_new, 1.0, v1)
        d_h = dot5(d_new, k1)
        d_z = d_z1 - d_h
    else:
        s1, s2, s3, s4 = stages
        h2 = h / 2.0
        d_k4 = tuple((h / 6.0) * d for d in d_new)
        v4, d_z4, ctp4, k4 = vjp_stage(s4, z_entry + h, d_k4)
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

    dpair_ref[:] += ctp[None]

    sel = in_band
    new_ct = jnp.concatenate([
        jnp.where(sel, d_st[0], ct_x), jnp.where(sel, d_st[1], ct_y),
        jnp.where(sel, d_z, ct_z), jnp.where(sel, d_st[2], ct_Tx),
        jnp.where(sel, d_st[3], ct_Ty), jnp.where(sel, d_st[4], ct_Tz),
        zero, zero], axis=0)
    ct_scratch[g] = new_ct

    @pl.when(si == S - 1)
    def _():
        stc = pltpu.make_async_copy(ct_scratch.at[g], dstate_ref.at[g], sem)
        stc.start()
        stc.wait()


def _bwd_stage_call(static, params, out, traj, pairs, ct_out):
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    G = out.shape[0]
    rows = _stage_rows(algorithm)
    kern = functools.partial(_bwd_stage_kernel, W=W, H=H, S=S, G=G, B=B,
                             scheme=scheme, algorithm=algorithm)
    dpairs, dstate = pl.pallas_call(
        kern,
        grid=(S, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, rows, B), lambda si, g: (g, S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, W * 4, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.VMEM((G, 8, B), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, out, traj, pairs, ct_out)
    return dpairs, dstate


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_march(static, params, state, pairs, field):
    """field rides along purely for the backward fallback (unused fwd)."""
    del field
    return _fused_call(static, params, state, pairs)


# stage-residual budget: above this the backward reconstructs states by
# reverse re-march instead of streaming saved stages (HBM capacity trade
# only — the residual's bandwidth is fully overlapped).  Trace-time env
# read: changing it after a first compilation requires jax.clear_caches().
_TRAJ_DEFAULT_MAX_BYTES = 2 << 30


def _traj_max_bytes() -> int:
    import os
    return int(os.environ.get("PHOTON_TRAJ_MAX_BYTES",
                              _TRAJ_DEFAULT_MAX_BYTES))


def _bwd_fused_eligible(static) -> bool:
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    return algorithm in (1, 2) and substeps == 1 \
        and W * H <= _BWD_FUSED_MAX_SLAB


def _fused_march_fwd(static, params, state, pairs, field):
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    G = state.shape[0]
    if _bwd_fused_eligible(static):
        traj_bytes = G * S * _stage_rows(algorithm) * B * 4
        if traj_bytes <= _traj_max_bytes():
            out, traj = _fused_call(static, params, state, pairs,
                                    save_traj=True)
            return out, (params, out, state, pairs, field, traj)
    out = _fused_call(static, params, state, pairs)
    return out, (params, out, state, pairs, field, None)


def _fused_march_bwd(static, res, ct):
    """Backward dispatch, fastest applicable first:

    1. the STAGE cotangent kernel over saved per-stage states (Euler/
       RK4 single substep, slab <= the VMEM cap, residual under the
       PHOTON_TRAJ_MAX_BYTES budget) — shortest dependency chain;
    2. the reverse-re-march cotangent kernel (same coverage, no
       residual — for marches whose stage residual would not fit HBM);
    3. a recompute through the differentiable per-stage path (AB4,
       substeps > 1, oversized slabs).

    Either way the ``pairs``/``field`` split is the same: the total
    field gradient is pairs_packed's transpose of d_pairs plus d_field,
    and each path routes the whole gradient through exactly one of the
    two.  Gradients w.r.t. the geometry scalars in params are zero on
    the fused path (volume bounds are never optimization variables)."""
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    params, out, state, pairs, field, traj = res
    if traj is not None:
        d_pairs, d_state = _bwd_stage_call(static, params, out, traj,
                                           pairs, ct)
        return (jnp.zeros_like(params), d_state, d_pairs,
                jnp.zeros_like(field))
    if _bwd_fused_eligible(static):
        # the backward may run at a smaller ray-block size than the
        # forward (its per-stage transients — A, d_A, weight matrices —
        # all scale with B); with the raised vmem_limit_bytes the
        # tables are currently equal and f == 1, but the re-block (a
        # pure relabeling of ray slots, inverted on d_state below)
        # keeps the knob available.
        bwd_B = bwd_block_size_for_slab(W * H)
        f = B // bwd_B
        if f > 1:
            def reblock(a):
                g0 = a.shape[0]
                return jnp.transpose(a.reshape(g0, 8, f, bwd_B),
                                     (0, 2, 1, 3)).reshape(g0 * f, 8, bwd_B)
            static_b = static[:7] + (bwd_B, defect_iters)
            d_pairs, d_state_b = _bwd_fused_call(
                static_b, params, reblock(out), pairs, reblock(ct))
            g0 = out.shape[0]
            d_state = jnp.transpose(
                d_state_b.reshape(g0, f, 8, bwd_B),
                (0, 2, 1, 3)).reshape(g0, 8, B)
        else:
            d_pairs, d_state = _bwd_fused_call(static, params, out, pairs,
                                               ct)
        return (jnp.zeros_like(params), d_state, d_pairs,
                jnp.zeros_like(field))

    def unfused(params, state, field):
        return _unfused_equivalent(static, params, state, field)

    _, vjp = jax.vjp(unfused, params, state, field)
    d_params, d_state, d_field = vjp(ct)
    d_pairs = jnp.zeros((S, W * 4, 2 * H), jnp.float32)
    return d_params, d_state, d_pairs, d_field


def _unfused_equivalent(static, params, state, field):
    """The fused kernel's math, expressed through the per-stage sampler
    (march_dense's scan body) — used only for the backward recompute."""
    W, H, S, scheme, algorithm, substeps, interpret, B, defect_iters = static[:9]
    from photon_tpu.ops.march_dense_pallas import (dense_slab_sample,
                                                   pairs_transposed)

    min_x, min_y, sx, sy, z_min, dz_slab = (params[i] for i in range(6))
    G = state.shape[0]
    rows = [state[:, i, :].reshape(-1) for i in range(8)]
    x, y, z, Tx, Ty, Tz, inside = rows[:7]

    lo_T, hi_T = pairs_transposed(field)
    sampler_static = (W, H, scheme, interpret)

    ks = jnp.arange(S - 1, -1, -1, dtype=jnp.float32)
    z_planes = jnp.maximum(z_min + (ks - 0.5) * dz_slab, z_min)

    def rhs(pair, z_plane, px, py, tx, ty, tz, z_at):
        uz = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        gx, gy, gz, nm1 = dense_slab_sample(
            sampler_static, pair[0], pair[1], ux, uy, uz)
        inv_tz = 1.0 / tz
        g = (1.0 + nm1) * inv_tz
        return (tx * inv_tz, ty * inv_tz, g * gx, g * gy, g * gz)

    def rk4_sub(pair, z_plane, stv, h, z0):
        px, py, tx, ty, tz = stv
        k1 = rhs(pair, z_plane, px, py, tx, ty, tz, z0)
        h2 = h / 2.0
        k2 = rhs(pair, z_plane, px + h2 * k1[0], py + h2 * k1[1],
                 tx + h2 * k1[2], ty + h2 * k1[3], tz + h2 * k1[4],
                 z0 + h2)
        k3 = rhs(pair, z_plane, px + h2 * k2[0], py + h2 * k2[1],
                 tx + h2 * k2[2], ty + h2 * k2[3], tz + h2 * k2[4],
                 z0 + h2)
        k4 = rhs(pair, z_plane, px + h * k3[0], py + h * k3[1],
                 tx + h * k3[2], ty + h * k3[3], tz + h * k3[4], z0 + h)
        s6 = h / 6.0
        return tuple(v + s6 * (a + 2 * b + 2 * c + d)
                     for v, a, b, c, d in zip(stv, k1, k2, k3, k4))

    def step(carry, xs_slab):
        pair, z_plane = xs_slab
        x, y, z, Tx, Ty, Tz = carry
        in_band = (inside > 0.0) & (z > z_plane)
        hstep = -(z - z_plane)
        stv = (x, y, Tx, Ty, Tz)
        if algorithm == 1:
            k1 = rhs(pair, z_plane, x, y, Tx, Ty, Tz, z)
            new = tuple(v + hstep * k for v, k in zip(stv, k1))
        elif substeps == 1:
            new = rk4_sub(pair, z_plane, stv, hstep, z)
        else:
            hs = hstep / substeps
            new = stv
            for si in range(substeps):
                new = rk4_sub(pair, z_plane, new, hs, z + si * hs)
        z_n = jnp.full_like(z, 1.0) * z_plane
        out = (jnp.where(in_band, new[0], x), jnp.where(in_band, new[1], y),
               jnp.where(in_band, z_n, z), jnp.where(in_band, new[2], Tx),
               jnp.where(in_band, new[3], Ty), jnp.where(in_band, new[4], Tz))
        return out, None

    carry = (x, y, z, Tx, Ty, Tz)
    carry, _ = jax.lax.scan(jax.checkpoint(step), carry,
                            ((lo_T, hi_T), z_planes))
    x, y, z, Tx, Ty, Tz = carry
    out = jnp.stack([x, y, z, Tx, Ty, Tz, inside, rows[7]], axis=0)
    return jnp.transpose(out.reshape(8, G, B), (1, 0, 2))


_fused_march.defvjp(_fused_march_fwd, _fused_march_bwd)


def pairs_packed(field):
    """(D, H, W, 4) field -> (S, W*4, 2H) packed-K slab pairs, top-down.

    Row r = w * 4 + c holds channel c of column w; the 2H contraction
    axis is [lo slab | hi slab] (a y-window is two half-K column
    ranges — the windowed march DMAs each half separately)."""
    d, h, w, _ = field.shape
    f = jnp.transpose(field, (0, 2, 3, 1))           # (D, W, 4, H)
    lo = jnp.flip(f[:-1], axis=0).reshape(d - 1, w * 4, h)
    hi = jnp.flip(f[1:], axis=0).reshape(d - 1, w * 4, h)
    return jnp.concatenate([lo, hi], axis=2)


def march_chief_fused(vol, xs, ys, zs, dcx, dcy, dcz, *,
                      algorithm: int = 2, interpolation_scheme: int = 1,
                      field=None, substeps=None, interpret=None,
                      passes=None):
    """Fused-kernel twin of march_dense.march_chief_dense.

    Same contract: (P,) chief states in, (x, y, z, dirx, diry, dirz)
    after traversal out; rays missing the volume pass through unchanged.
    Gradients flow to ``field`` and the ray states via the custom_vjp
    reverse-re-march kernel (Euler/RK4) or the per-stage recompute.
    """
    from photon_tpu.ops.march_dense import bspline_prefilter_jax

    w, h, d = (int(s) for s in vol.sizes)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if field is None:
        field = vol.field
    if interpolation_scheme == 2:
        field = bspline_prefilter_jax(field)

    B = block_size_for_slab(w * h)
    sx = (vol.max_bound[0] - vol.min_bound[0]) / (w - 2.0)
    sy = (vol.max_bound[1] - vol.min_bound[1]) / (h - 2.0)
    z_max = vol.max_bound[2]
    z_min = vol.min_bound[2]
    dz_slab = (z_max - z_min) / (d - 2.0)

    # entry advance to the volume top (identical to march_chief_dense)
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

    P = x.shape[0]
    G = -(-P // B)
    pad = G * B - P

    def padr(a, fill=0.0):
        a = a.astype(jnp.float32)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, jnp.float32)])
        return a

    state = jnp.stack([
        padr(x), padr(y), padr(z), padr(Tx), padr(Ty), padr(Tz, -1.0),
        padr(inside.astype(jnp.float32)), padr(z),   # row 7: entry z
    ], axis=0)                                        # (8, G*B)
    state = jnp.transpose(state.reshape(8, G, B), (1, 0, 2))

    params = jnp.stack([
        jnp.float32(vol.min_bound[0]), jnp.float32(vol.min_bound[1]),
        jnp.float32(sx), jnp.float32(sy), jnp.float32(z_min),
        jnp.float32(dz_slab), jnp.float32(0.0), jnp.float32(0.0)])

    pairs = pairs_packed(field)
    if substeps is None:
        substeps = 2 if algorithm == 3 else 1
    substeps = max(1, int(substeps))
    # backward-reconstruction defect iterations, chosen from the grid's
    # static z/lateral anisotropy: each z step spans ~ratio lateral
    # voxels, which sets the reverse-step truncation (see the kernel's
    # reconstruction comment for the measured error ladder)
    try:
        ratio = float(dz_slab) / max(min(float(sx), float(sy)), 1e-30)
        defect_iters = 0 if ratio <= 4.0 else (1 if ratio <= 16.0 else 3)
    except jax.errors.ConcretizationTypeError:
        # volume bounds are traced (e.g. closure-captured under
        # shard_map): geometry unknown at trace time — take the
        # accurate-everywhere setting
        defect_iters = 3
    static = (w, h, d - 1, int(interpolation_scheme), int(algorithm),
              substeps, bool(interpret), B, defect_iters,
              int(_fwd_passes() if passes is None else passes))

    max_g = max(1, _BWD_MAX_RAYS // B)
    if G <= max_g:
        out = _fused_march(static, params, state, pairs, field)
    else:
        # block-chunk huge marches so every chunk stays inside the fused
        # backward's two (G*8, B) scratch register files (the per-chunk
        # d_pairs/d_field cotangents sum in the outer graph)
        outs = [
            _fused_march(static, params, state[i:i + max_g], pairs, field)
            for i in range(0, G, max_g)]
        out = jnp.concatenate(outs, axis=0)              # (G, 8, B)
    rows = jnp.transpose(out, (1, 0, 2)).reshape(8, G * B)[:, :P]
    x, y, z, Tx, Ty, Tz = (rows[i] for i in range(6))

    Tn = jnp.sqrt(Tx * Tx + Ty * Ty + Tz * Tz)
    dirx_f = jnp.where(inside, Tx / Tn, dcx)
    diry_f = jnp.where(inside, Ty / Tn, dcy)
    dirz_f = jnp.where(inside, Tz / Tn, dcz)
    return x, y, z, dirx_f, diry_f, dirz_f
