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
  contraction: pair (W*4, 2H) @ [wy0; wy1] (2H, B).  For the 64^3
  sample volume 2H = 128 exactly fills the systolic depth — twice the
  MXU utilization of the per-stage kernel.
* the RK4/Euler combine runs on (1, B) rows in VMEM (VPU), not XLA.

Weight construction, clip/fold edge semantics, and the 3-pass bf16-split
matmul (march_dense_pallas._dot3) are bit-identical to the per-stage
kernel, so the fused march matches march_chief_dense to float rounding;
tests drive both (tests/test_dense_fused.py).

Backward: the fused kernel carries a custom_vjp whose backward re-runs
the march through the differentiable per-stage path (march_chief_dense
with the sampler's hand-written cotangent kernels) — the same
recompute-in-backward trade as jax.checkpoint, so gradients are
identical to the unfused path's.

Supported: algorithms 1 (Euler), 2 (RK4), 3 (RK4 x substeps; default 2),
schemes 1 (trilinear) / 2 (tricubic B-spline over prefiltered
coefficients).  AB4 (algorithm 4) keeps the per-stage path (its
derivative history would add 15 scratch rows for a rarely-used
integrator).

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

from photon_tpu.ops.march_dense_pallas import (_dot3, _weights_T,
                                               _weights_T_du)

_B = 1024          # rays per block (lane-major rows)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_kernel(params_ref, state_ref, pair_ref, out_ref, scratch,
                  *, W: int, H: int, S: int, scheme: int, algorithm: int,
                  substeps: int, traj_ref=None):
    return _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref,
                              traj_ref, scratch, W=W, H=H, S=S,
                              scheme=scheme, algorithm=algorithm,
                              substeps=substeps)


def _fused_kernel_traj(params_ref, state_ref, pair_ref, out_ref, traj_ref,
                       scratch, *, W: int, H: int, S: int, scheme: int,
                       algorithm: int, substeps: int):
    return _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref,
                              traj_ref, scratch, W=W, H=H, S=S,
                              scheme=scheme, algorithm=algorithm,
                              substeps=substeps)


def _fused_kernel_impl(params_ref, state_ref, pair_ref, out_ref, traj_ref,
                       scratch, *, W: int, H: int, S: int, scheme: int,
                       algorithm: int, substeps: int):
    """One (ray block g, slab s) grid step of the fused march.

    params_ref (SMEM, (8,)): min_x, min_y, sx, sy, z_min, dz_slab.
    state_ref / out_ref: (1, 8, B) rows [x, y, z, Tx, Ty, Tz, inside, -].
    pair_ref: (W*4, 2H) — slab pair s in the packed-K layout
      [loT | hiT] along the contraction axis.
    scratch: (8, B) VMEM register file persisting across the slab axis.
    traj_ref: optional (1, 1, 8, B) per-(g, s) output recording the state
      at the ENTRY of step s — consumed by the fused backward kernel.
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        scratch[:] = state_ref[0]

    if traj_ref is not None:
        traj_ref[0, 0] = scratch[:]

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
        wy = _weights_T(uy, H, scheme)                        # (H, B)
        wy_cat = jnp.concatenate([wy * (1.0 - uz), wy * uz], axis=0)
        dn = (((1,), (0,)), ((), ()))
        A = _dot3(pair_ref[0], wy_cat, dn)                    # (W*4, B)
        s4 = jnp.sum(A.reshape(W, 4, _B) * wx[:, None, :], axis=0)
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
    elif substeps == 1:
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


def _fused_call(static, params, state, pairs, save_traj: bool = False):
    """state: (G, 8, B); pairs: (S, W*4, 2H); params: (8,) f32.

    With ``save_traj`` also returns the (G, S, 8, B) per-step entry
    states (the fused backward kernel's residual)."""
    W, H, S, scheme, algorithm, substeps, interpret = static
    G = state.shape[0]
    kw = dict(W=W, H=H, S=S, scheme=scheme, algorithm=algorithm,
              substeps=substeps)
    kern = functools.partial(
        _fused_kernel_traj if save_traj else _fused_kernel, **kw)
    out_specs = pl.BlockSpec((1, 8, _B), lambda g, s: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((G, 8, _B), jnp.float32)
    if save_traj:
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, 8, _B), lambda g, s: (g, s, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((G, S, 8, _B), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, _B), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * 4, 2 * H), lambda g, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, _B), jnp.float32)],
        interpret=interpret,
    )(params, state, pairs)


# ---------------------------------------------------------------------------
# Fused backward kernel: hand-written RK4/Euler transpose over the slab scan
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(params_ref, traj_ref, pair_ref, ct_in_ref,
                      dpair_ref, dstate_ref, ct_scratch,
                      *, W: int, H: int, S: int, G: int, scheme: int,
                      algorithm: int):
    """One (reversed slab si, ray block g) step of the fused backward.

    Grid is (S, G) with the slab axis OUTER (reversed: forward step
    s = S-1-si) so the d_pair output block for step s stays resident in
    VMEM while the inner g loop accumulates every ray block's
    contribution; the per-block cotangent state lives in the
    (G*8, B) scratch across the whole sweep.

    traj_ref: (1, 1, 8, B) — the forward ENTRY state of step s for
    block g (saved by the forward kernel).  ct_in_ref: the upstream
    cotangent of the final state.  dstate_ref receives the cotangent of
    the march's entry state on the last sweep.  Gradients w.r.t. the
    geometry scalars in params are NOT produced (zeros) — volume bounds
    are never optimization variables here.
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

    @pl.when(si == 0)
    def _():
        ct_scratch[pl.ds(g * 8, 8)] = ct_in_ref[0]

    @pl.when(g == 0)
    def _():
        dpair_ref[:] = jnp.zeros_like(dpair_ref)

    row = traj_ref[0, 0]                   # (8, B) entry state of step s
    x, y, z = row[0:1], row[1:2], row[2:3]
    Tx, Ty, Tz = row[3:4], row[4:5], row[5:6]
    inside = row[6:7]
    in_band = (inside > 0.0) & (z > z_plane)
    h = z_plane - z                        # hstep

    ct = ct_scratch[pl.ds(g * 8, 8)]       # (8, B)
    ct_x, ct_y, ct_z = ct[0:1], ct[1:2], ct[2:3]
    ct_Tx, ct_Ty, ct_Tz = ct[3:4], ct[4:5], ct[5:6]

    zero = jnp.zeros_like(x)
    gate = in_band.astype(jnp.float32)
    d_new = (ct_x * gate, ct_y * gate, ct_Tx * gate, ct_Ty * gate,
             ct_Tz * gate)

    dn_fwd = (((1,), (0,)), ((), ()))      # pair (W4, 2H) @ (2H, B)
    dn_ctp = (((1,), (1,)), ((), ()))      # d_A (W4, B) x wy_cat (2H, B)
    dn_dwy = (((0,), (0,)), ((), ()))      # pair (W4, 2H) x d_A (W4, B)

    def f(st, z_at):
        """Stage RHS with the 3-pass split matmul (the recomputed primal
        trajectory must match the forward kernel's accuracy).  Returns
        k plus the sampled channels the VJP reuses; the weight matrices
        are NOT cached — keeping 4 stages of (W, B)/(2H, B) live was a
        measured VMEM OOM, so vjp_f rebuilds them (~15% extra flops)."""
        px, py, tx, ty, tz = st
        uz = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)
        wy = _weights_T(uy, H, scheme)
        wy_cat = jnp.concatenate([wy * (1.0 - uz), wy * uz], axis=0)
        A = _dot3(pair_ref[0], wy_cat, dn_fwd)
        A_r = A.reshape(W, 4, _B)
        s4 = jnp.sum(A_r * wx[:, None, :], axis=0)        # (4, B)
        gx, gy, gz, nm1 = s4[0:1], s4[1:2], s4[2:3], s4[3:4]
        inv = 1.0 / tz
        gfac = (1.0 + nm1) * inv
        k = (tx * inv, ty * inv, gfac * gx, gfac * gy, gfac * gz)
        return k, (gx, gy, gz, nm1, inv, gfac)

    def vjp_f(st, z_at, cache, d5):
        """Cotangents of one stage sample; recomputes the weight
        matrices and the (single-pass) contraction in place."""
        px, py, tx, ty, tz = st
        gx, gy, gz, nm1, inv, gfac = cache
        uz_raw = (z_at - z_plane) / dz_slab
        uz = jnp.clip(uz_raw, 0.0, 1.0)
        ux = 0.5 + (px - min_x) / sx
        uy = 0.5 + (py - min_y) / sy
        wx = _weights_T(ux, W, scheme)
        wy = _weights_T(uy, H, scheme)
        wy_cat = jnp.concatenate([wy * (1.0 - uz), wy * uz], axis=0)
        A_r = jax.lax.dot_general(
            pair_ref[0], wy_cat, dn_fwd,
            preferred_element_type=jnp.float32).reshape(W, 4, _B)
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
        d_A = (wx[:, None, :] * d_s4[None]).reshape(W * 4, _B)
        d_wx = jnp.sum(A_r * d_s4[None], axis=1)          # (W, B)
        d_ux = jnp.sum(d_wx * _weights_T_du(ux, W, scheme),
                       axis=0, keepdims=True)
        ct_pair = jax.lax.dot_general(d_A, wy_cat, dn_ctp,
                                      preferred_element_type=jnp.float32)
        d_wy_cat = jax.lax.dot_general(pair_ref[0], d_A, dn_dwy,
                                       preferred_element_type=jnp.float32)
        d_wy = d_wy_cat[:H] * (1.0 - uz) + d_wy_cat[H:] * uz
        d_uz = jnp.sum(wy * (d_wy_cat[H:] - d_wy_cat[:H]),
                       axis=0, keepdims=True)
        d_uy = jnp.sum(d_wy * _weights_T_du(uy, H, scheme),
                       axis=0, keepdims=True)
        mask = ((uz_raw >= 0.0) & (uz_raw <= 1.0)).astype(jnp.float32)
        d_z_at = d_uz * mask / dz_slab
        d_state = (d_ux / sx, d_uy / sy, d_tx, d_ty, d_tz)
        return d_state, d_z_at, ct_pair

    def add5(a, c, b):
        return tuple(ai + c * bi for ai, bi in zip(a, b))

    def dot5(a, b):
        return sum(ai * bi for ai, bi in zip(a, b))

    s1 = (x, y, Tx, Ty, Tz)
    if algorithm == 1:
        k1, c1 = f(s1, z)
        d_st = d_new
        d_h = dot5(d_new, k1)
        d_k1 = tuple(h * d for d in d_new)
        v1, d_z1, ctp = vjp_f(s1, z, c1, d_k1)
        d_st = add5(d_st, 1.0, v1)
        d_z = d_z1 - d_h
    else:
        h2 = h / 2.0
        k1, c1 = f(s1, z)
        s2 = add5(s1, h2, k1)
        k2, c2 = f(s2, z + h2)
        s3 = add5(s1, h2, k2)
        k3, c3 = f(s3, z + h2)
        s4 = add5(s1, h, k3)
        k4, c4 = f(s4, z + h)

        combo = tuple(a + 2.0 * b + 2.0 * c + d
                      for a, b, c, d in zip(k1, k2, k3, k4))
        d_st = d_new
        d_h = dot5(d_new, combo) / 6.0
        d_z = zero

        d_k4 = tuple((h / 6.0) * d for d in d_new)
        v4, d_z4, ctp4 = vjp_f(s4, z + h, c4, d_k4)
        d_st = add5(d_st, 1.0, v4)
        d_h = d_h + dot5(v4, k3) + d_z4
        d_z = d_z + d_z4
        d_k3 = add5(tuple((h / 3.0) * d for d in d_new), h, v4)

        v3, d_z3, ctp3 = vjp_f(s3, z + h2, c3, d_k3)
        d_st = add5(d_st, 1.0, v3)
        d_h = d_h + 0.5 * dot5(v3, k2) + 0.5 * d_z3
        d_z = d_z + d_z3
        d_k2 = add5(tuple((h / 3.0) * d for d in d_new), h2, v3)

        v2, d_z2, ctp2 = vjp_f(s2, z + h2, c2, d_k2)
        d_st = add5(d_st, 1.0, v2)
        d_h = d_h + 0.5 * dot5(v2, k1) + 0.5 * d_z2
        d_z = d_z + d_z2
        d_k1 = add5(tuple((h / 6.0) * d for d in d_new), h2, v2)

        v1, d_z1, ctp1 = vjp_f(s1, z, c1, d_k1)
        d_st = add5(d_st, 1.0, v1)
        d_z = d_z + d_z1
        d_z = d_z - d_h                     # h = z_plane - z
        ctp = ctp1 + ctp2 + ctp3 + ctp4

    dpair_ref[:] += ctp[None]

    sel = in_band
    new_ct = jnp.concatenate([
        jnp.where(sel, d_st[0], ct_x), jnp.where(sel, d_st[1], ct_y),
        jnp.where(sel, d_z, ct_z), jnp.where(sel, d_st[2], ct_Tx),
        jnp.where(sel, d_st[3], ct_Ty), jnp.where(sel, d_st[4], ct_Tz),
        zero, zero], axis=0)
    ct_scratch[pl.ds(g * 8, 8)] = new_ct

    @pl.when(si == S - 1)
    def _():
        dstate_ref[0] = new_ct


def _bwd_fused_call(static, params, traj, pairs, ct_out):
    W, H, S, scheme, algorithm, substeps, interpret = static
    G = traj.shape[0]
    kern = functools.partial(_bwd_fused_kernel, W=W, H=H, S=S, G=G,
                             scheme=scheme, algorithm=algorithm)
    dpairs, dstate = pl.pallas_call(
        kern,
        grid=(S, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8, _B), lambda si, g: (g, S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _B), lambda si, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, W * 4, 2 * H),
                         lambda si, g: (S - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _B), lambda si, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, W * 4, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, _B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G * 8, _B), jnp.float32)],
        interpret=interpret,
    )(params, traj, pairs, ct_out)
    return dpairs, dstate


# a (G*8, B) cotangent scratch at G blocks of 1024 rays: cap the fused
# backward at 128 blocks (4 MB scratch); larger marches are chunked by
# march_chief_fused (direct callers beyond the cap fall back to the
# per-stage recompute path)
_BWD_MAX_G = 128

# the backward kernel's per-stage VJP transients (A_r, d_A, weight
# matrices, bf16 matmul copies) scale with the slab area; 64x64 slabs
# measure ~14 MB scoped VMEM (fits), 128x128 measured 23.5 MB (OOM on
# v5e's 16 MB budget) — above this cap the backward recomputes through
# the per-stage sampler path instead (proven to 256x256)
_BWD_FUSED_MAX_SLAB = 64 * 64


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_march(static, params, state, pairs, field):
    """field rides along purely for the backward re-march (unused fwd)."""
    del field
    return _fused_call(static, params, state, pairs)


def _fused_march_fwd(static, params, state, pairs, field):
    W, H, S, scheme, algorithm, substeps, interpret = static
    G = state.shape[0]
    if algorithm in (1, 2) and substeps == 1 and G <= _BWD_MAX_G \
            and W * H <= _BWD_FUSED_MAX_SLAB:
        out, traj = _fused_call(static, params, state, pairs,
                                save_traj=True)
        return out, (params, traj, pairs, None, field)
    return _fused_call(static, params, state, pairs), \
        (params, None, None, state, field)


def _fused_march_bwd(static, res, ct):
    """Backward dispatch: the fused cotangent kernel when the forward
    saved its trajectory (Euler/RK4, single substep); otherwise a
    recompute through the differentiable per-stage path.

    Either way the ``pairs``/``field`` split is the same: the total
    field gradient is pairs_packed's transpose of d_pairs plus d_field,
    and each path routes the whole gradient through exactly one of the
    two.  Gradients w.r.t. the geometry scalars in params are zero on
    the fused path (volume bounds are never optimization variables)."""
    W, H, S, scheme, algorithm, substeps, interpret = static
    params, traj, pairs, state, field = res
    if traj is not None:
        d_pairs, d_state = _bwd_fused_call(static, params, traj, pairs, ct)
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
    W, H, S, scheme, algorithm, substeps, interpret = static
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
    return jnp.transpose(out.reshape(8, G, _B), (1, 0, 2))


_fused_march.defvjp(_fused_march_fwd, _fused_march_bwd)


def pairs_packed(field):
    """(D, H, W, 4) field -> (S, W*4, 2H) packed-K slab pairs, top-down.

    Row r = w * 4 + c holds channel c of column w; the 2H contraction
    axis is [lo slab | hi slab]."""
    d, h, w, _ = field.shape
    f = jnp.transpose(field, (0, 2, 3, 1))           # (D, W, 4, H)
    lo = jnp.flip(f[:-1], axis=0).reshape(d - 1, w * 4, h)
    hi = jnp.flip(f[1:], axis=0).reshape(d - 1, w * 4, h)
    return jnp.concatenate([lo, hi], axis=2)


def march_chief_fused(vol, xs, ys, zs, dcx, dcy, dcz, *,
                      algorithm: int = 2, interpolation_scheme: int = 1,
                      field=None, substeps=None, interpret=None):
    """Fused-kernel twin of march_dense.march_chief_dense.

    Same contract: (P,) chief states in, (x, y, z, dirx, diry, dirz)
    after traversal out; rays missing the volume pass through unchanged.
    Gradients flow to ``field`` and the ray states via the custom_vjp
    recompute path.
    """
    from photon_tpu.ops.march_dense import bspline_prefilter_jax

    w, h, d = (int(s) for s in vol.sizes)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if field is None:
        field = vol.field
    if interpolation_scheme == 2:
        field = bspline_prefilter_jax(field)

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
    G = -(-P // _B)
    pad = G * _B - P

    def padr(a, fill=0.0):
        a = a.astype(jnp.float32)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, jnp.float32)])
        return a

    state = jnp.stack([
        padr(x), padr(y), padr(z), padr(Tx), padr(Ty), padr(Tz, -1.0),
        padr(inside.astype(jnp.float32)), jnp.zeros((G * _B,), jnp.float32),
    ], axis=0)                                        # (8, G*B)
    state = jnp.transpose(state.reshape(8, G, _B), (1, 0, 2))

    params = jnp.stack([
        jnp.float32(vol.min_bound[0]), jnp.float32(vol.min_bound[1]),
        jnp.float32(sx), jnp.float32(sy), jnp.float32(z_min),
        jnp.float32(dz_slab), jnp.float32(0.0), jnp.float32(0.0)])

    pairs = pairs_packed(field)
    if substeps is None:
        substeps = 2 if algorithm == 3 else 1
    substeps = max(1, int(substeps))
    static = (w, h, d - 1, int(interpolation_scheme), int(algorithm),
              substeps, bool(interpret))

    if G <= _BWD_MAX_G:
        out = _fused_march(static, params, state, pairs, field)
    else:
        # block-chunk huge marches so every chunk stays inside the fused
        # backward's (G*8, B) cotangent-scratch budget (the per-chunk
        # d_pairs/d_field cotangents sum in the outer graph)
        outs = [
            _fused_march(static, params, state[i:i + _BWD_MAX_G], pairs,
                         field)
            for i in range(0, G, _BWD_MAX_G)]
        out = jnp.concatenate(outs, axis=0)              # (G, 8, B)
    rows = jnp.transpose(out, (1, 0, 2)).reshape(8, G * _B)[:, :P]
    x, y, z, Tx, Ty, Tz = (rows[i] for i in range(6))

    Tn = jnp.sqrt(Tx * Tx + Ty * Ty + Tz * Tz)
    dirx_f = jnp.where(inside, Tx / Tn, dcx)
    diry_f = jnp.where(inside, Ty / Tn, dcy)
    dirz_f = jnp.where(inside, Tz / Tn, dcz)
    return x, y, z, dirx_f, diry_f, dirz_f
