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

from photon_tpu.ops.march_dense_pallas import _dot3, _weights_T

_B = 1024          # rays per block (lane-major rows)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_kernel(params_ref, state_ref, pair_ref, out_ref, scratch,
                  *, W: int, H: int, S: int, scheme: int, algorithm: int,
                  substeps: int):
    """One (ray block g, slab s) grid step of the fused march.

    params_ref (SMEM, (8,)): min_x, min_y, sx, sy, z_min, dz_slab.
    state_ref / out_ref: (1, 8, B) rows [x, y, z, Tx, Ty, Tz, inside, -].
    pair_ref: (W*4, 2H) — slab pair s in the packed-K layout
      [loT | hiT] along the contraction axis.
    scratch: (8, B) VMEM register file persisting across the slab axis.
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


def _fused_call(static, params, state, pairs):
    """state: (G, 8, B); pairs: (S, W*4, 2H); params: (8,) f32."""
    W, H, S, scheme, algorithm, substeps, interpret = static
    G = state.shape[0]
    kern = functools.partial(_fused_kernel, W=W, H=H, S=S, scheme=scheme,
                             algorithm=algorithm, substeps=substeps)
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
        out_specs=pl.BlockSpec((1, 8, _B), lambda g, s: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, _B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _B), jnp.float32)],
        interpret=interpret,
    )(params, state, pairs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_march(static, params, state, pairs, field):
    """field rides along purely for the backward re-march (unused fwd)."""
    del field
    return _fused_call(static, params, state, pairs)


def _fused_march_fwd(static, params, state, pairs, field):
    return _fused_call(static, params, state, pairs), (params, state, field)


def _fused_march_bwd(static, res, ct):
    """Recompute-in-backward through the differentiable per-stage path.

    Rebuilds the march from the saved (params, state, field) with the
    per-stage sampler kernels (their hand-written cotangent kernels do
    the heavy lifting) and transposes the state packing around it.
    """
    W, H, S, scheme, algorithm, substeps, interpret = static
    params, state, field = res

    def unfused(params, state, field):
        return _unfused_equivalent(static, params, state, field)

    _, vjp = jax.vjp(unfused, params, state, field)
    d_params, d_state, d_field = vjp(ct)
    # pairs is a pure repack of field; its cotangent is folded into
    # d_field by the recompute (which rebuilds the pairs internally)
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

    out = _fused_march(static, params, state, pairs, field)  # (G, 8, B)
    rows = jnp.transpose(out, (1, 0, 2)).reshape(8, G * _B)[:, :P]
    x, y, z, Tx, Ty, Tz = (rows[i] for i in range(6))

    Tn = jnp.sqrt(Tx * Tx + Ty * Ty + Tz * Tz)
    dirx_f = jnp.where(inside, Tx / Tn, dcx)
    diry_f = jnp.where(inside, Ty / Tn, dcy)
    dirz_f = jnp.where(inside, Tz / Tn, dcz)
    return x, y, z, dirx_f, diry_f, dirz_f
