"""Fused Pallas particle-splat: erf spots accumulated in a VMEM image.

ops.sensor_fast.particle_splat builds (P, K, K) patches in XLA and
scatter-adds them into the frame — measured at ~90 ms for 1e5 particles
on v5e (XLA scatter runs element-at-a-time, ~100M deposits/s, and it is
the largest non-march cost of the forward).  This kernel replaces the
whole weights -> patch -> scatter chain for the per-particle
(diffraction, no-noise) path:

* the image lives in VMEM for the whole kernel as (ny, nx/128, 128) —
  dim 0 is untiled, so a K-row deposit at any (row, col) is a plain
  dynamic slice on dim 0 plus a scalar index into the 128-lane tiles;
* per particle the K x K erf patch (with the reference's circular
  render mask) is built in-register from the (P,) centroid rows staged
  in SMEM, placed at its lane offset with a dynamic `pltpu.roll`, and
  read-modify-written into the two affected lane tiles;
* particles stream through a sequential grid of SMEM row blocks; the
  single image block is written back to HBM once, at the last step.

Anchors are pre-clamped fully inside the frame (particle_splat does
this): erf weights depend only on ``pixel - center``, so shifting the
window never changes a visible pixel's value, and the circular mask
zeroes anything the shift exposes — matching the XLA path to float32
rounding (tests/test_splat_pallas.py compares at ~1e-6 relative; the
erf approximation below keeps the kernel inside that budget).

erf inside the kernel uses the Abramowitz–Stegun 7.1.26 rational
approximation (|err| < 1.5e-7, i.e. float32 noise) — elementwise-exact
parity with XLA's erf is not required by any budget.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PB = 1024         # particles per grid step (SMEM row blocks)
_LANES = 128

# A&S 7.1.26 coefficients
_A1, _A2, _A3, _A4, _A5 = (0.254829592, -0.284496736, 1.421413741,
                           -1.453152027, 1.061405429)
_P = 0.3275911


def _erf(x):
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    y = 1.0 - (((((_A5 * t + _A4) * t) + _A3) * t + _A2) * t + _A1) * t \
        * jnp.exp(-ax * ax)
    return s * y


def _splat_kernel(xb_ref, yb_ref, amp_ref, col0_ref, row0_ref, img_ref,
                  *, K: int, ny: int, nxt: int, diameter: float,
                  render_fraction: float):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        img_ref[:] = jnp.zeros_like(img_ref)

    sqrt8_d = jnp.float32(math.sqrt(8.0) / diameter)
    rfd2 = jnp.float32((render_fraction * diameter) ** 2)
    # Mosaic's iota is integer-only; convert after
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) \
        .astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) \
        .astype(jnp.float32)

    def body(i, _):
        X = xb_ref[0, 0, i]
        Y = yb_ref[0, 0, i]
        A = amp_ref[0, 0, i]
        c0 = col0_ref[0, 0, i]
        r0 = row0_ref[0, 0, i]
        fc = c0.astype(jnp.float32) + iota_c - X          # (1, K)
        fr = r0.astype(jnp.float32) + iota_r - Y          # (K, 1)
        wx = _erf(sqrt8_d * (fc - 0.5)) - _erf(sqrt8_d * (fc + 0.5))
        wy = (_erf(sqrt8_d * (fr - 0.5)) - _erf(sqrt8_d * (fr + 0.5))) * A
        patch = wy * wx                                   # (K, K)
        patch = jnp.where(fc * fc + fr * fr <= rfd2, patch, 0.0)

        buf = jnp.concatenate(
            [patch, jnp.zeros((K, 2 * _LANES - K), jnp.float32)], axis=1)
        o = jax.lax.rem(c0, _LANES)
        t0 = jax.lax.div(c0, _LANES)
        buf = pltpu.roll(buf, o, axis=1)                  # dynamic shift
        t1 = jnp.minimum(t0 + 1, nxt - 1)

        idx0 = (pl.ds(r0, K), t0)
        img_ref[idx0] = img_ref[idx0] + buf[:, :_LANES]
        idx1 = (pl.ds(r0, K), t1)
        # when the patch doesn't cross a lane-tile boundary the second
        # half of buf is zero, so the (clamped) second store is a no-op
        img_ref[idx1] = img_ref[idx1] + buf[:, _LANES:]
        return 0

    jax.lax.fori_loop(0, _PB, body, 0)


@functools.partial(jax.jit, static_argnames=("K", "ny", "nx", "diameter",
                                             "render_fraction",
                                             "interpret"))
def splat_particles_pallas(Xbar, Ybar, A, col0, row0, *, K: int, ny: int,
                           nx: int, diameter: float,
                           render_fraction: float,
                           interpret: bool = False):
    """Accumulate P clamped-anchor erf spots into an (ny, nx) image.

    Same contract as the patch+scatter tail of sensor_fast.particle_splat
    with in-bounds anchors: Xbar/Ybar (P,) centroid pixel coordinates,
    A (P,) amplitudes (already scaled by pi/32), col0/row0 (P,) int32
    anchors in [0, nx-K] x [0, ny-K].
    """
    P = Xbar.shape[0]
    G = -(-P // _PB)
    pad = G * _PB - P
    nxt = -(-nx // _LANES)

    def prep(a, dtype):
        a = a.astype(dtype)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), dtype)])
        # (G, 1, PB): the SMEM block's last two dims must equal the
        # array's (Mosaic block-mapping rule), so the grid axis leads
        return a.reshape(G, 1, _PB)

    args = (prep(Xbar, jnp.float32), prep(Ybar, jnp.float32),
            prep(A, jnp.float32), prep(col0, jnp.int32),
            prep(row0, jnp.int32))

    row = pl.BlockSpec((1, 1, _PB), lambda g: (g, 0, 0),
                       memory_space=pltpu.SMEM)
    img = pl.pallas_call(
        functools.partial(_splat_kernel, K=K, ny=ny, nxt=nxt,
                          diameter=float(diameter),
                          render_fraction=float(render_fraction)),
        grid=(G,),
        in_specs=[row] * 5,
        out_specs=pl.BlockSpec((ny, nxt, _LANES), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nxt, _LANES), jnp.float32),
        interpret=interpret,
    )(*args)
    return img.reshape(ny, nxt * _LANES)[:, :nx]


def splat_supported(K: int, ny: int, nx: int) -> bool:
    """VMEM residency bound: image + double-buffered rows must fit."""
    return (K <= 64 and ny >= K and nx >= K
            and ny * (-(-nx // _LANES)) * _LANES * 4 <= 8 * 1024 * 1024)


# ---------------------------------------------------------------------------
# v2: sorted tile-accumulate splat (round 5)
# ---------------------------------------------------------------------------
#
# The v1 kernel pays ~0.37 us/particle of tiny-vector work: per particle
# it evaluates erf on (1, K)/(K, 1) shapes (8 of 1024 lanes busy), then
# concat + dynamic `pltpu.roll` + two read-modify-writes of image tiles.
# v2 restructures around the image's tile grid:
#
# * particles are SORTED (device argsort, outside the kernel) by the
#   (row-tile, lane-tile) their anchor lands in;
# * the kernel keeps ONE (16, 256) accumulation window — two row-tiles
#   x two lane-tiles, provably containing any K <= 8 patch anchored in
#   its first (8, 128) tile — and evaluates each particle's erf spot
#   DIRECTLY in window coordinates as full (16, 1) x (1, 256) vector
#   ops (the circular render mask zeroes everything beyond the spot, so
#   no placement/roll is needed at all);
# * the window flushes into the VMEM image only when the next
#   particle's tile differs — ~100 particles per flush at bench density
#   — so the per-particle cost is a handful of full-width vector ops.
#
# Sorting makes the per-tile accumulation order deterministic (it is a
# stable argsort of a pure function of the inputs); within-tile adds
# associate differently from v1, an ~1e-7 relative float difference.


def _splat_v2_kernel(xb_ref, yb_ref, amp_ref, tr_ref, tc_ref, img_ref,
                     acc, state, *, K: int, ny: int, nxt: int,
                     diameter: float, render_fraction: float):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        img_ref[:] = jnp.zeros_like(img_ref)
        acc[:] = jnp.zeros_like(acc)
        state[0] = -1
        state[1] = -1

    sqrt8_d = jnp.float32(math.sqrt(8.0) / diameter)
    rfd2 = jnp.float32((render_fraction * diameter) ** 2)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * _LANES), 1) \
        .astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) \
        .astype(jnp.float32)

    def flush():
        tr0 = state[0]
        tc0 = state[1]

        @pl.when(tr0 >= 0)
        def _():
            idx = (pl.ds(tr0 * 8, 16), pl.ds(tc0, 2))
            img_ref[idx] = img_ref[idx] + acc[:].reshape(16, 2, _LANES)

    def body(i, _):
        tr_i = tr_ref[0, 0, i]
        tc_i = tc_ref[0, 0, i]
        changed = (tr_i != state[0]) | (tc_i != state[1])

        @pl.when(changed)
        def _():
            flush()
            acc[:] = jnp.zeros_like(acc)
            state[0] = tr_i
            state[1] = tc_i

        X = xb_ref[0, 0, i]
        Y = yb_ref[0, 0, i]
        A = amp_ref[0, 0, i]
        fr = (tr_i * 8).astype(jnp.float32) + iota_r - Y      # (16, 1)
        fc = (tc_i * _LANES).astype(jnp.float32) + iota_c - X  # (1, 256)
        wy = (_erf(sqrt8_d * (fr - 0.5)) - _erf(sqrt8_d * (fr + 0.5))) * A
        wx = _erf(sqrt8_d * (fc - 0.5)) - _erf(sqrt8_d * (fc + 0.5))
        patch = jnp.where(fc * fc + fr * fr <= rfd2, wy * wx, 0.0)
        acc[:] = acc[:] + patch
        return 0

    jax.lax.fori_loop(0, _PB, body, 0)

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        flush()


@functools.partial(jax.jit, static_argnames=("K", "ny", "nx", "diameter",
                                             "render_fraction",
                                             "interpret"))
def splat_particles_pallas_v2(Xbar, Ybar, A, col0, row0, *, K: int,
                              ny: int, nx: int, diameter: float,
                              render_fraction: float,
                              interpret: bool = False):
    """Sorted tile-accumulate splat; same contract as
    :func:`splat_particles_pallas` (requires K <= 8, nx >= 256,
    ny >= 16 — see :func:`splat_v2_supported`)."""
    P = Xbar.shape[0]
    G = -(-P // _PB)
    pad = G * _PB - P
    nxt = -(-nx // _LANES)
    tr = jnp.clip(row0 // 8, 0, ny // 8 - 2).astype(jnp.int32)
    tc = jnp.clip(col0 // _LANES, 0, nxt - 2).astype(jnp.int32)
    order = jnp.argsort(tr * nxt + tc)
    Xs = Xbar[order]
    Ys = Ybar[order]
    As = A[order]
    tr = tr[order]
    tc = tc[order]

    def prep(a, dtype, fill=0.0):
        a = a.astype(dtype)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, dtype)])
        return a.reshape(G, 1, _PB)

    # padded slots carry amp 0 at tile (0, 0): they accumulate zeros
    args = (prep(Xs, jnp.float32, -1e6), prep(Ys, jnp.float32, -1e6),
            prep(As, jnp.float32), prep(tr, jnp.int32),
            prep(tc, jnp.int32))

    row = pl.BlockSpec((1, 1, _PB), lambda g: (g, 0, 0),
                       memory_space=pltpu.SMEM)
    img = pl.pallas_call(
        functools.partial(_splat_v2_kernel, K=K, ny=ny, nxt=nxt,
                          diameter=float(diameter),
                          render_fraction=float(render_fraction)),
        grid=(G,),
        in_specs=[row] * 5,
        out_specs=pl.BlockSpec((ny, nxt, _LANES), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nxt, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 2 * _LANES), jnp.float32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(*args)
    return img.reshape(ny, nxt * _LANES)[:, :nx]


def splat_v2_supported(K: int, ny: int, nx: int) -> bool:
    """v2's (16, 256) window must contain any anchored patch and the
    two-tile flush slice must stay in bounds."""
    return (K <= 8 and ny >= 16 and ny % 8 == 0 and nx >= 256
            and splat_supported(K, ny, nx))
