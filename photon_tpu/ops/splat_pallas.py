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
