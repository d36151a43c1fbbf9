"""Fused Pallas TPU kernel for the chief-ray tube march.

The XLA version (ops.march_fast.march_tubes) expresses the z-slab scan as
~60 scanned steps of small elementwise ops; XLA materializes the carry
and intermediates in HBM every step.  This kernel fuses the entire march:
ray state lives in VMEM for all steps, tube slabs stream from HBM with a
double-buffered async DMA (one slab pair ahead), and each RK4 stage's
TW x TW cross-section reduction is unrolled VPU code on (8, 128)
particle tiles.

Layout: particles are padded to blocks of B = 8*128 = 1024 and reshaped
(G, 8, 128); tube slabs arrive as (G, D, 4, TW*TW, 8, 128) float32 —
(channel, flattened cross-section) per particle — and window origins as
(G, D, 2, 8, 128), both built once per render by :func:`pack_tubes`.
Slanted tubes (windows re-centered on the chief line at every slab,
march_fast.extract_tubes) are supported: each slab's origin pair is
DMA'd alongside its voxel data.

Same math as march_tubes' RK4/Euler z-parametrization (see
ops.march_fast for the physics derivation and reference citations).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photon_tpu.ops.march_fast import TUBE_WIDTH, TubeBundle, _tube_width
from photon_tpu.volume import DensityVolume

_BLK = (8, 128)
_B = _BLK[0] * _BLK[1]


def pack_tubes(tubes: TubeBundle) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           int, int]:
    """(D, 4, TW*TW, P) -> (G, D, 4, TW*TW, 8, 128) padded blocks,
    plus origins (D, P) x0/y0 -> (G, D, 2, 8, 128)."""
    d, c, q, p = tubes.slabs.shape
    g = math.ceil(p / _B)
    pad = g * _B - p
    slabs = tubes.slabs
    origins = jnp.stack([tubes.x0, tubes.y0], axis=1)       # (D, 2, P)
    if pad:
        slabs = jnp.pad(slabs, ((0, 0), (0, 0), (0, 0), (0, pad)))
        origins = jnp.pad(origins, ((0, 0), (0, 0), (0, pad)))
    slabs = slabs.reshape(d, c, q, g, _BLK[0], _BLK[1])
    origins = origins.reshape(d, 2, g, _BLK[0], _BLK[1])
    return (jnp.transpose(slabs, (3, 0, 1, 2, 4, 5)),
            jnp.transpose(origins, (2, 0, 1, 3, 4)), g, pad)


def _pad_block(a, g, pad, fill=0.0):
    if pad:
        a = jnp.pad(a, ((0, pad),), constant_values=fill)
    return a.reshape(g, _BLK[0], _BLK[1])


def _march_kernel(sx_ref, sy_ref, dz_ref, zp0_ref,
                  x_ref, y_ref, z_ref, tx_ref, ty_ref, tz_ref,
                  act_ref, slabs_hbm, orig_hbm,
                  ox_ref, oy_ref, oz_ref, otx_ref, oty_ref, otz_ref,
                  slab_buf, orig_buf, sem, sem_o,
                  *, n_steps: int, tw: int, algorithm: int):
    """One particle block: full march, slabs DMA'd slab-pair by pair.

    SMEM scalars: sx/sy (tube x/y scale), dz (slab z extent), zp0
    (world z of voxel plane 0).
    slabs_hbm: (G, D, 4, TW*TW, 8, 128) in ANY/HBM (whole array; this
    block selects its G row via program_id).
    orig_hbm: (G, D, 2, 8, 128) per-slab window origins (x0, y0).
    slab_buf: VMEM scratch (2, 2, 4, TW*TW, 8, 128) — double buffer of
    slab *pairs* (lo, hi); orig_buf: (2, 2, 2, 8, 128) likewise.
    """
    gidx = pl.program_id(0)
    sx = sx_ref[0, 0]
    sy = sy_ref[0, 0]
    dz_slab = dz_ref[0, 0]
    zp0 = zp0_ref[0, 0]

    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    tx = tx_ref[0]
    ty = ty_ref[0]
    tz = tz_ref[0]
    active = act_ref[0] > 0.5

    d = n_steps + 1   # number of slabs

    def start_dma(slot, k):
        # copy slabs k (lo) and k+1 (hi) + their window origins
        pltpu.make_async_copy(slabs_hbm.at[gidx, k], slab_buf.at[slot, 0],
                              sem.at[slot, 0]).start()
        pltpu.make_async_copy(slabs_hbm.at[gidx, k + 1],
                              slab_buf.at[slot, 1], sem.at[slot, 1]).start()
        pltpu.make_async_copy(orig_hbm.at[gidx, k], orig_buf.at[slot, 0],
                              sem_o.at[slot, 0]).start()
        pltpu.make_async_copy(orig_hbm.at[gidx, k + 1],
                              orig_buf.at[slot, 1],
                              sem_o.at[slot, 1]).start()

    def wait_dma(slot, k):
        pltpu.make_async_copy(slabs_hbm.at[gidx, k], slab_buf.at[slot, 0],
                              sem.at[slot, 0]).wait()
        pltpu.make_async_copy(slabs_hbm.at[gidx, k + 1],
                              slab_buf.at[slot, 1], sem.at[slot, 1]).wait()
        pltpu.make_async_copy(orig_hbm.at[gidx, k], orig_buf.at[slot, 0],
                              sem_o.at[slot, 0]).wait()
        pltpu.make_async_copy(orig_hbm.at[gidx, k + 1],
                              orig_buf.at[slot, 1],
                              sem_o.at[slot, 1]).wait()

    # warm up: top slab pair (k = d-2)
    start_dma(0, d - 2)

    def cross_section(slot, which, wx, wy):
        """sum_{j,i} wy_j wx_i slab[c, j*tw+i] for the 4 channels."""
        outs = []
        for c in range(4):
            acc = None
            for j in range(tw):
                inner = None
                for i in range(tw):
                    col = slab_buf[slot, which, c, j * tw + i]
                    term = wx[i] * col
                    inner = term if inner is None else inner + term
                term = wy[j] * inner
                acc = term if acc is None else acc + term
            outs.append(acc)
        return outs

    def hat(u):
        uc = jnp.clip(u, 0.0, tw - 1.0)
        return [jnp.maximum(0.0, 1.0 - jnp.abs(uc - i)) for i in range(tw)]

    def body(s, carry):
        x, y, z, tx, ty, tz = carry
        k = (d - 2) - s               # slab index this step
        slot = s % 2
        # final plane clamps to z_min (= zp0); see march_fast/march_dense
        z_plane = jnp.maximum(
            zp0 + (k.astype(jnp.float32) - 0.5) * dz_slab, zp0)

        # prefetch the next pair while waiting on this one
        @pl.when(s + 1 < n_steps)
        def _():
            start_dma((s + 1) % 2, k - 1)

        wait_dma(slot, k)

        in_band = active & (z > z_plane)
        hstep = -(z - z_plane)

        x0_lo = orig_buf[slot, 0, 0]
        y0_lo = orig_buf[slot, 0, 1]
        x0_hi = orig_buf[slot, 1, 0]
        y0_hi = orig_buf[slot, 1, 1]

        def rhs(px, py, ptx, pty, ptz, z_at):
            lo = cross_section(slot, 0, hat((px - x0_lo) / sx),
                               hat((py - y0_lo) / sy))
            hi = cross_section(slot, 1, hat((px - x0_hi) / sx),
                               hat((py - y0_hi) / sy))
            tzf = jnp.clip((z_at - z_plane) / dz_slab, 0.0, 1.0)
            gx = lo[0] + tzf * (hi[0] - lo[0])
            gy = lo[1] + tzf * (hi[1] - lo[1])
            gz = lo[2] + tzf * (hi[2] - lo[2])
            nm1 = lo[3] + tzf * (hi[3] - lo[3])
            n = 1.0 + nm1
            inv_tz = 1.0 / ptz
            g = n * inv_tz
            return (ptx * inv_tz, pty * inv_tz, g * gx, g * gy, g * gz)

        if algorithm == 1:
            k1 = rhs(x, y, tx, ty, tz, z)
            x_n = x + hstep * k1[0]
            y_n = y + hstep * k1[1]
            tx_n = tx + hstep * k1[2]
            ty_n = ty + hstep * k1[3]
            tz_n = tz + hstep * k1[4]
        else:
            k1 = rhs(x, y, tx, ty, tz, z)
            h2 = hstep / 2.0
            k2 = rhs(x + h2 * k1[0], y + h2 * k1[1], tx + h2 * k1[2],
                     ty + h2 * k1[3], tz + h2 * k1[4], z + h2)
            k3 = rhs(x + h2 * k2[0], y + h2 * k2[1], tx + h2 * k2[2],
                     ty + h2 * k2[3], tz + h2 * k2[4], z + h2)
            k4 = rhs(x + hstep * k3[0], y + hstep * k3[1],
                     tx + hstep * k3[2], ty + hstep * k3[3],
                     tz + hstep * k3[4], z + hstep)
            s6 = hstep / 6.0
            x_n = x + s6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            y_n = y + s6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
            tx_n = tx + s6 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
            ty_n = ty + s6 * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
            tz_n = tz + s6 * (k1[4] + 2 * k2[4] + 2 * k3[4] + k4[4])

        z_n = jnp.zeros_like(z) + z_plane
        x = jnp.where(in_band, x_n, x)
        y = jnp.where(in_band, y_n, y)
        z = jnp.where(in_band, z_n, z)
        tx = jnp.where(in_band, tx_n, tx)
        ty = jnp.where(in_band, ty_n, ty)
        tz = jnp.where(in_band, tz_n, tz)
        return (x, y, z, tx, ty, tz)

    x, y, z, tx, ty, tz = jax.lax.fori_loop(
        0, n_steps, body, (x, y, z, tx, ty, tz))

    ox_ref[0] = x
    oy_ref[0] = y
    oz_ref[0] = z
    otx_ref[0] = tx
    oty_ref[0] = ty
    otz_ref[0] = tz


def march_chief_pallas(vol: DensityVolume, tubes: TubeBundle,
                       xs, ys, zs, dcx, dcy, dcz,
                       algorithm: int = 2, interpret: bool = False):
    """Pallas-fused chief-ray march; same contract as
    march_fast.march_tubes with (P,) states (vertical or slanted
    tubes)."""
    w, h, d = vol.sizes
    tw = _tube_width(tubes)
    sx = (vol.max_bound[0] - vol.min_bound[0]) / (w - 2.0)
    sy = (vol.max_bound[1] - vol.min_bound[1]) / (h - 2.0)
    z_max = vol.max_bound[2]
    z_min = vol.min_bound[2]
    dz_slab = (z_max - z_min) / (d - 2.0)

    # entry advance + Sharma variables (same as march_tubes)
    t_entry = (z_max - zs) / dcz
    above = zs >= z_max
    adv = jnp.where(above, jnp.maximum(t_entry, 0.0), 0.0)
    x = xs + dcx * adv
    y = ys + dcy * adv
    z = zs + dcz * adv
    inside = (z <= z_max) & (z >= z_min) & (dcz < 0)
    n0 = 1.0 + vol.data_min
    tx = n0 * dcx
    ty = n0 * dcy
    tz = n0 * dcz

    slabs_blk, orig_blk, g, pad = pack_tubes(tubes)
    p = xs.shape[0]

    blocks = [_pad_block(a, g, pad) for a in
              (x, y, z, tx, ty, tz, inside.astype(jnp.float32))]

    n_steps = d - 1
    kern = functools.partial(_march_kernel, n_steps=n_steps, tw=tw,
                             algorithm=algorithm)

    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    blk_spec = pl.BlockSpec((1,) + _BLK, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((g,) + _BLK, jnp.float32)] * 6

    scalars = (jnp.asarray([[sx]], jnp.float32),
               jnp.asarray([[sy]], jnp.float32),
               jnp.asarray([[dz_slab]], jnp.float32),
               jnp.asarray([[z_min]], jnp.float32))

    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[smem_spec] * 4 + [blk_spec] * 7
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[blk_spec] * 6,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, 2, 4, tw * tw) + _BLK, jnp.float32),
            pltpu.VMEM((2, 2, 2) + _BLK, jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(*scalars, *blocks, slabs_blk, orig_blk)

    def unblock(a):
        return a.reshape(g * _B)[:p]

    xo, yo, zo, txo, tyo, tzo = (unblock(o) for o in outs)
    tn = jnp.sqrt(txo * txo + tyo * tyo + tzo * tzo)
    dxo = jnp.where(inside, txo / tn, dcx)
    dyo = jnp.where(inside, tyo / tn, dcy)
    dzo = jnp.where(inside, tzo / tn, dcz)
    xo = jnp.where(inside, xo, x)
    yo = jnp.where(inside, yo, y)
    zo = jnp.where(inside, zo, z)
    return xo, yo, zo, dxo, dyo, dzo
