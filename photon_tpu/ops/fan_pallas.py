"""Fused (P, R) ray-fan statistics kernel.

The fast renderer's non-march cost is the (P particles, R rays)
generation -> lens -> sensor-stats chain: ~15 XLA passes over (P, R)
f32 intermediates (~230 MB each at the BOS bench's 60M rays), so both
the forward (~58 ms) and its autodiff transpose (~66 ms) are pure HBM
streaming — while the useful inputs (per-particle columns, per-ray lens
rows) and outputs (three per-particle sums) are a few MB.  This kernel
runs the whole chain inside VMEM per (particle-block, ray-block) tile:

    A  [p] = sum_r amp[p, r]
    AX [p] = sum_r amp[p, r] * X[p, r]          (X = d_x - 0.5)
    AY [p] = sum_r amp[p, r] * Y[p, r]

which is everything the per-particle erf splat consumes (its anchor and
amplitude-weighted centroid; models.render_fast).  HBM traffic drops to
the (P,) columns + (R,) rows, ~40x less than the XLA chain.  The
per-particle columns travel as ONE packed (Pt, 16) block per grid step
(ten separate (Pt, 1) blocks measured ~10x slower: the per-step cost
was 10 tiny strided DMAs, not compute).

The math is the SoA pipeline of models.render_fast.render_chunk,
verbatim: ray generation (ref parallel_ray_tracing.cu:104-130), the
chief-delta march application, the apparent / thin-lens / thick
biconvex lens models (ref :416-864, :1545-1648), the sensor-plane
intersection with the diffraction mirror quirk (ref :1441-1447), and
the cos^4 falloff (ref :1467-1472).  Scalar amplitude factors
(1/f#^2, lens transmission, 8/pi) fold into the per-particle ``amp0``
column outside.

The backward is the same kernel shape running ``jax.vjp`` of the tile
function in-kernel (the chain re-computes in VMEM; cotangents for the
particle columns come out as one more packed per-particle block) — no
(P, R) residual ever exists in either direction.

Unsupported configs (camera rotation, per-ray splats, position noise,
bilinear sensor) stay on the XLA SoA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PT = 512      # particles per block (sublane axis), forward
_PT_BWD = 128  # backward block: the in-kernel jax.vjp keeps ~30 live
               # (Pt, Rt) residuals, which OOMs scoped VMEM at 512
_RT = 512      # rays per block (lane axis)
_NC = 16       # packed per-particle columns (10 used, padded to 16)


class FanScalars(NamedTuple):
    """Trace-time scalar config of the fan chain (closure constants)."""
    image_distance: float
    shift: float                 # z_offset + 750e3 (march frame)
    # apparent
    z_object: float
    magnification: float
    # thin / thick
    z_lens: float
    pitch: float
    focal_length: float
    vertex: float
    r_front: float
    r_back: float
    n_lens: float
    # sensor
    nx: int
    ny: int
    pixel_pitch: float
    z_sensor: float


def _refract(dx, dy, dz, nx_, ny_, nz_, ratio):
    cos_i = -(dx * nx_ + dy * ny_ + dz * nz_)
    radicand = 1.0 - ratio * ratio * (1.0 - cos_i * cos_i)
    tir = radicand < 0.0
    k = ratio * cos_i - jnp.sqrt(jnp.maximum(radicand, 0.0))
    ox = dx * ratio + k * nx_
    oy = dy * ratio + k * ny_
    oz = dz * ratio + k * nz_
    inv = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)
    return ox * inv, oy * inv, oz * inv, tir


def _sphere_hit(cz, radius, dx, dy, dz, px, py, pz):
    ox, oy, oz = px, py, pz - cz
    beta = 2.0 * (dx * ox + dy * oy + dz * oz)
    gamma = ox * ox + oy * oy + oz * oz - radius * radius
    disc = beta * beta - 4.0 * gamma
    miss = disc < 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-beta + sq) / 2.0
    t2 = (-beta - sq) / 2.0
    lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
    t = jnp.where(radius > 0, lo, hi)
    return px + dx * t, py + dy * t, pz + dz * t, miss


def _fan_tile(cpack, rows, sc: FanScalars, *, lens_model: str,
              has_march: bool, mirror_x: bool):
    """One (Pt, Rt) tile of the fan chain -> (Pt, 8) packed stats.

    ``cpack``: (Pt, _NC) packed per-particle columns
    [xs, ys, zs, amp0, dz_exit, dpx, dpy, ddx, ddy, ddz, pad...];
    ``rows``: 3 per-ray (1, Rt) rows [x_lens, y_lens, ray_mask].
    Twin of models.render_fast.render_chunk's pre-splat math.
    """
    (xs, ys, zs, amp0, dze, dpx_, dpy_, ddx_, ddy_, ddz_) = (
        cpack[:, j:j + 1] for j in range(10))
    x_lens, y_lens, rmask = rows

    denom = sc.image_distance - zs                     # (Pt, 1)
    tx = -(x_lens - xs) / denom                        # (Pt, Rt)
    ty = -(y_lens - ys) / denom
    inv = jax.lax.rsqrt(tx * tx + ty * ty + 1.0)
    dx, dy, dz = tx * inv, ty * inv, -inv
    px = xs + jnp.zeros_like(tx)
    py = ys + jnp.zeros_like(tx)
    pz = zs + jnp.zeros_like(tx)
    valid = jnp.ones_like(tx, dtype=bool)

    if has_march:
        # to_world (unrotated: z-shift only), apply chief deltas,
        # to_camera — ops.march_fast.apply_chief_deltas componentwise
        pzw = pz - sc.shift
        t = (dze - pzw) / dz
        px = px + dx * t + dpx_
        py = py + dy * t + dpy_
        pzw = dze + jnp.zeros_like(tx)
        ox_, oy2, oz_ = dx + ddx_, dy + ddy_, dz + ddz_
        inv2 = jax.lax.rsqrt(ox_ * ox_ + oy2 * oy2 + oz_ * oz_)
        dx, dy, dz = ox_ * inv2, oy2 * inv2, oz_ * inv2
        pz = pzw + sc.shift

    if lens_model == "apparent":
        rdx, rdy, rdz = -dx, -dy, -dz
        t = (sc.z_object - pz) / rdz
        hx = px + rdx * t
        hy = py + rdy * t
        ix = -hx * sc.magnification
        iy = -hy * sc.magnification
        fdx, fdy, fdz = rdx, rdy, rdz
    else:
        if lens_model == "thin-lens":
            t = (sc.z_lens - pz) / dz
            hx, hy = px + dx * t, py + dy * t
            r2 = hx * hx + hy * hy
            valid = valid & (r2 <= (sc.pitch / 2.0) ** 2)
            ox_ = -hx / sc.focal_length + dx
            oy2 = -hy / sc.focal_length + dy
            oz_ = dz
            inv3 = jax.lax.rsqrt(ox_ * ox_ + oy2 * oy2 + oz_ * oz_)
            px, py, pz = hx, hy, sc.z_lens + jnp.zeros_like(hx)
            dx, dy, dz = ox_ * inv3, oy2 * inv3, oz_ * inv3
        else:
            half_pitch = sc.pitch / 2.0
            czf = sc.z_lens + sc.vertex / 2.0 - sc.r_front
            hx, hy, hz, miss = _sphere_hit(czf, sc.r_front,
                                           dx, dy, dz, px, py, pz)
            r2 = hx * hx + hy * hy
            valid = valid & ~miss & (r2 <= half_pitch * half_pitch)
            nx_, ny_, nz_ = hx, hy, hz - czf
            invn = jax.lax.rsqrt(nx_ * nx_ + ny_ * ny_ + nz_ * nz_)
            dx, dy, dz, tir = _refract(dx, dy, dz, nx_ * invn, ny_ * invn,
                                       nz_ * invn, 1.0 / sc.n_lens)
            valid = valid & ~tir
            px, py, pz = hx, hy, hz

            czb = sc.z_lens - sc.vertex / 2.0 - sc.r_back
            hx, hy, hz, miss = _sphere_hit(czb, sc.r_back,
                                           dx, dy, dz, px, py, pz)
            r2 = hx * hx + hy * hy
            valid = valid & ~miss & (r2 <= half_pitch * half_pitch)
            nx_, ny_, nz_ = -hx, -hy, -(hz - czb)
            invn = jax.lax.rsqrt(nx_ * nx_ + ny_ * ny_ + nz_ * nz_)
            dx, dy, dz, tir = _refract(dx, dy, dz, nx_ * invn, ny_ * invn,
                                       nz_ * invn, sc.n_lens)
            valid = valid & ~tir
            px, py, pz = hx, hy, hz
        t = (sc.z_sensor - pz) / dz
        ix = px + dx * t
        iy = py + dy * t
        fdx, fdy, fdz = dx, dy, dz

    nx, ny = sc.nx, sc.ny
    pitch = sc.pixel_pitch
    pixel_1_x = -pitch * (nx - 1) / 2.0
    pixel_1_y = -pitch * (ny - 1) / 2.0
    if mirror_x:
        d_x = (nx - 1) - (ix - pixel_1_x) / pitch
    else:
        d_x = (ix - pixel_1_x) / pitch
    d_y = (iy - pixel_1_y) / pitch
    on_sensor = (d_x >= 0) & (d_x < nx) & (d_y >= 0) & (d_y < ny)
    valid = valid & on_sensor

    cos2 = (fdz * fdz) / (fdx * fdx + fdy * fdy + fdz * fdz)
    amp = amp0 * cos2 * cos2 * rmask
    amp = jnp.where(valid, amp, 0.0)
    # X/Y of culled rays must not poison the weighted sums (0 * big or
    # 0 * inf): zero them under the same mask
    Xm = jnp.where(valid, d_x - 0.5, 0.0)
    Ym = jnp.where(valid, d_y - 0.5, 0.0)
    A = jnp.sum(amp, axis=1, keepdims=True)
    AX = jnp.sum(amp * Xm, axis=1, keepdims=True)
    AY = jnp.sum(amp * Ym, axis=1, keepdims=True)
    return jnp.concatenate(
        [A, AX, AY, jnp.zeros((A.shape[0], 5), jnp.float32)], axis=1)


def _fan_fwd_kernel(cpack_ref, xl, yl, rm, out_ref,
                    *, sc, lens_model, has_march, mirror_x):
    r = pl.program_id(1)
    stats = _fan_tile(cpack_ref[0], (xl[0], yl[0], rm[0]), sc,
                      lens_model=lens_model, has_march=has_march,
                      mirror_x=mirror_x)

    @pl.when(r == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += stats


def _fan_bwd_kernel(cpack_ref, xl, yl, rm, ct_ref, dout_ref,
                    *, sc, lens_model, has_march, mirror_x):
    r = pl.program_id(1)
    rows = (xl[0], yl[0], rm[0])

    def f(cpack):
        return _fan_tile(cpack, rows, sc, lens_model=lens_model,
                         has_march=has_march, mirror_x=mirror_x)

    _, vjp = jax.vjp(f, cpack_ref[0])
    (d_cpack,) = vjp(ct_ref[0])

    @pl.when(r == 0)
    def _():
        dout_ref[0] = jnp.zeros_like(dout_ref[0])

    dout_ref[0] += d_cpack


def _call(kern_head, extra_in_specs, out_nc, Gp, Gr, args, interpret, sc,
          lens_model, has_march, mirror_x, pt=_PT):
    col_spec = pl.BlockSpec((1, pt, _NC), lambda g, r: (g, 0, 0))
    row_spec = pl.BlockSpec((1, _RT), lambda g, r: (0, r))
    out_spec = pl.BlockSpec((1, pt, out_nc), lambda g, r: (g, 0, 0))
    kern = functools.partial(kern_head, sc=sc, lens_model=lens_model,
                             has_march=has_march, mirror_x=mirror_x)
    return pl.pallas_call(
        kern,
        grid=(Gp, Gr),
        in_specs=[col_spec] + [row_spec] * 3 + extra_in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Gp, pt, out_nc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fan_stats(static, sc, shapes, interpret, cpack, rows):
    Gp, Gr = shapes
    lens_model, has_march, mirror_x = static
    return _call(_fan_fwd_kernel, [], 8, Gp, Gr,
                 [cpack] + list(rows), interpret, sc, lens_model,
                 has_march, mirror_x)


def _fan_stats_fwd(static, sc, shapes, interpret, cpack, rows):
    out = _fan_stats(static, sc, shapes, interpret, cpack, rows)
    return out, (cpack, rows)


def _fan_stats_bwd(static, sc, shapes, interpret, res, ct):
    Gp, Gr = shapes
    lens_model, has_march, mirror_x = static
    cpack, rows = res
    # reblock to the smaller backward particle block (pure relabeling)
    f = _PT // _PT_BWD
    cpack_b = cpack.reshape(Gp * f, _PT_BWD, _NC)
    ct_b = ct.reshape(Gp * f, _PT_BWD, 8)
    ct_spec = pl.BlockSpec((1, _PT_BWD, 8), lambda g, r: (g, 0, 0))
    d_cpack = _call(_fan_bwd_kernel, [ct_spec], _NC, Gp * f, Gr,
                    [cpack_b] + list(rows) + [ct_b], interpret, sc,
                    lens_model, has_march, mirror_x, pt=_PT_BWD)
    d_rows = tuple(jnp.zeros_like(r) for r in rows)
    return d_cpack.reshape(Gp, _PT, _NC), d_rows


_fan_stats.defvjp(_fan_stats_fwd, _fan_stats_bwd)


def fan_stats(xs, ys, zs, amp0, deltas6, x_lens, y_lens, *,
              sc: FanScalars, lens_model: str, mirror_x: bool = True,
              interpret=None):
    """Per-particle fan statistics (A, AX, AY), each (P,).

    ``amp0``: per-particle amplitude with all scalar factors folded
    (radiance / f#^2 * transmission * 8/pi).  ``deltas6``: chief-march
    deltas or None.  ``x_lens``/``y_lens``: (R,) lens-aperture sample
    offsets (R == 1 must pass zeros — the caller's quirk).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = xs.shape[0]
    R = x_lens.shape[0]
    Gp = -(-P // _PT)
    Gr = -(-R // _RT)
    has_march = deltas6 is not None
    if not has_march:
        deltas6 = (jnp.zeros_like(xs),) * 6
    cols = [xs, ys, zs, amp0] + list(deltas6)
    ppad = Gp * _PT - P
    packed = jnp.stack([c.astype(jnp.float32) for c in cols], axis=-1)
    packed = jnp.pad(packed, ((0, ppad), (0, _NC - len(cols))))
    cpack = packed.reshape(Gp, _PT, _NC)

    rpad = Gr * _RT - R
    rmask = jnp.ones((R,), jnp.float32)

    def padr(a):
        a = a.astype(jnp.float32)
        if rpad:
            a = jnp.concatenate([a, jnp.zeros((rpad,), jnp.float32)])
        return a.reshape(1, Gr * _RT)

    rows = (padr(x_lens), padr(y_lens), padr(rmask))
    static = (lens_model, has_march, bool(mirror_x))
    out = _fan_stats(static, sc, (Gp, Gr), bool(interpret), cpack, rows)
    flat = out.reshape(Gp * _PT, 8)[:P]
    return flat[:, 0], flat[:, 1], flat[:, 2]
