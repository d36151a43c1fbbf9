"""Fused Pallas TPU sampler for the dense matmul-interpolation march.

The XLA formulation of one dense-march sample (march_dense._slab_sample)
materializes a (P, 2*H*4) f32 intermediate in HBM per integrator stage —
~200 MB at the BOS bench's P=1e5 — so the march is HBM-bound (~100 GB of
traffic per render; measured: precision changes move the runtime <15%).
This kernel keeps the whole bilinear contraction on-chip:

    s[c, b] = sum_h sum_w  wy[h, b] * wx[w, b] * pair[h, w, c]

laid out with the big ray axis in the *lanes* (transposed relative to the
XLA path), so per 1024-ray block:

    A  = loT (W*4, H) @ wy0T (H, B)  +  hiT @ wy1T        [MXU]
    s  = sum_w wxT[w] * A.reshape(W, 4, B)[w]             [VPU]

with the interpolation weights built in-kernel from the (1, B) ray
coordinates (broadcast rows — no relayout).  HBM traffic per stage drops
to the (P,) coordinates + (P, 4) samples (~3 MB), and the slab pair
(<= 512 KB in the dense regime) is block-cached in VMEM.

The backward pass is a second kernel (custom_vjp): it recomputes A and
produces cotangents for the coordinates (via the analytic weight-kernel
derivatives, matching the clip/fold semantics of march_dense._tri_weights
/ _cubic_weights exactly) and for the slab pair, accumulated across ray
blocks through the sequential TPU grid.

Math parity: bit-identical weight definitions to ops.march_dense; tested
against the XLA sampler (values and gradients) in interpret mode
(tests/test_dense_pallas.py) and on real TPU via bench.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 1024          # rays per block: (sublane, lane) tiles of (8, 128)

# backward/cotangent matmuls run single-pass bf16 (gradient cosine
# similarity vs full-f32 is 1.0 at the bench scale; max rel err ~1e-4)
_MXU_PRECISION = jax.lax.Precision.DEFAULT


def _dot3(a, b, dn):
    """3-pass bf16-split matmul: ~f32 accuracy at half HIGHEST's cost.

    Mosaic rejects Precision.HIGH, so the split is done by hand:
    a @ b  ~=  a_hi @ b_hi + a_hi @ b_lo + a_lo @ b_hi, each a single
    bf16 MXU pass (the lo x lo term is below f32 epsilon).  Used for the
    forward sample (the physics path); measured end-of-march deflection
    error vs full f32 drops from ~3e-3 (single-pass) to ~1e-5 relative.
    """
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi

    def d(x, y):
        return jax.lax.dot_general(x, y, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dot_split(a, b, dn, passes: int):
    """bf16-split contraction with a selectable pass count.

    passes=3 is :func:`_dot3` (~f32: both operands' low bits
    corrected); passes=2 keeps the FIELD-low-bits correction
    (a_lo @ b_hi) and drops the weight-low-bits term (measured
    immaterial: 1-pass and weight-corrected 2-pass land on the same
    ~2e-3 deflection error, i.e. the split error is all in the field
    operand); passes=1 is plain bf16.  The fused and windowed marches
    default to 2 (see march_dense_fused._fwd_passes / PARITY.md).

    (A K-concat single-matmul variant — [a_hi | a_lo] @ [b_hi ; b_hi],
    one systolic fill/drain instead of two — was A/B-measured slightly
    SLOWER at bench scale and OOM'd the 512^3 windowed march: the
    per-stage concat copies cost more than the saved pipeline fill.)
    """
    if passes >= 3:
        return _dot3(a, b, dn)

    def d(x, y):
        return jax.lax.dot_general(x, y, dn,
                                   preferred_element_type=jnp.float32)

    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 1:
        return d(a_hi, b)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    return d(a_hi, b_hi) + d(a_lo, b_hi)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Weight kernels and their derivatives (transposed build: (n, B) from (1, B))
# ---------------------------------------------------------------------------


def _b3(x):
    ax = jnp.abs(x)
    inner = (4.0 - 6.0 * ax * ax + 3.0 * ax * ax * ax) / 6.0
    outer = (2.0 - ax) ** 3 / 6.0
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def _b3_d(x):
    ax = jnp.abs(x)
    s = jnp.sign(x)
    inner = s * (-12.0 * ax + 9.0 * ax * ax) / 6.0
    outer = -s * (2.0 - ax) ** 2 / 2.0
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def _weights_T(u_row, n: int, scheme: int):
    """(n, B) weight matrix from (1, B) coordinates; twin of
    march_dense._tri_weights / _cubic_weights (same clip + border folds)."""
    # Mosaic's iota is integer-only; convert after
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    if scheme == 2:
        uc = jnp.clip(u_row, -2.0, n + 1.0)
        w = _b3(uc - iota)
        fold_l = _b3(uc + 1.0) + _b3(uc + 2.0) + _b3(uc + 3.0)
        fold_r = _b3(uc - n) + _b3(uc - (n + 1.0)) + _b3(uc - (n + 2.0))
        w = w + jnp.where(iota == 0.0, fold_l, 0.0) \
            + jnp.where(iota == n - 1.0, fold_r, 0.0)
        return w
    uc = jnp.clip(u_row, 0.0, n - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(uc - iota))


def _weights_T_du(u_row, n: int, scheme: int):
    """d(weights)/du as (n, B), including the clip masks and folds."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
    if scheme == 2:
        uc = jnp.clip(u_row, -2.0, n + 1.0)
        mask = ((u_row > -2.0) & (u_row < n + 1.0)).astype(jnp.float32)
        d = _b3_d(uc - iota)
        fold_l = _b3_d(uc + 1.0) + _b3_d(uc + 2.0) + _b3_d(uc + 3.0)
        fold_r = _b3_d(uc - n) + _b3_d(uc - (n + 1.0)) + _b3_d(uc - (n + 2.0))
        d = d + jnp.where(iota == 0.0, fold_l, 0.0) \
            + jnp.where(iota == n - 1.0, fold_r, 0.0)
        return d * mask
    uc = jnp.clip(u_row, 0.0, n - 1.0)
    mask = ((u_row > 0.0) & (u_row < n - 1.0)).astype(jnp.float32)
    diff = uc - iota
    live = (jnp.abs(diff) < 1.0).astype(jnp.float32)
    return -jnp.sign(diff) * live * mask


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(ux_ref, uy_ref, uz_ref, lo_ref, hi_ref, out_ref,
                *, W: int, H: int, scheme: int):
    ux = ux_ref[0]                     # (1, B)
    uy = uy_ref[0]
    uz = uz_ref[0]
    wxT = _weights_T(ux, W, scheme)    # (W, B)
    wyT = _weights_T(uy, H, scheme)    # (H, B)
    wy0 = wyT * (1.0 - uz)
    wy1 = wyT * uz
    dn = (((1,), (0,)), ((), ()))      # contract axis 1 of lhs w/ axis 0 rhs
    A = _dot3(lo_ref[:], wy0, dn) + _dot3(hi_ref[:], wy1, dn)
    s = jnp.sum(A.reshape(W, 4, _B) * wxT[:, None, :], axis=0)   # (4, B)
    out_ref[0] = s


def _bwd_kernel(ux_ref, uy_ref, uz_ref, lo_ref, hi_ref, ct_ref,
                dux_ref, duy_ref, duz_ref, dlo_ref, dhi_ref,
                *, W: int, H: int, scheme: int):
    g = pl.program_id(0)
    ux = ux_ref[0]                     # (1, B)
    uy = uy_ref[0]
    uz = uz_ref[0]
    ct = ct_ref[0]                     # (4, B)

    wxT = _weights_T(ux, W, scheme)
    wyT = _weights_T(uy, H, scheme)
    wy0 = wyT * (1.0 - uz)
    wy1 = wyT * uz

    dn = (((1,), (0,)), ((), ()))
    A = jax.lax.dot_general(lo_ref[:], wy0, dn,
                            preferred_element_type=jnp.float32, precision=_MXU_PRECISION) \
        + jax.lax.dot_general(hi_ref[:], wy1, dn,
                              preferred_element_type=jnp.float32, precision=_MXU_PRECISION)

    # ct wrt wxT and ux
    A_r = A.reshape(W, 4, _B)
    ct_wxT = jnp.sum(A_r * ct[None], axis=1)                 # (W, B)
    dux_ref[0] = jnp.sum(ct_wxT * _weights_T_du(ux, W, scheme),
                         axis=0, keepdims=True)              # (1, B)

    # ct wrt A: (W*4, B)
    ct_A = (wxT[:, None, :] * ct[None]).reshape(W * 4, _B)

    # ct wrt slabs: contract over the ray lanes (accumulated across blocks)
    dn_b = (((1,), (1,)), ((), ()))    # (W4, B) x (H, B) -> (W4, H)
    ct_lo = jax.lax.dot_general(ct_A, wy0, dn_b,
                                preferred_element_type=jnp.float32, precision=_MXU_PRECISION)
    ct_hi = jax.lax.dot_general(ct_A, wy1, dn_b,
                                preferred_element_type=jnp.float32, precision=_MXU_PRECISION)

    @pl.when(g == 0)
    def _():
        dlo_ref[:] = jnp.zeros_like(dlo_ref)
        dhi_ref[:] = jnp.zeros_like(dhi_ref)

    dlo_ref[:] += ct_lo
    dhi_ref[:] += ct_hi

    # ct wrt wy0/wy1 -> uy, uz
    dn_y = (((0,), (0,)), ((), ()))    # (W4, H) x (W4, B) -> (H, B)
    ct_wy0 = jax.lax.dot_general(lo_ref[:], ct_A, dn_y,
                                 preferred_element_type=jnp.float32, precision=_MXU_PRECISION)
    ct_wy1 = jax.lax.dot_general(hi_ref[:], ct_A, dn_y,
                                 preferred_element_type=jnp.float32, precision=_MXU_PRECISION)
    ct_wyT = ct_wy0 * (1.0 - uz) + ct_wy1 * uz
    duy_ref[0] = jnp.sum(ct_wyT * _weights_T_du(uy, H, scheme),
                         axis=0, keepdims=True)
    duz_ref[0] = jnp.sum((ct_wy1 - ct_wy0) * wyT, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# custom_vjp op
# ---------------------------------------------------------------------------


def _blocked(a, G):
    p = a.shape[0]
    pad = G * _B - p
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
    return a.reshape(G, 1, _B)


def _fwd_call(static, loT, hiT, ux, uy, uz):
    W, H, scheme, interpret = static
    P = ux.shape[0]
    G = -(-P // _B)
    blocks = [_blocked(a, G) for a in (ux, uy, uz)]

    row = pl.BlockSpec((1, 1, _B), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((W * 4, H), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, H=H, scheme=scheme),
        grid=(G,),
        in_specs=[row, row, row, slab, slab],
        out_specs=pl.BlockSpec((1, 4, _B), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 4, _B), jnp.float32),
        interpret=interpret,
    )(*blocks, loT, hiT)
    s = jnp.transpose(out, (1, 0, 2)).reshape(4, G * _B)[:, :P]
    return s[0], s[1], s[2], s[3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def dense_slab_sample(static, loT, hiT, ux, uy, uz):
    """Sample (gx, gy, gz, n-1) for P rays between one slab pair.

    static = (W, H, scheme, interpret).  loT/hiT: (W*4, H) slab pair in
    the transposed layout (built once per march by
    march_dense pairs setup); ux/uy: (P,) voxel-center coordinates
    (lookup - 0.5); uz: (P,) z blend in [0, 1].
    """
    return _fwd_call(static, loT, hiT, ux, uy, uz)


def _vjp_fwd(static, loT, hiT, ux, uy, uz):
    return _fwd_call(static, loT, hiT, ux, uy, uz), (loT, hiT, ux, uy, uz)


def _vjp_bwd(static, res, cts):
    W, H, scheme, interpret = static
    loT, hiT, ux, uy, uz = res
    P = ux.shape[0]
    G = -(-P // _B)
    blocks = [_blocked(a, G) for a in (ux, uy, uz)]

    # stack the 4 cotangent channels into (G, 4, B); padded rays get 0
    ct = jnp.stack(cts, axis=0)                       # (4, P)
    pad = G * _B - P
    if pad:
        ct = jnp.concatenate([ct, jnp.zeros((4, pad), ct.dtype)], axis=1)
    ct = jnp.transpose(ct.reshape(4, G, _B), (1, 0, 2))   # (G, 4, B)

    row = pl.BlockSpec((1, 1, _B), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((W * 4, H), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, H=H, scheme=scheme),
        grid=(G,),
        in_specs=[row, row, row, slab, slab,
                  pl.BlockSpec((1, 4, _B), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[row, row, row, slab, slab],
        out_shape=[jax.ShapeDtypeStruct((G, 1, _B), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((W * 4, H), jnp.float32)] * 2,
        interpret=interpret,
    )(*blocks, loT, hiT, ct)
    dux, duy, duz, dlo, dhi = outs
    return (dlo, dhi, dux.reshape(-1)[:P], duy.reshape(-1)[:P],
            duz.reshape(-1)[:P])


dense_slab_sample.defvjp(_vjp_fwd, _vjp_bwd)


def pairs_transposed(field):
    """(D, H, W, 4) field -> scan inputs for the Pallas sampler:
    (S, W*4, H) lo/hi slab pairs ordered top-down (same ordering as
    march_dense's XLA pairs)."""
    d, h, w, _ = field.shape
    f = jnp.transpose(field, (0, 2, 3, 1)).reshape(d, w * 4, h)
    lo = jnp.flip(f[:-1], axis=0)
    hi = jnp.flip(f[1:], axis=0)
    return lo, hi
