"""Tests for volume sampling (trilinear tex3D semantics + tricubic B-spline)."""
import numpy as np

import jax.numpy as jnp

from photon_tpu.ops.interp import (bspline_prefilter, sample_tricubic,
                                   sample_trilinear, texture_lookup)


def _flat(field):
    # field is (D, H, W, C) -> (D*H*W, C)
    return jnp.asarray(field.reshape(-1, field.shape[-1]))


def test_trilinear_exact_at_voxel_centers():
    rng = np.random.default_rng(0)
    W, H, D = 6, 5, 4
    field = rng.random((D, H, W, 2)).astype(np.float32)
    # texture coordinate i + 0.5 samples voxel i exactly
    xs, ys, zs = np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                             indexing="ij")
    lookup = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5,
                       zs.ravel() + 0.5], axis=-1).astype(np.float32)
    out = np.asarray(sample_trilinear(_flat(field), (W, H, D),
                                      jnp.asarray(lookup)))
    expected = field[zs.ravel(), ys.ravel(), xs.ravel()]
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_trilinear_midpoint_average():
    W = H = D = 3
    field = np.zeros((D, H, W, 1), dtype=np.float32)
    field[0, 0, 0, 0] = 2.0
    field[0, 0, 1, 0] = 4.0
    out = sample_trilinear(_flat(field), (W, H, D),
                           jnp.asarray([[1.0, 0.5, 0.5]], jnp.float32))
    assert float(out[0, 0]) == 3.0  # halfway between voxels 0 and 1 in x


def test_trilinear_clamps_at_boundary():
    W = H = D = 3
    field = np.arange(27, dtype=np.float32).reshape(D, H, W, 1)
    out = sample_trilinear(_flat(field), (W, H, D),
                           jnp.asarray([[-5.0, 0.5, 0.5], [50.0, 0.5, 0.5]],
                                       jnp.float32))
    assert float(out[0, 0]) == field[0, 0, 0, 0]
    assert float(out[1, 0]) == field[0, 0, 2, 0]


def test_texture_lookup_mapping():
    # lookup = 1 + frac * (N - 2): min -> 1, max -> N-1
    min_b = jnp.asarray([0.0, 0.0, 0.0])
    max_b = jnp.asarray([10.0, 10.0, 10.0])
    lk = texture_lookup(jnp.asarray([[0.0, 5.0, 10.0]]), min_b, max_b,
                        (8, 8, 8))
    np.testing.assert_allclose(np.asarray(lk[0]), [1.0, 4.0, 7.0])


def test_bspline_prefilter_reproduces_samples():
    # interpolating the prefiltered coefficients at the sample points must
    # return the original samples (the defining property of the prefilter)
    rng = np.random.default_rng(1)
    W = H = D = 10
    field = rng.random((D, H, W, 1)).astype(np.float32)
    coeffs = bspline_prefilter(field)
    xs, ys, zs = np.meshgrid(np.arange(2, W - 2), np.arange(2, H - 2),
                             np.arange(2, D - 2), indexing="ij")
    lookup = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5,
                       zs.ravel() + 0.5], axis=-1).astype(np.float32)
    out = np.asarray(sample_tricubic(_flat(coeffs), (W, H, D),
                                     jnp.asarray(lookup)))
    expected = field[zs.ravel(), ys.ravel(), xs.ravel()]
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_tricubic_linear_field_exact():
    # B-spline interpolation reproduces linear functions exactly (away from
    # the clamped boundary)
    W = H = D = 12
    xs, ys, zs = np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                             indexing="ij")
    lin = (0.5 * xs + 0.25 * ys - 0.1 * zs).astype(np.float32)
    field = lin.transpose(2, 1, 0)[..., None]
    coeffs = bspline_prefilter(field)
    pts = np.array([[4.3, 5.7, 6.1], [3.9, 4.2, 5.5]], np.float32)
    out = np.asarray(sample_tricubic(_flat(coeffs), (W, H, D),
                                     jnp.asarray(pts + 0.5)))
    expected = 0.5 * pts[:, 0] + 0.25 * pts[:, 1] - 0.1 * pts[:, 2]
    # float32 prefilter boundary init leaves ~1e-3 absolute error
    np.testing.assert_allclose(out[:, 0], expected, atol=2e-3)
