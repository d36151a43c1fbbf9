"""Tests for the eikonal marcher: analytic deflection oracle + geometry.

The key physics check is the paraxial BOS relation
``epsilon = (1/n0) * K * grad(rho) * Delta z``
(ref: synthetic_fields.calculate_theoretical_deflection:193-215 and
createNRRD.py:108-116) — a ray crossing a uniform-density-gradient volume
must exit deflected by epsilon radians.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from photon_tpu.ops.lens import RayBundle
from photon_tpu.ops.march import aabb_entry, march_rays
from photon_tpu.volume import build_density_volume


def make_gradient_volume(grad_rho_x=5.0, n=32, extent=3e5, depth=1e5,
                         rho0=1.225):
    """Uniform d(rho)/dx volume centered on the z axis.

    grad_rho_x is in kg/m^3 per (volume width), like createNRRD.py's
    ``grad_x`` (rho increases linearly across the x extent).
    """
    x = np.linspace(-extent / 2, extent / 2, n)
    y = np.linspace(-extent / 2, extent / 2, n)
    z = np.linspace(0.0, depth, n)
    X = x[:, None, None] * np.ones((1, n, n))
    rho = rho0 + grad_rho_x * (X - x.min()) / (x.max() - x.min())
    spacings = [x[1] - x[0], y[1] - y[0], z[1] - z[0]]
    origin = [x[0], y[0], z[0]]
    vol = build_density_volume(rho, spacings, origin,
                               z_origin_shift=0.0)
    return vol, rho, spacings


def straight_rays(n_rays, vol, z_start=-1e4):
    x = np.linspace(-5e4, 5e4, n_rays)
    pos = np.stack([x, np.zeros(n_rays), np.full(n_rays, z_start)],
                   axis=-1).astype(np.float32)
    direction = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n_rays, 1))
    return RayBundle(jnp.asarray(pos), jnp.asarray(direction),
                     jnp.zeros(n_rays, jnp.float32),
                     jnp.ones(n_rays, jnp.float32))


def test_aabb_entry():
    min_b = jnp.asarray([0.0, 0.0, 0.0])
    max_b = jnp.asarray([10.0, 10.0, 10.0])
    pos = jnp.asarray([[5.0, 5.0, -3.0],     # enters through z=0 face
                       [20.0, 5.0, -3.0],    # misses
                       [5.0, 5.0, 5.0]], jnp.float32)   # already inside
    direction = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
    out, hit = aabb_entry(pos, direction, min_b, max_b)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(np.asarray(out[0]), [5.0, 5.0, 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pos[1]))


@pytest.mark.parametrize("algorithm", [1, 2])
def test_uniform_gradient_deflection(algorithm):
    """A constant grad(n) must deflect rays by epsilon = K grad(rho) dz / n0."""
    grad_rho, extent, depth, rho0 = 5.0, 3e5, 1e5, 1.225
    vol, rho, spacings = make_gradient_volume(grad_rho, n=32, extent=extent,
                                              depth=depth, rho0=rho0)
    rays = straight_rays(16, vol)
    out = march_rays(vol, rays, algorithm=algorithm)

    K = 0.225e-3
    n0 = 1.0 + K * (rho0 + grad_rho / 2.0)
    # grad(n) per micron: K * grad_rho over the x extent
    dn_dx = K * grad_rho / extent
    eps_expected = dn_dx * depth / n0

    dirs = np.asarray(out.dir)
    # deflection angle in the x-z plane
    eps = dirs[:, 0] / dirs[:, 2]
    # rays near the volume edges see clamped/boundary gradients; test the
    # interior ones
    interior = slice(3, -3)
    np.testing.assert_allclose(eps[interior], eps_expected, rtol=0.05)
    # positions must have advanced through the volume in z
    assert np.all(np.asarray(out.pos)[:, 2] >= depth * 0.95)


def test_no_gradient_passthrough():
    """Zero gradient: rays exit undeviated."""
    vol, _, _ = make_gradient_volume(0.0, n=16)
    rays = straight_rays(8, vol)
    out = march_rays(vol, rays, algorithm=2)
    dirs = np.asarray(out.dir)
    np.testing.assert_allclose(dirs[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(dirs[:, 2], 1.0, atol=1e-6)


def test_miss_volume_unchanged():
    vol, _, _ = make_gradient_volume(5.0, n=16)
    pos = jnp.asarray([[1e7, 1e7, -1e4]], jnp.float32)
    direction = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    rays = RayBundle(pos, direction, jnp.zeros(1), jnp.ones(1))
    out = march_rays(vol, rays, algorithm=2)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(pos))
    np.testing.assert_allclose(np.asarray(out.dir), np.asarray(direction))


def test_rk4_matches_euler_small_steps():
    """RK4 and Euler agree up to the exit-boundary step quantization.

    Both integrators accumulate deflection in units of step * grad(n);
    Euler commits its last step past the exit face while RK4's mid-stage
    boundary checks stop one step short, so they bracket the analytic
    value within ~1 step / depth each.
    """
    grad_rho, extent, depth = 2.0, 3e5, 1e5
    vol, _, _ = make_gradient_volume(grad_rho, n=24, extent=extent,
                                     depth=depth)
    rays = straight_rays(8, vol)
    out_e = march_rays(vol, rays, algorithm=1)
    out_r = march_rays(vol, rays, algorithm=2)
    eps_e = np.asarray(out_e.dir)[:, 0] / np.asarray(out_e.dir)[:, 2]
    eps_r = np.asarray(out_r.dir)[:, 0] / np.asarray(out_r.dir)[:, 2]
    K = 0.225e-3
    eps_expected = K * grad_rho / extent * depth
    step_frac = vol.step_size / depth
    tol = 1.5 * step_frac
    np.testing.assert_allclose(eps_e[2:-2], eps_expected, rtol=tol)
    np.testing.assert_allclose(eps_r[2:-2], eps_expected, rtol=tol)


@pytest.mark.parametrize("algorithm", [3, 4])
def test_uniform_gradient_deflection_rk45_ab4(algorithm):
    """The adaptive RK45 and AB4 integrators hit the same oracle."""
    grad_rho, extent, depth, rho0 = 5.0, 3e5, 1e5, 1.225
    vol, *_ = make_gradient_volume(grad_rho, n=24, extent=extent,
                                   depth=depth, rho0=rho0)
    rays = straight_rays(8, vol)
    out = march_rays(vol, rays, algorithm=algorithm)
    K = 0.225e-3
    n0 = 1.0 + K * (rho0 + grad_rho / 2.0)
    eps_expected = K * grad_rho / extent * depth / n0
    dirs = np.asarray(out.dir)
    eps = dirs[:, 0] / dirs[:, 2]
    # boundary step quantization allows a couple of steps of slack
    tol = 3.0 * vol.step_size / depth
    np.testing.assert_allclose(eps[2:-2], eps_expected, rtol=tol)


def test_tricubic_march_matches_trilinear():
    """Tricubic B-spline interpolation agrees with trilinear on a smooth
    (linear) refractive-index field."""
    vol, *_ = make_gradient_volume(3.0, n=20)
    rays = straight_rays(6, vol)
    out_tri = march_rays(vol, rays, algorithm=2, interpolation_scheme=1)
    out_cub = march_rays(vol, rays, algorithm=2, interpolation_scheme=2)
    eps_tri = np.asarray(out_tri.dir)[:, 0] / np.asarray(out_tri.dir)[:, 2]
    eps_cub = np.asarray(out_cub.dir)[:, 0] / np.asarray(out_cub.dir)[:, 2]
    np.testing.assert_allclose(eps_cub[1:-1], eps_tri[1:-1], rtol=0.05)


def test_differentiable_scan_matches_while():
    vol, _, _ = make_gradient_volume(5.0, n=16)
    rays = straight_rays(8, vol)
    out_w = march_rays(vol, rays, algorithm=2)
    out_s = march_rays(vol, rays, algorithm=2, differentiable=True)
    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_w.pos),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_s.dir), np.asarray(out_w.dir),
                               rtol=1e-4, atol=1e-6)


def test_rk45_differentiable_matches_while_and_fd():
    """Round-4: the adaptive RK45 gains a fixed-trip differentiable
    scan — 'adaptive' and 'gradients' are no longer mutually exclusive.
    The scan must reproduce the while_loop march and its field gradient
    must match a central finite difference along a random direction."""
    import jax

    vol, _, _ = make_gradient_volume(5.0, n=12)
    rays = straight_rays(6, vol)

    out_w = march_rays(vol, rays, algorithm=3)
    out_s = march_rays(vol, rays, algorithm=3, differentiable=True)
    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_w.pos),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_s.dir), np.asarray(out_w.dir),
                               rtol=1e-4, atol=1e-6)

    field_flat = vol.field.reshape(-1, 4)

    def loss(field):
        out = march_rays(vol, rays, algorithm=3, differentiable=True,
                         num_steps=96, field_flat=field)
        return jnp.sum(out.dir[:, 0] * 1e3)

    g = np.asarray(jax.grad(loss)(field_flat), np.float64)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0

    # directional FD: perturb only the gradient channels (the n-1
    # channel's accept/reject sensitivity is knife-edged)
    rng = np.random.default_rng(0)
    v = np.zeros_like(np.asarray(field_flat))
    v[:, :3] = rng.normal(size=(v.shape[0], 3))
    v = v / np.linalg.norm(v)
    eps = 1e-10
    lp = float(loss(field_flat + eps * jnp.asarray(v)))
    lm = float(loss(field_flat - eps * jnp.asarray(v)))
    fd = (lp - lm) / (2 * eps)
    ad = float((g * v).sum())
    assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad)), (fd, ad)


def test_march_gradient_wrt_field():
    """d(exit x)/d(field) must exist and be finite via the scan path."""
    import jax

    vol, _, _ = make_gradient_volume(5.0, n=12)
    rays = straight_rays(4, vol)
    field_flat = vol.field.reshape(-1, 4)

    def exit_x(field):
        out = march_rays(vol, rays, algorithm=2, differentiable=True,
                         num_steps=64, field_flat=field)
        return jnp.sum(out.pos[:, 0])

    g = jax.grad(exit_x)(field_flat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
