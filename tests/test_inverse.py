"""Differentiable BOS inversion: recover a density gradient from an image."""
import numpy as np

import jax
import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case
from photon_tpu.inverse import invert_bos, volume_from_rho
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_source
from photon_tpu.utils.rng import lens_samples
from photon_tpu.volume import build_density_volume


def _small_volume(setup, n=12, grad_rho=4.0, rho0=1.225):
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n)
    z_dots = setup.object_distance
    z = np.linspace(z_dots - 0.6 * setup.object_distance,
                    z_dots - 0.1 * setup.object_distance, n)
    X = x[:, None, None] * np.ones((1, n, n))
    rho = rho0 + grad_rho * (X - x.min()) / (x.max() - x.min())
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [x[0], x[0], z[0]])
    return vol, rho.astype(np.float32)


def test_volume_from_rho_matches_numpy_precompute():
    cfg = bos_case("apparent", n_dots=2, rays=4)
    setup = camera_setup(cfg)
    vol, rho = _small_volume(setup, n=8)
    rebuilt = volume_from_rho(jnp.asarray(rho), vol)
    np.testing.assert_allclose(np.asarray(rebuilt.field),
                               np.asarray(vol.field), rtol=1e-4, atol=1e-12)


def test_bos_inversion_recovers_gradient():
    cfg = bos_case("apparent", n_dots=8, rays=16)
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(4))
    r1, r2 = lens_samples(jax.random.key(9), 16)
    vol_true, rho_true = _small_volume(setup, n=10, grad_rho=4.0)

    observed = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            vol=vol_true))
    result = invert_bos(cfg, setup, src, r1, r2, observed, vol_true,
                        steps=30, learning_rate=0.05)
    # the data term must drop substantially from the uniform start
    assert result.losses[-1] < 0.2 * result.losses[0], result.losses[::10]

    # BOS only constrains grad(n) along the sampled ray tubes — one thin
    # voxel column per dot; the rest of the grid is nullspace.  Check the
    # recovered d(n)/dx where information exists: re-render from the
    # recovered field and compare against the observation, and confirm
    # the recovered field actually deflects (differs from uniform).
    img_rec = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                           vol=result.volume))
    img_uniform = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    err_rec = np.abs(img_rec - observed).sum()
    err_uniform = np.abs(img_uniform - observed).sum()
    assert err_rec < 0.5 * err_uniform, (err_rec, err_uniform)


def test_bos_inversion_through_windowed_march():
    """The framework's north star at CI size: differentiable BOS
    inversion through a volume BEYOND the dense-march cap (>256^2
    slabs), i.e. gradients flow through the windowed custom_vjp kernel
    (round-4 verdict #1: this used to fall to the tube path).  Also
    regression-guards render_image_fast being traced inside an outer
    jit with the windowed drift check active."""
    from photon_tpu.ops.march_dense import dense_march_supported
    from photon_tpu.volume import build_density_volume

    cfg = bos_case("apparent", n_dots=8, rays=8)
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(4))
    r1, r2 = lens_samples(jax.random.key(9), 8)

    n, d = 288, 6
    x = np.linspace(-2e5, 2e5, n)
    z = np.linspace(setup.object_distance - 0.6 * setup.object_distance,
                    setup.object_distance - 0.1 * setup.object_distance, d)
    gx = np.linspace(0, 1, n)
    rho_true = (1.225 + 4.0 * gx[:, None, None]
                * np.ones((1, n, d))).astype(np.float32)
    vol_true = build_density_volume(
        rho_true, [x[1] - x[0], x[1] - x[0], z[1] - z[0]],
        [x[0], x[0], z[0]])
    assert not dense_march_supported(vol_true)

    observed = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            vol=vol_true))
    result = invert_bos(cfg, setup, src, r1, r2, observed, vol_true,
                        steps=20, learning_rate=0.02)
    assert np.isfinite(result.losses).all()
    assert min(result.losses) < 0.6 * result.losses[0], result.losses
