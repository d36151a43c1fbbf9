"""Tests for the speed-of-light (P, R) SoA pipeline against the exact
reference-semantics renderer and the analytic BOS oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render import render_image
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_source
from photon_tpu.ops.march import make_march_fn, march_rays
from photon_tpu.ops.march_fast import extract_tubes, march_tubes
from photon_tpu.ops.lens import RayBundle
from photon_tpu.utils.rng import lens_samples


def _scene(lens_model="general", rays=32):
    cfg = bos_case(lens_model, n_dots=6, rays=rays)
    setup = camera_setup(cfg)
    src, dot_x, dot_y = bos_source(cfg, setup, np.random.default_rng(11))
    r1, r2 = lens_samples(jax.random.key(5), rays)
    return cfg, setup, src, dot_x, dot_y, r1, r2


@pytest.mark.parametrize("lens_model", ["apparent", "thin-lens", "general"])
def test_fast_matches_reference_no_gradients(lens_model):
    cfg, setup, src, *_ , r1, r2 = _scene(lens_model)
    img_ref = np.asarray(render_image(cfg, setup, src, r1, r2))
    img_fast = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    assert img_ref.sum() > 0
    # the fast splat keeps the (tiny) erf tail the reference truncates,
    # so allow a few percent of L1 energy difference
    l1 = np.abs(img_ref - img_fast).sum() / img_ref.sum()
    assert l1 < 0.05, l1
    # peak positions coincide
    assert np.unravel_index(img_ref.argmax(), img_ref.shape) \
        == np.unravel_index(img_fast.argmax(), img_fast.shape)


def test_fast_matches_reference_with_gradients():
    cfg, setup, src, *_ , r1, r2 = _scene("general")
    vol, eps, Z_D = gradient_volume_between(setup)
    march_fn = make_march_fn(vol, algorithm=2)
    img_ref = np.asarray(render_image(cfg, setup, src, r1, r2,
                                      march_fn=march_fn))
    img_fast = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            vol=vol))
    l1 = np.abs(img_ref - img_fast).sum() / img_ref.sum()
    assert l1 < 0.10, l1


def test_fast_bos_displacement_oracle():
    cfg, setup, src, dot_x, dot_y, r1, r2 = _scene("general")
    vol, eps, Z_D = gradient_volume_between(setup)
    img0 = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    img1 = np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol))
    m = setup.magnification
    pitch = cfg.camera_design.pixel_pitch
    nx = cfg.camera_design.x_pixel_number

    def centroid_x(im, cx, cy, rad=8):
        r0, c0 = int(round(cy)), int(round(cx))
        sl = im[max(r0 - rad, 0): r0 + rad, max(c0 - rad, 0): c0 + rad]
        xs = np.arange(sl.shape[1])
        return (sl * xs[None, :]).sum() / sl.sum()

    expected = m * Z_D * eps / pitch
    shifts = []
    for dx_, dy_ in zip(dot_x, dot_y):
        pc = (nx - 1) - ((-dx_ * m) + pitch * (nx - 1) / 2) / pitch
        pr = ((-dy_ * m) + pitch * (nx - 1) / 2) / pitch
        shifts.append(centroid_x(img1, pc, pr) - centroid_x(img0, pc, pr))
    shifts = np.asarray(shifts)
    # mirrored x: +x deflection shows as -column shift
    np.testing.assert_allclose(-shifts, expected, rtol=0.08)


def test_tube_march_matches_reference_march():
    cfg, setup, *_ = _scene()
    vol, eps, Z_D = gradient_volume_between(setup)
    P, R = 5, 3
    xs = np.linspace(-4e4, 4e4, P).astype(np.float32)
    x = jnp.asarray(np.repeat(xs[:, None], R, 1))
    y = jnp.zeros((P, R), jnp.float32)
    z = jnp.full((P, R), -50000.0, jnp.float32)
    zero = jnp.zeros((P, R), jnp.float32)
    dirz = jnp.full((P, R), -1.0, jnp.float32)
    tubes = extract_tubes(vol, jnp.asarray(xs), np.zeros(P, np.float32))
    xo, yo, zo, dxo, dyo, dzo = march_tubes(vol, tubes, x, y, z,
                                            zero, zero, dirz, algorithm=2)

    rays = RayBundle(
        jnp.stack([x.ravel(), y.ravel(), z.ravel()], -1),
        jnp.stack([zero.ravel(), zero.ravel(), dirz.ravel()], -1),
        jnp.zeros(P * R), jnp.ones(P * R))
    ref = march_rays(vol, rays, algorithm=2)
    ref_dx = np.asarray(ref.dir)[::R, 0]
    np.testing.assert_allclose(np.asarray(dxo)[:, 0], ref_dx, rtol=0.03)


def test_fast_renders_are_deterministic():
    cfg, setup, src, *_ , r1, r2 = _scene("apparent", rays=16)
    a = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    b = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    np.testing.assert_array_equal(a, b)
