"""End-to-end renderer tests: geometry of the image formation.

Small scenes (tiny sensor, few rays) that check the physically meaningful
invariants: a dot at a known object position images to the predicted pixel
through every lens model, and the BOS pair shows the oracle displacement
when a density gradient is present.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from photon_tpu.config import default_config
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render import RenderParams, generate_rays, trace_chunk
from photon_tpu.models.scenes import LightfieldSource
from photon_tpu.utils.rng import lens_samples


def tiny_cfg(lens_model="general", sensor=64, diffraction=True):
    cfg = default_config("bos")
    cfg.camera_design.x_pixel_number = sensor
    cfg.camera_design.y_pixel_number = sensor
    cfg.camera_design.implement_diffraction = diffraction
    cfg.lens_design.lens_model = lens_model
    return cfg


def point_source(cfg, setup, x=0.0, y=0.0, rays=64):
    x_arr = np.array([x], np.float32)
    return LightfieldSource(
        x=x_arr, y=np.array([y], np.float32),
        z=np.array([setup.z_object], np.float32),
        radiance=np.array([10.0]),
        diameter_index=np.zeros(1, np.int32),
        z_offset=float(setup.z_offset),
        object_distance=float(setup.object_distance),
        lightray_number_per_particle=rays)


def render_point(cfg, x_obj, y_obj, rays=128):
    setup = camera_setup(cfg)
    src = point_source(cfg, setup, x_obj, y_obj, rays)
    params = RenderParams.from_setup(cfg, setup, src)
    r1, r2 = lens_samples(jax.random.key(0), rays)
    img = trace_chunk(
        (jnp.asarray(src.x), jnp.asarray(src.y), jnp.asarray(src.z),
         jnp.asarray(src.radiance, jnp.float32),
         jnp.asarray(src.diameter_index),
         jnp.asarray(r1), jnp.asarray(r2)),
        params, setup.elements, None, setup.rotation_matrix,
        setup.inverse_rotation_matrix, {})
    return np.asarray(img), setup, params


def centroid(img):
    ys, xs = np.mgrid[: img.shape[0], : img.shape[1]]
    s = img.sum()
    return (img * xs).sum() / s, (img * ys).sum() / s


def predicted_pixel(setup, params, x_obj, y_obj):
    """Ideal imaging: the dot at (x, y) maps to pixel (col, row) through
    inversion + magnification + the mirrored-x sensor convention."""
    m = setup.magnification
    x_img, y_img = -x_obj * m, -y_obj * m
    nx, ny, pitch = params.nx, params.ny, params.pixel_pitch
    d_x = (nx - 1) - ((x_img + pitch * (nx - 1) / 2) / pitch)
    d_y = (y_img + pitch * (ny - 1) / 2) / pitch
    # splat centers at (d_x - 0.5, d_y - 0.5)
    return d_x - 0.5, d_y - 0.5


@pytest.mark.parametrize("lens_model", ["apparent", "thin-lens", "general"])
def test_point_images_at_predicted_pixel(lens_model):
    cfg = tiny_cfg(lens_model)
    m = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    # a dot off-center by ~1/4 of the (reduced) sensor
    x_obj = 16 * cfg.camera_design.pixel_pitch / m
    y_obj = -10 * cfg.camera_design.pixel_pitch / m
    img, setup, params = render_point(cfg, x_obj, y_obj)
    assert img.sum() > 0, f"no energy on sensor for {lens_model}"
    cx, cy = centroid(img)
    px, py = predicted_pixel(setup, params, x_obj, y_obj)
    # thick-lens aberrations and the finite ray cone allow ~a pixel of slop
    assert abs(cx - px) < 1.5, (cx, px)
    assert abs(cy - py) < 1.5, (cy, py)


def test_centered_point_all_models_agree():
    imgs = {}
    for lm in ("apparent", "thin-lens", "general"):
        cfg = tiny_cfg(lm)
        img, setup, params = render_point(cfg, 0.0, 0.0)
        imgs[lm] = img
        cx, cy = centroid(img)
        # dead center of the sensor (mirrored x): (nx-1)-(nx-1)/2-0.5
        assert abs(cx - (params.nx / 2 - 1)) < 1.0
        assert abs(cy - (params.ny / 2 - 1)) < 1.0
    # total collected energy should be comparable across models
    e = {k: v.sum() for k, v in imgs.items()}
    assert e["thin-lens"] == pytest.approx(e["general"], rel=0.2)


def test_bilinear_path_no_diffraction():
    cfg = tiny_cfg("general", diffraction=False)
    img, setup, params = render_point(cfg, 0.0, 0.0)
    assert img.sum() > 0
    # bilinear spot is compact: at most a handful of bright pixels
    assert (img > 0).sum() <= 16


def test_render_differentiable_wrt_dot_position():
    cfg = tiny_cfg("apparent")
    setup = camera_setup(cfg)
    rays = 32
    r1, r2 = lens_samples(jax.random.key(0), rays)
    src = point_source(cfg, setup, 0.0, 0.0, rays)
    params = RenderParams.from_setup(cfg, setup, src)
    cols = jnp.arange(params.nx, dtype=jnp.float32)

    def img_centroid_x(x_obj):
        img = trace_chunk(
            (jnp.asarray([x_obj]), jnp.asarray(src.y), jnp.asarray(src.z),
             jnp.asarray(src.radiance, jnp.float32),
             jnp.asarray(src.diameter_index), jnp.asarray(r1),
             jnp.asarray(r2)),
            params, setup.elements, None, setup.rotation_matrix,
            setup.inverse_rotation_matrix, {})
        return jnp.sum(img * cols[None, :]) / (jnp.sum(img) + 1e-9)

    g = jax.grad(img_centroid_x)(jnp.float32(0.0))
    # moving the dot +x moves the (mirrored) image centroid -x in pixels:
    # d(col)/d(x_obj) = -(-M)/pitch = ... sign: x_img = -x M, col = mirrored
    m = setup.magnification
    expected = m / cfg.camera_design.pixel_pitch
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(expected, rel=0.15)


def test_rotated_camera_renders():
    """Nonzero camera angles exercise the rotation path end-to-end
    (ref: parallel_ray_tracing.cu:2036-2129) through the exact renderer."""
    cfg = tiny_cfg("general")
    cfg.camera_design.x_camera_angle = np.deg2rad(2.0)
    cfg.camera_design.y_camera_angle = np.deg2rad(-1.0)
    img, setup, params = render_point(cfg, 0.0, 0.0)
    assert np.isfinite(img).all()
    assert img.sum() > 0
    # rotation matrices must be applied (non-identity)
    assert not np.allclose(setup.rotation_matrix, np.eye(3))
