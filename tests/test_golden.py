"""Golden-image regression: fixed-seed renders across every scene family
must stay stable.

Guards the physics against silent drift across refactors.  Cases cover
the workload matrix the reference supports: diffraction BOS with a
density volume (RK4 trilinear and RK45-substep tricubic), the bilinear
(diffraction-off) sensor, a rotated camera, PIV with Mie scattering, and
a calibration plane.  A regression in Mie table interpolation, the
cal-grid layout, the rotation frames, either sensor model, or either
march flavor fails its golden.

Regenerate with ``python tests/test_golden.py`` (rewrites
tests/goldens/*.npy) — only do that deliberately, after verifying the
change that moved them.
"""
import os

import numpy as np
import pytest

import jax

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
LEGACY_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_bos_64.npy")


def _bos_scene(n_dots=5, rays=24, sensor=64, **over):
    from tests.test_bos_pipeline import bos_case
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.scenes import bos_source
    from photon_tpu.utils.rng import lens_samples

    cfg = bos_case("general", n_dots=n_dots, rays=rays)
    cfg.camera_design.x_pixel_number = sensor
    cfg.camera_design.y_pixel_number = sensor
    m = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    half = 0.7 * sensor * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.bos_pattern.X_Min, cfg.bos_pattern.X_Max = -half, half
    cfg.bos_pattern.Y_Min, cfg.bos_pattern.Y_Max = -half, half
    for k, v in over.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(21))
    r1, r2 = lens_samples(jax.random.key(3), rays)
    return cfg, setup, src, r1, r2


def _render_legacy():
    """The original 64^2 RK4-trilinear BOS golden (kept bit-compatible)."""
    from tests.test_bos_pipeline import gradient_volume_between
    from photon_tpu.models.render_fast import render_image_fast

    cfg, setup, src, r1, r2 = _bos_scene()
    vol, *_ = gradient_volume_between(setup, n=12)
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol))


def _render_bos_tricubic_rk45():
    from tests.test_bos_pipeline import gradient_volume_between
    from photon_tpu.models.render_fast import render_image_fast

    cfg, setup, src, r1, r2 = _bos_scene(
        sensor=128, **{"density_gradients.interpolation_scheme": 2,
                       "density_gradients.ray_tracing_algorithm": 3})
    vol, *_ = gradient_volume_between(setup, n=12)
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol,
                                        algorithm=3, interpolation_scheme=2))


def _render_bos_bilinear():
    from photon_tpu.models.render_fast import render_image_fast

    cfg, setup, src, r1, r2 = _bos_scene(
        sensor=128, **{"camera_design.implement_diffraction": False})
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2))


def _render_bos_rotated():
    """x_camera_angle != 0: both the scene rotation frames and the
    rotated-march path."""
    from tests.test_bos_pipeline import gradient_volume_between
    from photon_tpu.models.render_fast import render_image_fast

    cfg, setup, src, r1, r2 = _bos_scene(
        sensor=128, **{"camera_design.x_camera_angle": 0.05})
    vol, *_ = gradient_volume_between(setup, n=12)
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol))


def _render_piv_mie():
    from photon_tpu.config import default_config
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.render_fast import render_image_fast
    from photon_tpu.models.scenes import piv_source
    from photon_tpu.ops.mie import create_mie_scattering_data
    from photon_tpu.utils.rng import lens_samples

    cfg = default_config("piv")
    cfg.camera_design.x_pixel_number = 128
    cfg.camera_design.y_pixel_number = 128
    cfg.particle_field.particle_number = 300
    cfg.particle_field.lightray_number_per_particle = 32
    cfg.particle_field.mie_scattering_angle_number = 32
    cfg.particle_field.particle_diameter_number = 9
    m = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    half = 0.7 * 128 * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.particle_field.X_Min, cfg.particle_field.X_Max = -half, half
    cfg.particle_field.Y_Min, cfg.particle_field.Y_Max = -half, half
    rng = np.random.default_rng(77)
    setup = camera_setup(cfg)
    scattering = create_mie_scattering_data(cfg, rng)
    src = piv_source(cfg, setup, 1,
                     diameter_index_distribution=scattering[
                         "particle_diameter_index_distribution"], rng=rng)
    r1, r2 = lens_samples(jax.random.key(9), 32)
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                        scattering=scattering))


def _render_cal_plane():
    from photon_tpu.config import default_config
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.render_fast import render_image_fast
    from photon_tpu.models.scenes import calibration_source
    from photon_tpu.utils.rng import lens_samples

    cfg = default_config("cal")
    cfg.camera_design.x_pixel_number = 128
    cfg.camera_design.y_pixel_number = 128
    cfg.calibration_grid.x_grid_point_number = 5
    cfg.calibration_grid.y_grid_point_number = 5
    cfg.calibration_grid.x_grid_point_spacing = 8e3
    cfg.calibration_grid.y_grid_point_spacing = 8e3
    cfg.calibration_grid.grid_point_diameter = 1.5e3
    cfg.calibration_grid.particle_number_per_grid_point = 64
    cfg.calibration_grid.lightray_number_per_particle = 16
    setup = camera_setup(cfg)
    src = calibration_source(cfg, setup, 0, np.random.default_rng(13))
    r1, r2 = lens_samples(jax.random.key(4), 16)
    return np.asarray(render_image_fast(cfg, setup, src, r1, r2))


CASES = {
    "bos_tricubic_rk45_128": _render_bos_tricubic_rk45,
    "bos_bilinear_128": _render_bos_bilinear,
    "bos_rotated_128": _render_bos_rotated,
    "piv_mie_128": _render_piv_mie,
    "cal_plane_128": _render_cal_plane,
}


def test_golden_bos_image():
    img = _render_legacy()
    if not os.path.exists(LEGACY_GOLDEN):
        pytest.skip("golden not generated yet")
    golden = np.load(LEGACY_GOLDEN)
    # rtol budget: jit-boundary moves re-fuse the arithmetic and shift
    # isolated pixels by ~1e-3 relative; physics regressions move whole
    # dot spots, which 2e-3 still catches
    np.testing.assert_allclose(img, golden, rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_case(name):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    img = CASES[name]()
    golden = np.load(path)
    assert img.sum() > 0
    np.testing.assert_allclose(img, golden, rtol=2e-3, atol=1e-6
                               * max(golden.max(), 1.0))


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.save(LEGACY_GOLDEN, _render_legacy())
    print("wrote", LEGACY_GOLDEN)
    for name, fn in CASES.items():
        p = os.path.join(GOLDEN_DIR, name + ".npy")
        np.save(p, fn())
        print("wrote", p)
