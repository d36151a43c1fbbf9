"""Tests for scene/light-field source generation."""
import numpy as np

from photon_tpu.config import default_config
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.scenes import (bos_source, calibration_source,
                                      non_overlapping_dot_coordinates,
                                      piv_source, sunflower_coordinates)


def test_sunflower_fill():
    rng = np.random.default_rng(0)
    x, y = sunflower_coordinates(600.0, 100, rng)
    r = np.sqrt(x ** 2 + y ** 2)
    assert r.max() <= 300.0 + 1e-9
    # roughly the requested point count, origin included
    assert 50 <= x.size <= 150
    assert r.min() == 0.0


def test_non_overlapping_dots_respect_spacing():
    cfg = default_config("bos")
    cfg.bos_pattern.grid_point_number = 200
    rng = np.random.default_rng(1)
    coords = non_overlapping_dot_coordinates(cfg, rng)
    assert coords.shape[0] > 150  # near-complete fill at this density
    d_g = cfg.bos_pattern.grid_point_diameter
    M = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    d_diff = cfg.camera_design.diffraction_diameter \
        * cfg.camera_design.pixel_pitch / M
    threshold = 1.5 * np.sqrt(d_g ** 2 + d_diff ** 2)
    from scipy.spatial.distance import pdist
    assert pdist(coords).min() > threshold


def test_bos_source_layout():
    cfg = default_config("bos")
    cfg.bos_pattern.grid_point_number = 10
    cfg.bos_pattern.particle_number_per_grid_point = 20
    setup = camera_setup(cfg)
    src, dot_x, dot_y = bos_source(cfg, setup, np.random.default_rng(2))
    fill = src.num_particles // dot_x.size
    assert src.num_particles == dot_x.size * fill
    # all source points sit on the (shifted) object plane
    np.testing.assert_allclose(src.z, setup.z_object, rtol=1e-6)
    assert src.z_offset == setup.z_offset
    # dot-major ordering: first fill points belong to the first dot
    assert np.abs(src.x[:fill] - dot_x[0]).max() \
        <= cfg.bos_pattern.grid_point_diameter / 2 + 1e-3
    np.testing.assert_allclose(src.radiance, 10.0)


def test_bos_regular_distribution():
    cfg = default_config("bos")
    cfg.bos_pattern.dot_distribution = "regular"
    setup = camera_setup(cfg)
    src, dot_x, dot_y = bos_source(cfg, setup, np.random.default_rng(3))
    xs = np.unique(np.round(dot_x, 6))
    spacing = np.diff(np.sort(xs))
    # regular grid: uniform spacing
    assert np.allclose(spacing, spacing[0], rtol=1e-6)


def test_calibration_source_planes():
    cfg = default_config("cal")
    cfg.calibration_grid.particle_number_per_grid_point = 50
    cfg.calibration_grid.x_grid_point_number = 3
    cfg.calibration_grid.y_grid_point_number = 3
    setup = camera_setup(cfg)
    s0 = calibration_source(cfg, setup, 0, np.random.default_rng(4))
    s3 = calibration_source(cfg, setup, 3, np.random.default_rng(4))
    # plane 3 of 7 is the center plane (z_world = 0)
    np.testing.assert_allclose(np.unique(np.round(s3.z, 3)),
                               round(setup.z_object, 3))
    # plane 0 sits calibration_plane_spacing*3 closer
    assert abs((s0.z.mean() - s3.z.mean())
               + 3 * cfg.calibration_grid.calibration_plane_spacing) < 1e-3


def test_piv_source_gaussian_sheet():
    cfg = default_config("piv")
    cfg.particle_field.particle_number = 2000
    cfg.particle_field.perform_mie_scattering = False
    setup = camera_setup(cfg)
    src = piv_source(cfg, setup, 1, rng=np.random.default_rng(5))
    assert src.num_particles == 2000
    # radiance follows the Gaussian sheet: max near z = z_object
    z_rel = src.z - setup.z_object
    sigma = cfg.particle_field.gaussian_beam_fwhm / (2 * np.sqrt(2 * np.log(2)))
    expected = 1e4 / (sigma * np.sqrt(2 * np.pi)) \
        * np.exp(-z_rel ** 2 / (2 * sigma ** 2))
    # z is stored float32 after the z_object shift (~8.2e5 um), so the
    # reconstructed z_rel carries ~0.1 um rounding that the Gaussian
    # amplifies; compare loosely
    np.testing.assert_allclose(src.radiance, expected, rtol=0.05)


def test_piv_single_particle_centered():
    cfg = default_config("piv")
    cfg.particle_field.particle_number = 1
    cfg.particle_field.perform_mie_scattering = False
    setup = camera_setup(cfg)
    src = piv_source(cfg, setup, 1, rng=np.random.default_rng(6))
    half_px = cfg.camera_design.pixel_pitch / setup.magnification / 2.0
    np.testing.assert_allclose(src.x, [half_px], atol=1e-6)
