"""Tests for the typed config layer."""
import os

import numpy as np
import pytest

from photon_tpu.config import SimulationConfig, default_config


def test_default_bos_matches_reference_defaults():
    cfg = default_config("bos")
    # values from create_simulation_parameters.py (reference defaults)
    assert cfg.lens_design.focal_length == 105e3
    assert cfg.lens_design.aperture_f_number == 8.0
    assert cfg.camera_design.pixel_pitch == 17.0
    assert cfg.camera_design.x_pixel_number == 1024
    assert cfg.bos_pattern.grid_point_number == 1000
    assert cfg.bos_pattern.lightray_number_per_particle == 500
    assert cfg.density_gradients.gladstone_dale == pytest.approx(0.225e-3)
    assert cfg.particle_field is None


def test_default_piv_section():
    cfg = default_config("piv")
    assert cfg.particle_field.particle_diameter_mean == 27.0
    assert cfg.particle_field.mie_scattering_angle_number == 128
    assert tuple(cfg.particle_field.beam_propogation_vector) == (0.0, 1.0, 0.0)


def test_json_roundtrip(tmp_path):
    cfg = default_config("bos")
    cfg.bos_pattern.grid_point_number = 42
    cfg.camera_design.x_pixel_number = 256
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    cfg2 = SimulationConfig.from_json(path)
    assert cfg2.bos_pattern.grid_point_number == 42
    assert cfg2.camera_design.x_pixel_number == 256
    assert cfg2.simulation_type == "bos"


def test_load_reference_mat():
    path = "/root/reference/sample-data/bos/parameters/sample-parameters.mat"
    if not os.path.exists(path):
        pytest.skip("reference sample parameters not present")
    cfg = SimulationConfig.from_mat(path)
    assert cfg.simulation_type == "bos"
    assert cfg.lens_design.focal_length == 105000.0
    assert cfg.lens_design.lens_radius_of_curvature == 100000.0
    assert cfg.camera_design.pixel_gain == 25.0
    assert cfg.bos_pattern.grid_point_number == 1000
    assert cfg.bos_pattern.lightray_number_per_particle == 500
    assert cfg.density_gradients.ray_tracing_algorithm == 2
    assert cfg.camera_design.implement_diffraction is True


def test_postprocess_crop():
    from photon_tpu.postprocess import crop
    img = np.arange(100).reshape(10, 10)
    out = crop(img, 6, 6)
    # reference crop semantics: center block minus one row/col
    # (ref: perform_ray_tracing_03.py:2258)
    assert out.shape == (5, 5)
    assert out[0, 0] == img[2, 2]
