"""Fast-path PIV Mie scattering vs the reference per-ray path."""
import numpy as np

import jax

from photon_tpu.config import default_config
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render import render_image
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import piv_source
from photon_tpu.ops.mie import create_mie_scattering_data
from photon_tpu.utils.rng import lens_samples


def test_fast_mie_matches_reference():
    cfg = default_config("piv")
    cfg.camera_design.x_pixel_number = 128
    cfg.camera_design.y_pixel_number = 128
    cfg.particle_field.particle_number = 40
    cfg.particle_field.lightray_number_per_particle = 16
    cfg.particle_field.mie_scattering_angle_number = 32
    # keep particles in the reduced FOV
    m = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    half = 0.7 * 128 * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.particle_field.X_Min, cfg.particle_field.X_Max = -half, half
    cfg.particle_field.Y_Min, cfg.particle_field.Y_Max = -half, half

    setup = camera_setup(cfg)
    rng = np.random.default_rng(3)
    scattering = create_mie_scattering_data(cfg, rng)
    src = piv_source(
        cfg, setup, 1,
        diameter_index_distribution=scattering[
            "particle_diameter_index_distribution"],
        rng=rng)
    r1, r2 = lens_samples(jax.random.key(2), 16)

    img_ref = np.asarray(render_image(cfg, setup, src, r1, r2,
                                      scattering=scattering))
    img_fast = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            scattering=scattering))
    assert img_ref.sum() > 0
    l1 = np.abs(img_ref - img_fast).sum() / img_ref.sum()
    assert l1 < 0.05, l1
    # Mie must actually modulate intensity: different particles differ
    img_diffuse = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    assert np.abs(img_fast - img_diffuse).sum() > 0.01 * img_fast.sum()
