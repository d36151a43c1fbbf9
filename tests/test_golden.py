"""Golden-image regression: a fixed-seed BOS render must stay stable.

Guards the physics against silent drift across refactors.  The golden is
regenerated with ``python tests/test_golden.py`` (writes
tests/golden_bos_64.npy) — only do that deliberately after verifying the
change that moved it.
"""
import os

import numpy as np

import jax

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_bos_64.npy")


def _render_case():
    from tests.test_bos_pipeline import bos_case, gradient_volume_between
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.render_fast import render_image_fast
    from photon_tpu.models.scenes import bos_source
    from photon_tpu.utils.rng import lens_samples

    cfg = bos_case("general", n_dots=5, rays=24)
    cfg.camera_design.x_pixel_number = 64
    cfg.camera_design.y_pixel_number = 64
    m = cfg.lens_design.focal_length / (cfg.lens_design.object_distance
                                        - cfg.lens_design.focal_length)
    half = 0.7 * 64 * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.bos_pattern.X_Min, cfg.bos_pattern.X_Max = -half, half
    cfg.bos_pattern.Y_Min, cfg.bos_pattern.Y_Max = -half, half
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(21))
    r1, r2 = lens_samples(jax.random.key(3), 24)
    vol, *_ = gradient_volume_between(setup, n=12)
    img = np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol))
    return img


def test_golden_bos_image():
    img = _render_case()
    if not os.path.exists(GOLDEN_PATH):
        import pytest
        pytest.skip("golden not generated yet")
    golden = np.load(GOLDEN_PATH)
    # rtol budget: jit-boundary moves re-fuse the arithmetic and shift
    # isolated pixels by ~1e-3 relative; physics regressions move whole
    # dot spots, which 2e-3 still catches
    np.testing.assert_allclose(img, golden, rtol=2e-3, atol=1e-6)


if __name__ == "__main__":
    np.save(GOLDEN_PATH, _render_case())
    print("wrote", GOLDEN_PATH)
