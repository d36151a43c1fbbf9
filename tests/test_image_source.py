"""Image-driven BOS source (C7 tail: generate_bos_image_lightfield_data)."""
import numpy as np

import jax

from tests.test_bos_pipeline import bos_case
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_image_source
from photon_tpu.utils.rng import lens_samples


def test_bos_image_source_geometry_and_render():
    cfg = bos_case("apparent", rays=8)
    setup = camera_setup(cfg)
    # a target image with two bright pixels
    img = np.zeros((50, 50), np.float32)
    img[10, 10] = 2.0
    img[40, 30] = 5.0
    src = bos_image_source(cfg, setup, img)
    assert src.num_particles == 2
    # radiance carries pixel intensity
    assert sorted(src.radiance.tolist()) == [2.0, 5.0]
    # all points on the object plane
    np.testing.assert_allclose(src.z, setup.z_object, rtol=1e-6)
    # columns mirror into x: the col=10 pixel maps farther +x than col=30
    x_by_rad = {r: x for r, x in zip(src.radiance, src.x)}
    assert x_by_rad[2.0] > x_by_rad[5.0]
    # rows descend from Y_Max: row 10 above row 40
    y_by_rad = {r: y for r, y in zip(src.radiance, src.y)}
    assert y_by_rad[2.0] > y_by_rad[5.0]

    r1, r2 = lens_samples(jax.random.key(0), 8)
    out = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    assert out.sum() > 0
    from scipy import ndimage
    assert ndimage.label(out > out.max() * 0.1)[1] == 2
