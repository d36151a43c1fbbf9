"""Multi-device tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_source
from photon_tpu.utils.rng import lens_samples

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_mesh
def test_sharded_fast_render_matches_single_device():
    cfg = bos_case("general", n_dots=6, rays=16)
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(11))
    r1, r2 = lens_samples(jax.random.key(5), 16)
    vol, *_ = gradient_volume_between(setup, n=16)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("particles",))

    img1 = np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol))
    img8 = np.asarray(render_image_fast(cfg, setup, src, r1, r2, vol=vol,
                                        mesh=mesh))
    assert img1.sum() > 0
    np.testing.assert_allclose(img8.sum(), img1.sum(), rtol=1e-4)
    l1 = np.abs(img1 - img8).sum() / img1.sum()
    assert l1 < 1e-4, l1


@needs_mesh
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
