"""Pallas fused march kernel vs the XLA z-scan (interpret mode on CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.ops.march_fast import extract_tubes, march_tubes
from photon_tpu.ops.march_pallas import march_chief_pallas


def _chief_setup(n_vol=16, P=20):
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, eps, Z_D = gradient_volume_between(setup, n=n_vol)
    xs = np.linspace(-4e4, 4e4, P).astype(np.float32)
    x = jnp.asarray(xs)
    y = jnp.zeros(P, jnp.float32)
    z = jnp.full((P,), -50000.0, jnp.float32)
    zero = jnp.zeros(P, jnp.float32)
    dzc = jnp.full((P,), -1.0, jnp.float32)
    tubes = extract_tubes(vol, x, y)
    return vol, tubes, x, y, z, zero, dzc


def test_pallas_march_matches_xla_rk4():
    vol, tubes, x, y, z, zero, dzc = _chief_setup()
    ref = march_tubes(vol, tubes, x, y, z, zero, zero, dzc, algorithm=2)
    out = march_chief_pallas(vol, tubes, x, y, z, zero, zero, dzc,
                             algorithm=2, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_pallas_march_matches_xla_euler():
    vol, tubes, x, y, z, zero, dzc = _chief_setup()
    ref = march_tubes(vol, tubes, x, y, z, zero, zero, dzc, algorithm=1)
    out = march_chief_pallas(vol, tubes, x, y, z, zero, zero, dzc,
                             algorithm=1, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_pallas_march_miss_passthrough():
    vol, tubes, x, y, z, zero, dzc = _chief_setup()
    # rays below the volume going down: must pass through unchanged
    z_low = jnp.full_like(z, float(vol.min_bound[2]) - 1e4)
    out = march_chief_pallas(vol, tubes, x, y, z_low, zero, zero, dzc,
                             algorithm=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out[5]), -1.0)
