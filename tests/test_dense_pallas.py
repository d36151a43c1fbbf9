"""Fused Pallas dense-slab sampler vs the XLA matmul+reduce path
(interpret mode on CPU): values, gradients, and the full march."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.ops.march_dense import (_cubic_weights, _slab_sample,
                                        _tri_weights, chief_deltas_dense)
from photon_tpu.ops.march_dense_pallas import dense_slab_sample


def _xla_sample(field_pair, ux, uy, uz, W, H, scheme):
    """The march_dense XLA formulation on one slab pair."""
    lo, hi = field_pair                   # (H, W, 4) each
    pair = jnp.stack([jnp.transpose(lo, (1, 0, 2)),
                      jnp.transpose(hi, (1, 0, 2))], axis=1)   # (W, 2, H, 4)
    pair_T = pair.reshape(W, 2 * H * 4)
    weights = _cubic_weights if scheme == 2 else _tri_weights
    wx = weights(ux, W)
    wy = weights(uy, H)
    return _slab_sample(pair_T, wx, wy * (1.0 - uz)[:, None],
                        wy * uz[:, None], H)


def _pallas_sample(field_pair, ux, uy, uz, W, H, scheme):
    lo, hi = field_pair
    loT = jnp.transpose(lo, (1, 2, 0)).reshape(W * 4, H)
    hiT = jnp.transpose(hi, (1, 2, 0)).reshape(W * 4, H)
    return dense_slab_sample((W, H, scheme, True), loT, hiT, ux, uy, uz)


@pytest.mark.parametrize("scheme", [1, 2])
def test_pallas_sampler_matches_xla(scheme):
    W, H, P = 16, 12, 37
    rng = np.random.default_rng(scheme)
    lo = jnp.asarray(rng.normal(size=(H, W, 4)).astype(np.float32))
    hi = jnp.asarray(rng.normal(size=(H, W, 4)).astype(np.float32))
    # coordinates spanning inside, border, and far outside the grid
    ux = jnp.asarray(rng.uniform(-4, W + 3, P).astype(np.float32))
    uy = jnp.asarray(rng.uniform(-4, H + 3, P).astype(np.float32))
    uz = jnp.asarray(rng.uniform(0, 1, P).astype(np.float32))

    ref = _xla_sample((lo, hi), ux, uy, uz, W, H, scheme)
    out = _pallas_sample((lo, hi), ux, uy, uz, W, H, scheme)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("scheme", [1, 2])
def test_pallas_sampler_gradients_match_xla(scheme):
    W, H, P = 16, 12, 29
    rng = np.random.default_rng(10 + scheme)
    lo = jnp.asarray(rng.normal(size=(H, W, 4)).astype(np.float32))
    hi = jnp.asarray(rng.normal(size=(H, W, 4)).astype(np.float32))
    # keep coordinates away from the (measure-zero) weight-kernel kinks
    ux = jnp.asarray((rng.integers(-2, W + 1, P) + 0.3).astype(np.float32))
    uy = jnp.asarray((rng.integers(-2, H + 1, P) + 0.6).astype(np.float32))
    uz = jnp.asarray(rng.uniform(0.05, 0.95, P).astype(np.float32))

    def loss_xla(lo, hi, ux, uy, uz):
        s = _xla_sample((lo, hi), ux, uy, uz, W, H, scheme)
        return sum((v * jnp.arange(1.0, P + 1)).sum() for v in s)

    def loss_pal(lo, hi, ux, uy, uz):
        s = _pallas_sample((lo, hi), ux, uy, uz, W, H, scheme)
        return sum((v * jnp.arange(1.0, P + 1)).sum() for v in s)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(lo, hi, ux, uy, uz)
    g_out = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(lo, hi, ux, uy, uz)
    for r, o in zip(g_ref, g_out):
        scale = max(float(jnp.abs(r).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-5 * scale)


@pytest.mark.parametrize("algorithm,scheme", [(2, 1), (3, 2)])
def test_pallas_march_matches_xla_march(algorithm, scheme):
    """Full chief march through a real volume: both samplers agree."""
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=16)
    P = 9
    xs = np.linspace(-4e4, 4e4, P).astype(np.float32)
    pos = np.stack([xs, np.zeros(P), np.full(P, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (P, 1))
    args = (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
            jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
            jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]))

    ref = chief_deltas_dense(vol, *args, algorithm=algorithm,
                             interpolation_scheme=scheme,
                             use_pallas_sampler=False)
    # PHOTON_MARCH_PASSES=3: this is a bit-parity check of the sampler
    # semantics; the production default is the 2-pass contraction whose
    # ~2e-3 budget is asserted in test_dense_fused
    import photon_tpu.ops.march_dense_fused as mdf
    import unittest.mock as mock
    with mock.patch.object(mdf, "_fwd_passes", lambda: 3):
        out = chief_deltas_dense(vol, *args, algorithm=algorithm,
                                 interpolation_scheme=scheme,
                                 use_pallas_sampler=True)
    for r, o in zip(ref, out):
        r, o = np.asarray(r), np.asarray(o)
        scale = max(np.abs(r).max(), 1e-9)
        np.testing.assert_allclose(o, r, atol=2e-5 * scale, rtol=2e-4)


def test_pallas_march_gradient_flows():
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=12)
    P = 5
    xs = np.linspace(-3e4, 3e4, P).astype(np.float32)
    pos = np.stack([xs, np.zeros(P), np.full(P, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (P, 1))
    args = (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
            jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
            jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]))

    def loss(field, pallas):
        d = chief_deltas_dense(vol, *args, algorithm=2, field=field,
                               use_pallas_sampler=pallas)
        return jnp.sum(d[1] ** 2)

    g_ref = np.asarray(jax.grad(lambda f: loss(f, False))(vol.field))
    g_out = np.asarray(jax.grad(lambda f: loss(f, True))(vol.field))
    assert np.isfinite(g_out).all()
    scale = max(np.abs(g_ref).max(), 1e-30)
    np.testing.assert_allclose(g_out, g_ref, atol=1e-4 * scale, rtol=1e-3)


def test_pallas_sampler_extends_dense_to_large_slabs():
    """Slabs beyond the XLA dense limit (128^2) run through the Pallas
    sampler (VMEM-resident slab pair) and agree with the tube march."""
    from tests.test_march_tube_fullmenu import big_volume, _entry_args
    from photon_tpu.ops.march_dense import (DENSE_MAX_SLAB,
                                            dense_march_supported)
    from photon_tpu.ops.march_fast import chief_deltas_chunked

    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol = big_volume(setup, n_xy=144, n_z=10)
    w, h, _ = vol.sizes
    assert w * h > DENSE_MAX_SLAB
    assert not dense_march_supported(vol, use_pallas_sampler=False)
    assert dense_march_supported(vol, use_pallas_sampler=True)

    P = 5
    xs = np.linspace(-4e4, 4e4, P).astype(np.float32)
    pos = np.stack([xs, np.zeros(P), np.full(P, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (P, 1))
    args = (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
            jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
            jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]))

    dense = chief_deltas_dense(vol, *args, algorithm=2,
                               use_pallas_sampler=True)
    tube = chief_deltas_chunked(vol, *_entry_args(vol, pos, dirs), *args,
                                algorithm=2, particles_per_chunk=None)
    for a, b in zip(tube, dense):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale)

    # the XLA sampler refuses (memory hazard), with a clear error
    with pytest.raises(ValueError):
        chief_deltas_dense(vol, *args, algorithm=2,
                           use_pallas_sampler=False)
