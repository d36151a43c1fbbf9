"""Fused Pallas particle splat vs the XLA patch+scatter path."""
import numpy as np

import jax
import jax.numpy as jnp

from photon_tpu.ops.sensor_fast import (_particle_splat_xla,
                                        particle_splat)
from photon_tpu.ops.splat_pallas import splat_particles_pallas


def _spots(p=300, nx=256, ny=192, K=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-0.5, nx - 0.5, p).astype(np.float32)
    Y = rng.uniform(-0.5, ny - 0.5, p).astype(np.float32)
    A = rng.uniform(0.1, 2.0, p).astype(np.float32)
    col0 = np.clip(np.round(X).astype(np.int32) - K // 2, 0, nx - K)
    row0 = np.clip(np.round(Y).astype(np.int32) - K // 2, 0, ny - K)
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(A),
            jnp.asarray(col0), jnp.asarray(row0))


def test_pallas_splat_matches_xla():
    nx, ny, K, D = 256, 192, 8, 3.0
    X, Y, A, col0, row0 = _spots(nx=nx, ny=ny, K=K)
    static = (nx, ny, D, K, 0.75)
    ref = np.asarray(_particle_splat_xla(X, Y, A, col0, row0, static))
    got = np.asarray(splat_particles_pallas(
        X, Y, A, col0, row0, K=K, ny=ny, nx=nx, diameter=D,
        render_fraction=0.75, interpret=True))
    assert ref.sum() > 0
    # in-kernel erf is the A&S 7.1.26 approximation (|err| < 1.5e-7)
    np.testing.assert_allclose(got, ref, atol=3e-6 * ref.max())


def test_pallas_splat_border_spots():
    """Spots whose centers sit at the frame corners/edges."""
    nx, ny, K, D = 128, 128, 8, 3.0
    X = jnp.asarray([-0.4, nx - 0.6, 3.0, nx / 2.0], jnp.float32)
    Y = jnp.asarray([-0.4, ny - 0.6, ny - 1.0, 0.2], jnp.float32)
    A = jnp.ones(4, jnp.float32)
    col0 = jnp.clip(jnp.round(X).astype(jnp.int32) - K // 2, 0, nx - K)
    row0 = jnp.clip(jnp.round(Y).astype(jnp.int32) - K // 2, 0, ny - K)
    static = (nx, ny, D, K, 0.75)
    ref = np.asarray(_particle_splat_xla(X, Y, A, col0, row0, static))
    got = np.asarray(splat_particles_pallas(
        X, Y, A, col0, row0, K=K, ny=ny, nx=nx, diameter=D,
        render_fraction=0.75, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-6 * max(ref.max(), 1e-9))


def test_particle_splat_entrypoint_pallas_matches_xla():
    """The public particle_splat with use_pallas forced on/off."""
    nx = ny = 192
    X, Y, A, *_ = _spots(nx=nx, ny=ny)
    pc = jnp.round(X).astype(jnp.int32)
    pr = jnp.round(Y).astype(jnp.int32)
    kw = dict(nx=nx, ny=ny, diameter=3.0, patch=8)
    ref = np.asarray(particle_splat(X, Y, A, pc, pr, use_pallas=False, **kw))
    got = np.asarray(particle_splat(X, Y, A, pc, pr, use_pallas=True, **kw))
    np.testing.assert_allclose(got, ref, atol=3e-6 * ref.max())


def test_pallas_splat_gradients():
    """custom_vjp backward (XLA transpose) matches XLA-path autodiff."""
    nx = ny = 128
    X, Y, A, col0, row0 = _spots(p=50, nx=nx, ny=ny)
    static = (nx, ny, 3.0, 8, 0.75)
    from photon_tpu.ops.sensor_fast import _particle_splat_fused

    tgt = jnp.ones((ny, nx), jnp.float32)

    def loss_fused(X, Y, A):
        img = _particle_splat_fused(static, X, Y, A, col0, row0)
        return jnp.sum(img * tgt * img)

    def loss_ref(X, Y, A):
        img = _particle_splat_xla(X, Y, A, col0, row0, static)
        return jnp.sum(img * tgt * img)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(X, Y, A)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(X, Y, A)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(b).max(), 1e-9)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5)


def test_pallas_splat_v2_matches_xla():
    """The round-5 sorted tile-accumulate kernel: identical deposits to
    the XLA oracle (modulo the in-kernel erf approximation and
    within-tile add reordering)."""
    from photon_tpu.ops.splat_pallas import (splat_particles_pallas_v2,
                                             splat_v2_supported)
    nx, ny, K, D = 512, 256, 8, 3.0
    assert splat_v2_supported(K, ny, nx)
    X, Y, A, col0, row0 = _spots(p=600, nx=nx, ny=ny, K=K)
    static = (nx, ny, D, K, 0.75)
    ref = np.asarray(_particle_splat_xla(X, Y, A, col0, row0, static))
    got = np.asarray(splat_particles_pallas_v2(
        X, Y, A, col0, row0, K=K, ny=ny, nx=nx, diameter=D,
        render_fraction=0.75, interpret=True))
    assert ref.sum() > 0
    np.testing.assert_allclose(got, ref, atol=3e-6 * ref.max())


def test_pallas_splat_v2_border_spots():
    from photon_tpu.ops.splat_pallas import splat_particles_pallas_v2
    nx, ny, K, D = 256, 128, 8, 3.0
    X = jnp.asarray([-0.4, nx - 0.6, 3.0, nx / 2.0], jnp.float32)
    Y = jnp.asarray([-0.4, ny - 0.6, ny - 1.0, 0.2], jnp.float32)
    A = jnp.ones(4, jnp.float32)
    col0 = jnp.clip(jnp.round(X).astype(jnp.int32) - K // 2, 0, nx - K)
    row0 = jnp.clip(jnp.round(Y).astype(jnp.int32) - K // 2, 0, ny - K)
    static = (nx, ny, D, K, 0.75)
    ref = np.asarray(_particle_splat_xla(X, Y, A, col0, row0, static))
    got = np.asarray(splat_particles_pallas_v2(
        X, Y, A, col0, row0, K=K, ny=ny, nx=nx, diameter=D,
        render_fraction=0.75, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-6 * max(ref.max(), 1e-9))
