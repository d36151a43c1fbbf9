"""Large-volume (slab > 128x128) fast path: the prefiltered voxel-tube
march covers the full integrator x interpolation menu, and the dense
cubic weights reproduce clamped-texture addressing exactly.

These lock in round-3 fixes: the tube fallback previously raised
NotImplementedError for tricubic / RK45-substep / AB4
(render_fast.py gate), and the dense tricubic weights diverged from
interp.sample_tricubic for laterally-exiting rays.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.ops.lens import RayBundle
from photon_tpu.ops.march import march_rays
from photon_tpu.ops.march_dense import _cubic_weights, march_chief_dense
from photon_tpu.ops.march_fast import chief_deltas_chunked
from photon_tpu.volume import build_density_volume


def big_volume(setup, n_xy=144, n_z=24, grad_rho=4.0):
    """Uniform-d(rho)/dx volume whose slab (n_xy^2) exceeds the dense
    march's 128x128 limit (same frame mapping as
    gradient_volume_between)."""
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n_xy)
    z_dots = setup.object_distance
    z = np.linspace(z_dots - 0.6 * setup.object_distance,
                    z_dots - 0.1 * setup.object_distance, n_z)
    rho0 = 1.225
    X = x[:, None, None] * np.ones((1, n_xy, n_z))
    rho = rho0 + grad_rho * (X - x.min()) / (x.max() - x.min())
    return build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [x[0], x[0], z[0]])


def _chief_rays(P=7, span=8e4):
    xs = np.linspace(-span / 2, span / 2, P).astype(np.float32)
    pos = np.stack([xs, np.zeros(P), np.full(P, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (P, 1))
    return xs, pos, dirs


def _entry_args(vol, pos, dirs):
    """(entry_x, entry_y, slope_x, slope_y) at the volume top."""
    z_top = float(vol.max_bound[2])
    t = (z_top - pos[:, 2]) / dirs[:, 2]
    ex = pos[:, 0] + dirs[:, 0] * t
    ey = pos[:, 1] + dirs[:, 1] * t
    return (jnp.asarray(ex), jnp.asarray(ey),
            jnp.asarray(dirs[:, 0] / dirs[:, 2]),
            jnp.asarray(dirs[:, 1] / dirs[:, 2]))


@pytest.mark.parametrize("algorithm,scheme", [(1, 2), (2, 2), (3, 1),
                                              (3, 2), (4, 1), (4, 2)])
def test_tube_fullmenu_matches_exact(algorithm, scheme):
    """Every previously-unsupported combo tracks the exact marcher on a
    slab too large for the dense march."""
    from photon_tpu.ops.march_dense import dense_march_supported

    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol = big_volume(setup)
    assert not dense_march_supported(vol)
    xs, pos, dirs = _chief_rays()

    exact_alg = algorithm if algorithm != 3 else 2
    ref = march_rays(vol, RayBundle(jnp.asarray(pos), jnp.asarray(dirs),
                                    jnp.zeros(len(xs)), jnp.ones(len(xs))),
                     algorithm=exact_alg, interpolation_scheme=scheme)
    ref_slope = np.asarray(ref.dir)[:, 0] / np.asarray(ref.dir)[:, 2]

    out = chief_deltas_chunked(
        vol, *_entry_args(vol, pos, dirs),
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
        jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]),
        algorithm=algorithm, interpolation_scheme=scheme,
        particles_per_chunk=None)
    # ddir deltas -> exit slope (chiefs start as (0, 0, -1))
    tube_slope = np.asarray(out[3]) / (-1.0 + np.asarray(out[5]))
    np.testing.assert_allclose(tube_slope, ref_slope, rtol=0.03,
                               atol=0.03 * np.abs(ref_slope).max())


def test_render_fast_large_volume_tricubic_rk45():
    """render_image_fast accepts tricubic + RK45-substep at any volume
    size (the old gate raised NotImplementedError here) and matches the
    exact-path image."""
    from tests.test_march_dense import _scene
    from photon_tpu.models.render import render_image
    from photon_tpu.models.render_fast import render_image_fast
    from photon_tpu.ops.march import make_march_fn
    from photon_tpu.pipeline import can_use_fast_renderer

    cfg, setup, src, r1, r2 = _scene(
        "general", rays=16,
        **{"density_gradients.interpolation_scheme": 2,
           "density_gradients.ray_tracing_algorithm": 3})
    vol = big_volume(setup)
    assert can_use_fast_renderer(cfg, setup, vol=vol)

    img_fast = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            vol=vol, algorithm=3,
                                            interpolation_scheme=2))
    march_fn = make_march_fn(vol, algorithm=2, interpolation_scheme=2)
    img_ref = np.asarray(render_image(cfg, setup, src, r1, r2,
                                      march_fn=march_fn))
    assert img_fast.sum() > 0
    l1 = np.abs(img_ref - img_fast).sum() / img_ref.sum()
    assert l1 < 0.10, l1


def test_tube_tricubic_256_volume_matches_exact():
    """The VERDICT gate case: a 256^3 volume with tricubic marches
    through the fast tube path and matches the exact marcher."""
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol = big_volume(setup, n_xy=256, n_z=256)
    xs, pos, dirs = _chief_rays(P=5)

    ref = march_rays(vol, RayBundle(jnp.asarray(pos), jnp.asarray(dirs),
                                    jnp.zeros(len(xs)), jnp.ones(len(xs))),
                     algorithm=2, interpolation_scheme=2)
    ref_slope = np.asarray(ref.dir)[:, 0] / np.asarray(ref.dir)[:, 2]

    out = chief_deltas_chunked(
        vol, *_entry_args(vol, pos, dirs),
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
        jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]),
        algorithm=3, interpolation_scheme=2, particles_per_chunk=None)
    tube_slope = np.asarray(out[3]) / (-1.0 + np.asarray(out[5]))
    np.testing.assert_allclose(tube_slope, ref_slope, rtol=0.03,
                               atol=0.03 * np.abs(ref_slope).max())


def test_tube_gradients_flow_large_volume():
    """jax.grad through the large-volume tricubic tube march is finite
    and nonzero (gradients previously raised via the Pallas default)."""
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol = big_volume(setup, n_xy=136, n_z=12)
    xs, pos, dirs = _chief_rays(P=5)
    args = (_entry_args(vol, pos, dirs)
            + (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
               jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
               jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2])))

    def loss(field):
        d = chief_deltas_chunked(vol._replace(field=field), *args,
                                 algorithm=4, interpolation_scheme=2,
                                 particles_per_chunk=None)
        return jnp.sum(d[1] ** 2)

    g = np.asarray(jax.grad(loss)(vol.field))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


# ---------------------------------------------------------------------------
# Clamped-addressing parity of the dense cubic weights (VERDICT r2 #9)
# ---------------------------------------------------------------------------


def _bspline_w4(t):
    one = 1.0 - t
    return np.stack([one ** 3 / 6.0,
                     (3 * t ** 3 - 6 * t ** 2 + 4) / 6.0,
                     (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) / 6.0,
                     t ** 3 / 6.0], -1)


def test_dense_cubic_weights_match_clamped_gather():
    """_cubic_weights(u) @ values == the 4-tap clamped gather
    (interp.sample_tricubic semantics) for every coordinate, including
    far outside the grid."""
    n = 9
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(n,)).astype(np.float32)
    u = np.array([-7.0, -2.3, -2.0, -1.0, -0.2, 0.0, 0.5, 3.7,
                  n - 1.0, n - 0.5, n + 0.8, n + 5.0], np.float32)

    # reference: clamped 4-tap gather exactly as sample_tricubic does it
    i0 = np.floor(u)
    t = u - i0
    base = i0.astype(np.int64) - 1
    idx = np.clip(base[:, None] + np.arange(4)[None, :], 0, n - 1)
    ref = (_bspline_w4(t) * vals[idx]).sum(-1)

    dense = np.asarray(_cubic_weights(jnp.asarray(u), n)) @ vals
    np.testing.assert_allclose(dense, ref, rtol=1e-5, atol=1e-6)


def test_laterally_exiting_ray_dense_tricubic():
    """A chief ray far outside the volume laterally samples the border
    voxel (clamped addressing), so it still deflects by the border
    gradient — the old fold gave it near-zero weights instead."""
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=16)
    span = float(vol.max_bound[0] - vol.min_bound[0])
    # one interior ray, one ray 30% past the +x face
    xs = np.array([0.0, float(vol.max_bound[0]) + 0.3 * span], np.float32)
    pos = np.stack([xs, np.zeros(2), np.full(2, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (2, 1))

    def slope(scheme):
        out = march_chief_dense(
            vol, jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
            jnp.asarray(pos[:, 2]), jnp.asarray(dirs[:, 0]),
            jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]),
            algorithm=2, interpolation_scheme=scheme)
        return np.asarray(out[3]) / np.asarray(out[5])

    s_tri = slope(1)
    s_cub = slope(2)
    # the outside ray samples pure border voxel under both schemes: the
    # deflections agree and are the same order as the interior ray's
    np.testing.assert_allclose(s_cub[1], s_tri[1], rtol=1e-3)
    assert abs(s_cub[1]) > 0.3 * abs(s_cub[0])
