"""Windowed fused march (ops.march_window) vs the dense-march oracle.

The windowed kernel must reproduce march_chief_dense exactly (same
weights, same slab planes) while touching only a per-block window of
each slab — these tests run it in interpret mode on volumes small
enough for the XLA dense oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from photon_tpu.ops.march_dense import march_chief_dense
from photon_tpu.ops.march_window import (chief_deltas_windowed,
                                         march_chief_windowed,
                                         plan_windows)
from photon_tpu.volume import build_density_volume


def _vol(n=128, d=10, lo=-6e4, hi=6e4, z0=4.0e5, z1=9.0e5, seed=3):
    """Random but PHYSICAL refractivity: the windowed march's plan
    bounds each block's window by its straight chief track plus a
    margin — valid for real BOS/PIV media (micro-radian deflections).
    A 0.8-amplitude random rho field (the fused-march tests' field)
    bends rays tens of voxels off the straight line, violating the
    plan's contract by construction."""
    rng = np.random.default_rng(seed)
    x = np.linspace(lo, hi, n)
    rho = 1.225 + 0.08 * rng.random((n, n, d))
    return build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], (z1 - z0) / (d - 1)], [lo, lo, z0])


def _chiefs(p, seed=0, spread=5.5e4, outside_frac=0.02):
    """Random downward chiefs; a few land laterally outside the volume
    (their weights clamp to the border — the windowed kernel must
    reproduce the clamp through its border windows)."""
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-spread, spread, p)
    ys = rng.uniform(-spread, spread, p)
    n_out = max(1, int(outside_frac * p))
    xs[:n_out] = rng.uniform(7e4, 9e4, n_out)       # beyond the +6e4 edge
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.02, 0.02, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    return tuple(np.asarray(a, np.float32) for a in
                 (xs, ys, zs, tx * inv, ty * inv, -inv))


@pytest.mark.parametrize("scheme", [1, 2])
def test_windowed_matches_dense(scheme):
    vol = _vol()
    ch = _chiefs(16 * 1024)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None, "plan must succeed at this density"
    # y windows are partial (8-voxel granularity); x windows on a
    # 128-wide volume are full-width by granularity (32-voxel lane
    # tiles + slack) — partial x is covered by
    # test_windowed_partial_x_on_wide_volume
    assert plan.win_h < 128, (plan.win_w, plan.win_h)
    got = march_chief_windowed(vol, plan, *map(jnp.asarray, ch),
                               algorithm=2, interpolation_scheme=scheme,
                               passes=3)
    ref = march_chief_dense(vol, *map(jnp.asarray, ch), algorithm=2,
                            interpolation_scheme=scheme,
                            use_pallas_sampler=False)
    # positions compare at 0.05 um absolute (f32 tap-ordering rounding
    # on ~1e5 um coordinates; far below any physical significance),
    # directions at 2e-5
    for i, (g, r) in enumerate(zip(got, ref)):
        atol = 0.05 if i < 3 else 2e-5
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=atol, err_msg=str(i))


def test_windowed_euler_and_substeps():
    vol = _vol(d=8)
    ch = _chiefs(16 * 1024, seed=5)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    for kw in (dict(algorithm=1), dict(algorithm=3, substeps=2)):
        got = march_chief_windowed(vol, plan, *map(jnp.asarray, ch),
                                   passes=3, **kw)
        ref = march_chief_dense(vol, *map(jnp.asarray, ch),
                                use_pallas_sampler=False, **kw)
        for i, (g, r) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4,
                                       atol=0.05 if i < 3 else 2e-5)


def test_windowed_miss_rays_pass_through():
    vol = _vol(d=8)
    xs, ys, zs, dx, dy, dz = _chiefs(4096, seed=7)
    plan = plan_windows(vol, xs, ys, zs, dx, dy, -dz,
                        require_profit=False)  # upward: all miss
    # upward rays never enter; the plan still builds (t clamps to 0)
    if plan is None:
        pytest.skip("plan degenerate for all-miss scene")
    got = march_chief_windowed(vol, plan, *map(jnp.asarray,
                                               (xs, ys, zs, dx, dy, -dz)))
    np.testing.assert_allclose(np.asarray(got[0]), xs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[3]), dx, rtol=0)


def test_windowed_deltas_contract():
    vol = _vol(d=8)
    ch = _chiefs(8192, seed=9)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    z1, dpx, dpy, ddx, ddy, ddz = chief_deltas_windowed(
        vol, plan, *map(jnp.asarray, ch), passes=3)
    from photon_tpu.ops.march_dense import chief_deltas_dense
    r = chief_deltas_dense(vol, *map(jnp.asarray, ch),
                           use_pallas_sampler=False)
    for i, (a, b) in enumerate(zip((z1, dpx, dpy, ddx, ddy, ddz), r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4,
                                   atol=0.05 if i < 3 else 2e-5)


def test_render_routes_large_volume_through_windowed_march():
    """render_image_fast on a volume beyond the dense-march cap: the
    windowed march plans successfully and the rendered image matches
    the tube-path render of the same scene."""
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.render_fast import render_image_fast
    from photon_tpu.models.scenes import bos_source
    from photon_tpu.config import default_config
    from photon_tpu.utils.rng import lens_samples

    cfg = default_config("bos")
    cfg.camera_design.x_pixel_number = 256
    cfg.camera_design.y_pixel_number = 256
    cfg.bos_pattern.grid_point_number = 600
    cfg.bos_pattern.particle_number_per_grid_point = 8
    cfg.bos_pattern.lightray_number_per_particle = 16
    m = cfg.lens_design.focal_length / (
        cfg.lens_design.object_distance - cfg.lens_design.focal_length)
    half = 0.7 * 256 * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.bos_pattern.X_Min, cfg.bos_pattern.X_Max = -half, half
    cfg.bos_pattern.Y_Min, cfg.bos_pattern.Y_Max = -half, half
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(2))
    r1, r2 = lens_samples(jax.random.key(5), 16)

    # 288^2 lateral slab: beyond DENSE_MAX_SLAB_PALLAS (256^2)
    n, d = 288, 8
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n)
    z_dots = setup.object_distance
    z = np.linspace(z_dots - 0.6 * setup.object_distance,
                    z_dots - 0.1 * setup.object_distance, d)
    gx = np.linspace(0, 1, n)
    rho = 1.225 + 2.0 * gx[:, None, None] * np.ones((1, n, d))
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [x[0], x[0], z[0]])

    from photon_tpu.ops.march_dense import dense_march_supported
    assert not dense_march_supported(vol)

    img_win = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                           vol=vol))
    img_tube = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                            vol=vol, dense_march=False))
    assert img_win.sum() > 0
    l1 = np.abs(img_win - img_tube).sum() / img_tube.sum()
    assert l1 < 2e-3, l1


def test_windowed_partial_x_on_wide_volume():
    """A wide (256 x 64) volume: x windows must be PARTIAL (the ray
    blocks tile the x axis) and still match the dense oracle —
    exercises nonzero lane-aligned window origins."""
    rng = np.random.default_rng(3)
    w, h, d = 256, 64, 8
    lo, hi, z0, z1 = -12e4, 12e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, w)
    vox = x[1] - x[0]
    rho = 1.225 + 0.08 * rng.random((w, h, d))
    vol = build_density_volume(
        rho, [vox, vox, (z1 - z0) / (d - 1)], [lo, lo * h / w, z0])

    p = 16 * 1024
    xs = rng.uniform(-11e4, 11e4, p)
    ys = rng.uniform(-0.45 * vox * h, 0.45 * vox * h, p)
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.005, 0.005, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    ch = tuple(np.asarray(a, np.float32) for a in
               (xs, ys, zs, tx * inv, ty * inv, -inv))

    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    assert plan.win_w < w, plan.win_w
    assert int(plan.ox.max()) > 0          # nonzero lane origins used
    got = march_chief_windowed(vol, plan, *map(jnp.asarray, ch), passes=3)
    ref = march_chief_dense(vol, *map(jnp.asarray, ch),
                            use_pallas_sampler=False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4,
                                   atol=0.05 if i < 3 else 2e-5)


def test_windowed_default_passes_within_reference_budget():
    """The windowed march defaults to a 2-pass bf16-split contraction;
    its DEFLECTION error vs the 3-pass (~f32) kernel must sit well
    inside the reference's own 1% displacement acceptance budget
    (createNRRD.py:108-116)."""
    vol = _vol(d=10)
    ch = _chiefs(16 * 1024, seed=2)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))
    d2 = chief_deltas_windowed(vol, plan, *args, passes=2)
    d3 = chief_deltas_windowed(vol, plan, *args, passes=3)
    # deflection channels: ddir_x / ddir_y
    for a, b in ((d2[3], d3[3]), (d2[4], d3[4])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max()
        assert scale > 0
        rel = np.abs(a - b).max() / scale
        assert rel < 1e-2, rel


def test_windowed_unaligned_volume_dims():
    """Volume dims that are not multiples of the tile granularity
    (w % 32 != 0, h % 8 != 0): origins must stay tile-aligned after
    clipping — the plan either covers correctly or declines (never
    ships a false pl.multiple_of claim)."""
    rng = np.random.default_rng(4)
    w, h, d = 140, 116, 8
    lo, hi, z0, z1 = -6e4, 6e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, w)
    vox = x[1] - x[0]
    rho = 1.225 + 0.08 * rng.random((w, h, d))
    vol = build_density_volume(
        rho, [vox, vox, (z1 - z0) / (d - 1)], [lo, lo * h / w, z0])
    p = 16 * 1024
    xs = rng.uniform(-5.8e4, 5.8e4, p)
    ys = rng.uniform(-0.48 * vox * h, 0.48 * vox * h, p)
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.01, 0.01, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    ch = tuple(np.asarray(a, np.float32) for a in
               (xs, ys, zs, tx * inv, ty * inv, -inv))
    plan = plan_windows(vol, *ch, require_profit=False)
    if plan is None:
        pytest.skip("plan declined (acceptable for unaligned edges)")
    assert (plan.ox % 32 == 0).all() and (plan.oy % 8 == 0).all()
    got = march_chief_windowed(vol, plan, *map(jnp.asarray, ch), passes=3)
    ref = march_chief_dense(vol, *map(jnp.asarray, ch),
                            use_pallas_sampler=False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4,
                                   atol=0.05 if i < 3 else 2e-5)


def test_plan_rejects_degenerate_cases():
    # tiny volume: windows cannot beat dense
    vol = _vol(n=16, d=8)
    ch = _chiefs(2048, spread=5e4)
    assert plan_windows(vol, *ch) is None


# ---------------------------------------------------------------------------
# Windowed backward (round 5): gradients at any volume size
# ---------------------------------------------------------------------------


def _field_loss(marcher):
    def fn(field):
        o = marcher(field)
        return jnp.sum(o[0] ** 2 + o[3] ** 2 * 1e6)
    return fn


@pytest.mark.parametrize("scheme", [1, 2])
@pytest.mark.parametrize("traj", ["stage", "recompute"])
def test_windowed_gradients_match_dense(scheme, traj, monkeypatch):
    """Field gradients through the windowed custom_vjp kernel match the
    per-stage XLA autodiff oracle — both backward flavors (saved stage
    residual / reverse re-march reconstruction)."""
    if traj == "recompute":
        import photon_tpu.ops.march_window as mw
        monkeypatch.setattr(mw, "_win_traj_max_bytes", lambda: 0)
    vol = _vol(n=64, d=8)
    ch = _chiefs(2048)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))

    gw = jax.grad(_field_loss(
        lambda f: march_chief_windowed(vol._replace(field=f), plan, *args,
                                       algorithm=2,
                                       interpolation_scheme=scheme,
                                       passes=3)))(vol.field)
    gd = jax.grad(_field_loss(
        lambda f: march_chief_dense(vol, *args, algorithm=2,
                                    interpolation_scheme=scheme, field=f,
                                    use_pallas_sampler=False)))(vol.field)
    gw, gd = np.asarray(gw).ravel(), np.asarray(gd).ravel()
    cos = gw @ gd / (np.linalg.norm(gw) * np.linalg.norm(gd))
    assert cos > 0.9999, cos
    rel = np.abs(gw - gd).max() / np.abs(gd).max()
    assert rel < 5e-4, rel


def test_windowed_euler_gradients_match_dense(monkeypatch):
    import photon_tpu.ops.march_window as mw
    vol = _vol(n=64, d=8)
    ch = _chiefs(2048, seed=4)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))
    gd = np.asarray(jax.grad(_field_loss(
        lambda f: march_chief_dense(vol, *args, algorithm=1, field=f,
                                    use_pallas_sampler=False)))(
                        vol.field)).ravel()
    for traj_bytes in (None, 0):
        if traj_bytes is not None:
            monkeypatch.setattr(mw, "_win_traj_max_bytes", lambda: 0)
        gw = np.asarray(jax.grad(_field_loss(
            lambda f: march_chief_windowed(vol._replace(field=f), plan,
                                           *args, algorithm=1,
                                           passes=3)))(vol.field)).ravel()
        cos = gw @ gd / (np.linalg.norm(gw) * np.linalg.norm(gd))
        assert cos > 0.9999, cos


def test_windowed_state_gradients_match_dense():
    """Ray-state (entry z) gradients through the windowed kernel."""
    vol = _vol(n=64, d=8)
    ch = _chiefs(2048, seed=6)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))

    def loss(marcher):
        def fn(z0):
            o = marcher(z0)
            return jnp.sum(o[0] ** 2 + o[3] ** 2 * 1e6)
        return fn

    gz_w = np.asarray(jax.grad(loss(
        lambda z0: march_chief_windowed(vol, plan, args[0], args[1], z0,
                                        *args[3:], algorithm=2,
                                        passes=3)))(args[2]))
    gz_d = np.asarray(jax.grad(loss(
        lambda z0: march_chief_dense(vol, args[0], args[1], z0, *args[3:],
                                     algorithm=2,
                                     use_pallas_sampler=False)))(args[2]))
    denom = np.abs(gz_d).max()
    assert denom > 0
    np.testing.assert_allclose(gz_w / denom, gz_d / denom, atol=1e-5)


def test_windowed_gradients_beyond_dense_cap(monkeypatch):
    """The verdict's acceptance case: a volume whose slab exceeds the
    fused dense cap (>256^2) gets windowed gradients with cosine
    >= 0.9999 against the exact-semantics XLA autodiff (the dense
    sampler with its production memory guard lifted — the TUBE path is
    not a valid gradient oracle: its finite tube width truncates the
    tap support of edge voxels, measured cos ~0.98)."""
    rng = np.random.default_rng(11)
    w, h, d = 320, 224, 6
    lo, hi, z0, z1 = -9e4, 9e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, w)
    vox = x[1] - x[0]
    rho = 1.225 + 0.08 * rng.random((w, h, d))
    vol = build_density_volume(
        rho, [vox, vox, (z1 - z0) / (d - 1)], [lo, lo * h / w, z0])
    assert w * h > 256 * 256
    from photon_tpu.ops.march_dense import dense_march_supported
    assert not dense_march_supported(vol)

    p = 4096
    xs = rng.uniform(-8.5e4, 8.5e4, p)
    ys = rng.uniform(-0.45 * vox * h, 0.45 * vox * h, p)
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.01, 0.01, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    ch = tuple(np.asarray(a, np.float32) for a in
               (xs, ys, zs, tx * inv, ty * inv, -inv))
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))

    import photon_tpu.ops.march_dense as md
    monkeypatch.setattr(md, "DENSE_MAX_SLAB", 1 << 30)

    def dloss(deltas):
        return jnp.sum(deltas[1] ** 2 + deltas[3] ** 2 * 1e6)

    gw = np.asarray(jax.grad(lambda f: dloss(chief_deltas_windowed(
        vol._replace(field=f), plan, *args, algorithm=2,
        passes=3)))(vol.field)).ravel()
    from photon_tpu.ops.march_dense import chief_deltas_dense
    gd = np.asarray(jax.grad(lambda f: dloss(chief_deltas_dense(
        vol, *args, algorithm=2, field=f,
        use_pallas_sampler=False)))(vol.field)).ravel()
    cos = gw @ gd / (np.linalg.norm(gw) * np.linalg.norm(gd))
    assert cos > 0.9999, cos
    rel = np.abs(gw - gd).max() / np.abs(gd).max()
    assert rel < 1e-3, rel


def test_windowed_drift_violation_flags():
    """Runtime enforcement of the plan's drift contract: a physical
    field flags nothing; a violently refractive white-noise field (rays
    bend many voxels off the straight track) raises per-ray flags
    instead of silently reading clamped window edges."""
    # physical field: no violations
    vol = _vol(n=96, d=8)
    ch = _chiefs(4096, seed=8)
    plan = plan_windows(vol, *ch, require_profit=False)
    assert plan is not None
    args = tuple(map(jnp.asarray, ch))
    out = march_chief_windowed(vol, plan, *args, return_violations=True)
    assert len(out) == 7
    assert float(np.asarray(out[6]).sum()) == 0.0

    # contract-violating scene: rays clustered in a narrow y band (the
    # serpentine plan then cuts TIGHT windows around their straight
    # tracks) marched through an absurd uniform lateral density
    # gradient (120 kg/m^3 across the volume, ~20 voxels of coherent
    # drift).  The marched rays exit their windows: samples clamp at
    # non-border edges — exactly the "wrong sample" condition the
    # runtime flag must catch.  NOTE: drift alone does NOT flag — a
    # generous window still samples exactly (zero flags above is the
    # correct, not the lenient, answer).
    n, d = 96, 8
    lo, hi, z0, z1 = -6e4, 6e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, n)
    yy = np.linspace(0.0, 1.0, n)
    rho = 1.225 + 120.0 * yy[None, :, None] * np.ones((n, 1, d))
    vol_bad = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], (z1 - z0) / (d - 1)], [lo, lo, z0])
    rng = np.random.default_rng(21)
    p = 4096
    vox = x[1] - x[0]
    xs_b = rng.uniform(-5.5e4, 5.5e4, p)
    ys_b = rng.uniform(-2.0 * vox, 2.0 * vox, p)     # narrow band
    zs_b = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = np.zeros(p)
    inv = 1.0 / np.sqrt(tx * tx + 1.0)
    ch_b = tuple(np.asarray(a, np.float32) for a in
                 (xs_b, ys_b, zs_b, tx * inv, ty, -inv))
    plan_b = plan_windows(vol_bad, *ch_b, require_profit=False)
    if plan_b is None:
        pytest.skip("plan declined outright (also acceptable)")
    assert plan_b.win_h < 48, plan_b.win_h       # windows must be tight
    out_b = march_chief_windowed(vol_bad, plan_b,
                                 *map(jnp.asarray, ch_b),
                                 return_violations=True)
    assert float(np.asarray(out_b[6]).sum()) > 0.0


def test_windowed_two_copy_lane_snap():
    """The 16-voxel x-origin snap (two_copy): windows read from the
    natural field layout or its 16-voxel-shifted twin, halving the
    origin-snap slack.  Forward must match the dense oracle through
    both copies, and the backward's widened+rolled ct RMW must keep
    gradient parity."""
    rng = np.random.default_rng(3)
    w, h, d = 256, 64, 8
    lo, hi, z0, z1 = -12e4, 12e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, w)
    vox = x[1] - x[0]
    rho = 1.225 + 0.08 * rng.random((w, h, d))
    vol = build_density_volume(
        rho, [vox, vox, (z1 - z0) / (d - 1)], [lo, lo * h / w, z0])
    p = 8 * 1024
    xs = rng.uniform(-11e4, 11e4, p)
    ys = rng.uniform(-0.45 * vox * h, 0.45 * vox * h, p)
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.005, 0.005, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    ch = tuple(np.asarray(a, np.float32) for a in
               (xs, ys, zs, tx * inv, ty * inv, -inv))
    base = plan_windows(vol, *ch, require_profit=False)
    assert base is not None
    # force the two-copy origin snap at the same window size: 16-snap
    # origins cover at least as well as 32-snap, so the plan must build
    plan = plan_windows(vol, *ch, require_profit=False,
                        force_win=(base.win_w, base.win_h, True))
    assert plan is not None and plan.two_copy
    assert int(plan.oxc.max()) == 1, "no copy-1 window (degenerate scene)"
    assert (plan.ox % 32 == 0).all()

    args = tuple(map(jnp.asarray, ch))
    got = march_chief_windowed(vol, plan, *args, passes=3)
    ref = march_chief_dense(vol, *args, use_pallas_sampler=False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4,
                                   atol=0.05 if i < 3 else 2e-5)

    gw = np.asarray(jax.grad(_field_loss(
        lambda f: march_chief_windowed(vol._replace(field=f), plan, *args,
                                       algorithm=2,
                                       passes=3)))(vol.field)).ravel()
    gd = np.asarray(jax.grad(_field_loss(
        lambda f: march_chief_dense(vol, *args, algorithm=2, field=f,
                                    use_pallas_sampler=False)))(
                        vol.field)).ravel()
    cos = gw @ gd / (np.linalg.norm(gw) * np.linalg.norm(gd))
    assert cos > 0.9999, cos
    rel = np.abs(gw - gd).max() / np.abs(gd).max()
    assert rel < 5e-4, rel
