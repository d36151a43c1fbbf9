"""Fused whole-march kernel vs the per-stage dense march (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from photon_tpu.ops.march_dense import march_chief_dense
from photon_tpu.ops.march_dense_fused import march_chief_fused
from photon_tpu.volume import build_density_volume


def _vol(n=12, lo=-6e4, hi=6e4, z0=4.0e5, z1=9.0e5):
    rng = np.random.default_rng(3)
    x = np.linspace(lo, hi, n)
    z = np.linspace(z0, z1, n)
    rho = 1.2 + 0.8 * rng.random((n, n, n))
    return build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [lo, lo, z0])


def _chiefs(p=37, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-4e4, 4e4, p).astype(np.float32)
    ys = rng.uniform(-4e4, 4e4, p).astype(np.float32)
    zs = np.full(p, 1.0e6, np.float32)
    tx = rng.uniform(-0.08, 0.08, p)
    ty = rng.uniform(-0.08, 0.08, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs),
            jnp.asarray((tx * inv).astype(np.float32)),
            jnp.asarray((ty * inv).astype(np.float32)),
            jnp.asarray((-inv).astype(np.float32)))


@pytest.mark.parametrize("algorithm", [1, 2, 3])
@pytest.mark.parametrize("scheme", [1, 2])
def test_fused_matches_per_stage(algorithm, scheme):
    vol = _vol()
    chiefs = _chiefs()
    ref = march_chief_dense(vol, *chiefs, algorithm=algorithm,
                            interpolation_scheme=scheme,
                            use_pallas_sampler=False)
    # passes=3: the near-f32 contraction for bit-level parity with the
    # XLA oracle (the production default is the field-corrected 2-pass,
    # whose ~2e-3 budget is asserted separately below)
    got = march_chief_fused(vol, *chiefs, algorithm=algorithm,
                            interpolation_scheme=scheme, interpret=True,
                            passes=3)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_fused_default_passes_within_reference_budget():
    """The production 2-pass contraction must stay well inside the
    reference's 1% displacement acceptance (createNRRD.py:108-116)."""
    vol = _vol()
    chiefs = _chiefs()
    d2 = march_chief_fused(vol, *chiefs, algorithm=2, interpret=True)
    d3 = march_chief_fused(vol, *chiefs, algorithm=2, interpret=True,
                           passes=3)
    for i in (3, 4):       # deflection channels
        a = np.asarray(d2[i], np.float64)
        b = np.asarray(d3[i], np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert rel < 1e-2, rel


def test_fused_miss_rays_pass_through():
    vol = _vol()
    xs, ys, zs, dx, dy, dz = _chiefs(8)
    dz_up = -dz  # upward rays never enter (dcz > 0)
    got = march_chief_fused(vol, xs, ys, zs, dx, dy, dz_up, interpret=True)
    ref = march_chief_dense(vol, xs, ys, zs, dx, dy, dz_up,
                            use_pallas_sampler=False)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6)
    # positions and directions are untouched by the (missed) volume
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(xs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[3]), np.asarray(dx), rtol=0)


@pytest.mark.parametrize("algorithm", [1, 2])
def test_fused_field_gradients_match_per_stage(algorithm):
    """algorithm 1/2 exercise the fused cotangent kernel; the per-stage
    XLA path is the oracle."""
    vol = _vol(n=8)
    chiefs = _chiefs(11)

    def loss_fused(field):
        out = march_chief_fused(vol, *chiefs, algorithm=algorithm,
                                field=field, interpret=True)
        return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)

    def loss_ref(field):
        out = march_chief_dense(vol, *chiefs, algorithm=algorithm,
                                field=field, use_pallas_sampler=False)
        return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)

    g_fused = jax.grad(loss_fused)(vol.field)
    g_ref = jax.grad(loss_ref)(vol.field)
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=5e-4)


def test_fused_state_gradients_match_per_stage():
    """Cotangents w.r.t. the chief entry state (dot positions/directions)
    through the fused backward kernel."""
    vol = _vol(n=8)
    xs, ys, zs, dx, dy, dz = _chiefs(11)

    def out_sum(marcher, x0, tx0):
        def run(args):
            x, t = args
            inv = 1.0 / jnp.sqrt(t * t + dy * dy + dz * dz)
            o = marcher(vol, x, ys, zs, t * inv, dy * inv, dz * inv)
            return jnp.sum(o[0]) + 1e6 * jnp.sum(o[3])
        return jax.grad(run)((x0, tx0))

    g_fused = out_sum(lambda v, *a: march_chief_fused(v, *a, algorithm=2,
                                                      interpret=True),
                      xs, dx)
    g_ref = out_sum(lambda v, *a: march_chief_dense(
        v, *a, algorithm=2, use_pallas_sampler=False), xs, dx)
    for gf, gr in zip(g_fused, g_ref):
        gf, gr = np.asarray(gf), np.asarray(gr)
        denom = np.abs(gr).max()
        assert denom > 0
        np.testing.assert_allclose(gf / denom, gr / denom, atol=1e-3)


def test_fused_entry_z_gradients_match_per_stage():
    """Cotangent w.r.t. the entry z state (the fused backward's d_z /
    d_h accumulation): rays start INSIDE the volume's z range so the
    march entry z is the differentiated input (rays from above clamp
    their entry to z_max, hiding the kernel's d_z path)."""
    vol = _vol(n=8)
    xs, ys, _, dx, dy, dz = _chiefs(11)
    zs_in = jnp.linspace(5.0e5, 8.5e5, xs.shape[0]).astype(jnp.float32)

    def grad_z(marcher):
        def run(z0):
            o = marcher(vol, xs, ys, z0, dx, dy, dz)
            return jnp.sum(o[0]) + 1e6 * jnp.sum(o[3])
        return jax.grad(run)(zs_in)

    g_fused = grad_z(lambda v, *a: march_chief_fused(v, *a, algorithm=2,
                                                     interpret=True))
    g_ref = grad_z(lambda v, *a: march_chief_dense(
        v, *a, algorithm=2, use_pallas_sampler=False))
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=1e-3)


def test_fused_bwd_reblock_path(monkeypatch):
    """The backward can run at a smaller ray-block size than the
    forward (the VMEM-mitigation knob): force the divergence and check
    gradient parity through the reblock/inverse-reblock."""
    import photon_tpu.ops.march_dense_fused as mdf

    vol = _vol(n=8)
    chiefs = _chiefs(11)

    def loss(field):
        out = march_chief_fused(vol, *chiefs, algorithm=2, field=field,
                                interpret=True)
        return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)

    # disable the stage residual for BOTH runs: with it the backward
    # takes the traj path and the reblocked _bwd_fused_call would never
    # dispatch (the monkeypatched table would be dead)
    monkeypatch.setattr(mdf, "_traj_max_bytes", lambda: 0)
    g_ref = np.asarray(jax.grad(loss)(vol.field))
    monkeypatch.setattr(mdf, "_BWD_B_FOR_SLAB", ((64 * 64, 512),))
    g_reb = np.asarray(jax.grad(loss)(vol.field))
    denom = np.abs(g_ref).max()
    assert denom > 0
    np.testing.assert_allclose(g_reb / denom, g_ref / denom, atol=1e-6)


def test_fused_recompute_backward_matches(monkeypatch):
    """The memory-lean reverse-re-march backward (stage residual over
    the PHOTON_TRAJ_MAX_BYTES budget) matches the per-stage autodiff
    oracle like the default stage-residual kernel does."""
    import photon_tpu.ops.march_dense_fused as mdf

    monkeypatch.setattr(mdf, "_traj_max_bytes", lambda: 0)
    vol = _vol(n=8)
    chiefs = _chiefs(11)

    def loss(marcher):
        def fn(field):
            out = marcher(field)
            return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)
        return fn

    g_fused = jax.grad(loss(lambda f: march_chief_fused(
        vol, *chiefs, algorithm=2, field=f, interpret=True)))(vol.field)
    monkeypatch.undo()
    g_ref = jax.grad(loss(lambda f: march_chief_dense(
        vol, *chiefs, algorithm=2, field=f,
        use_pallas_sampler=False)))(vol.field)
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=5e-4)


def test_fused_tricubic_gradients_match_per_stage():
    vol = _vol(n=8)
    chiefs = _chiefs(7)

    def loss(marcher):
        def fn(field):
            out = marcher(field)
            return jnp.sum(out[1] ** 2 + out[4] ** 2 * 1e6)
        return fn

    g_fused = jax.grad(loss(lambda f: march_chief_fused(
        vol, *chiefs, algorithm=2, interpolation_scheme=2, field=f,
        interpret=True)))(vol.field)
    g_ref = jax.grad(loss(lambda f: march_chief_dense(
        vol, *chiefs, algorithm=2, interpolation_scheme=2, field=f,
        use_pallas_sampler=False)))(vol.field)
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=1e-3)


def test_fused_march_under_shard_map():
    """The fused kernel must run inside shard_map (the multi-chip render
    path shards particles over the mesh and marches per shard)."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    vol = _vol(n=8)
    xs, ys, zs, dx, dy, dz = _chiefs(16)
    devices = np.asarray(jax.devices("cpu")[:4])
    mesh = Mesh(devices, ("p",))

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("p"),) * 6, out_specs=(P("p"),) * 6,
             check_vma=False)
    def sharded(xs, ys, zs, dx, dy, dz):
        return march_chief_fused(vol, xs, ys, zs, dx, dy, dz,
                                 algorithm=2, interpret=True)

    got = sharded(xs, ys, zs, dx, dy, dz)
    ref = march_chief_dense(vol, xs, ys, zs, dx, dy, dz,
                            use_pallas_sampler=False)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_fused_substep_gradient_fallback_matches():
    """Algorithm 3 (RK4 x 2 substeps) has no fused transpose; its
    backward recomputes through the per-stage path — check it."""
    vol = _vol(n=8)
    chiefs = _chiefs(9)

    def loss(marcher):
        def fn(field):
            out = marcher(field)
            return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)
        return fn

    g_fused = jax.grad(loss(lambda f: march_chief_fused(
        vol, *chiefs, algorithm=3, field=f, interpret=True)))(vol.field)
    g_ref = jax.grad(loss(lambda f: march_chief_dense(
        vol, *chiefs, algorithm=3, field=f,
        use_pallas_sampler=False)))(vol.field)
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=5e-4)


def test_fused_march_block_chunking(monkeypatch):
    """Marches wider than the fused backward's block budget split into
    chunks; values and field gradients must be unaffected."""
    import photon_tpu.ops.march_dense_fused as mdf

    vol = _vol(n=8)
    chiefs = _chiefs(2100)          # > 2 blocks of 1024

    ref = march_chief_fused(vol, *chiefs, algorithm=2, interpret=True)
    monkeypatch.setattr(mdf, "_BWD_MAX_RAYS", 1024)
    got = march_chief_fused(vol, *chiefs, algorithm=2, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6)

    def loss(field):
        out = march_chief_fused(vol, *chiefs, algorithm=2, field=field,
                                interpret=True)
        return jnp.sum(out[0] ** 2)

    g_chunked = np.asarray(jax.grad(loss)(vol.field))
    monkeypatch.undo()
    g_ref = np.asarray(jax.grad(loss)(vol.field))
    denom = np.abs(g_ref).max()
    assert denom > 0
    np.testing.assert_allclose(g_chunked / denom, g_ref / denom, atol=1e-5)


def test_fused_large_slab_gradient_falls_back():
    """Slabs above the fused-backward VMEM cap (64x64) route gradients
    through the per-stage recompute; forward stays fused."""
    rng = np.random.default_rng(5)
    n, d = 66, 6
    lo, hi, z0, z1 = -6e4, 6e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, n)
    rho = 1.2 + 0.8 * rng.random((n, n, d))
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], (z1 - z0) / (d - 1)], [lo, lo, z0])
    chiefs = _chiefs(9)

    def loss(marcher):
        def fn(field):
            out = marcher(field)
            return jnp.sum(out[0] ** 2 + out[3] ** 2 * 1e6)
        return fn

    g_fused = jax.grad(loss(lambda f: march_chief_fused(
        vol, *chiefs, algorithm=2, field=f, interpret=True)))(vol.field)
    g_ref = jax.grad(loss(lambda f: march_chief_dense(
        vol, *chiefs, algorithm=2, field=f,
        use_pallas_sampler=False)))(vol.field)
    gf, gr = np.asarray(g_fused), np.asarray(g_ref)
    denom = np.abs(gr).max()
    assert denom > 0
    np.testing.assert_allclose(gf / denom, gr / denom, atol=5e-4)


def test_fused_bwd_beyond_128sq_slab(monkeypatch):
    """Round-5: the fused backward covers every slab the fused forward
    covers (the 256^2 tier was TPU-validated and the cap raised).  CI
    checks a >128^2 slab in interpret mode against the XLA per-stage
    autodiff with its production memory guard lifted."""
    import photon_tpu.ops.march_dense as md
    import photon_tpu.ops.march_dense_fused as mdf

    assert mdf._BWD_FUSED_MAX_SLAB >= 256 * 256
    monkeypatch.setattr(md, "DENSE_MAX_SLAB", 1 << 30)
    rng = np.random.default_rng(7)
    n, d = 160, 6
    lo, hi, z0, z1 = -6e4, 6e4, 4.0e5, 9.0e5
    x = np.linspace(lo, hi, n)
    rho = 1.225 + 0.08 * rng.random((n, n, d))
    from photon_tpu.volume import build_density_volume
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], (z1 - z0) / (d - 1)], [lo, lo, z0])
    assert n * n > 128 * 128

    p = 1024
    xs = rng.uniform(-5.5e4, 5.5e4, p)
    ys = rng.uniform(-5.5e4, 5.5e4, p)
    zs = np.full(p, 1.0e6)
    tx = rng.uniform(-0.02, 0.02, p)
    ty = rng.uniform(-0.02, 0.02, p)
    inv = 1.0 / np.sqrt(tx * tx + ty * ty + 1.0)
    ch = tuple(jnp.asarray(np.asarray(a, np.float32)) for a in
               (xs, ys, zs, tx * inv, ty * inv, -inv))

    def loss(marcher):
        def fn(field):
            o = marcher(field)
            return jnp.sum(o[0] ** 2 + o[3] ** 2 * 1e6)
        return fn

    gf = np.asarray(jax.grad(loss(
        lambda f: march_chief_fused(vol, *ch, algorithm=2, field=f,
                                    interpret=True)))(vol.field)).ravel()
    gd = np.asarray(jax.grad(loss(
        lambda f: march_chief_dense(vol, *ch, algorithm=2, field=f,
                                    use_pallas_sampler=False)))(
                        vol.field)).ravel()
    cos = gf @ gd / (np.linalg.norm(gf) * np.linalg.norm(gd))
    assert cos > 0.9999, cos
