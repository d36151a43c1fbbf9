"""Reference sample-scene parity harness (the correctness gate).

Renders the reference's own BOS sample scene — the committed
`sample-images/parameters.mat` (512^2 sensor, thin-lens f/11 at 1 m,
85x85 regular dot grid, y_camera_angle = 5*pi/6, Euler march through
`sample-data/bos/sample-density.nrrd`) — end to end and checks it
against the only reference-produced artifacts in the repo:

* `positions.mat` — the dot-grid coordinates the reference saved next to
  its rendered images (run_simulation_02.py:2101-2106): matched
  bit-exactly.
* the paraxial BOS oracle eps = (1/n0) * integral of grad(n) ds — the
  reference's own acceptance criterion for rendered displacements
  (createNRRD.py:108-116, light_ray_processing.py:532-638): the per-dot
  displacement field extracted from our rendered rays must match the
  oracle integral through the actual sample density volume.

The reference repo commits no rendered images (sample-images/ holds only
parameters.mat + positions.mat), so these two checks are the strongest
"allclose vs reference" available in this environment; the glibc
srand(10) lens-sample stream is reproduced exactly via
utils.rng.GlibcRand (reference_lens_rng=True).
"""
import dataclasses
import os

import numpy as np
import pytest

import jax.numpy as jnp

from photon_tpu.config import SimulationConfig
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.scenes import bos_source

REF = "/root/reference/sample-data/bos"
PARAMS_MAT = os.path.join(REF, "sample-images", "parameters.mat")
POSITIONS_MAT = os.path.join(REF, "sample-images", "positions.mat")
DENSITY_NRRD = os.path.join(REF, "sample-density.nrrd")
SAMPLE_PARAMS_MAT = os.path.join(REF, "parameters", "sample-parameters.mat")

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference sample-data not present")


def _load_cfg() -> SimulationConfig:
    cfg = SimulationConfig.from_mat(PARAMS_MAT)
    # the .mat carries a dead absolute path from the original author's
    # cluster; point it at the committed sample volume
    cfg.density_gradients.density_gradient_filename = DENSITY_NRRD
    cfg.reference_lens_rng = True
    return cfg


def _subsample(src, step: int):
    sub = slice(0, None, step)
    return dataclasses.replace(
        src, x=src.x[sub], y=src.y[sub], z=src.z[sub],
        radiance=src.radiance[sub], diameter_index=src.diameter_index[sub])


@needs_ref
def test_from_mat_loads_reference_parameter_files():
    cfg = _load_cfg()
    assert cfg.simulation_type == "bos"
    assert cfg.camera_design.pixel_pitch == 10.0
    assert cfg.camera_design.x_pixel_number == 512
    assert cfg.camera_design.y_camera_angle == pytest.approx(5 * np.pi / 6)
    assert cfg.lens_design.lens_model == "thin-lens"
    assert cfg.lens_design.aperture_f_number == 11.0
    assert cfg.bos_pattern.dot_distribution == "regular"
    assert cfg.density_gradients.ray_tracing_algorithm == 1

    cfg2 = SimulationConfig.from_mat(SAMPLE_PARAMS_MAT)
    assert cfg2.lens_design.lens_model == "general"
    assert cfg2.bos_pattern.grid_point_number == 1000
    assert cfg2.bos_pattern.lightray_number_per_particle == 500
    assert cfg2.density_gradients.ray_tracing_algorithm == 2


@needs_ref
def test_dot_positions_match_positions_mat_exactly():
    """Scene generation reproduces the reference's saved dot grid
    bit-for-bit (regular distribution: int-truncated grid count,
    endpoint-free linspace, xy-meshgrid C-flatten —
    run_simulation_02.py:1437-1454)."""
    import scipy.io as sio

    cfg = _load_cfg()
    setup = camera_setup(cfg)
    _, dot_x, dot_y = bos_source(cfg, setup, np.random.default_rng(0))
    ref = sio.loadmat(POSITIONS_MAT)
    assert dot_x.size == ref["x"].size == 7225
    np.testing.assert_array_equal(dot_x, ref["x"].ravel())
    np.testing.assert_array_equal(dot_y, ref["y"].ravel())


@needs_ref
def test_sample_scene_routed_to_exact_path():
    """The 150-degree camera sends world-frame rays upward through the
    volume — outside the fast z-scan march's contract — so the gate must
    route this scene to the direction-agnostic exact path."""
    from photon_tpu.pipeline import can_use_fast_renderer
    from photon_tpu.volume import load_density_volume

    cfg = _load_cfg()
    setup = camera_setup(cfg)
    vol = load_density_volume(DENSITY_NRRD)
    assert not can_use_fast_renderer(cfg, setup, vol=vol)
    # without the volume (im1) the lens/sensor fast path is fine
    assert can_use_fast_renderer(cfg, setup)


# the per-dot displacement oracle lives in the package (promoted from
# this test in round 4 so it is unit-tested against the closed-form
# paraxial formulas rather than existing only here)
from photon_tpu.analysis.fields import paraxial_displacement_oracle \
    as _oracle_displacement_px  # noqa: E402


@needs_ref
def test_sample_scene_displacement_matches_paraxial_oracle():
    """Per-dot BOS displacements rendered through the full pipeline
    (ray gen -> Euler march through the sample NRRD -> thin lens ->
    sensor) match the oracle integral dot by dot.

    CI subsamples 289 of 7,225 dots and 16 of 500 rays; set
    PHOTON_SLOW=1 to run the FULL grid (all 7,225 dots, 500 rays) —
    ~tens of minutes on the 2-core CPU host."""
    from photon_tpu.analysis.light_rays import process_lightray_data
    from photon_tpu.models.render import render_rays
    from photon_tpu.ops.march import make_march_fn
    from photon_tpu.pipeline import _lens_sample_pair
    from photon_tpu.volume import load_density_volume

    slow = os.environ.get("PHOTON_SLOW", "0") == "1"
    cfg = _load_cfg()
    setup = camera_setup(cfg)
    vol = load_density_volume(DENSITY_NRRD)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(0))
    if not slow:
        src = _subsample(src, 25)             # 289 of 7225 dots for CI
    R = src.lightray_number_per_particle
    r1, r2 = _lens_sample_pair(cfg, R)

    march_fn = make_march_fn(
        vol, algorithm=int(cfg.density_gradients.ray_tracing_algorithm),
        interpolation_scheme=int(cfg.density_gradients.interpolation_scheme))
    rays1 = render_rays(cfg, setup, src, r1, r2, march_fn=None)
    rays2 = render_rays(cfg, setup, src, r1, r2, march_fn=march_fn)
    disp = process_lightray_data(
        np.asarray(rays1.pos), np.asarray(rays2.pos), R,
        cfg.camera_design.pixel_pitch, cfg.camera_design.x_pixel_number,
        cfg.camera_design.y_pixel_number)["displacement"]

    pred, hit = _oracle_displacement_px(cfg, setup, vol, src)
    ok = hit & np.isfinite(disp).all(1)
    assert ok.sum() > 200
    for axis in range(2):
        a, b = disp[ok, axis], pred[ok, axis]
        slope = (a * b).sum() / (b * b).sum()
        corr = np.corrcoef(a, b)[0, 1]
        rms = np.sqrt(np.mean((a - b) ** 2))
        assert abs(slope - 1.0) < 0.03, (axis, slope)
        assert corr > 0.995, (axis, corr)
        assert rms < 0.02 * np.abs(a).max() + 0.005, (axis, rms)


@needs_ref
def test_sample_scene_renders_image_pair():
    """run_bos on the sample config produces the im1/im2 pair: dots land
    where the magnification map puts them, and the density gradients
    displace im2 measurably."""
    from photon_tpu.pipeline import run_bos

    cfg = _load_cfg()
    # subsample the grid via the dot count for CI cost: every 4th grid
    # column/row by shrinking spacing is not faithful, so render the full
    # 85x85 grid but with fewer rays per dot
    cfg.bos_pattern.lightray_number_per_particle = 16
    res = run_bos(cfg)
    im1 = res.raw_images["bos_pattern_image_1"]
    im2 = res.raw_images["bos_pattern_image_2"]
    assert float(np.sum(im1)) > 0
    assert float(np.sum(im2)) > 0

    # the gradients must move energy: normalized L1 difference is well
    # above float noise but the images stay globally similar
    l1 = np.abs(im1 - im2).sum() / im1.sum()
    assert 0.05 < l1 < 1.5, l1

    # im1 dot centroids: predicted pixel position of the central dot
    # (x mirrored, magnification-scaled)
    nx = cfg.camera_design.x_pixel_number
    ny = cfg.camera_design.y_pixel_number
    pitch = cfg.camera_design.pixel_pitch
    setup = res.setup
    dot_x = res.dot_positions["x"]
    dot_y = res.dot_positions["y"]
    # pick the dot nearest the field center
    i = np.argmin(dot_x ** 2 + dot_y ** 2)
    M = setup.magnification
    px = (nx - 1) - ((-dot_x[i] * M) - (-pitch * (nx - 1) / 2)) / pitch
    py = ((-dot_y[i] * M) - (-pitch * (ny - 1) / 2)) / pitch
    # centroid of a window around the predicted position
    r0, c0 = int(round(py)), int(round(px))
    win = im1[max(r0 - 4, 0):r0 + 5, max(c0 - 4, 0):c0 + 5]
    assert win.sum() > 0.05 * im1.sum() / dot_x.size, \
        "central dot not found at its predicted pixel"


def _load_general_cfg():
    """The reference's primary published BOS sample: 1,000 dots x 500
    rays, lens_model='general', RK4 through sample-density.nrrd
    (parameters/sample-parameters.mat; ref run_simulation_02.py:
    2030-2092).

    Frame note: the committed sample-density.nrrd (z origin 733634.3)
    only intersects the optical path under the volume-shift variant the
    reference carries COMMENTED OUT in its loader
    (trace_rays_through_density_gradients.h:1704 `- 750e3; // +
    z_offset;` vs the ray shift z_offset + 750e3 at
    parallel_ray_tracing.cu:2045).  With the shipped 750e3-only shift
    the volume sits above the dot plane and no ray crosses it — so
    these tests opt into the commented variant via the
    ``nrrd_z_origin_shift`` config knob to make the physics check
    non-vacuous.
    """
    cfg = SimulationConfig.from_mat(SAMPLE_PARAMS_MAT)
    cfg.density_gradients.density_gradient_filename = DENSITY_NRRD
    cfg.density_gradients.simulate_density_gradients = True
    setup = camera_setup(cfg)
    cfg.density_gradients.nrrd_z_origin_shift = 750e3 + setup.z_offset
    return cfg, setup


@needs_ref
def test_general_lens_sample_routes_to_fast_path():
    """The flagship general-lens config (no camera rotation, no
    dispersion/absorbance, 64^3 volume) must take the fast SoA pipeline
    with the dense fused march."""
    from photon_tpu.pipeline import can_use_fast_renderer
    from photon_tpu.volume import load_density_volume

    cfg, setup = _load_general_cfg()
    vol = load_density_volume(
        DENSITY_NRRD, z_origin_shift=cfg.density_gradients.nrrd_z_origin_shift)
    assert setup.lens_model == "general"
    assert cfg.density_gradients.ray_tracing_algorithm == 2
    assert can_use_fast_renderer(cfg, setup, vol=vol)
    from photon_tpu.ops.march_dense import dense_march_supported
    assert dense_march_supported(vol)


@needs_ref
def test_general_lens_sample_end_to_end_displacements():
    """run_bos on the general-lens sample config (thick lens + RK4 +
    sample-density.nrrd, fast path with the fused dense march): per-dot
    image displacements measured by windowed centroids on the rendered
    im1/im2 pair match the paraxial oracle through the actual volume.

    CI keeps the full published 1,000-dot pattern but shrinks the
    per-dot fan (4 sub-particles x 32 rays); PHOTON_SLOW=1 runs the
    published 100 x 500 fan.
    """
    from scipy.spatial import cKDTree

    from photon_tpu.pipeline import run_bos
    from photon_tpu.volume import load_density_volume

    slow = os.environ.get("PHOTON_SLOW", "0") == "1"
    cfg, setup = _load_general_cfg()
    if not slow:
        cfg.bos_pattern.particle_number_per_grid_point = 4
        cfg.bos_pattern.lightray_number_per_particle = 32

    res = run_bos(cfg)
    im1 = np.asarray(res.raw_images["bos_pattern_image_1"], np.float64)
    im2 = np.asarray(res.raw_images["bos_pattern_image_2"], np.float64)
    assert im1.sum() > 0 and np.isfinite(im1).all() and np.isfinite(im2).all()
    # gradients must move energy (volume in-path)
    assert np.abs(im1 - im2).sum() > 0.01 * im1.sum()

    vol = load_density_volume(
        DENSITY_NRRD, z_origin_shift=cfg.density_gradients.nrrd_z_origin_shift)
    dot_x = res.dot_positions["x"]
    dot_y = res.dot_positions["y"]
    nx = cfg.camera_design.x_pixel_number
    ny = cfg.camera_design.y_pixel_number
    pitch = cfg.camera_design.pixel_pitch
    M = setup.magnification
    px = (nx - 1) - ((-dot_x * M) - (-pitch * (nx - 1) / 2)) / pitch
    py = ((-dot_y * M) - (-pitch * (ny - 1) / 2)) / pitch

    # windowed centroid displacement per dot; skip windows polluted by a
    # neighboring dot and dots clipped by the frame
    W = 10
    crowded = set()
    for a, b in cKDTree(np.stack([px, py], -1)).query_pairs(2.5 * W):
        crowded.add(a)
        crowded.add(b)
    rr, cc = np.mgrid[-W:W + 1, -W:W + 1]
    disp, keep = [], []
    for i in range(len(dot_x)):
        r0, c0 = int(round(py[i])), int(round(px[i]))
        if i in crowded or r0 < W or c0 < W or r0 >= ny - W or c0 >= nx - W:
            continue
        w1 = im1[r0 - W:r0 + W + 1, c0 - W:c0 + W + 1]
        w2 = im2[r0 - W:r0 + W + 1, c0 - W:c0 + W + 1]
        if w1.sum() <= 0 or w2.sum() <= 0:
            continue
        c1 = np.array([(w1 * cc).sum(), (w1 * rr).sum()]) / w1.sum()
        c2 = np.array([(w2 * cc).sum(), (w2 * rr).sum()]) / w2.sum()
        disp.append(c2 - c1)
        keep.append(i)
    disp = np.array(disp)
    keep = np.array(keep)

    # oracle through the actual volume at the dot centers
    import dataclasses
    src = res.sources["bos"]
    pseudo = dataclasses.replace(
        src, x=dot_x.astype(np.float64), y=dot_y.astype(np.float64),
        z=np.full(dot_x.shape, float(np.asarray(src.z).ravel()[0])),
        radiance=np.ones(dot_x.shape),
        diameter_index=np.zeros(dot_x.shape, np.int32))
    pred, hit = _oracle_displacement_px(cfg, setup, vol, pseudo)
    pred, hit = pred[keep], hit[keep]
    ok = hit & np.isfinite(disp).all(1)
    assert ok.sum() >= 20, ok.sum()
    for axis in range(2):
        a, b = disp[ok, axis], pred[ok, axis]
        assert np.abs(b).max() > 0.05       # the scene deflects visibly
        slope = (a * b).sum() / (b * b).sum()
        corr = np.corrcoef(a, b)[0, 1]
        rms = np.sqrt(np.mean((a - b) ** 2))
        assert abs(slope - 1.0) < 0.12, (axis, slope)
        assert corr > 0.93, (axis, corr)
        assert rms < 0.2 * np.abs(b).max() + 0.01, (axis, rms)


@needs_ref
def test_piv_sample_config_renders():
    """The PIV sample config (5e4 Mie particles x 1e4 rays,
    create_sample_simulation_parameters.py:70-71) loads via from_mat and
    renders through the full pipeline at a CI-scale particle/ray count
    (the full-scale throughput is bench.py's piv_mie metric)."""
    from photon_tpu.pipeline import run_piv

    cfg = SimulationConfig.from_mat(
        os.path.join("/root/reference/sample-data/piv/parameters",
                     "sample-parameters.mat"))
    assert cfg.simulation_type == "piv"
    pf = cfg.particle_field
    assert (pf.particle_number, pf.lightray_number_per_particle) \
        == (50_000, 10_000)
    assert pf.perform_mie_scattering
    assert pf.mie_scattering_angle_number == 128
    assert pf.particle_diameter_number == 27

    # CI scale: keep the Mie table and sensor exact, shrink the ray
    # budget (the sample's Gaussian sheet spans ~4% of the particle Z
    # extent, so enough particles are needed for lit ones to exist)
    cfg.particle_field.particle_number = 500
    cfg.particle_field.lightray_number_per_particle = 16
    cfg.particle_field.frame_vector = (1,)
    res = run_piv(cfg)
    img = res.raw_images["particle_image_frame_0001"]
    assert np.isfinite(img).all()
    assert float(img.sum()) > 0
