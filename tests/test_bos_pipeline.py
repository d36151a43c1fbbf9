"""End-to-end BOS acceptance test: the rendered dot displacement between the
reference image (no gradients) and the distorted image (with gradients)
must match the paraxial oracle epsilon = K grad(rho) dz / n0, displacement
= M Z_D epsilon / pixel_pitch — the reference's de-facto acceptance test
(SURVEY.md §3.5, light_ray_processing.process_lightray_data)."""
import numpy as np
import pytest

import jax

from photon_tpu.analysis.light_rays import process_lightray_data
from photon_tpu.config import default_config
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render import render_rays
from photon_tpu.models.scenes import bos_source
from photon_tpu.ops.march import make_march_fn
from photon_tpu.utils.rng import lens_samples
from photon_tpu.volume import build_density_volume


def bos_case(lens_model="apparent", n_dots=6, rays=64):
    cfg = default_config("bos")
    cfg.lens_design.lens_model = lens_model
    cfg.camera_design.x_pixel_number = 256
    cfg.camera_design.y_pixel_number = 256
    cfg.bos_pattern.grid_point_number = n_dots
    cfg.bos_pattern.particle_number_per_grid_point = 8
    cfg.bos_pattern.lightray_number_per_particle = rays
    # keep dots inside the reduced field of view
    m = cfg.lens_design.focal_length / (
        cfg.lens_design.object_distance - cfg.lens_design.focal_length)
    half = 0.7 * 256 * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.bos_pattern.X_Min, cfg.bos_pattern.X_Max = -half, half
    cfg.bos_pattern.Y_Min, cfg.bos_pattern.Y_Max = -half, half
    return cfg


def gradient_volume_between(setup, grad_rho=4.0, n=32,
                            frac_near=0.1, frac_far=0.6):
    """Uniform-d(rho)/dx volume between the dot plane and the lens.

    Frames: rays enter the marcher at z_m = sensor_z - z_offset - 750e3
    (ref: parallel_ray_tracing.cu:2045), and the volume is placed at
    z_m = nrrd_z - 750e3 (ref: trace_rays...h:1704).  So NRRD z
    coordinates correspond to sensor-frame z minus z_offset; the dot
    plane sits at nrrd_z = object_distance.
    """
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n)
    z_dots = setup.object_distance             # dot plane, NRRD frame
    z_hi = z_dots - frac_near * setup.object_distance
    z_lo = z_dots - frac_far * setup.object_distance
    z = np.linspace(z_lo, z_hi, n)
    rho0 = 1.225
    X = x[:, None, None] * np.ones((1, n, n))
    rho = rho0 + grad_rho * (X - x.min()) / (x.max() - x.min())
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [x[0], x[0], z[0]])
    K = 0.225e-3
    n0 = 1.0 + K * (rho0 + grad_rho / 2)
    dn_dx = K * grad_rho / extent          # per micron
    depth = z_hi - z_lo
    eps = dn_dx * depth / n0               # radians
    z_mid = (z_hi + z_lo) / 2.0
    Z_D = z_dots - z_mid                   # dot plane -> volume center
    return vol, eps, Z_D


def test_paraxial_displacement_oracle_matches_closed_form():
    """The per-dot oracle (analysis.fields.paraxial_displacement_oracle,
    the generalization used by the sample-scene parity tests) reduces to
    theoretical_deflection's closed form on a uniform-gradient volume
    with an unrotated camera."""
    import dataclasses

    from photon_tpu.analysis.fields import (paraxial_displacement_oracle,
                                            theoretical_deflection)

    cfg = bos_case("apparent")
    setup = camera_setup(cfg)
    vol, eps, Z_D = gradient_volume_between(setup)
    source, dot_x, dot_y = bos_source(cfg, setup,
                                      np.random.default_rng(11))
    # one pseudo source point per dot, on-axis z
    pseudo = dataclasses.replace(
        source, x=dot_x.astype(np.float64), y=dot_y.astype(np.float64),
        z=np.full(dot_x.shape, float(np.asarray(source.z).ravel()[0])),
        radiance=np.ones(dot_x.shape),
        diameter_index=np.zeros(dot_x.shape, np.int32))
    pred, hit = paraxial_displacement_oracle(cfg, setup, vol, pseudo)
    assert hit.all()
    # closed form: same eps for every dot (uniform gradient), mapped
    # through M * Z_D / pitch with the sensor-x mirror
    _, disp_expected = theoretical_deflection(
        rho_grad=4.0 / 4e5, magnification=setup.magnification, Z_D=Z_D,
        del_z=0.5 * setup.object_distance, rho_0=1.225 + 2.0,
        pixel_pitch=cfg.camera_design.pixel_pitch)
    got = pred[:, 0]
    assert np.sign(np.mean(got)) == -np.sign(disp_expected) or \
        np.sign(disp_expected) == 0
    np.testing.assert_allclose(np.abs(got), abs(disp_expected), rtol=0.08)
    # y displacement ~ 0 (gradient is along x)
    assert np.abs(pred[:, 1]).max() < 0.05 * abs(disp_expected) + 1e-3


@pytest.mark.parametrize("lens_model", ["apparent", "general"])
def test_bos_displacement_matches_oracle(lens_model):
    cfg = bos_case(lens_model)
    setup = camera_setup(cfg)
    rng = np.random.default_rng(11)
    source, dot_x, dot_y = bos_source(cfg, setup, rng)
    r1, r2 = lens_samples(jax.random.key(5), 64)

    vol, eps, Z_D = gradient_volume_between(setup)
    march_fn = make_march_fn(vol, algorithm=2)

    rays1 = render_rays(cfg, setup, source, r1, r2, march_fn=None)
    rays2 = render_rays(cfg, setup, source, r1, r2, march_fn=march_fn)

    res = process_lightray_data(
        np.asarray(rays1.pos), np.asarray(rays2.pos),
        rays_per_dot=64 * source.num_particles // dot_x.size,
        pixel_pitch=cfg.camera_design.pixel_pitch,
        nx=256, ny=256)
    disp = res["displacement"]

    # oracle: pixels of apparent shift on the sensor.  A ray deflected by
    # +eps in x arrives at the dot plane displaced by -eps*Z_D (tracing
    # backward), image inverts (-M) and the sensor x is mirrored, so the
    # magnitude is M*Z_D*eps/pitch; verify magnitude and that all dots
    # move coherently.
    expected_px = setup.magnification * Z_D * eps \
        / cfg.camera_design.pixel_pitch
    dx = disp[np.isfinite(disp[:, 0]), 0]
    assert len(dx) >= 4
    assert np.std(dx) < 0.15 * abs(expected_px) + 0.02
    assert np.mean(np.abs(dx)) == pytest.approx(abs(expected_px), rel=0.15)
    # y barely moves
    dy = disp[np.isfinite(disp[:, 1]), 1]
    assert np.abs(dy).max() < 0.2 * abs(expected_px) + 0.02


def test_bos_image_pair_pipeline_runs(tmp_path):
    """Smoke: the full run_bos + save_result path with a density volume."""
    from photon_tpu.analysis.fields import save_density_nrrd
    from photon_tpu.pipeline import run_bos, save_result

    cfg = bos_case("apparent", n_dots=4, rays=16)
    setup = camera_setup(cfg)
    vol_path = str(tmp_path / "rho.nrrd")
    n = 16
    x = np.linspace(-2e5, 2e5, n)
    z_dots = setup.object_distance            # dot plane in the NRRD frame
    z = np.linspace(z_dots - 4e5, z_dots - 1e5, n)
    rho = 1.225 + 3.0 * (x[:, None, None] - x.min()) / (x.max() - x.min()) \
        * np.ones((1, n, n))
    save_density_nrrd(vol_path, rho, x, x, z)
    cfg.density_gradients.density_gradient_filename = vol_path
    cfg.density_gradients.simulate_density_gradients = True

    result = run_bos(cfg)
    assert set(result.images) == {"bos_pattern_image_1",
                                  "bos_pattern_image_2"}
    im1 = result.raw_images["bos_pattern_image_1"]
    im2 = result.raw_images["bos_pattern_image_2"]
    assert im1.sum() > 0 and im2.sum() > 0
    # gradients shift the pattern: the images must differ
    assert np.abs(im1 - im2).sum() > 1e-3 * im1.sum()

    written = save_result(cfg, result, str(tmp_path / "out"))
    import os
    assert all(os.path.exists(p) for p in written)
    from photon_tpu.utils.tiff_io import read_tiff16
    img = read_tiff16(str(tmp_path / "out" / "tif" / "bos_pattern_image_1.tif"))
    assert img.shape == (256, 256)
    assert img.max() > 0

    # .mat sidecars in reference layout: parameters.mat round-trips
    # through the reference-format loader; positions.mat holds the dot
    # grid as column vectors (ref: run_simulation_02.py:1874-1879,
    # 2094-2106; consumed by light_ray_processing.py:539-551)
    import scipy.io as sio

    from photon_tpu.config import SimulationConfig
    cfg2 = SimulationConfig.from_mat(str(tmp_path / "out" / "parameters.mat"))
    assert cfg2.simulation_type == "bos"
    assert cfg2.bos_pattern.grid_point_number == cfg.bos_pattern.grid_point_number
    assert cfg2.camera_design.x_pixel_number == cfg.camera_design.x_pixel_number
    pos = sio.loadmat(str(tmp_path / "out" / "positions.mat"))
    assert pos["x"].shape == (len(result.dot_positions["x"]), 1)
    np.testing.assert_allclose(pos["x"][:, 0], result.dot_positions["x"])


def test_bos_saved_lightrays_deflection_pipeline(tmp_path):
    """Full C18 parity flow: save_lightrays bins -> load -> per-dot
    displacement matches the paraxial oracle (SURVEY.md §3.5)."""
    from photon_tpu.analysis.fields import save_density_nrrd
    from photon_tpu.analysis.light_rays import (load_ray_data,
                                                process_lightray_data)
    from photon_tpu.pipeline import run_bos

    cfg = bos_case("apparent", n_dots=5, rays=32)
    setup = camera_setup(cfg)
    vol, eps, Z_D = gradient_volume_between(setup, n=16)
    # write the volume so run_bos picks it up
    vol_path = str(tmp_path / "rho.nrrd")
    n = 16
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n)
    z_dots = setup.object_distance
    z = np.linspace(z_dots - 0.6 * setup.object_distance,
                    z_dots - 0.1 * setup.object_distance, n)
    rho = 1.225 + 4.0 * (x[:, None, None] - x.min()) / (x.max() - x.min()) \
        * np.ones((1, n, n))
    save_density_nrrd(vol_path, rho, x, x, z)
    cfg.density_gradients.density_gradient_filename = vol_path
    cfg.output_data.save_lightrays = True
    cfg.output_data.num_lightrays_save = 0   # 0 -> save all
    cfg.output_data.image_directory = str(tmp_path)

    result = run_bos(cfg)
    pos1 = load_ray_data(str(tmp_path / "light-ray-positions" / "im1"))
    pos2 = load_ray_data(str(tmp_path / "light-ray-positions" / "im2"))
    assert pos1.shape == pos2.shape and pos1.shape[0] > 0

    src = result.sources["bos"]
    rays_per_dot = src.num_rays // len(result.dot_positions["x"])
    res = process_lightray_data(
        pos1, pos2, rays_per_dot=rays_per_dot,
        pixel_pitch=cfg.camera_design.pixel_pitch, nx=256, ny=256)
    disp = res["displacement"][:, 0]
    expected_px = setup.magnification * Z_D * eps \
        / cfg.camera_design.pixel_pitch
    np.testing.assert_allclose(np.abs(disp[np.isfinite(disp)]),
                               expected_px, rtol=0.10)
