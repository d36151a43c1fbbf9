"""Fused (P, R) fan-statistics kernel (ops.fan_pallas) vs the XLA SoA
chain of models.render_fast — images and gradients must match for every
supported lens model."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from photon_tpu.config import default_config
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_source
from photon_tpu.utils.rng import lens_samples
from photon_tpu.volume import build_density_volume


def _scene(lens_model="general", sensor=128, n_dots=80, rays=24):
    cfg = default_config("bos")
    cfg.lens_design.lens_model = lens_model
    cfg.camera_design.x_pixel_number = sensor
    cfg.camera_design.y_pixel_number = sensor
    cfg.bos_pattern.grid_point_number = n_dots
    cfg.bos_pattern.particle_number_per_grid_point = 4
    cfg.bos_pattern.lightray_number_per_particle = rays
    m = cfg.lens_design.focal_length / (
        cfg.lens_design.object_distance - cfg.lens_design.focal_length)
    half = 0.7 * sensor * cfg.camera_design.pixel_pitch / 2.0 / m
    cfg.bos_pattern.X_Min, cfg.bos_pattern.X_Max = -half, half
    cfg.bos_pattern.Y_Min, cfg.bos_pattern.Y_Max = -half, half
    setup = camera_setup(cfg)
    src, *_ = bos_source(cfg, setup, np.random.default_rng(5))
    r1, r2 = lens_samples(jax.random.key(5), rays)
    n = 16
    x = np.linspace(-1.5e5, 1.5e5, n)
    z = np.linspace(setup.object_distance - 5e5,
                    setup.object_distance - 1e2, n)
    rho = 1.225 + 5.0 * (x[:, None, None] - x.min()) \
        / (x.max() - x.min()) * np.ones((1, n, n))
    vol = build_density_volume(
        rho, [x[1] - x[0], x[1] - x[0], z[1] - z[0]], [x[0], x[0], z[0]])
    return cfg, setup, src, np.asarray(r1), np.asarray(r2), vol


def _ab(monkeypatch, fn):
    """Run fn twice with the fan kernel on/off; return both results."""
    out = {}
    for fan in ("1", "0"):
        monkeypatch.setenv("PHOTON_FUSED_FAN", fan)
        jax.clear_caches()
        out[fan] = fn()
    return out["1"], out["0"]


@pytest.mark.parametrize("lens_model", ["general", "apparent", "thin-lens"])
def test_fan_kernel_matches_xla_chain(lens_model, monkeypatch):
    cfg, setup, src, r1, r2, vol = _scene(lens_model)
    on, off = _ab(monkeypatch, lambda: np.asarray(
        render_image_fast(cfg, setup, src, r1, r2, vol=vol)))
    assert off.sum() > 0
    rel = np.abs(on - off).max() / off.max()
    assert rel < 5e-4, rel


def test_fan_kernel_gradients_match(monkeypatch):
    cfg, setup, src, r1, r2, vol = _scene("general")

    def grad():
        g = jax.grad(lambda f: jnp.mean(render_image_fast(
            cfg, setup, src, r1, r2, vol=vol._replace(field=f)) ** 2)
        )(vol.field)
        return np.asarray(g).ravel()

    on, off = _ab(monkeypatch, grad)
    cos = on @ off / (np.linalg.norm(on) * np.linalg.norm(off))
    assert cos > 0.9999, cos


def test_fan_kernel_no_volume_and_chunked(monkeypatch):
    cfg, setup, src, r1, r2, _vol = _scene("general")
    on, off = _ab(monkeypatch, lambda: np.asarray(
        render_image_fast(cfg, setup, src, r1, r2,
                          particles_per_chunk=100)))
    assert off.sum() > 0
    rel = np.abs(on - off).max() / off.max()
    assert rel < 5e-4, rel


def test_fan_kernel_ineligible_configs_fall_back(monkeypatch):
    """Rotated cameras and per-ray-splat configs must keep the XLA
    chain (the kernel supports neither) — just check they still render
    with the kernel flag on."""
    monkeypatch.setenv("PHOTON_FUSED_FAN", "1")
    cfg, setup, src, r1, r2, vol = _scene("general", n_dots=20, rays=8)
    cfg.camera_design.x_camera_angle = 0.05
    cfg.camera_design.y_camera_angle = -0.03
    setup_rot = camera_setup(cfg)
    img = np.asarray(render_image_fast(cfg, setup_rot, src, r1, r2))
    assert np.isfinite(img).all()
    img2 = np.asarray(render_image_fast(cfg, setup, src, r1, r2,
                                        per_ray_splat=True))
    assert np.isfinite(img2).all() and img2.sum() > 0
