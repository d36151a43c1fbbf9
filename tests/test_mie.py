"""Tests for the Mie scattering layer against physical invariants and
reference-derived golden values."""
import numpy as np
import pytest

from photon_tpu.config import default_config
from photon_tpu.ops.mie import (bhmie, create_mie_scattering_data,
                                log_normal_cdf, log_normal_pdf,
                                log_normal_pdf_extrema,
                                particle_diameter_distribution)


def test_bhmie_small_sphere_rayleigh_limit():
    """x << 1: Qsca approaches the Rayleigh formula
    Qsca = 8/3 x^4 |(m^2-1)/(m^2+2)|^2."""
    m = 1.5
    x = 0.01
    s1, s2, qext, qsca, qback, gsca = bhmie(x, m, 16)
    rayleigh = 8.0 / 3.0 * x ** 4 * abs((m ** 2 - 1) / (m ** 2 + 2)) ** 2
    assert qsca == pytest.approx(rayleigh, rel=1e-3)
    # non-absorbing sphere: Qext == Qsca
    assert qext == pytest.approx(qsca, rel=1e-3)


def test_bhmie_large_sphere_extinction_paradox():
    """x >> 1: Qext -> 2 (extinction paradox)."""
    *_, qext, qsca, _, _ = bhmie(150.0, 1.33, 64)
    assert 1.9 < qext < 2.3
    assert qext == pytest.approx(qsca, rel=1e-6)  # non-absorbing


def test_bhmie_forward_peak():
    """Large particles scatter predominantly forward."""
    s1, s2, *_ = bhmie(50.0, 1.2, 32)
    s11 = 0.5 * (np.abs(s1) ** 2 + np.abs(s2) ** 2)
    assert s11[0] == np.max(s11)
    assert s11[0] > 100 * s11[len(s11) // 2]


def test_log_normal_distribution_properties():
    mu, sigma = np.log(27.0), 0.2
    x = np.linspace(5, 100, 2000)
    pdf = log_normal_pdf(x, mu, sigma)
    # integrates to ~1
    assert np.trapezoid(pdf, x) == pytest.approx(1.0, abs=1e-3)
    assert log_normal_cdf(1e9, mu, sigma) == pytest.approx(1.0)
    xmin, xmax = log_normal_pdf_extrema(mu, sigma, 0.01)
    tail = 1.0 - (log_normal_cdf(xmax, mu, sigma)
                  - log_normal_cdf(xmin, mu, sigma))
    assert tail == pytest.approx(0.01, rel=1e-6)
    # equal pdf at both extrema (defining property)
    assert log_normal_pdf(xmin, mu, sigma) == pytest.approx(
        log_normal_pdf(xmax, mu, sigma), rel=1e-6)


def test_particle_diameter_distribution():
    cfg = default_config("piv")
    d, pdf = particle_diameter_distribution(cfg)
    assert d.size == cfg.particle_field.particle_diameter_number
    assert pdf.sum() == pytest.approx(1.0)
    assert d.min() > 0
    # mode near the configured mean diameter
    assert abs(d[np.argmax(pdf)] - 27.0) < 5.0


def test_create_mie_scattering_data_shapes():
    cfg = default_config("piv")
    cfg.particle_field.particle_number = 1000
    cfg.particle_field.mie_scattering_angle_number = 32
    data = create_mie_scattering_data(cfg, np.random.default_rng(0))
    n_ang = 2 * 32 - 1
    n_d = cfg.particle_field.particle_diameter_number
    assert data["scattering_irradiance"].shape == (n_ang, n_d)
    assert data["scattering_angle"].shape == (n_ang,)
    assert data["scattering_angle"][0] == 0.0
    assert data["scattering_angle"][-1] == pytest.approx(np.pi)
    idx = data["particle_diameter_index_distribution"]
    assert idx.shape == (1000,)
    assert idx.min() >= 0 and idx.max() < n_d
    assert np.all(data["scattering_irradiance"] > 0)
    np.testing.assert_allclose(
        np.linalg.norm(data["beam_propogation_vector"]), 1.0)
