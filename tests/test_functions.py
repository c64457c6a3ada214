import numpy as np

from maria_tpu.constants import T_CMB, c, k_B
from maria_tpu.functions import (
    MaternInterpolator,
    approximate_normalized_matern,
    inverse_planck_spectrum,
    inverse_rayleigh_jeans_spectrum,
    matern_five_halves,
    normalized_matern,
    planck_spectrum,
    rayleigh_jeans_spectrum,
)


def test_radiometry_roundtrip():
    nu = np.geomspace(30e9, 1e12, 64)
    T = 10.0
    assert np.allclose(inverse_rayleigh_jeans_spectrum(rayleigh_jeans_spectrum(T, nu), nu), T)
    assert np.allclose(inverse_planck_spectrum(planck_spectrum(T_CMB, nu), nu), T_CMB, rtol=1e-10)


def test_rj_limit_of_planck():
    # at low frequency, the Planck spectrum approaches Rayleigh-Jeans
    nu = 1e9
    T = 100.0
    assert np.isclose(planck_spectrum(T, nu), rayleigh_jeans_spectrum(T, nu), rtol=1e-3)


def test_normalized_matern_limits():
    assert np.isclose(normalized_matern(1e-8, nu=5 / 6), 1.0, atol=1e-5)
    assert normalized_matern(100.0, nu=5 / 6) < 1e-10


def test_approximate_matern_accuracy():
    r = np.geomspace(1e-4, 50, 512)
    for nu in (1 / 3, 5 / 6):
        exact = normalized_matern(r, nu=nu)
        approx = approximate_normalized_matern(r, nu=nu, r0=1.0)
        assert np.max(np.abs(exact - approx)) < 2e-3


def test_matern_interpolator_matches_host():
    r = np.geomspace(1e-3, 30, 256)
    host = approximate_normalized_matern(r, nu=5 / 6, r0=300.0)
    dev = np.asarray(MaternInterpolator(nu=5 / 6, r0=300.0)(r))
    assert np.max(np.abs(host - dev)) < 1e-5


def test_matern_five_halves_at_zero():
    assert np.isclose(matern_five_halves(0.0), 1.0)
