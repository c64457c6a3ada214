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


def test_chebyshev_surface_fit():
    """The general-purpose Chebyshev surface fit (ops/interp) reproduces
    a smooth analytic surface to high accuracy, gather-free."""
    import jax.numpy as jnp
    import numpy as np

    from maria_tpu.ops.interp import eval_chebyshev_2d, fit_chebyshev_2d

    x = np.geomspace(0.1, 50.0, 40)
    y = np.linspace(0.1, 1.5, 30)
    X, Y = np.meshgrid(x, y, indexing="ij")
    table = np.exp(-0.2 * np.log(X) ** 2) * (1 + 0.5 * np.sin(2 * Y))

    fit = fit_chebyshev_2d(x, y, table, deg_x=10, deg_y=8)
    assert fit["log_x"] and fit["max_rel_err"] < 1e-4

    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.exp(rng.uniform(np.log(0.12), np.log(45), 500)))
    ys = jnp.asarray(rng.uniform(0.12, 1.45, 500))
    got = np.asarray(eval_chebyshev_2d(fit, xs, ys))
    want = np.exp(-0.2 * np.log(np.asarray(xs)) ** 2) * (1 + 0.5 * np.sin(2 * np.asarray(ys)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-3


def test_make_table_eval_is_exact_bilinear():
    import jax.numpy as jnp
    import numpy as np

    from maria_tpu.ops.interp import RegularGridInterpolator, make_table_eval

    rng = np.random.default_rng(1)
    x = np.geomspace(0.05, 100.0, 24)
    y = np.linspace(0.1, 1.57, 14)
    table = rng.uniform(1.0, 5.0, (24, 14))
    fn = make_table_eval(x, y, table)
    rgi = RegularGridInterpolator((x, y), table)
    xs = jnp.asarray(np.exp(rng.uniform(np.log(0.03), np.log(150), 3000)))  # incl. out-of-domain
    ys = jnp.asarray(rng.uniform(0.0, 1.8, 3000))
    a = np.asarray(fn(xs, ys))
    b = np.asarray(rgi((xs, ys)))
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=3e-6 * np.abs(b).max())
