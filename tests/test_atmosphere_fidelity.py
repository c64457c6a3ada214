"""FFT-screen fidelity against the analytic Matérn statistics.

Round-4 finding: footprint-sized periodic screens cannot carry the
Matérn spectrum — every mode between the box size and the outer scale
r0 is absent, and those scales DOMINATE the aperture-smoothed structure
function (a 240 m stare box measured 4% of the analytic D^(1/2)(60 m)
and 0.7% of the field variance; a 23x deficit in sampled pwv
fluctuation). Screens are now sized >= 4 r0 per axis
(atmosphere._min_spectral_extent_cells); these oracles pin the
statistics of the screens THE SIM ACTUALLY BUILDS against the analytic
spectral integrals, so a future sizing/normalization regression cannot
hide behind a loose two-model comparison again.

Reference behavior: maria's atmosphere papers (PRD 105:042004) define
the model as Matérn(nu, r0) turbulence; the reference implementation
shares the small-grid limitation through its AR cross-sections.
"""

from __future__ import annotations

import numpy as np
import jax
import pytest
from scipy.special import j0

from maria_tpu.atmosphere.fourier import (
    field_spectral_weights_2d,
    synthesize_matern_field_2d,
)
from maria_tpu.functions import matern_spectral_density

NU, R0, RES = 1 / 3, 1e3, 10.0


def analytic_d_half(lag_m: float, beam_sigma: float) -> float:
    """sqrt(E[(F(x+r) - F(x))^2]) of the unit-variance, beam-smoothed
    Matérn field, from the isotropic spectral integral."""
    k = np.linspace(1e-5, 2.0, 100_000)
    S = matern_spectral_density(k, nu=NU, r0=R0, d=2) * k
    W = np.exp(-(beam_sigma**2) * k**2)
    return float(np.sqrt(
        2 * np.trapezoid(S * W * (1 - j0(k * lag_m)), k) / np.trapezoid(S, k)
    ))


@pytest.mark.parametrize("beam_sigma", [0.0, 42.5])
def test_screen_structure_function_matches_analytic(beam_sigma):
    cells = 512  # ~5 r0 at RES — what _min_spectral_extent_cells enforces
    W = np.asarray(field_spectral_weights_2d(
        cells, cells, RES, RES, nu=NU, r0=R0, beam_sigma=beam_sigma))
    d = {6: [], 20: []}
    var = []
    for i in range(24):
        F = np.asarray(synthesize_matern_field_2d(jax.random.key(i), W, cells, cells))
        var.append(F.var())
        for lag in d:
            d[lag].append(np.sqrt(((F[:, lag:] - F[:, :-lag]) ** 2).mean()))
    for lag, vals in d.items():
        ref = analytic_d_half(lag * RES, beam_sigma)
        got = float(np.mean(vals))
        # the 5 r0 box carries ~98% of D; ensemble-of-24 scatter is a few %
        assert abs(got / ref - 1) < 0.15, (lag, got, ref)
    # in-box variance: super-box scales (the missing ~1 - this) fold into
    # the weather-level mean-pwv draw by design
    assert 0.45 < float(np.mean(var)) < 1.05


def test_sim_screens_are_spectrally_sized():
    """The screens a real (small-footprint) sim builds must span the
    extent rule — the stare scene that exposed the bug."""
    import maria_tpu

    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2",
        plans=maria_tpu.get_plan("ten_second_zenith_stare", sample_rate=20),
        site="chajnantor", atmosphere="2d",
        atmosphere_kwargs={"method": "fourier"}, noise=False, seed=7,
    )
    obs = sim.obs_list[0]
    sim._simulate_atmosphere(obs, sim._next_key())
    for s in obs.atmosphere.screens:
        if s.W is None:
            continue
        assert s.nx * s.res >= 4.0 * R0 * 0.99, (s.nx, s.res)
        assert s.ny * s.res >= 4.0 * R0 * 0.99


def test_sim_3d_groups_are_spectrally_sized():
    import maria_tpu

    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2",
        plans=maria_tpu.get_plan("ten_second_zenith_stare", sample_rate=20),
        site="chajnantor", atmosphere="3d", noise=False, seed=7,
    )
    obs = sim.obs_list[0]
    sim._simulate_atmosphere(obs, sim._next_key())
    for g in getattr(obs.atmosphere, "groups", []):
        assert g.nx * g.res >= 4.0 * R0 * 0.99
        assert g.ny * g.res >= 4.0 * R0 * 0.99
