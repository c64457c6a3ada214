"""Absolute anchors for the synthetic atmospheric spectra.

The whole pW scale of every TOD rides on spectrum/synth.py, so it must
land on published atmospheric physics, not just have the right shapes.
Anchors below are standard Chajnantor (ALMA site, ~5060 m) zenith
values from the am / APEX-radiometer literature (reference grids are
am-computed: maria/spectrum/atmosphere.py:26-57):

- the APEX 225 GHz tipper relation tau_225 ~ 0.005 + 0.04 * pwv[mm];
- the 3 mm / 2 mm / 0.87 mm window transmissions at ~1 mm pwv;
- total saturation at the 183 GHz water line;
- emission/opacity consistency: the downwelling RJ temperature must be
  (1 - e^-tau) times an effective atmospheric temperature between the
  tropopause and surface temperatures.
"""

import numpy as np
import pytest

from maria_tpu.spectrum import AtmosphericSpectrum


@pytest.fixture(scope="module")
def spec():
    return AtmosphericSpectrum(region="chajnantor", source="synthetic/v1")


def _transmission(spec, nu_GHz, pwv, el_deg=90.0):
    return float(
        np.asarray(
            spec.transmission(
                nu=np.array([nu_GHz * 1e9]), pwv=pwv,
                base_temperature=270.0, elevation=np.radians(el_deg),
            )
        )[0]
    )


@pytest.mark.parametrize(
    "nu_GHz,pwv,lo,hi",
    [
        # 3 mm window: very transparent
        (90.0, 1.0, 0.93, 0.995),
        (90.0, 2.0, 0.91, 0.99),
        # 2 mm window
        (150.0, 1.0, 0.92, 0.98),
        (150.0, 2.0, 0.86, 0.96),
        # 225 GHz tipper: tau ~ 0.005 + 0.04/mm -> T ~ e^-(0.025..0.085)
        (225.0, 0.5, 0.94, 0.99),
        (225.0, 1.0, 0.92, 0.97),
        (225.0, 2.0, 0.87, 0.95),
        # 0.87 mm window (Band 7)
        (345.0, 0.5, 0.82, 0.95),
        (345.0, 1.0, 0.70, 0.90),
    ],
)
def test_window_transmission_anchors(spec, nu_GHz, pwv, lo, hi):
    t = _transmission(spec, nu_GHz, pwv)
    assert lo < t < hi, f"zenith transmission at {nu_GHz} GHz, pwv={pwv} mm: {t:.3f}"


def test_183_line_saturates(spec):
    assert _transmission(spec, 183.3, 1.0) < 0.05
    assert _transmission(spec, 183.3, 0.2) < 0.4


def test_airmass_scaling(spec):
    """Opacity must scale with airmass: tau(el) ~ tau_zenith / sin(el)."""
    nu = np.array([225e9])
    tau_z = float(np.asarray(spec.opacity(nu=nu, pwv=1.0, base_temperature=270.0, elevation=np.radians(90.0)))[0])
    tau_30 = float(np.asarray(spec.opacity(nu=nu, pwv=1.0, base_temperature=270.0, elevation=np.radians(30.0)))[0])
    np.testing.assert_allclose(tau_30, tau_z / np.sin(np.radians(30.0)), rtol=0.05)


def test_emission_opacity_consistency(spec):
    """T_RJ_emission ~ T_eff (1 - e^-tau) with a physical T_eff."""
    nu = np.arange(80e9, 900e9, 10e9)
    kwargs = dict(pwv=1.5, base_temperature=270.0, elevation=np.radians(60.0))
    tau = np.asarray(spec.opacity(nu=nu, **kwargs))
    T_em = np.asarray(spec.emission(nu=nu, **kwargs))
    mask = (tau > 0.05) & (tau < 3.0)
    # RJ emission of a graybody at T_eff, RJ-corrected: for nu < 1 THz and
    # T ~ 250 K the RJ approximation holds to ~10%
    T_eff = T_em[mask] / (1 - np.exp(-tau[mask]))
    assert (T_eff > 150.0).all() and (T_eff < 290.0).all(), (T_eff.min(), T_eff.max())


def test_pwv_monotonic_all_windows(spec):
    for nu_GHz in (90.0, 150.0, 225.0, 345.0):
        ts = [_transmission(spec, nu_GHz, pwv) for pwv in (0.5, 1.0, 2.0, 4.0)]
        assert all(a > b for a, b in zip(ts[:-1], ts[1:])), (nu_GHz, ts)
