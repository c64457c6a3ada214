import numpy as np
import pytest

from maria_tpu.spectrum import AtmosphericSpectrum
from maria_tpu.spectrum.synth import generate_spectrum_grids


@pytest.fixture(scope="module")
def chajnantor():
    return AtmosphericSpectrum(region="chajnantor")


def test_opacity_structure(chajnantor):
    s = chajnantor
    nu = np.array([90e9, 150e9, 183.3e9, 225e9, 345e9])
    tau = s.opacity(nu=nu, pwv=1.0, elevation=np.radians(90))
    # windows are transparent, the 183 GHz water line is opaque
    assert tau[0] < 0.2  # 90 GHz window
    assert tau[2] > 2.0  # 183 GHz line center
    assert tau[4] > tau[3] > tau[1] > 0  # opacity rises through the windows


def test_opacity_monotone_in_pwv(chajnantor):
    taus = [float(chajnantor.opacity(nu=225e9, pwv=p, elevation=np.radians(60))) for p in (0.5, 1, 2, 4)]
    assert all(b > a for a, b in zip(taus, taus[1:]))


def test_opacity_airmass_scaling(chajnantor):
    t90 = float(chajnantor.opacity(nu=150e9, pwv=1.0, elevation=np.radians(90)))
    t30 = float(chajnantor.opacity(nu=150e9, pwv=1.0, elevation=np.radians(30)))
    assert np.isclose(t30 / t90, 2.0, rtol=0.05)  # 1/sin(30°) = 2


def test_emission_physical(chajnantor):
    nu = np.geomspace(30e9, 1e12, 64)
    T_em = chajnantor.emission(nu=nu, pwv=2.0, elevation=np.radians(45), base_temperature=270.0)
    assert (T_em > 0).all()
    assert (T_em < 280.0).all()  # bounded by the physical temperature
    # at an opaque frequency, emission approaches the ambient temperature
    T_line = float(chajnantor.emission(nu=183.31e9, pwv=5.0, elevation=np.radians(30), base_temperature=270.0))
    assert T_line > 180.0


def test_transmission_in_unit_interval(chajnantor):
    nu = np.geomspace(30e9, 1.2e12, 128)
    trans = chajnantor.transmission(nu=nu, pwv=1.0, elevation=np.radians(60))
    assert (trans >= 0).all() and (trans <= 1).all()


def test_window_opacities_plausible():
    # at a 5 km dry site, published zenith opacities per mm pwv:
    # tau_225 ~ 0.02-0.12, tau_345 ~ 0.1-0.4
    grids = generate_spectrum_grids(base_altitude_m=5040.0, n_temperatures=3, n_pwv=8, n_elevations=4)
    nu = grids["side_nu_Hz"]
    pwv = grids["side_zenith_pwv_mm"]
    i_el = -1  # zenith
    i225 = np.argmin(np.abs(nu - 225e9))
    ip = np.argmin(np.abs(pwv - 1.0))
    i_T = 1
    tau_225 = grids["opacity_nepers"][i_T, ip, i_el, i225]
    assert 0.01 < tau_225 < 0.15, tau_225


def test_dry_site_more_transparent():
    lo = generate_spectrum_grids(base_altitude_m=0.0, n_temperatures=1, n_pwv=4, n_elevations=2)
    hi = generate_spectrum_grids(base_altitude_m=5040.0, n_temperatures=1, n_pwv=4, n_elevations=2)
    i90_lo = np.argmin(np.abs(lo["side_nu_Hz"] - 90e9))
    i90_hi = np.argmin(np.abs(hi["side_nu_Hz"] - 90e9))
    assert hi["opacity_nepers"][0, 0, -1, i90_hi] < lo["opacity_nepers"][0, 0, -1, i90_lo]
