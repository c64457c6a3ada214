"""Astropy oracle for the from-scratch ephemeris (runs wherever astropy
is installable; skips cleanly offline).

The reference derives az/el <-> ra/dec from astropy itself
(maria/coords/coordinates.py:94-235 fits fiducial linear maps to astropy
transforms), so astropy IS the behavioral oracle for coords parity.
This environment cannot install astropy, mirroring how
tools/bench_reference_maria.py gates on the real reference package —
the moment astropy exists, these tests bound the custom IAU-2006
ephemeris (maria_tpu/coords/ephemeris.py) against it.

Comparison controls (so the test measures the MODEL, not data feeds):
- `delta_ut1_utc = 0` on every astropy Time — our ERA assumes UT1 ~ UTC
  (ephemeris.py:12); without pinning, IERS DUT1 (up to ~0.9 s ~ 13" of
  rotation) would dominate the residual.
- no pressure on AltAz frames — no atmospheric refraction on either side.
- IERS auto-download disabled; polar motion (< ~0.3") rides inside the
  stated tolerance.

Tolerance: 1.0 arcsec absolute pointing (the documented model accuracy
is ~0.5" from the 18-term nutation truncation + aberration model;
astropy's own offline polar-motion deficit adds ~0.3").
"""

from __future__ import annotations

import numpy as np
import pytest

astropy = pytest.importorskip("astropy")

import astropy.units as u  # noqa: E402
from astropy.coordinates import (  # noqa: E402
    AltAz,
    EarthLocation as APEarthLocation,
    SkyCoord,
)
from astropy.time import Time  # noqa: E402
from astropy.utils import iers  # noqa: E402

from maria_tpu.coords import Coordinates  # noqa: E402
from maria_tpu.coords.earth import EarthLocation  # noqa: E402

iers.conf.auto_download = False

TOL_ARCSEC = 1.0

# (name, lat_deg, lon_deg, height_m) — the two benchmark sites plus a
# high-latitude one to stress the polar geometry
SITES = [
    ("green_bank", 38.433, -79.840, 825.0),
    ("alma", -23.029, -67.755, 5064.0),
    ("south_pole_ish", -80.0, 45.0, 2800.0),
]

# well inside the 2017+ leap-second validity window (ephemeris.py:28)
TIMES_UNIX = [1.60e9, 1.75e9, 1.85e9]


def _aptime(t_unix):
    t = Time(t_unix, format="unix", scale="utc")
    t.delta_ut1_utc = 0.0
    return t


def _sep_arcsec(phi1, theta1, phi2, theta2):
    c1 = SkyCoord(phi1 * u.rad, theta1 * u.rad)
    c2 = SkyCoord(phi2 * u.rad, theta2 * u.rad)
    return c1.separation(c2).arcsec


@pytest.mark.parametrize("site", SITES, ids=[s[0] for s in SITES])
def test_azel_to_radec_matches_astropy(site):
    """Absolute az/el -> ra/dec pointing vs the astropy oracle."""
    name, lat, lon, height = site
    loc = EarthLocation(lat_deg=lat, lon_deg=lon, height_m=height)
    ap_loc = APEarthLocation.from_geodetic(lon * u.deg, lat * u.deg, height * u.m)

    az = np.radians([0.0, 45.0, 137.0, 250.0, 311.0])
    el = np.radians([20.0, 35.0, 55.0, 75.0, 88.0])
    for t_unix in TIMES_UNIX:
        c = Coordinates(
            phi=az, theta=el, t=np.full_like(az, t_unix),
            earth_location=loc, frame="az/el",
        )
        ra, dec = c.ra, c.dec

        frame = AltAz(obstime=_aptime(np.full_like(az, t_unix)), location=ap_loc)
        icrs = SkyCoord(az * u.rad, el * u.rad, frame=frame).icrs
        sep = _sep_arcsec(ra, dec, icrs.ra.rad, icrs.dec.rad)
        assert np.max(sep) < TOL_ARCSEC, f"{name} @ {t_unix}: max sep {np.max(sep):.3f}\""


@pytest.mark.parametrize("site", SITES[:2], ids=[s[0] for s in SITES[:2]])
def test_radec_to_azel_matches_astropy(site):
    """The inverse direction: ICRS -> az/el tracking vs astropy."""
    name, lat, lon, height = site
    loc = EarthLocation(lat_deg=lat, lon_deg=lon, height_m=height)
    ap_loc = APEarthLocation.from_geodetic(lon * u.deg, lat * u.deg, height * u.m)

    # a source that transits high at each site
    ra = np.radians(150.0)
    dec = np.radians(lat + 5.0)
    t = np.asarray(TIMES_UNIX)

    c = Coordinates(
        phi=np.full_like(t, ra), theta=np.full_like(t, dec), t=t,
        earth_location=loc, frame="ra/dec",
    )
    az_m, el_m = c.az, c.el

    frame = AltAz(obstime=_aptime(t), location=ap_loc)
    aa = SkyCoord(ra * u.rad, dec * u.rad, frame="icrs").transform_to(frame)
    # only compare above-horizon samples (below, neither side is meaningful)
    up = aa.alt.rad > np.radians(10.0)
    if not up.any():
        pytest.skip("source below horizon at all probe times")
    sep = _sep_arcsec(az_m[up], el_m[up], aa.az.rad[up], aa.alt.rad[up])
    assert np.max(sep) < TOL_ARCSEC, f"{name}: max sep {np.max(sep):.3f}\""


def test_roundtrip_through_astropy():
    """maria az/el -> maria ra/dec -> astropy az/el closes the loop."""
    lat, lon, height = SITES[0][1:]
    loc = EarthLocation(lat_deg=lat, lon_deg=lon, height_m=height)
    ap_loc = APEarthLocation.from_geodetic(lon * u.deg, lat * u.deg, height * u.m)
    t_unix = 1.78e9
    az, el = np.radians(123.0), np.radians(61.0)

    c = Coordinates(phi=az, theta=el, t=t_unix, earth_location=loc, frame="az/el")
    frame = AltAz(obstime=_aptime(np.atleast_1d(t_unix)), location=ap_loc)
    back = SkyCoord(float(c.ra) * u.rad, float(c.dec) * u.rad, frame="icrs").transform_to(frame)
    sep = _sep_arcsec(
        np.atleast_1d(az), np.atleast_1d(el),
        np.atleast_1d(back.az.rad), np.atleast_1d(back.alt.rad),
    )
    assert float(np.max(sep)) < TOL_ARCSEC
