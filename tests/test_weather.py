import numpy as np
import pytest

from maria_tpu.weather import Weather

T_SUMMER_N = 1.75e9  # 2025-06-17ish
T_WINTER_N = 1.7656e9  # ~6 months later


def test_basic_fields():
    w = Weather(region="chajnantor", time=T_SUMMER_N)
    assert w.pwv > 0
    assert 180 < w.temperature.min() < w.temperature.max() < 320
    assert (w.wind_speed >= 0).all()
    assert np.allclose(w.wind_speed, np.hypot(w.wind_east, w.wind_north))


def test_dry_site_vs_wet_site():
    dry = Weather(region="chajnantor", time=T_SUMMER_N)
    wet = Weather(region="green_bank", time=T_SUMMER_N)
    assert dry.pwv < wet.pwv


def test_pwv_quantiles_monotone():
    pwvs = [Weather(region="chajnantor", time=T_SUMMER_N, quantiles={"pwv": q}).pwv for q in (0.1, 0.5, 0.9)]
    assert pwvs[0] < pwvs[1] < pwvs[2]


def test_pwv_override():
    w = Weather(region="chajnantor", time=T_SUMMER_N, override={"pwv": 3.0})
    assert abs(w.pwv - 3.0) < 0.1


def test_seasonal_cycle():
    # northern-hemisphere site is warmer in northern summer
    summer = Weather(region="green_bank", time=T_SUMMER_N)
    winter = Weather(region="green_bank", time=T_WINTER_N)
    assert summer.temperature[0] > winter.temperature[0]


def test_altitude_call():
    w = Weather(region="chajnantor", time=T_SUMMER_N)
    vals = w(altitude=w.base_altitude + np.array([100.0, 1000.0, 5000.0]))
    assert vals["temperature"][0] > vals["temperature"][2]
    assert vals["absolute_humidity"][0] > vals["absolute_humidity"][2]


def test_layers_pwv_consistent():
    w = Weather(region="mauna_kea", time=T_SUMMER_N)
    layers = w.layers()
    assert np.isclose(layers.total_water.sum(), w.pwv, rtol=1e-6)
    assert (layers.altitude > w.base_altitude).all()


import pytest

from maria_tpu.site import all_regions


# The full 25-region sweep regenerates each region's synthetic
# climatology + spectrum cache cold (~8 s/region) — the default tier
# keeps the benchmark/reference sites and the climate extremes, the
# rest ride the slow tier (SURVEY.md §4 retier).
_CORE_REGIONS = {"chajnantor", "green_bank", "mauna_kea", "south_pole"}


@pytest.mark.parametrize(
    "region",
    [r if r in _CORE_REGIONS else pytest.param(r, marks=pytest.mark.slow)
     for r in all_regions],
)
def test_every_region_weather_and_spectrum(region):
    """Reference-style all-region sweep
    (maria/tests/atmosphere/test_atmosphere.py:10-14): every region must
    produce physical weather and spectrum grids."""
    import numpy as np

    from maria_tpu.spectrum import AtmosphericSpectrum
    from maria_tpu.weather import Weather

    w = Weather(time=1.75e9, region=region, source="synthetic")
    assert 0.0 < float(w.pwv) < 100.0
    assert 150.0 < float(w.temperature[0]) < 330.0
    assert np.isfinite(w.wind_speed).all()

    spec = AtmosphericSpectrum(region=region, source="synthetic/v1")
    t = np.asarray(spec.transmission(nu=np.array([90e9, 225e9]), pwv=1.0,
                                     base_temperature=float(w.temperature[0]),
                                     elevation=np.radians(60.0)))
    assert np.isfinite(t).all() and (t > 0).all() and (t <= 1.0 + 1e-6).all()


def test_thermodynamic_helpers():
    from maria_tpu.weather import (
        air_density,
        dew_point,
        dew_point_to_relative_humidity,
        saturation_pressure,
        vapor_pressure,
    )

    T, RH = 290.0, 0.40  # K, fraction (matches Weather.humidity)
    dp = dew_point(T, RH)
    assert dp < T  # dew point below ambient for RH < 100%
    # round trip: RH -> dew point -> RH
    assert np.isclose(dew_point_to_relative_humidity(T, dp), RH, rtol=1e-6)
    # saturation: dew point equals temperature at 100% RH
    assert np.isclose(dew_point(T, 1.0), T, atol=1e-6)
    # moist air is lighter than dry air at the same (P, T)
    rho_dry = air_density(101325.0, T, 1e-4)
    rho_wet = air_density(101325.0, T, 0.99)
    assert 1.0 < rho_wet < rho_dry < 1.4
    # vapor pressure increases with RH and T
    assert vapor_pressure(T, 0.80) > vapor_pressure(T, 0.40)
    assert vapor_pressure(T + 10, RH) > vapor_pressure(T, RH)
    # helpers consume Weather.humidity directly (same fraction convention)
    from maria_tpu.weather import Weather

    w = Weather(region="chajnantor", time=1.75e9)
    vp = vapor_pressure(w.temperature, w.humidity)
    sat = saturation_pressure(w.temperature)
    assert np.all(vp > 0) and np.all(vp <= sat * 1.0001)
