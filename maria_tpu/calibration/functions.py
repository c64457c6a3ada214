"""Closed-form radiometric conversion edges
(reference: maria/calibration/functions.py).

All functions take/return values in canonical units: W (power), K (temps),
Jy (flux densities), rad/sr (angles/areas), Hz (frequency).
"""

from __future__ import annotations

import numpy as np

from ..constants import T_CMB, h, k_B
from ..errors import ShapeError
from ..functions.radiometry import (
    inverse_planck_spectrum,
    inverse_rayleigh_jeans_spectrum,
    planck_spectrum,
    rayleigh_jeans_spectrum,
)

JY = 1e-26  # W m^-2 Hz^-1


def identity(x, **kwargs):
    return x


def cmb_temperature_anisotropy_to_compton_y(dT_CMB, nu, **kwargs):
    x = h * nu / (k_B * T_CMB)
    f = x * (np.exp(x) + 1) / (np.exp(x) - 1) - 4
    return dT_CMB / (f * T_CMB)


def compton_y_to_cmb_temperature_anisotropy(y, nu, **kwargs):
    x = h * nu / (k_B * T_CMB)
    f = x * (np.exp(x) + 1) / (np.exp(x) - 1) - 4
    return y * f * T_CMB


def cmb_temperature_anisotropy_to_brightness_temperature(dT_CMB, **kwargs):
    return dT_CMB + T_CMB


def brightness_temperature_to_cmb_temperature_anisotropy(T_b, **kwargs):
    return T_b - T_CMB


def rayleigh_jeans_temperature_to_brightness_temperature(T_RJ, nu, **kwargs):
    return inverse_planck_spectrum(rayleigh_jeans_spectrum(T_RJ, nu), nu)


def brightness_temperature_to_rayleigh_jeans_temperature(T_b, nu, **kwargs):
    return inverse_rayleigh_jeans_spectrum(planck_spectrum(T_b, nu), nu)


def rayleigh_jeans_temperature_to_cmb_temperature_anisotropy(T_RJ, nu, **kwargs):
    """Linearized about the CMB monopole: dT_CMB = T_RJ / (dT_RJ/dT_CMB)."""
    return T_RJ / _drj_dcmb(nu)


def cmb_temperature_anisotropy_to_rayleigh_jeans_temperature(dT_CMB, nu, **kwargs):
    return dT_CMB * _drj_dcmb(nu)


def _drj_dcmb(nu, eps=1e-5):
    hi = inverse_rayleigh_jeans_spectrum(planck_spectrum(T_CMB + eps, nu), nu)
    lo = inverse_rayleigh_jeans_spectrum(planck_spectrum(T_CMB - eps, nu), nu)
    return (hi - lo) / (2 * eps)


# -- band-integrated power conversions ---------------------------------------


def _band_integral(band, spectrum=None, **kwargs):
    if spectrum is not None:
        return band.compute_transmission_integral(
            spectrum=spectrum,
            zenith_pwv=kwargs.get("zenith_pwv"),
            base_temperature=kwargs.get("base_temperature"),
            elevation=kwargs.get("elevation"),
        )
    return band.compute_transmission_integral(spectrum=None)


def rayleigh_jeans_temperature_to_power(T_RJ, band, polarized=False, spectrum=None, **kwargs):
    integral = _band_integral(band, spectrum=spectrum, **kwargs)
    return (0.5 if polarized else 1.0) * k_B * integral * T_RJ


def power_to_rayleigh_jeans_temperature(P, band, polarized=False, spectrum=None, **kwargs):
    integral = _band_integral(band, spectrum=spectrum, **kwargs)
    return P / ((0.5 if polarized else 1.0) * k_B * integral)


def brightness_temperature_to_power_explicit(T_b, band, polarized=False, spectrum=None, **kwargs):
    """Full passband integral of the Planck spectrum of T_b
    (reference: calibration/functions.py brightness_temperature_to_power_explicit)."""
    T_b = np.atleast_1d(T_b)
    if T_b.ndim > 1:
        raise ShapeError("'T_b' must be one-dimensional")

    if spectrum is not None:
        nu = spectrum.side_nu[:, None]
        T_RJ = inverse_rayleigh_jeans_spectrum(planck_spectrum(T_b[None], nu), nu)
        # (T_base, pwv, el, nu, n_T)
        weighted = T_RJ[None, None, None] * (
            np.exp(-spectrum._opacity[..., None]) * band.passband(nu)[None, None, None]
        )
        integral_grid = np.trapezoid(weighted, x=spectrum.side_nu, axis=-2)
        from ..ops import RegularGridInterpolator

        xi = (
            kwargs.get("base_temperature"),
            kwargs.get("zenith_pwv"),
            kwargs.get("elevation"),
        )
        integral = np.asarray(RegularGridInterpolator(spectrum.points[:3], integral_grid)(xi))
    else:
        nu = band.nu[:, None]
        T_RJ = inverse_rayleigh_jeans_spectrum(planck_spectrum(T_b[None], nu), nu)
        integral = np.trapezoid(T_RJ * band.passband(nu), x=band.nu, axis=-2)

    return (0.5 if polarized else 1.0) * k_B * integral


def brightness_temperature_to_power(T_b, band, polarized=False, spectrum=None, eps=1e-4, **kwargs):
    """Two-point linearization, exact for any single T_b value
    (reference convention)."""
    T_b = np.asarray(T_b)
    T_lo = float(np.min(T_b)) - eps / 2
    T_hi = float(np.min(T_b)) + eps / 2
    P = brightness_temperature_to_power_explicit(
        np.array([T_lo, T_hi]), band=band, polarized=polarized, spectrum=spectrum, **kwargs
    )
    t = (T_b - T_lo) / eps
    return t * P[..., 1] + (1 - t) * P[..., 0]


def cmb_temperature_anisotropy_to_power(dT_CMB, band, polarized=False, spectrum=None, eps=1e-5, **kwargs):
    P = brightness_temperature_to_power_explicit(
        np.array([T_CMB - eps / 2, T_CMB + eps / 2]), band=band, polarized=polarized, spectrum=spectrum, **kwargs
    )
    return dT_CMB * (P[..., 1] - P[..., 0]) / eps


def power_to_cmb_temperature_anisotropy(P, band, polarized=False, spectrum=None, eps=1e-5, **kwargs):
    P2 = brightness_temperature_to_power_explicit(
        np.array([T_CMB - eps / 2, T_CMB + eps / 2]), band=band, polarized=polarized, spectrum=spectrum, **kwargs
    )
    return P / ((P2[..., 1] - P2[..., 0]) / eps)


# -- flux densities -----------------------------------------------------------


def rayleigh_jeans_temperature_to_spectral_flux_density_per_pixel(T_RJ, nu, pixel_area, **kwargs):
    return rayleigh_jeans_spectrum(T_RJ, nu) * pixel_area / JY


def spectral_flux_density_per_pixel_to_rayleigh_jeans_temperature(E, nu, pixel_area, **kwargs):
    return inverse_rayleigh_jeans_spectrum(E * JY / pixel_area, nu)


def rayleigh_jeans_temperature_to_spectral_flux_density_per_beam(T_RJ, nu, beam_area, **kwargs):
    return rayleigh_jeans_spectrum(T_RJ, nu) * beam_area / JY


def spectral_flux_density_per_beam_to_rayleigh_jeans_temperature(E, nu, beam_area, **kwargs):
    return inverse_rayleigh_jeans_spectrum(E * JY / beam_area, nu)


def spectral_flux_density_per_pixel_to_spectral_radiance(E, nu, pixel_area, **kwargs):
    return E / (pixel_area if pixel_area is not None else 1.0)


def spectral_radiance_to_spectral_flux_density_per_pixel(I, nu, pixel_area, **kwargs):
    return I * pixel_area


def spectral_flux_density_per_pixel_to_spectral_flux_density_per_beam(E, beam_area, pixel_area, **kwargs):
    return E * beam_area / pixel_area


def spectral_flux_density_per_beam_to_spectral_flux_density_per_pixel(E, beam_area, pixel_area, **kwargs):
    return E * pixel_area / beam_area


def power_to_brightness_temperature(P, **kwargs):
    raise NotImplementedError("power -> brightness temperature is not invertible in closed form")


def dP_dT_CMB(band, polarized=False, spectrum=None, eps=1e-4, **kwargs):
    """Detector power per unit CMB temperature anisotropy, W/K_CMB
    (reference calibration/functions.py dP_dT_CMB)."""
    P = brightness_temperature_to_power_explicit(
        np.array([T_CMB - eps / 2, T_CMB + eps / 2]), band=band, polarized=polarized, spectrum=spectrum, **kwargs
    )
    return (P[..., 1] - P[..., 0]) / eps


def T_RJ_per_T_CMB(band, eps=1e-3, **kwargs):
    """Band-averaged color correction K_RJ/K_CMB with no atmosphere
    (reference calibration/functions.py T_RJ_per_T_CMB)."""
    test_T_b = T_CMB + np.array([[-eps / 2], [+eps / 2]])
    T_RJ = inverse_rayleigh_jeans_spectrum(planck_spectrum(test_T_b, band.nu), band.nu)
    P = k_B * np.trapezoid(T_RJ * band.passband(band.nu), x=band.nu, axis=-1)
    return power_to_rayleigh_jeans_temperature((P[1] - P[0]) / eps, spectrum=None, band=band)
