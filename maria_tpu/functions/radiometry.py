"""Radiometric spectra and their inverses.

Works on both numpy and jax arrays (pure ufunc math). Formula parity with
reference maria/functions/radiometry.py:6-19.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import c, h, k_B

__all__ = [
    "rayleigh_jeans_spectrum",
    "inverse_rayleigh_jeans_spectrum",
    "planck_spectrum",
    "inverse_planck_spectrum",
]


def _np_or_jnp(*args):
    return jnp if any(isinstance(a, jnp.ndarray) for a in args) else np


def rayleigh_jeans_spectrum(T_RJ, nu):
    """Spectral radiance (W m^-2 Hz^-1 sr^-1) of a Rayleigh-Jeans source."""
    return 2 * k_B * nu**2 * T_RJ / c**2


def inverse_rayleigh_jeans_spectrum(I_nu, nu):
    """Rayleigh-Jeans temperature of a given spectral radiance."""
    return I_nu * c**2 / (2 * k_B * nu**2)


def planck_spectrum(T_b, nu):
    """Spectral radiance of a blackbody at brightness temperature T_b."""
    xp = _np_or_jnp(T_b, nu)
    return 2 * h * nu**3 / (c**2 * xp.expm1(h * nu / (k_B * T_b)))


def inverse_planck_spectrum(I_nu, nu):
    """Brightness temperature of a given spectral radiance."""
    xp = _np_or_jnp(I_nu, nu)
    return (h * nu / k_B) / xp.log1p(2 * h * nu**3 / (I_nu * c**2))
