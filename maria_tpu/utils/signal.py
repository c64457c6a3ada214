"""Signal-processing tools for TOD post-processing.

SVD decomposition, B-spline bases and frequency-domain filters
(reference: maria/utils/signal/__init__.py and signal/filters.py). The
filters here are FFT brick-wall-with-rolloff transfer functions applied
in jnp — a TPU-friendlier equivalent of the reference's scipy Bessel
IIR filtfilt (same passbands, linear phase by construction).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy as sp

__all__ = [
    "decompose",
    "detrend",
    "bspline_basis",
    "lowpass",
    "highpass",
    "bandpass",
]


def decompose(data, k: int = None, downsample_rate: int = 1, mode: str = "uv"):
    """Truncated SVD of (n_det, n_time) data (reference signal/__init__.py:59).

    Returns (a, b) with data ≈ a @ b; `a` is (n_det, k) mode mixing,
    `b` is (k, n_time) mode time series.
    """
    data = np.asarray(data)
    u, s, vh = np.linalg.svd(data[:, ::downsample_rate], full_matrices=False)
    k = k or len(s)
    a = u[:, :k] * s[:k]
    if downsample_rate > 1:
        b = np.linalg.lstsq(a, data, rcond=None)[0]
    else:
        b = vh[:k]
    return a, b


def detrend(data, order: int = 1):
    """Remove a least-squares polynomial along the last axis."""
    data = np.asarray(data)
    n = data.shape[-1]
    x = np.linspace(-1, 1, n)
    V = np.polynomial.polynomial.polyvander(x, order)
    coeffs, *_ = np.linalg.lstsq(V, data.reshape(-1, n).T, rcond=None)
    return (data.reshape(-1, n) - (V @ coeffs).T).reshape(data.shape)


def bspline_basis(n: int, spacing: int = None, n_knots: int = None, order: int = 3):
    """Cubic B-spline basis over n samples (reference signal/__init__.py:107)."""
    if spacing is None and n_knots is None:
        raise ValueError("supply either 'spacing' (in samples) or 'n_knots'")
    n_knots = n_knots or max(int(n / spacing) + 1, 2)
    t = np.linspace(0, n - 1, n_knots)
    t = np.r_[[t[0]] * order, t, [t[-1]] * order]
    x = np.arange(n)
    k = len(t) - order - 1
    B = np.stack(
        [sp.interpolate.BSpline.basis_element(t[i : i + order + 2], extrapolate=False)(x) for i in range(k)],
        axis=0,
    )
    return np.nan_to_num(B)


def _fft_filter(data, sample_rate, transfer):
    data = jnp.asarray(data)
    n = data.shape[-1]
    f = jnp.fft.rfftfreq(n, d=1 / sample_rate)
    return jnp.fft.irfft(jnp.fft.rfft(data, axis=-1) * transfer(f), n=n, axis=-1)


def _rolloff(f, cutoff, order):
    # |H|² of an order-n Butterworth; applied once → linear-phase FFT filter
    return 1.0 / jnp.sqrt(1.0 + (f / cutoff) ** (2 * order))


def lowpass(data, cutoff, sample_rate, order: int = 4):
    return _fft_filter(data, sample_rate, lambda f: _rolloff(f, cutoff, order))


def highpass(data, cutoff, sample_rate, order: int = 4):
    return _fft_filter(
        data, sample_rate, lambda f: 1.0 - _rolloff(f, cutoff, order)
    )


def bandpass(data, f_lower, f_upper, sample_rate, order: int = 4):
    return _fft_filter(
        data,
        sample_rate,
        lambda f: (1.0 - _rolloff(f, f_lower, order)) * _rolloff(f, f_upper, order),
    )
