"""FFT spectral synthesis of Matérn turbulence fields.

This is the TPU-native default path for turbulence generation: instead of
the reference's sequential conditional-Gaussian extrusion (reference
maria/atmosphere/process.py:191-209, an inherently serial loop), each
layer's screen is drawn *at once* as a stationary Gaussian random field
with the exact Whittle-Matérn spectral density, via two FFTs on a
padded grid. Beam smoothing fuses into the same spectral multiply
(the reference smooths separately with scipy.ndimage.gaussian_filter,
atmosphere.py:341-344).

Spectra and covariances agree with the AR path by construction (both
target normalized_matern); the test suite checks the realized covariance
against the closed form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..functions import matern_spectral_density

__all__ = ["good_fft_size", "synthesize_matern_field_2d", "field_spectral_weights_2d"]


def good_fft_size(n: int) -> int:
    """Smallest m * 2^k >= n with odd part m in {1, 3, 5, 9}.

    TPU XLA FFTs are fast only when the length's odd part is tiny:
    measured on v5e, n=3072 (3*2^10) runs ~25x faster than n=3000
    (2^3*3*5^3). Restricting the odd factor to <=9 keeps padding
    overhead <=12.5% over the next power of two while staying on the
    fast path.
    """
    n = max(int(n), 16)
    best = 1 << (n - 1).bit_length()
    for m in (3, 5, 9):
        size = m << max(0, (-(-n // m) - 1).bit_length()) if n > m else m
        while size < n:
            size *= 2
        best = min(best, size)
    return best


def field_spectral_weights_2d(ny: int, nx: int, dy: float, dx: float, nu: float, r0: float, beam_sigma: float = 0.0):
    """Host-precomputed spectral weights W(k) such that
    irfft2(rfft2(white) * W) is a unit-variance Matérn(nu, r0) field,
    optionally beam-smoothed with a Gaussian of width `beam_sigma`
    (all lengths in meters)."""
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=dy)
    kx = 2 * np.pi * np.fft.rfftfreq(nx, d=dx)
    k = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    S = matern_spectral_density(k, nu=nu, r0=r0, d=2)

    # unit variance: Var(x) = (1/N) sum_k |W_k|^2 over the FULL grid.
    # account for the rfft half-spectrum (columns 0 and nx/2 are not doubled)
    weights_full = np.ones_like(S)
    weights_full[:, 1:] = 2.0
    if nx % 2 == 0:
        weights_full[:, -1] = 1.0
    n_total = ny * nx
    norm = np.sqrt(n_total / np.sum(weights_full * S))
    W = np.sqrt(S) * norm

    if beam_sigma > 0:
        W = W * np.exp(-0.5 * beam_sigma**2 * k**2)
    return W.astype(np.float32)


@partial(jax.jit, static_argnames=("ny", "nx"))
def synthesize_matern_field_2d(key, W, ny: int, nx: int):
    """Draw the (ny, nx) real field with spectral weights W (host-built).

    One white-noise draw + one rfft2 + one irfft2; everything fuses under
    jit with downstream sampling.
    """
    white = jax.random.normal(key, (ny, nx), dtype=jnp.float32)
    return jnp.fft.irfft2(jnp.fft.rfft2(white) * W, s=(ny, nx))
