"""Scalar spherical harmonic synthesis on HEALPix grids.

Replaces healpy's synalm/alm2map for CMB generation (reference:
maria/cmb/generation.py:36-58). Host-side float64: a stable normalized
associated-Legendre recursion per m, accumulated into per-ring Fourier
coefficients, then one FFT per isolatitude ring (with m-aliasing for the
short polar rings). Spin-2 (Q/U) synthesis is not yet implemented; the
polarized CMB path carries zero Q/U for now.
"""

from __future__ import annotations

import logging

import numpy as np

from .core import nside2npix, ring_info

logger = logging.getLogger("maria_tpu")

__all__ = ["synalm", "alm2map", "map2alm", "alm_index"]


def synalm(cl: np.ndarray, lmax: int = None, seed: int = None) -> np.ndarray:
    """Draw a_lm ~ N(0, C_l). Returns complex array indexed [l, m]."""
    rng = np.random.default_rng(seed)
    cl = np.asarray(cl, dtype=float)
    lmax = lmax if lmax is not None else len(cl) - 1
    cl = cl[: lmax + 1]
    alm = np.zeros((lmax + 1, lmax + 1), dtype=complex)
    ells = np.arange(lmax + 1)
    # m = 0: real
    alm[:, 0] = rng.standard_normal(lmax + 1) * np.sqrt(cl)
    # m > 0: complex with total variance C_l
    for m in range(1, lmax + 1):
        n = lmax + 1 - m
        re = rng.standard_normal(n)
        im = rng.standard_normal(n)
        alm[m:, m] = (re + 1j * im) * np.sqrt(cl[m:] / 2)
    return alm


def alm_index(lmax: int):
    return np.tril_indices(lmax + 1)


def alm2map(alm: np.ndarray, nside: int) -> np.ndarray:
    """Synthesize a real HEALPix RING map from a_lm (indexed [l, m])."""
    lmax = alm.shape[0] - 1
    rings = ring_info(nside)
    z = rings["z"]  # (n_rings,)
    sin_theta = np.sqrt(np.clip(1 - z**2, 0, None))
    n_rings = len(z)

    # g[m, ring] = sum_l a_lm lambda_lm(z)
    g = np.zeros((lmax + 1, n_rings), dtype=complex)

    # lambda_mm seed, built iteratively: lambda_00 = 1/sqrt(4 pi)
    lam_mm = np.full(n_rings, 1 / np.sqrt(4 * np.pi))
    for m in range(lmax + 1):
        if m > 0:
            lam_mm = -np.sqrt(1 + 1 / (2 * m)) * sin_theta * lam_mm
        # upward recursion in l at fixed m
        lam_prev = np.zeros(n_rings)  # lambda_{l-1, m}
        lam = lam_mm.copy()  # lambda_{l, m} starting at l = m
        g[m] += alm[m, m] * lam
        for ell in range(m + 1, lmax + 1):
            a = np.sqrt((4 * ell**2 - 1) / (ell**2 - m**2))
            b = np.sqrt(((ell - 1) ** 2 - m**2) / (4 * (ell - 1) ** 2 - 1))
            lam, lam_prev = a * (z * lam - b * lam_prev), lam
            g[m] += alm[ell, m] * lam

    # per-ring FFT with m-aliasing
    out = np.empty(nside2npix(nside))
    for r in range(n_rings):
        n = int(rings["n_pix"][r])
        start = int(rings["start"][r])
        phi0 = rings["shift"][r] * (2 * np.pi / n)
        m_arr = np.arange(lmax + 1)
        w = g[:, r] * np.exp(1j * m_arr * phi0)
        # fold m into the ring's Fourier modes (m = 0 counted once,
        # m > 0 contribute w e^{im phi} + conj)
        F = np.zeros(n, dtype=complex)
        np.add.at(F, m_arr % n, w)
        Fc = np.zeros(n, dtype=complex)
        np.add.at(Fc, (-m_arr[1:]) % n, np.conj(w[1:]))
        ring_map = np.real(np.fft.ifft(F + Fc) * n)
        out[start : start + n] = ring_map
    return out


def map2alm(m: np.ndarray, lmax: int) -> np.ndarray:
    """Analyze a HEALPix RING map: a_lm = sum_pix map * conj(Y_lm) * Omega_pix."""
    npix = len(m)
    nside = int(round(np.sqrt(npix / 12)))
    rings = ring_info(nside)
    z = rings["z"]
    sin_theta = np.sqrt(np.clip(1 - z**2, 0, None))
    n_rings = len(z)
    omega = 4 * np.pi / npix

    # per-ring Fourier analysis: h[m, ring] = sum_j map_j e^{-i m phi_j}
    h = np.zeros((lmax + 1, n_rings), dtype=complex)
    m_arr = np.arange(lmax + 1)
    for r in range(n_rings):
        n = int(rings["n_pix"][r])
        start = int(rings["start"][r])
        phi0 = rings["shift"][r] * (2 * np.pi / n)
        F = np.fft.fft(m[start : start + n])  # F[k] = sum_j map_j e^{-2pi i jk/n}
        h[:, r] = F[m_arr % n] * np.exp(-1j * m_arr * phi0)

    alm = np.zeros((lmax + 1, lmax + 1), dtype=complex)
    lam_mm = np.full(n_rings, 1 / np.sqrt(4 * np.pi))
    for mm in range(lmax + 1):
        if mm > 0:
            lam_mm = -np.sqrt(1 + 1 / (2 * mm)) * sin_theta * lam_mm
        lam_prev = np.zeros(n_rings)
        lam = lam_mm.copy()
        alm[mm, mm] = omega * np.sum(lam * h[mm])
        for ell in range(mm + 1, lmax + 1):
            a = np.sqrt((4 * ell**2 - 1) / (ell**2 - mm**2))
            b = np.sqrt(((ell - 1) ** 2 - mm**2) / (4 * (ell - 1) ** 2 - 1))
            lam, lam_prev = a * (z * lam - b * lam_prev), lam
            alm[ell, mm] = omega * np.sum(lam * h[mm])
    return alm
