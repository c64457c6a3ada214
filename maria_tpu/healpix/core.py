"""HEALPix pixelization from scratch (RING scheme).

A dependency-free replacement for the healpy functions the reference
uses (ang2pix for pointing matrices, map/healpix.py:79; synalm/alm2map
for CMB generation, cmb/generation.py:36). `ang2pix_ring` is pure jnp —
it runs inside the simulation program as a gather index computation.

Conventions match HEALPix: theta is the colatitude in [0, pi], phi the
longitude in [0, 2pi); npix = 12 nside^2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ang2pix_ring", "pix2ang_ring", "nside2npix", "npix2nside", "ring_info"]


def nside2npix(nside: int) -> int:
    return 12 * nside * nside


def npix2nside(npix: int) -> int:
    nside = int(round(np.sqrt(npix / 12)))
    if 12 * nside * nside != npix:
        raise ValueError(f"{npix} is not a valid HEALPix map size.")
    return nside


def ang2pix_ring(nside: int, theta, phi):
    """RING-scheme pixel index of (colatitude, longitude); pure jnp."""
    xp = jnp
    z = xp.cos(theta)
    za = xp.abs(z)
    tt = (phi % (2 * np.pi)) / (np.pi / 2)  # in [0, 4)

    # --- equatorial belt: |z| <= 2/3
    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = xp.floor(temp1 - temp2).astype(jnp.int32)
    jm = xp.floor(temp1 + temp2).astype(jnp.int32)
    ir_eq = nside + 1 + jp - jm  # ring counted from z = 2/3, in [1, 2 nside+1]
    kshift = 1 - (ir_eq & 1)
    ip_eq = ((jp + jm - nside + kshift + 1) // 2) % (4 * nside)
    ncap = 2 * nside * (nside - 1)
    pix_eq = ncap + (ir_eq - 1) * 4 * nside + ip_eq

    # --- polar caps
    tp = tt - xp.floor(tt)
    tmp = nside * xp.sqrt(3 * (1 - za))
    jp_c = xp.floor(tp * tmp).astype(jnp.int32)
    jm_c = xp.floor((1 - tp) * tmp).astype(jnp.int32)
    ir_c = jp_c + jm_c + 1
    ip_c = xp.floor(tt * ir_c).astype(jnp.int32) % (4 * ir_c)
    pix_north = 2 * ir_c * (ir_c - 1) + ip_c
    pix_south = nside2npix(nside) - 2 * ir_c * (ir_c + 1) + ip_c

    pix_cap = xp.where(z > 0, pix_north, pix_south)
    return xp.where(za <= 2 / 3, pix_eq, pix_cap)


def ring_info(nside: int):
    """Host-side table of the 4*nside - 1 isolatitude rings.

    Returns dict with, per ring i (0-based from the north pole):
    n_pix (pixels in ring), start (first pixel index), z (cos colatitude),
    shift (phi offset of the first pixel, in units of the pixel spacing/2).
    """
    n_rings = 4 * nside - 1
    i = np.arange(1, n_rings + 1)  # 1-based ring index

    north_cap = i < nside
    south_cap = i > 3 * nside
    equatorial = ~(north_cap | south_cap)

    n_pix = np.where(north_cap, 4 * i, np.where(south_cap, 4 * (4 * nside - i), 4 * nside))

    z = np.empty(n_rings)
    z[north_cap] = 1 - (i[north_cap] ** 2) / (3 * nside**2)
    z[equatorial] = 4 / 3 - 2 * i[equatorial] / (3 * nside)
    i_s = 4 * nside - i[south_cap]
    z[south_cap] = -(1 - (i_s**2) / (3 * nside**2))

    # phi of the first pixel, in units of the ring's pixel spacing: cap
    # rings start half a pixel in; equatorial rings alternate 0 / half
    s = np.where(equatorial, (i - nside + 1) % 2, 1)
    shift = np.where(equatorial, 0.5 * s, 0.5)

    start = np.zeros(n_rings, dtype=np.int64)
    start[1:] = np.cumsum(n_pix)[:-1]

    return {"n_pix": n_pix.astype(np.int64), "start": start, "z": z, "shift": shift}


def pix2ang_ring(nside: int, pix):
    """(colatitude, longitude) of RING pixels; host numpy."""
    pix = np.asarray(pix, dtype=np.int64)
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)

    theta = np.empty(pix.shape)
    phi = np.empty(pix.shape)

    north = pix < ncap
    south = pix >= npix - ncap
    eq = ~(north | south)

    # north cap
    p = pix[north]
    ir = np.floor(0.5 * (1 + np.sqrt(1 + 2 * p))).astype(np.int64)
    ip = p - 2 * ir * (ir - 1)
    theta[north] = np.arccos(1 - ir**2 / (3 * nside**2))
    phi[north] = (ip + 0.5) * np.pi / (2 * ir)

    # equatorial
    p = pix[eq] - ncap
    ir = p // (4 * nside) + nside  # in [nside, 3 nside]
    ip = p % (4 * nside)
    s = (ir - nside + 1) % 2
    theta[eq] = np.arccos(4 / 3 - 2 * ir / (3 * nside))
    phi[eq] = (ip + 0.5 * s) * np.pi / (2 * nside)

    # south cap
    p = npix - 1 - pix[south]
    ir = np.floor(0.5 * (1 + np.sqrt(1 + 2 * p))).astype(np.int64)
    ip = p - 2 * ir * (ir - 1)
    theta[south] = np.arccos(-(1 - ir**2 / (3 * nside**2)))
    phi[south] = (4 * ir - ip - 0.5) * np.pi / (2 * ir) % (2 * np.pi)

    return theta, phi
