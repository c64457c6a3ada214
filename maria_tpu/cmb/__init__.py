"""CMB skies (reference: maria/cmb/cmb.py:29-60, cmb/generation.py:36-104)."""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..constants import T_CMB  # noqa: F401
from ..healpix import alm2map, alm2map_spin, synalm, synalm_cmb
from ..healpix.sht import synalm_cmb_device
from ..io import caching as io_caching
from ..map.healpix import HEALPixMap
from ..map.projection import ProjectionMap
from .spectra import get_cmb_spectrum

logger = logging.getLogger("maria_tpu")

__all__ = ["CMB", "generate_cmb", "get_cmb", "generate_cmb_patch", "get_cmb_spectrum"]


class CMB(HEALPixMap):
    """An IQU CMB sky in K_CMB, galactic frame."""


def generate_cmb(nside: int = 256, lmax: int = None, seed: int = None, **kwargs) -> CMB:
    """Synthesize a polarized IQU CMB realization from the embedded ΛCDM
    TT/EE/BB/TE spectra: correlated (aT, aE, aB) draw, scalar SHT for T,
    spin-2 SHT for Q/U (reference: cmb/generation.py:36-58 via healpy).
    """
    import time as _time

    t0 = _time.perf_counter()
    lmax = lmax if lmax is not None else min(3 * nside - 1, 2500)
    spectra = get_cmb_spectrum(lmax=lmax)
    # draw the alm on device: only O(lmax) Cl vectors cross the host
    # boundary, and the synthesized maps stay on device for the sim
    aT, aE, aB = synalm_cmb_device(spectra, lmax=lmax, seed=seed if seed is not None else 0)
    T = alm2map(aT, nside)
    Q, U = alm2map_spin(aE, aB, nside)
    data = jnp.stack([T, Q, U])[:, None, None].astype(jnp.float32)
    logger.info(
        f"Generated IQU CMB realization (nside={nside}, lmax={lmax}) "
        f"in {_time.perf_counter() - t0:.2f} s."
    )
    return CMB(data=data, stokes="IQU", units="K_CMB", frame="galactic", nu=[150e9])


# Planck PLA SMICA IQU map (reference: maria/cmb/cmb.py:18)
PLANCK_CMB_URL = "https://pla.esac.esa.int/pla-sl/data-action?MAP.MAP_OID=15001"

# reference parity (cmb/cmb.py:11-26): sources and cache locations for
# the real-data path (fetch first, synthesize offline)
CMB_MAP_SOURCE_URL = PLANCK_CMB_URL
CMB_SPECTRUM_SOURCE_URL = (
    "https://github.com/thomaswmorris/maria-data/raw/master/cmb/spectra/"
    "COM_PowerSpect_CMB-base-plikHM-TTTEEE-lowl-lowE-lensing-minimum-theory_R3.01.txt"
)
CMB_MAP_CACHE_PATH = "cmb/planck.fits"
CMB_SPECTRUM_CACHE_PATH = "cmb/spectrum.txt"
CMB_MAP_CACHE_MAX_AGE = 30 * 86400
CMB_SPECTRUM_CACHE_MAX_AGE = 30 * 86400
CMB_SOURCES = {"planck": {"spectrum": "cmb/spectra/planck.csv"}}



def _generate_planck_stand_in(source_path: str, destination: str):
    """Offline generator for the fetch chain: a deterministic (seed=777)
    IQU realization of the best-fit spectra, written as a healpy-style
    FITS bintable so the read path is identical to the real product's."""
    from ..io.fits import write_fits_bintable

    logger.warning(
        "Planck CMB map unavailable from the network; generating a "
        "deterministic (seed=777) ΛCDM realization in its place.",
    )
    cmb = generate_cmb(nside=256, seed=777)
    T, Q, U = (np.asarray(cmb.data[i, 0, 0], dtype=np.float32) for i in range(3))
    ones = np.ones(len(T), dtype=np.float32)
    write_fits_bintable(
        destination,
        columns=[
            ("I_STOKES", "E", T, "K_CMB"),
            ("Q_STOKES", "E", Q, "K_CMB"),
            ("U_STOKES", "E", U, "K_CMB"),
            ("TMASK", "E", ones, ""),
            ("PMASK", "E", ones, ""),
        ],
        header_cards=[("ORDERING", "RING"), ("NSIDE", 256), ("COORDSYS", "G")],
    )


io_caching.register_generator("maps/planck_cmb.fits", _generate_planck_stand_in)


def get_cmb(**kwargs) -> CMB:
    """The observed (Planck SMICA) CMB sky, through the full fetch chain:
    cache → PLA download → offline stand-in realization (reference:
    maria/cmb/cmb.py:43-64). Masked pixels become NaN."""
    from ..io.fits import read_fits

    path = io_caching.fetch(
        "maps/planck_cmb.fits", url=PLANCK_CMB_URL, max_age=365 * 86400
    )
    header, table = next(
        (h, d) for h, d in read_fits(path) if d is not None and d.dtype.names
    )
    names = list(table.dtype.names)

    def col(*candidates):
        for c in candidates:
            if c in names:
                return np.asarray(table[c], dtype=np.float32)
        return None

    T = col("I_STOKES", "TEMPERATURE", "T")
    Q = col("Q_STOKES", "Q")
    U = col("U_STOKES", "U")
    tmask = col("TMASK", "T_MASK")
    pmask = col("PMASK", "P_MASK")
    if str(header.get("ORDERING", "RING")).strip().upper().startswith("NEST"):
        from ..healpix.core import reorder

        T, Q, U = (reorder(x, n2r=True) if x is not None else None for x in (T, Q, U))
        tmask, pmask = (
            reorder(x, n2r=True) if x is not None else None for x in (tmask, pmask)
        )
    if tmask is not None:
        T = np.where(tmask > 0, T, np.nan)
    if pmask is not None and Q is not None:
        Q = np.where(pmask > 0, Q, np.nan)
        U = np.where(pmask > 0, U, np.nan)
    if Q is None:
        Q = U = np.zeros_like(T)
    data = np.stack([T, Q, U])[:, None, None]
    return CMB(data=data, stokes="IQU", units="K_CMB", frame="galactic", nu=[143e9])


def generate_cmb_patch(
    width: float = 5.0,  # degrees
    resolution: float = None,  # degrees
    center=(0.0, 0.0),  # degrees
    frame: str = "ra/dec",
    nu: float = 150e9,
    seed: int = None,
    pad_factor: float = 1.5,
) -> ProjectionMap:
    """Flat-sky FFT realization of the TT spectrum
    (reference: cmb/generation.py:60-104)."""
    resolution = resolution if resolution is not None else width / 512
    n = int(round(width / resolution))
    n_pad = int(n * pad_factor)

    res_rad = np.radians(resolution)
    kx = 2 * np.pi * np.fft.fftfreq(n_pad, d=res_rad)
    ky = 2 * np.pi * np.fft.rfftfreq(n_pad, d=res_rad)
    ell = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)

    spectra = get_cmb_spectrum(lmax=int(min(ell.max() + 2, 20000)))
    cl = np.interp(ell, spectra["ell"], spectra["TT"])

    pixel_area = res_rad**2
    W = np.sqrt(np.clip(cl, 0, None) / pixel_area)

    rng = np.random.default_rng(seed)
    white = rng.standard_normal((n_pad, n_pad))
    field = np.fft.irfft2(np.fft.rfft2(white)[:, : len(ky)] * W, s=(n_pad, n_pad))

    lo = (n_pad - n) // 2
    patch = field[lo : lo + n, lo : lo + n].astype(np.float32)

    return ProjectionMap(
        data=patch[None, None, None],
        center=center,
        width=width,
        frame=frame,
        nu=[nu],
        units="K_CMB",
        degrees=True,
    )
