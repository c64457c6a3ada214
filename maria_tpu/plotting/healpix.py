"""HEALPix map plotting (reference: maria/plotting/healpix.py, which
wraps healpy.mollview). Self-contained: a mollweide projection of a
ring-scheme map via matplotlib's built-in mollweide axes."""

from __future__ import annotations

import numpy as np

from ..healpix.core import npix2nside, pix2ang_ring


def plot_healpix_map(
    m, nu_index: int = 0, t_index: int = 0, stokes: str = "I", ax=None,
    cmap: str = "cmb", vmin=None, vmax=None, n_grid: int = 400, **kwargs
):
    """Mollweide view of one (stokes, nu, t) slice of a HEALPixMap.

    The sphere is rasterized onto an (n_grid x 2 n_grid) lon/lat grid by
    nearest-pixel lookup (exactly what healpy.mollview does internally),
    then drawn with pcolormesh on mollweide axes.
    """
    import matplotlib.pyplot as plt

    from .map import _register_cmb_cmap
    from ..healpix.core import ang2pix_ring

    _register_cmb_cmap()
    if ax is None:
        fig = plt.figure(figsize=(8, 4.5))
        ax = fig.add_subplot(111, projection="mollweide")

    data = np.asarray(m.data)
    s = m.stokes.index(stokes) if getattr(m, "stokes", None) else 0
    values = data[s, nu_index, t_index] if data.ndim == 4 else data.ravel()
    nside = npix2nside(len(values))

    lon = np.linspace(-np.pi, np.pi, 2 * n_grid)
    lat = np.linspace(-np.pi / 2, np.pi / 2, n_grid)
    LON, LAT = np.meshgrid(lon, lat)
    theta = np.pi / 2 - LAT
    phi = np.mod(LON, 2 * np.pi)
    pix = np.asarray(ang2pix_ring(nside, theta, phi))
    img = np.asarray(values)[pix]

    im = ax.pcolormesh(LON, LAT, img, cmap=cmap, vmin=vmin, vmax=vmax, rasterized=True, **kwargs)
    ax.grid(True, alpha=0.3)
    plt.colorbar(im, ax=ax, shrink=0.7, label=getattr(m, "units", ""))
    return ax
