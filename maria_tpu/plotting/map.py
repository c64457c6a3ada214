"""Map plotting (reference: maria/plotting/map.py)."""

from __future__ import annotations

import numpy as np

# a CMB-like diverging colormap registered as "cmb"
_CMB_COLORS = ["#00007f", "#0000ff", "#00ffff", "#ffff00", "#ff0000", "#7f0000"]


def _register_cmb_cmap():
    import matplotlib as mpl
    from matplotlib.colors import LinearSegmentedColormap

    if "cmb" not in mpl.colormaps:
        mpl.colormaps.register(LinearSegmentedColormap.from_list("cmb", _CMB_COLORS))


def plot_projection_map(m, nu_index=0, t_index=0, stokes="I", ax=None, cmap="cmb", **kwargs):
    import matplotlib.pyplot as plt

    _register_cmb_cmap()
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(6, 5))
    s = m.stokes.index(stokes)
    data = np.asarray(m.data[s, nu_index, t_index])
    extent = np.degrees([m.x_side[0], m.x_side[-1], m.y_side[0], m.y_side[-1]])
    im = ax.imshow(data, origin="lower", extent=extent, cmap=cmap, **kwargs)
    ax.set_xlabel(r"$\Delta x$ [deg]")
    ax.set_ylabel(r"$\Delta y$ [deg]")
    plt.colorbar(im, ax=ax, label=m.units)
    return ax
