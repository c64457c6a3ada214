"""Map transfer functions (reference: maria/map/transfer.py:27-232).

Cross-spectrum estimate T(k) = Re<F_in* F_out> / <|F_in|^2> with an
apodizing window and log-spaced radial bins.
"""

from __future__ import annotations

import logging

import numpy as np
import scipy as sp

from ..units import Quantity

logger = logging.getLogger("maria_tpu")


class TransferFunction:
    """Result container: `tf` is (n_bins,) for one channel or
    (n_nu, n_bins) for several (reference map/transfer.py:149)."""

    def __init__(self, k, tf, k_err=None, tf_err=None, input_map=None, output_map=None,
                 nu=None, beam_fwhm=None):
        self.k = k  # rad^-1
        self.tf = tf
        self.tf_err = tf_err
        self.input_map = input_map
        self.output_map = output_map
        self.nu = nu
        self.beam_fwhm = beam_fwhm

    @property
    def T(self):
        return np.atleast_2d(self.tf)

    def __call__(self, k, nu_index: int = 0):
        return np.interp(k, self.k, self.T[nu_index])

    def plot(self, ax=None, x_unit: str = "arcmin", filename: str = None,
             add_beam: bool = True, slices: dict = None, **kwargs):
        """(reference map/transfer.py:172): curves vs angular scale, with
        Gaussian beam overlays; `slices=dict(nu=[0])` selects channels."""
        T = self.T
        nu = np.atleast_1d(self.nu) if self.nu is not None else None
        beam = np.atleast_1d(self.beam_fwhm) if self.beam_fwhm is not None else None
        if slices and "nu" in slices:
            sel = np.atleast_1d(np.asarray(slices["nu"])).ravel()
            T = T[sel]
            nu = nu[sel] if nu is not None else None
            beam = beam[sel] if beam is not None else None
        return plot_transfer_function(
            self.k, T, nu=nu, beam_fwhm=beam if add_beam else None,
            ax=ax, x_unit=x_unit, filename=filename,
        )

    def __repr__(self):
        n_nu = self.T.shape[0]
        return (f"TransferFunction({n_nu} channel{'s' if n_nu != 1 else ''}, "
                f"k=[{np.min(self.k):.1f}, {np.max(self.k):.1f}] rad^-1)")


def compute_transfer_function(
    input_map,
    output_map,
    window="tukey",
    taper: float = 0.5,
    n_bins: int = 32,
    pad_factor: float = 1.0,
    stokes_index: int = 0,
    nu_index: int = 0,
    input_nu_index: int = None,
    t_index: int = 0,
):
    """(reference transfer.py:27-146). `window` may be a scipy window
    name, True (hann) or False (no apodization); `taper` is the tukey
    alpha."""
    if window is True:
        window = "hann"
    elif window is False or window is None:
        window = "boxcar"
    in_nu = input_nu_index if input_nu_index is not None else min(nu_index, input_map.n_nu - 1)
    d_in = np.asarray(input_map.data[stokes_index, in_nu, t_index], dtype=float)
    d_out = np.nan_to_num(np.asarray(output_map.data[stokes_index, nu_index, t_index], dtype=float))

    if d_in.shape != d_out.shape:
        raise ValueError(f"Map shapes differ: {d_in.shape} vs {d_out.shape}.")

    ny, nx = d_in.shape
    w2d = np.outer(sp.signal.get_window((window, taper) if window == "tukey" else window, ny),
                   sp.signal.get_window((window, taper) if window == "tukey" else window, nx))

    valid = np.asarray(output_map.weight[stokes_index, nu_index, t_index]) > 0
    w2d = w2d * valid
    d_in = (d_in - d_in[valid].mean() if valid.any() else d_in) * w2d
    d_out = d_out * w2d

    if pad_factor > 1:
        py, px = int(ny * (pad_factor - 1) / 2), int(nx * (pad_factor - 1) / 2)
        d_in = np.pad(d_in, ((py, py), (px, px)))
        d_out = np.pad(d_out, ((py, py), (px, px)))
        ny, nx = d_in.shape

    res_y = output_map.y_res
    res_x = output_map.x_res
    F_in = np.fft.rfft2(d_in)
    F_out = np.fft.rfft2(d_out)
    ky = np.fft.fftfreq(ny, d=res_y)
    kx = np.fft.rfftfreq(nx, d=res_x)
    k = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)

    cross = np.real(np.conj(F_in) * F_out)
    auto = np.abs(F_in) ** 2

    k_pos = k[k > 0]
    bins = np.geomspace(k_pos.min(), k.max(), n_bins + 1)
    idx = np.digitize(k.ravel(), bins) - 1
    tf = np.full(n_bins, np.nan)
    kc = np.sqrt(bins[:-1] * bins[1:])
    for i in range(n_bins):
        sel = idx == i
        denom = auto.ravel()[sel].sum()
        if denom > 0:
            tf[i] = cross.ravel()[sel].sum() / denom

    good = np.isfinite(tf)
    return TransferFunction(k=kc[good], tf=tf[good], input_map=input_map, output_map=output_map)


def plot_transfer_function(
    u, T, nu=None, beam_fwhm=None, ax=None, x_unit: str = "arcmin", filename: str = None
):
    """Plot transfer-function curves against angular scale, with optional
    per-channel Gaussian beam overlays (reference: maria/map/transfer.py:225).

    u: spatial frequency bin centers [rad^-1]; T: (n_nu, n_bins) or (n_bins,).
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 4), constrained_layout=True)
    per_rad = {"arcsec": 206264.8, "arcmin": 3437.75, "deg": 57.29578}[x_unit]
    u = np.asarray(u)
    T = np.atleast_2d(np.asarray(T))
    if nu is not None and len(np.atleast_1d(nu)) != len(T):
        raise ValueError(f"Got {len(T)} curves but {len(np.atleast_1d(nu))} frequencies.")
    if beam_fwhm is not None and len(np.atleast_1d(beam_fwhm)) != len(T):
        raise ValueError(f"Got {len(T)} curves but {len(np.atleast_1d(beam_fwhm))} beam widths.")
    labels = (
        [f"{Quantity(v, 'Hz')}" for v in np.atleast_1d(np.asarray(nu, dtype=float))]
        if nu is not None
        else [None] * len(T)
    )
    for i, row in enumerate(T):
        (line,) = ax.semilogx(per_rad / u, row, label=labels[i])
        if beam_fwhm is not None:
            fwhm = np.atleast_1d(beam_fwhm)[i]
            sigma = fwhm / np.sqrt(8 * np.log(2))
            ax.semilogx(
                per_rad / u,
                np.exp(-2 * (np.pi * sigma * u) ** 2),
                ls="--", lw=1, color=line.get_color(), alpha=0.6,
            )
    ax.axhline(1.0, color="gray", ls=":")
    ax.set_xlabel(f"angular scale [{x_unit}]")
    ax.set_ylabel(r"$T$")
    if nu is not None:
        ax.legend()
    if filename:
        ax.figure.savefig(filename)
    return ax
