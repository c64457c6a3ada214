"""Line-of-sight screen sampling — the single numerically authoritative
implementation shared by `Atmosphere.simulate_pwv` and the fused
`TODProgram` (they previously carried divergent copies).

Pure jnp; everything here is called under jit. Geometry convention:
(px, py) are unit-height east/north line-of-sight projections per
(detector, coarse time); a screen at height h is sampled at
x = h*px + vx*t, y = h*py + vy*t, rotated into its extrusion frame by
`angle`. Reference behavior: maria/atmosphere/atmosphere.py:341-366.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_bilinear_uniform, interp_bilinear_windowed
from .fourier import synthesize_layered_matern_2d, synthesize_matern_field_2d

__all__ = ["accumulate_pwv", "gaussian_blur_2d"]


def gaussian_blur_2d(values, sigma_y, sigma_x, res_y, res_x):
    """Periodic FFT Gaussian blur (AR-path analogue of the reference's
    scipy gaussian_filter, maria/atmosphere/atmosphere.py:341-344)."""
    ny, nx = values.shape
    ky = 2 * jnp.pi * jnp.fft.fftfreq(ny, d=res_y)
    kx = 2 * jnp.pi * jnp.fft.rfftfreq(nx, d=res_x)
    G = jnp.exp(-0.5 * (sigma_y**2 * ky[:, None] ** 2 + sigma_x**2 * kx[None, :] ** 2))
    return jnp.fft.irfft2(jnp.fft.rfft2(values) * G, s=(ny, nx))


def _sample_layer(
    values, h, angle, vx, vy, res_x, res_y, tx_min, ty_min,
    win_x, win_y, px, py, bs_px, bs_py, t_rel,
):
    """Sample one screen at the wind-advected LOS points of every
    (detector, coarse-time) sample; windowed MXU path when the static
    window is small relative to the screen."""
    x = h * px + vx * t_rel
    y = h * py + vy * t_rel
    ca, sa = np.cos(angle), np.sin(angle)
    tx = ca * x + sa * y
    ty = -sa * x + ca * y
    ny, nx = values.shape
    windowed = (
        win_x is not None
        and bs_px is not None
        and win_x * win_y <= 0.5 * nx * ny
    )
    if windowed:
        cx_b = ca * (h * bs_px + vx * t_rel) + sa * (h * bs_py + vy * t_rel)
        cy_b = -sa * (h * bs_px + vx * t_rel) + ca * (h * bs_py + vy * t_rel)
        return interp_bilinear_windowed(
            values, tx, ty, cx_b, cy_b, tx_min, res_x, ty_min, res_y, win_x, win_y
        )
    return interp_bilinear_uniform(values, tx, ty, tx_min, res_x, ty_min, res_y)


def accumulate_pwv(
    key, mean_pwv, screens, groups, px, py, bs_px, bs_py, t_rel, ar_values=None
):
    """Zenith-scaled PWV (n_det, n_t) in mm: mean + sum of per-layer
    turbulence samples.

    `screens` are independent per-layer fields: fourier screens carry
    spectral weights `W`; AR screens (W is None) read their extruded
    values from `ar_values[i]` and get beam-blurred here. `groups` are
    vertically-correlated stacks (the 3-D model) synthesized jointly.
    """
    pwv = jnp.full(px.shape, jnp.float32(mean_pwv))
    n_draws = len(screens) + len(groups)
    keys = jax.random.split(key, max(n_draws, 1))

    for i, screen in enumerate(screens):
        ty_res = screen.ty_res if screen.ty_res is not None else screen.res
        if screen.W is not None:
            values = synthesize_matern_field_2d(
                keys[i], jnp.asarray(screen.W), screen.ny, screen.nx
            )
        else:
            if ar_values is None or i not in ar_values:
                raise ValueError("AR screen values missing; run the process first.")
            values = ar_values[i]
            if screen.beam_sigma > 0:
                values = gaussian_blur_2d(
                    values, screen.beam_sigma, screen.beam_sigma, ty_res, screen.res
                )
        sample = _sample_layer(
            values, screen.h, screen.angle, screen.vx, screen.vy,
            screen.res, ty_res, screen.tx_min, screen.ty_min,
            screen.win_x, screen.win_y, px, py, bs_px, bs_py, t_rel,
        )
        pwv = pwv + screen.pwv_rms * sample

    for g, group in enumerate(groups):
        stack = synthesize_layered_matern_2d(
            keys[len(screens) + g],
            jnp.asarray(group.W),
            jnp.asarray(group.M_cos),
            jnp.asarray(group.M_sin),
            None if group.beam is None else jnp.asarray(group.beam),
            group.ny,
            group.nx,
        )
        for il, h in enumerate(group.heights):
            sample = _sample_layer(
                stack[il], float(h), group.angle, group.vx, group.vy,
                group.res, group.res, group.tx_min, group.ty_min,
                None if group.win_x is None else int(group.win_x[il]),
                None if group.win_y is None else int(group.win_y[il]),
                px, py, bs_px, bs_py, t_rel,
            )
            pwv = pwv + float(group.pwv_rms[il]) * sample

    return pwv
