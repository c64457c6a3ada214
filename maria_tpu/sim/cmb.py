"""CMB simulation mixin (reference: maria/sim/cmb.py:28-140)."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import T_CMB, k_B
from ..functions.radiometry import inverse_rayleigh_jeans_spectrum, planck_spectrum
from ..ops import RegularGridInterpolator, upsample_time

logger = logging.getLogger("maria_tpu")

# reference default (sim/cmb.py:25). Feasible everywhere now that the
# SHT synthesis runs on the native kernels (~1 min even on one core).
DEFAULT_CMB_SIM_KWARGS = {"nside": 1024}


def cmb_power_tables(band, spectrum, base_temperature: float, eps: float = 1e-6):
    """Host-precomputed (pwv, el) -> (P(T_CMB) [pW], dP/dT_CMB [pW/K])
    tables at a fixed base temperature, for the fused program's CMB
    stage (physics of _cmb_power_grids, reference sim/cmb.py:63-100,
    with the T_base axis collapsed like Band.atmosphere_power_table)."""
    from scipy.interpolate import interp1d

    nu = band.nu
    test_T_b = np.array([T_CMB, T_CMB + eps])
    test_T_RJ = inverse_rayleigh_jeans_spectrum(
        planck_spectrum(test_T_b[None], nu[:, None]), nu[:, None]
    )  # (n_nu, 2)

    op = interp1d(spectrum.side_nu, spectrum._opacity, axis=-1)(nu)  # (T, pwv, el, n_nu)
    # integrate over the FULL T grid first, then collapse at T0 — the
    # same operation order as the mixin's grid interpolation, so the
    # fused and mixin paths agree to float precision
    P_T = 1e12 * k_B * np.trapezoid(
        test_T_RJ[None, None, None] * (np.exp(-op) * band.passband(nu))[..., None], x=nu, axis=-2
    )  # (T, pwv, el, 2)
    T_sides = spectrum.side_base_temperature
    i = int(np.clip(np.searchsorted(T_sides, base_temperature) - 1, 0, len(T_sides) - 2))
    w = np.clip((base_temperature - T_sides[i]) / (T_sides[i + 1] - T_sides[i]), 0, 1)
    P = (1 - w) * P_T[i] + w * P_T[i + 1]  # (pwv, el, 2)
    return (
        np.asarray(spectrum.side_zenith_pwv),
        np.asarray(spectrum.side_elevation),
        np.asarray(P[..., 0], dtype=np.float32),
        np.asarray((P[..., 1] - P[..., 0]) / eps, dtype=np.float32),
    )


class CMBMixin:
    def _init_cmb(self, cmb, **cmb_kwargs):
        from ..cmb import CMB, generate_cmb, get_cmb

        if isinstance(cmb, str) and cmb in ["spectrum", "power_spectrum", "generate", "generated"]:
            self.cmb = generate_cmb(seed=self.seed, **cmb_kwargs)
        elif isinstance(cmb, str) and cmb in ["real", "planck"]:
            self.cmb = get_cmb(**cmb_kwargs)
        elif hasattr(cmb, "data"):
            self.cmb = cmb
        else:
            raise ValueError(f"Invalid value for cmb '{cmb}'.")

        if self.cmb.units != "K_CMB":
            self.cmb = self.cmb.to("K_CMB")

    def _cmb_power_grids(self, obs, band, eps: float = 1e-6):
        """Per-band (P(T_CMB), dP/dT_CMB) over the detector samples.

        The CMB is not a Rayleigh-Jeans source: integrate the Planck
        spectrum through the passband (and atmospheric transmission if
        present) at T_CMB and T_CMB + eps (reference sim/cmb.py:63-100).
        """
        nu = band.nu  # band's native grid
        test_T_b = np.array([T_CMB, T_CMB + eps])
        test_T_RJ = inverse_rayleigh_jeans_spectrum(
            planck_spectrum(test_T_b[None], nu[:, None]), nu[:, None]
        )  # (n_nu, 2)

        band_idx = np.where(obs.instrument.dets.band_name == band.name)[0]

        if hasattr(obs, "atmosphere"):
            spectrum = obs.atmosphere.spectrum
            # interpolate the opacity grid onto the band's nu grid and do the
            # two-point bandpass integrals over the (T_base, pwv, el) grid
            from scipy.interpolate import interp1d

            op = interp1d(spectrum.side_nu, spectrum._opacity, axis=-1)(nu)  # (T_base, pwv, el, n_nu)
            det_power_grid = (
                1e12 * k_B * np.trapezoid(
                    test_T_RJ[None, None, None] * (np.exp(-op) * band.passband(nu))[..., None],
                    x=nu, axis=-2,
                )
            )  # (T_base, pwv, el, 2)
            interp = RegularGridInterpolator(spectrum.points[:3], det_power_grid)
            T0 = float(obs.atmosphere.weather.temperature[0])
            pwv = obs.zenith_scaled_pwv[band_idx]
            from ..tod.tod import Pointing

            pointing = Pointing(obs.boresight, obs.offsets, obs.q)
            _, el_full = pointing.det_azel()
            P = interp((jnp.float32(T0), pwv, jnp.clip(el_full[band_idx], None, jnp.pi / 2)))
        else:
            P = 1e12 * k_B * np.trapezoid(
                test_T_RJ * band.passband(nu)[:, None], x=nu, axis=-2
            )  # (2,)
            P = jnp.asarray(P)[None, None, :]

        P0 = P[..., 0]
        dP_dT = (P[..., 1] - P[..., 0]) / eps
        return P0, dP_dT

    def _compute_cmb_loading(self, obs):
        from ..tod.tod import Pointing

        cmb_loading = jnp.zeros(obs.shape, dtype=jnp.float32)
        stokes_weight = jnp.asarray(obs.instrument.dets.stokes_weight(), dtype=jnp.float32)
        pointing = Pointing(obs.boresight, obs.offsets, obs.q)

        for band in obs.instrument.dets.bands:
            band_idx = np.where(obs.instrument.dets.band_name == band.name)[0]
            if len(band_idx) == 0:
                continue
            P0, dP_dT = self._cmb_power_grids(obs, band)

            # sample the CMB map along the line of sight, per Stokes
            sub_pointing = pointing[band_idx]
            samples = self.cmb.sample_stokes(sub_pointing, stokes_weight[band_idx])  # K_CMB

            band_loading = P0 * stokes_weight[band_idx, 0][:, None] + dP_dT * samples
            cmb_loading = cmb_loading.at[band_idx].set(band_loading.astype(jnp.float32))
        return cmb_loading
