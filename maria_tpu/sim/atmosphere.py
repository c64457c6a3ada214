"""Atmosphere simulation mixin (reference: maria/sim/atmosphere.py:23-80)."""

from __future__ import annotations

import logging
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import RegularGridInterpolator, upsample_time

logger = logging.getLogger("maria_tpu")

DEFAULT_ATMOSPHERE_SIM_KWARGS = {}


class AtmosphereMixin:
    def _simulate_atmosphere(self, obs, key):
        """Run the turbulence processes at the coarse timestep and upsample
        the zenith-scaled PWV to the TOD rate."""
        sim_s = _time.monotonic()
        pwv_coarse = obs.atmosphere.simulate_pwv(instrument=obs.instrument, key=key)
        # relative times in float64 BEFORE casting to device f32 — absolute
        # unix times are not representable in float32
        t0 = float(obs.t[0])
        t_coarse = jnp.asarray(np.asarray(obs.atmosphere.boresight.t, dtype=np.float64) - t0, dtype=jnp.float32)
        t_fine = jnp.asarray(np.asarray(obs.t, dtype=np.float64) - t0, dtype=jnp.float32)
        obs.zenith_scaled_pwv = upsample_time(pwv_coarse, t_coarse, t_fine, kind="linear")
        logger.debug(f"Simulated PWV {tuple(pwv_coarse.shape)} in {_time.monotonic() - sim_s:.2f} s")

    def _compute_atmospheric_loading(self, obs):
        """Band-integrated emission at the coarse samples, cubic-upsampled
        to the TOD rate (reference hot loop #3)."""
        atm = obs.atmosphere
        pwv_coarse = atm.zenith_scaled_pwv  # (n_det, n_tc)
        el_coarse = jnp.clip(atm.det_el, None, jnp.pi / 2)
        t0 = float(obs.t[0])
        t_coarse = jnp.asarray(np.asarray(atm.boresight.t, dtype=np.float64) - t0, dtype=jnp.float32)
        t_fine = jnp.asarray(np.asarray(obs.t, dtype=np.float64) - t0, dtype=jnp.float32)
        T_base = float(atm.weather.temperature[0])

        stokes_I = jnp.asarray(obs.instrument.dets.mueller()[:, 0, 0], dtype=jnp.float32)

        loading_coarse = jnp.zeros(pwv_coarse.shape, dtype=jnp.float32)
        for band in obs.instrument.dets.bands:
            band_idx = np.where(obs.instrument.dets.band_name == band.name)[0]
            pwv_side, el_side, table = band.atmosphere_power_table(atm.spectrum, T_base)
            interp = RegularGridInterpolator((pwv_side, el_side), table)
            p = interp((pwv_coarse[band_idx], el_coarse[band_idx]))
            loading_coarse = loading_coarse.at[band_idx].set(
                stokes_I[band_idx, None] * p.astype(jnp.float32)
            )

        return upsample_time(loading_coarse, t_coarse, t_fine, kind="cubic")
