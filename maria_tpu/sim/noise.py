"""Noise simulation mixin (reference: maria/sim/noise.py:14-61)."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..noise import DEFAULT_NOISE_SIM_KWARGS, generate_noise_with_knee
from ..utils import compute_diameter, generate_spatial_basis

logger = logging.getLogger("maria_tpu")


class NoiseMixin:
    def _simulate_noise(self, obs, key):
        noise_loading = jnp.zeros(obs.shape, dtype=jnp.float32)

        for band in obs.instrument.dets.bands:
            key, band_key = jax.random.split(key)
            band_idx = np.where(obs.instrument.dets.band_name == band.name)[0]
            if len(band_idx) == 0:
                continue

            # total NEP includes photon loading (reference sim/noise.py:33)
            if band.NEP_per_loading and obs.loading:
                total_loading = sum(
                    1e-12 * d[band_idx] for d in obs.loading.values()
                )  # W
                total_NEP = band.NEP + band.NEP_per_loading * total_loading
            else:
                total_NEP = band.NEP

            band_offsets = obs.instrument.dets.offsets[band_idx]
            fov = compute_diameter(band_offsets)
            corr_prop = self.noise_kwargs.get("correlated_noise_proportion", 0.0)
            if fov > 0 and len(band_idx) > 16 and corr_prop > 0:
                basis = generate_spatial_basis(
                    offsets=band_offsets,
                    k=5,
                    n_side=16,
                    scale=fov * self.noise_kwargs.get("correlated_noise_spatial_scale", 1.0),
                )
            else:
                basis = None
                corr_prop = 0.0

            unscaled = generate_noise_with_knee(
                band_key,
                shape=(len(band_idx), obs.shape[-1]),
                sample_rate=obs.sample_rate,
                knee=band.knee,
                basis=basis,
                corr_prop=corr_prop,
            )

            # into picowatts
            noise_loading = noise_loading.at[band_idx].set(1e12 * total_NEP * unscaled)

        obs.loading["noise"] = noise_loading
