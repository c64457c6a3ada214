"""Input-sky simulation mixin (reference: maria/sim/map.py:29-190).

Scanning over a celestial map: per band, beam-smooth the input map,
calibrate each frequency channel K_RJ -> pW with atmosphere-aware
transmission, then sample with a Stokes-weighted bilinear gather and a
final [1/4, 1/2, 1/4] time kernel mimicking continuous integration.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..beam import compute_angular_fwhm
from ..constants import k_B
from ..coords.transforms import phi_theta_to_offsets_jit
from ..map import Map, get
from ..units import Quantity

logger = logging.getLogger("maria_tpu")

DEFAULT_MAP_SIM_KWARGS = {"bilinear_sampling": True}


def apply_integration_kernel(x):
    """[1/4, 1/2, 1/4] triangular kernel along the time axis, mimicking
    continuous integration (reference sim/map.py:167). Shared by the
    mixin and the fused program so the two paths stay provably equal."""
    padded = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
    return 0.25 * padded[:, :-2] + 0.5 * padded[:, 1:-1] + 0.25 * padded[:, 2:]


def map_offsets(input_map, pointing):
    """Tangent-plane offsets of each detector sample from the map center,
    in the map's frame; pure jnp, shape (n_det, n_t, 2)."""
    if input_map.frame in ("ra/dec", "icrs"):
        ra, dec = pointing.det_radec()
        pt = jnp.stack([ra, dec], axis=-1)
    else:  # az/el map
        az, el = pointing.det_azel()
        pt = jnp.stack([az, el], axis=-1)
    return phi_theta_to_offsets_jit(pt, input_map.center[0], input_map.center[1])


def check_map_observable(input_map):
    """Multi-slice z/v cubes cannot be observed (only time-labeled maps
    interpolate over the scan); shared by the fused-program and mixin
    entry points."""
    if input_map.axis3_label != "t" and len(input_map.t) > 1:
        raise NotImplementedError(
            f"Observing a multi-slice '{input_map.axis3_label}' cube is not supported; "
            f"pass one slice (e.g. map.data[:, :, i:i+1]) or a time-labeled map."
        )


def static_map_samples(input_map, band, band_idx, obs, bilinear: bool = True):
    """Host/build-time static sky timelines for the fused program's map
    stage: per overlapping frequency channel, the Stokes-weighted,
    beam-smoothed, time-blended K_RJ samples along the (static) pointing.
    Returns a list of (channel_index, samples (n_band_det, n_t) float32).
    Neither the pwv-dependent K_RJ -> pW calibration nor the
    [1/4, 1/2, 1/4] continuous-integration kernel is applied here: both
    happen in-program, calibration FIRST (matching the mixin's operation
    order — the kernel does not commute with a time-varying
    calibration)."""
    from ..tod.tod import Pointing

    stokes_weight = np.asarray(obs.instrument.dets.stokes_weight(), dtype=np.float32)
    band_fwhm = compute_angular_fwhm(
        fwhm_0=float(np.mean(obs.instrument.dets.primary_size)), z=np.inf, nu=band.center
    )
    smoothed = input_map.smooth(fwhm=Quantity(band_fwhm, "rad"))
    pointing = Pointing(obs.boresight, obs.offsets[band_idx], obs.q)
    offsets = map_offsets(input_map, pointing)

    check_map_observable(input_map)
    out = []
    n_frames = len(input_map.t)
    channel_map = smoothed.to("K_RJ", band=band)
    for channel, (nu_min, nu_max) in enumerate(input_map.nu_bin_bounds):
        if (band.nu.max() < float(nu_min.Hz)) or (float(nu_max.Hz) < band.nu.min()):
            continue
        if n_frames == 1:
            samples = channel_map.sample(
                offsets[..., 0], offsets[..., 1],
                stokes_weight=stokes_weight[band_idx],
                nu_index=channel, bilinear=bilinear,
            )
        else:
            t0 = float(obs.t[0])
            t_rel = jnp.asarray(np.asarray(obs.t, dtype=np.float64) - t0, dtype=jnp.float32)
            frame_t = jnp.asarray(np.asarray(input_map.t, dtype=np.float64) - t0, dtype=jnp.float32)
            fi = jnp.clip(jnp.searchsorted(frame_t, t_rel) - 1, 0, n_frames - 2)
            w_hi = jnp.clip(
                (t_rel - frame_t[fi]) / (frame_t[fi + 1] - frame_t[fi]), 0.0, 1.0
            ).astype(jnp.float32)
            samples = jnp.zeros((len(band_idx), len(obs.t)), dtype=jnp.float32)
            for f in range(n_frames):
                w_f = jnp.where(fi == f, 1 - w_hi, 0.0) + jnp.where(fi + 1 == f, w_hi, 0.0)
                samples = samples + w_f[None, :] * channel_map.sample(
                    offsets[..., 0], offsets[..., 1],
                    stokes_weight=stokes_weight[band_idx],
                    nu_index=channel, t_index=f, bilinear=bilinear,
                )
        out.append((channel, np.asarray(samples, dtype=np.float32)))
    return out


def map_transmission_table(band, input_map, channel, spectrum, base_temperature: float):
    """(n_pwv, n_el) pW-per-K_RJ calibration table for one map channel."""
    nu_min, nu_max = input_map.nu_bin_bounds[channel]
    PWV, EL = np.meshgrid(spectrum.side_zenith_pwv, spectrum.side_elevation, indexing="ij")
    table = 1e12 * k_B * band.compute_transmission_integral(
        nu_min_Hz=float(nu_min.Hz), nu_max_Hz=float(nu_max.Hz),
        spectrum=spectrum,
        base_temperature=np.full_like(PWV, base_temperature),
        zenith_pwv=PWV, elevation=EL,
    )
    return np.asarray(table, dtype=np.float32)


class MapMixin:
    def _initialize_map(self, map, **map_kwargs):  # noqa: A002
        kwargs = {k: v for k, v in map_kwargs.items() if k not in DEFAULT_MAP_SIM_KWARGS}
        if isinstance(map, str):
            self.map = get(map, **kwargs)
        elif isinstance(map, Map):
            self.map = map
        else:
            raise ValueError("'map' must be either a Map or a string.")
        from ..map.projection import ProjectionMap

        if not isinstance(self.map, ProjectionMap):
            from ..errors import IncompatibleMapError

            raise IncompatibleMapError(
                f"Cannot observe a {type(self.map).__name__} passed as 'map=': only "
                f"ProjectionMap skies can be scanned (the same limit as the reference, "
                f"maria/map/projection.py:173). Pass HEALPix all-sky realizations as "
                f"'cmb=' instead, or project the map to a ProjectionMap first."
            )
        check_map_observable(self.map)

    def _map_offsets(self, obs, band_idx):
        """Tangent-plane offsets of each detector sample from the map
        center, in the map's frame; pure jnp, shape (n_band, n_t, 2)."""
        from ..tod.tod import Pointing

        return map_offsets(self.map, Pointing(obs.boresight, obs.offsets[band_idx], obs.q))

    def _sample_maps(self, obs):
        bilinear = self.map_kwargs.get("bilinear_sampling", True)
        map_loading = jnp.zeros(obs.shape, dtype=jnp.float32)
        stokes_weight = jnp.asarray(obs.instrument.dets.stokes_weight(), dtype=jnp.float32)

        for band in obs.instrument.dets.bands:
            band_idx = np.where(obs.instrument.dets.band_name == band.name)[0]
            if len(band_idx) == 0:
                continue

            band_fwhm = compute_angular_fwhm(
                fwhm_0=float(np.mean(obs.instrument.dets.primary_size)), z=np.inf, nu=band.center
            )
            smoothed = self.map.smooth(fwhm=Quantity(band_fwhm, "rad"))
            offsets = self._map_offsets(obs, band_idx)

            band_loading = jnp.zeros((len(band_idx), obs.shape[-1]), dtype=jnp.float32)
            channel_map = smoothed.to("K_RJ", band=band)
            for channel, (nu_min, nu_max) in enumerate(self.map.nu_bin_bounds):
                if (band.nu.max() < float(nu_min.Hz)) or (float(nu_max.Hz) < band.nu.min()):
                    continue

                spectrum_kwargs = {}
                if getattr(obs, "atmosphere", None) is not None and hasattr(obs, "zenith_scaled_pwv"):
                    from ..tod.tod import Pointing

                    _, el = Pointing(obs.boresight, obs.offsets[band_idx], obs.q).det_azel()
                    spectrum_kwargs = {
                        "spectrum": obs.atmosphere.spectrum,
                        "zenith_pwv": obs.zenith_scaled_pwv[band_idx],
                        "base_temperature": obs.atmosphere.weather.temperature[0],
                        "elevation": jnp.clip(el, None, jnp.pi / 2),
                    }

                pW_per_K_RJ = 1e12 * k_B * band.compute_transmission_integral(
                    nu_min_Hz=float(nu_min.Hz), nu_max_Hz=float(nu_max.Hz), **spectrum_kwargs
                )

                n_frames = len(self.map.t)
                if n_frames == 1:
                    samples = channel_map.sample(
                        offsets[..., 0], offsets[..., 1],
                        stokes_weight=stokes_weight[band_idx],
                        nu_index=channel, bilinear=bilinear,
                    )
                else:
                    # time-evolving map: linear blend between the two
                    # bracketing frames (reference supports t-axis maps,
                    # maria/tests/sim/test_time_evolving.py)
                    t0 = float(obs.t[0])
                    t_rel = jnp.asarray(np.asarray(obs.t, dtype=np.float64) - t0, dtype=jnp.float32)
                    frame_t = jnp.asarray(np.asarray(self.map.t, dtype=np.float64) - t0, dtype=jnp.float32)
                    fi = jnp.clip(jnp.searchsorted(frame_t, t_rel) - 1, 0, n_frames - 2)
                    w_hi = jnp.clip(
                        (t_rel - frame_t[fi]) / (frame_t[fi + 1] - frame_t[fi]), 0.0, 1.0
                    ).astype(jnp.float32)
                    samples = jnp.zeros((len(band_idx), obs.shape[-1]), dtype=jnp.float32)
                    for f in range(n_frames):
                        w_f = jnp.where(fi == f, 1 - w_hi, 0.0) + jnp.where(fi + 1 == f, w_hi, 0.0)
                        frame_samples = channel_map.sample(
                            offsets[..., 0], offsets[..., 1],
                            stokes_weight=stokes_weight[band_idx],
                            nu_index=channel, t_index=f, bilinear=bilinear,
                        )
                        samples = samples + w_f[None, :] * frame_samples
                band_loading = band_loading + jnp.asarray(pW_per_K_RJ, dtype=jnp.float32) * samples

            map_loading = map_loading.at[band_idx].set(band_loading)

        obs.loading["map"] = apply_integration_kernel(map_loading)
