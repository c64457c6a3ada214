"""Mapper base (reference: maria/mappers/base.py:27-345).

Handles geometry inference from TOD pointing, per-TOD preprocessing,
Stokes inference from detector Mueller sensitivity, and shared
postprocessing into a ProjectionMap.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..coords import Frame
from ..map.projection import ProjectionMap
from ..units import Quantity, parse_units

logger = logging.getLogger("maria_tpu")


class BaseMapper:
    """Geometry-agnostic mapper bookkeeping (reference: mappers/base.py:27):
    unit plumbing, per-TOD preprocessing, Stokes/band inference, time
    bins, and shared postprocessing."""

    def __init__(
        self,
        tods,
        frame: str = "ra/dec",
        units: str = "K_RJ",
        tod_preprocessing: dict = {},
        map_postprocessing: dict = {},
        t_bins: int = 1,
        timestep: float = None,
        stokes: str = None,
        progress_bars: bool = False,
    ):
        self.frame = Frame(frame)
        self.units = units
        # TODs can only carry power/temperature quantities; for map-only
        # units (Jy/pixel, ...) accumulate in K_RJ and convert the final
        # map (reference base.py:46-54)
        from ..tod.tod import VALID_TOD_QUANTITIES

        self.tod_units = (
            units if parse_units(units).quantity in VALID_TOD_QUANTITIES else "K_RJ"
        )
        self.t_bins = t_bins
        self.progress_bars = progress_bars
        self.map_postprocessing = dict(map_postprocessing)

        tods = tods if isinstance(tods, (list, tuple)) else [tods]
        self.tods = []
        for tod in tods:
            self.add_tod(tod, preprocessing=tod_preprocessing)

        # Stokes inference from detector sensitivity (reference base.py:80-87)
        sw = np.concatenate([tod.dets.stokes_weight() for tod in self.tods], axis=0)
        self.stokes = "".join(s for i, s in enumerate("IQUV") if np.abs(sw[:, i]).max() > 1e-8)
        if stokes is not None:  # explicit override (reference BinMapper kwarg)
            self.stokes = stokes

        # the simulation's input map rides along on the TOD metadata so
        # output maps can compute transfer functions without re-supplying
        # it (reference base.py:341-343)
        input_maps = [tod.metadata["input_map"] for tod in self.tods
                      if tod.metadata and tod.metadata.get("input_map") is not None]
        self._input_map = input_maps[0] if input_maps else None

        # one frequency channel per band
        self.bands = []
        seen = set()
        for tod in self.tods:
            for band in tod.dets.bands:
                if band.name not in seen:
                    self.bands.append(band)
                    seen.add(band.name)
        self.bands.sort(key=lambda b: b.center)
        self.nu = np.array([b.center for b in self.bands])

        # time bins across the combined span; `timestep` (seconds per
        # bin, reference docs usage/mapping) is an alternative to t_bins
        t_min = min(float(tod.time.min()) for tod in self.tods)
        t_max = max(float(tod.time.max()) for tod in self.tods) + 1e-6
        if timestep is not None:
            t_bins = max(int(np.ceil((t_max - t_min) / float(timestep))), 1)
            self.t_bins = t_bins
        self.t_edges = np.linspace(t_min, t_max, t_bins + 1)
        self.t_centers = 0.5 * (self.t_edges[1:] + self.t_edges[:-1])

    def add_tod(self, tod, preprocessing: dict = {}):
        if preprocessing:
            processed = tod.process(**preprocessing)
        else:
            processed = tod
        if processed.units != self.tod_units:
            # processing collapses fields into 'signal'; keep dets/pointing
            processed = processed.to(self.tod_units) if processed.dets is not None else processed
        self.tods.append(processed)

    def postprocess(self, sums, weights):
        """Shared postprocessing (reference base.py:164-198): optional
        Gaussian smoothing of sums and weights, then the zero-mean
        convention per (stokes, nu, t) slice."""
        from scipy.ndimage import gaussian_filter

        sums = np.asarray(sums, dtype=np.float64)
        weights = np.asarray(weights, dtype=np.float64)

        sigma = self.map_postprocessing.get("gaussian_filter", {}).get("sigma", 0)
        if sigma:
            sums = gaussian_filter(sums, sigma=(0, 0, 0, sigma, sigma))
            weights = gaussian_filter(weights, sigma=(0, 0, 0, sigma, sigma))

        size = self.map_postprocessing.get("median_filter", {}).get("size", 0)
        if size and size > 1:
            from scipy.ndimage import median_filter

            sums = median_filter(sums, size=(1, 1, 1, size, size))
            weights = median_filter(weights, size=(1, 1, 1, size, size))

        with np.errstate(invalid="ignore", divide="ignore"):
            m = sums / weights
        if not self.map_postprocessing.get("keep_mean", False):
            for idx in np.ndindex(m.shape[:3]):
                valid = weights[idx] > 0
                if valid.any():
                    m[idx] -= m[idx][valid].mean()
        m = np.where(weights > 0, m, np.nan)
        return m, weights


class BaseProjectionMapper(BaseMapper):
    """BaseMapper + tangent-plane map geometry inferred from the TOD
    hulls (reference: mappers/base.py:205-345)."""

    def __init__(
        self,
        tods,
        center=None,
        width=None,
        height=None,
        resolution=None,
        frame: str = "ra/dec",
        units: str = "K_RJ",
        degrees: bool = True,
        tod_preprocessing: dict = {},
        map_postprocessing: dict = {},
        t_bins: int = 1,
        timestep: float = None,
        stokes: str = None,
        target=None,
        progress_bars: bool = False,
    ):
        if target is not None:
            # copy the geometry of a target map (reference docs
            # tutorials/custom-map-simulations: BinMapper(target=input_map))
            center = center if center is not None else tuple(np.degrees(target.center))
            width = width if width is not None else float(np.degrees(target.width))
            height = height if height is not None else float(np.degrees(target.height))
            resolution = resolution if resolution is not None else float(np.degrees(target.resolution))
            frame = target.frame
        # unit-carrying sizes (e.g. resolution=input_map.resolution)
        # convert to the caller's angular convention
        if hasattr(width, "deg"):
            width = float(width.deg) if degrees else float(width.rad)
        if hasattr(height, "deg"):
            height = float(height.deg) if degrees else float(height.rad)
        if hasattr(resolution, "deg"):
            resolution = float(resolution.deg) if degrees else float(resolution.rad)
        if center is not None:
            # angle Quantities (e.g. center=tod.coords.center()) convert
            # to the caller's angular convention instead of failing in jit
            center = tuple(
                (float(c.deg) if degrees else float(c.rad)) if hasattr(c, "deg") else c
                for c in center
            )
        super().__init__(
            tods,
            frame=frame,
            units=units,
            tod_preprocessing=tod_preprocessing,
            map_postprocessing=map_postprocessing,
            t_bins=t_bins,
            timestep=timestep,
            stokes=stokes,
            progress_bars=progress_bars,
        )

        to_rad = np.pi / 180 if degrees else 1.0

        # geometry inference from the TOD boresight + array footprint
        # (reference base.py:231-274)
        if center is None or width is None:
            centers, extents = [], []
            for tod in self.tods:
                c = tod.pointing.boresight.center(frame=self.frame)
                centers.append((float(np.asarray(c[0])), float(np.asarray(c[1]))))
            center_inferred = (
                float(np.mean([c[0] for c in centers])),
                float(np.mean([c[1] for c in centers])),
            )
            if center is None:
                center_rad = center_inferred
            else:
                center_rad = (center[0] * to_rad, center[1] * to_rad)
            max_half = 0.0
            for tod in self.tods:
                bs_off = tod.pointing.boresight.offsets(frame=self.frame, center=center_rad)
                det_r = np.abs(tod.pointing.offsets).max() if tod.pointing.offsets.size else 0.0
                max_half = max(max_half, np.abs(bs_off).max() + det_r)
            width_rad = 2.05 * max_half
            height_rad = width_rad
        else:
            center_rad = (center[0] * to_rad, center[1] * to_rad)
            width_rad = width * to_rad
            height_rad = (height if height is not None else width) * to_rad

        if resolution is None:
            # half the smallest detector beam FWHM (reference base.py:231-233)
            res_rad = min(
                float(np.nanmin(tod.dets.angular_fwhm(np.inf).rad)) for tod in self.tods
            ) / 2
            logger.info(f"Inferred map resolution {np.degrees(res_rad):.2e} deg from detector FWHM.")
        else:
            res_rad = resolution * to_rad

        self.center = center_rad
        self.n_x = max(int(np.ceil(width_rad / res_rad)), 1)
        self.n_y = max(int(np.ceil(height_rad / res_rad)), 1)
        self.res = res_rad

    def make_map(self, data, weights) -> ProjectionMap:
        out = ProjectionMap(
            data=jnp.asarray(np.nan_to_num(data), dtype=jnp.float32),
            weight=jnp.asarray(weights, dtype=jnp.float32),
            center=np.degrees(self.center),
            resolution=np.degrees(self.res),
            frame=self.frame.name,
            stokes=self.stokes,
            nu=self.nu,
            t=self.t_centers,
            units=self.tod_units,
            degrees=True,
        )
        if self.units != self.tod_units:
            out = out.to(self.units)
        out._input_map = self._input_map
        try:
            fwhms = []
            for band in self.bands:
                det_sel = [
                    float(np.nanmean(np.asarray(tod.dets.angular_fwhm(np.inf).rad)[
                        np.asarray(tod.dets.band_name) == band.name]))
                    for tod in self.tods
                    if (np.asarray(tod.dets.band_name) == band.name).any()
                ]
                fwhms.append(float(np.nanmean(det_sel)) if det_sel else np.nan)
            out._beam_fwhm = fwhms
        except Exception:  # noqa: BLE001 — beam overlay is cosmetic
            out._beam_fwhm = None
        return out
