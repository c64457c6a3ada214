"""Time-tagged pointing container with lazy frame transforms.

API parity with the reference Coordinates (maria/coords/coordinates.py:45),
but the transform strategy is different: where the reference fits 3x3
linear maps to astropy on a fiducial grid and interpolates (:94-235), we
evaluate our closed-form ephemeris rotation matrix at every timestamp in
float64 on the host and apply it as a batched matmul — exact within the
ephemeris model and faster than the fiducial fit for any n_t.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import scipy as sp

from ..units import Quantity
from . import ephemeris as eph
from .earth import DEFAULT_EARTH_LOCATION, EarthLocation
from .frame import Frame
from .transforms import (
    get_center_phi_theta,
    offsets_to_phi_theta,
    phi_theta_to_offsets,
)

logger = logging.getLogger("maria_tpu")


def _unit_xyz(phi, theta):
    cos_t = np.cos(theta)
    return np.stack([np.cos(phi) * cos_t, np.sin(phi) * cos_t, np.sin(theta)], axis=-1)


def _phi_theta(xyz):
    norm = np.sqrt(np.sum(xyz**2, axis=-1))
    phi = np.arctan2(xyz[..., 1], xyz[..., 0]) % (2 * np.pi)
    theta = np.arcsin(np.clip(xyz[..., 2] / norm, -1, 1))
    return phi, theta


def _normalize(v):
    return v / np.sqrt(np.sum(v**2, axis=-1, keepdims=True))


# reference parity (coords/coordinates.py:42): a deterministic stand-in
# epoch for examples/tests. Time-less Coordinates use the wall clock at
# construction instead, which matches the reference's intent ("now").
DEFAULT_TIMESTAMP = 1.75e9


class Coordinates:
    """Pointing with shape (..., n_t): time is always the last axis."""

    def __init__(
        self,
        phi=0.0,
        theta=0.0,
        t=None,
        earth_location: EarthLocation = DEFAULT_EARTH_LOCATION,
        frame: str = "az/el",
        dtype=np.float64,
    ):
        import time as _time

        self.earth_location = earth_location
        self.frame = Frame(frame)
        self.dtype = dtype

        t = _time.time() if t is None else t
        phi, theta, t = np.broadcast_arrays(
            np.asarray(phi, dtype=dtype), np.asarray(theta, dtype=dtype), np.asarray(t, dtype=np.float64)
        )
        self._phi = phi
        self._theta = theta
        self.t = t[(0,) * (t.ndim - 1)] if t.ndim > 1 else np.atleast_1d(t)

        if t.ndim > 1 and np.ptp(t.reshape(-1, t.shape[-1]), axis=0).max() > 0:
            raise ValueError("Only the last axis can vary in time.")

        # cache of computed frames: name -> (phi, theta)
        self._frames = {self.frame.name: (self._phi, self._theta)}
        self.centers = {}

    # -- core transform machinery ---------------------------------------------
    @functools.cached_property
    def _icrs_to_tod(self):
        return eph.icrs_to_tod_matrix(self.t)

    @functools.cached_property
    def _enu_to_tod(self):
        return eph.enu_to_tod_matrix(self.t, self.earth_location.lat, self.earth_location.lon)

    @functools.cached_property
    def _beta(self):
        return eph.earth_velocity_over_c(self.t)

    def _azel_to_icrs(self, az, el):
        # ENU unit vector: x=East, y=North, z=Up; az from North through East
        cos_el = np.cos(el)
        v_enu = np.stack([np.sin(az) * cos_el, np.cos(az) * cos_el, np.sin(el)], axis=-1)
        v_tod = np.einsum("tij,...tj->...ti", self._enu_to_tod, v_enu)
        v_icrs_apparent = np.einsum("tji,...tj->...ti", self._icrs_to_tod, v_tod)
        v_icrs = _normalize(v_icrs_apparent - self._beta)
        return _phi_theta(v_icrs)

    def _icrs_to_azel(self, ra, dec):
        v_icrs = _unit_xyz(ra, dec)
        v_apparent = _normalize(v_icrs + self._beta)
        v_tod = np.einsum("tij,...tj->...ti", self._icrs_to_tod, v_apparent)
        v_enu = np.einsum("tji,...tj->...ti", self._enu_to_tod, v_tod)
        az = np.arctan2(v_enu[..., 0], v_enu[..., 1]) % (2 * np.pi)
        el = np.arcsin(np.clip(v_enu[..., 2], -1, 1))
        return az, el

    def _compute_frame(self, name: str):
        if name in self._frames:
            return self._frames[name]
        native = self.frame.name
        if native == "az/el":
            if "ra/dec" not in self._frames:
                self._frames["ra/dec"] = self._azel_to_icrs(self._phi, self._theta)
            if name == "galactic":
                ra, dec = self._frames["ra/dec"]
                v_gal = np.einsum("ij,...j->...i", eph.ICRS_TO_GAL, _unit_xyz(ra, dec))
                self._frames["galactic"] = _phi_theta(v_gal)
        elif native == "ra/dec":
            if name == "az/el":
                self._frames["az/el"] = self._icrs_to_azel(self._phi, self._theta)
            elif name == "galactic":
                v_gal = np.einsum("ij,...j->...i", eph.ICRS_TO_GAL, _unit_xyz(self._phi, self._theta))
                self._frames["galactic"] = _phi_theta(v_gal)
        elif native == "galactic":
            v_icrs = np.einsum("ji,...j->...i", eph.ICRS_TO_GAL, _unit_xyz(self._phi, self._theta))
            ra, dec = _phi_theta(v_icrs)
            self._frames["ra/dec"] = (ra, dec)
            if name == "az/el":
                self._frames["az/el"] = self._icrs_to_azel(ra, dec)
        return self._frames[name]

    def __getattr__(self, attr):
        for frame_name, (phi_attr, theta_attr) in (
            ("az/el", ("az", "el")),
            ("ra/dec", ("ra", "dec")),
            ("galactic", ("l", "b")),
        ):
            if attr in (phi_attr, theta_attr):
                phi, theta = self._compute_frame(frame_name)
                return phi if attr == phi_attr else theta
        raise AttributeError(attr)

    # -- structure -------------------------------------------------------------
    @property
    def shape(self):
        return self._phi.shape

    @property
    def ndim(self):
        return self._phi.ndim

    def __getitem__(self, idx):
        sub = Coordinates.__new__(Coordinates)
        sub.earth_location = self.earth_location
        sub.frame = self.frame
        sub.dtype = self.dtype
        sub._phi = self._phi[idx]
        sub._theta = self._theta[idx]
        sub.t = self.t
        sub._frames = {name: (p[idx], th[idx]) for name, (p, th) in self._frames.items()}
        sub.centers = {}
        for cached in ("_icrs_to_tod", "_enu_to_tod", "_beta"):
            if cached in self.__dict__:
                sub.__dict__[cached] = self.__dict__[cached]
        return sub

    @property
    def timestep(self):
        return float(np.mean(np.gradient(self.t))) if len(self.t) > 1 else None

    def downsample(self, timestep: float = None, factor: int = None):
        if timestep is None and factor is None:
            raise ValueError("You must supply either 'timestep' or 'factor'.")
        timestep = timestep or factor * self.timestep
        ds_t = np.arange(self.t.min(), self.t.max(), timestep)
        interp = sp.interpolate.interp1d(
            self.t, np.stack([self._phi, self._theta]), axis=-1, bounds_error=False, fill_value="extrapolate"
        )(ds_t)
        return Coordinates(
            phi=interp[0], theta=interp[1], t=ds_t,
            earth_location=self.earth_location, frame=self.frame.name, dtype=self.dtype,
        )

    def boresight(self):
        cphi, ctheta = get_center_phi_theta(self._phi, self._theta, keep_dims=(-1,))
        return Coordinates(
            phi=cphi, theta=ctheta, t=self.t,
            earth_location=self.earth_location, frame=self.frame.name, dtype=self.dtype,
        )

    def broadcast(self, offsets, frame="az/el"):
        """Boresight (n_t,) ⊗ detector offsets (n_det, 2) -> (n_det, n_t)."""
        frame = Frame(frame)
        phi = getattr(self, frame.phi_name)
        theta = getattr(self, frame.theta_name)
        pt = np.asarray(offsets_to_phi_theta(np.asarray(offsets)[..., None, :], phi, theta))
        return Coordinates(
            phi=pt[..., 0], theta=pt[..., 1], t=self.t,
            earth_location=self.earth_location, frame=frame.name, dtype=self.dtype,
        )

    def project(self, z, frame="az/el"):
        """Intersection of each line of sight with the horizontal plane at
        height z above the observer (..., n_t, 3); x=East, y=North, z=Up."""
        az, el = self.az, self.el
        cot_el = 1 / np.tan(el)
        scale = np.asarray(z) - 0.0
        return np.stack(
            [
                scale * np.sin(az) * cot_el,
                scale * np.cos(az) * cot_el,
                scale * np.ones_like(az),
            ],
            axis=-1,
        )

    def center(self, frame=None):
        frame = Frame(frame or self.frame)
        if frame.name not in self.centers:
            phi_c, theta_c = get_center_phi_theta(
                getattr(self, frame.phi_name), getattr(self, frame.theta_name)
            )
            self.centers[frame.name] = (Quantity(float(phi_c), "rad"), Quantity(float(theta_c), "rad"))
        return self.centers[frame.name]

    def offsets(self, frame, center=None):
        frame = Frame(frame)
        if center is None:
            center = self.center(frame=frame)
        cphi = float(np.asarray(center[0], dtype=float))
        ctheta = float(np.asarray(center[1], dtype=float))
        pt = np.stack(
            [getattr(self, frame.phi_name), getattr(self, frame.theta_name)], axis=-1
        )
        return np.asarray(phi_theta_to_offsets(pt, cphi, ctheta))

    def hull(self, frame, center=None, max_samples: int = 20000):
        offsets = self.offsets(frame=frame, center=center).reshape(-1, 2)
        if len(offsets) > max_samples:
            offsets = offsets[np.random.default_rng(0).choice(len(offsets), size=max_samples)]
        hull = sp.spatial.ConvexHull(offsets)
        return offsets[hull.vertices]

    def __repr__(self):
        frame = self.frame
        phi = np.degrees(self._phi)
        theta = np.degrees(self._theta)
        return (
            f"Coordinates(shape={self.shape}, frame='{frame.name}', "
            f"{frame.phi_name}=[{phi.min():.3f}°, {phi.max():.3f}°], "
            f"{frame.theta_name}=[{theta.min():.3f}°, {theta.max():.3f}°], "
            f"duration={self.t.max() - self.t.min():.1f}s)"
        )
