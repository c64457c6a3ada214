"""A single observation: instrument x plan x site
(reference: maria/sim/observation.py:27-96).

The pointing is kept *factorized*: boresight tracks (az/el and ra/dec,
host float64) plus static detector offsets and the local frame-rotation
angle q(t) between the two frames. Full (n_det, n_time) pointing fields
are computed on device inside the simulation program — never
materialized on the host — which is what lets 50k-detector arrays run
on one chip.
"""

from __future__ import annotations

import logging

import numpy as np

from ..coords import Coordinates
from ..errors import PointingError
from ..units import Quantity
from ..utils import rotation_matrix_2d

logger = logging.getLogger("maria_tpu")

MIN_ELEVATION_WARN = 20.0  # deg
MIN_ELEVATION_ERROR = 10.0  # deg


class Observation:
    def __init__(self, instrument, plan, site, atmosphere=None, atmosphere_kwargs: dict = {}):
        self.instrument = instrument
        self.plan = plan
        self.site = site

        # boresight in the plan's frame, tied to the site
        self.boresight = Coordinates(
            phi=getattr(plan, plan.frame.phi_name),
            theta=getattr(plan, plan.frame.theta_name),
            t=plan.time,
            earth_location=site.earth_location,
            frame=plan.frame.name,
        )

        el_deg = np.degrees(np.asarray(self.boresight.el))
        if el_deg.min() < MIN_ELEVATION_ERROR:
            raise PointingError(
                f"Observation dips below {MIN_ELEVATION_ERROR} deg elevation (min={el_deg.min():.1f} deg).",
            )
        if el_deg.min() < MIN_ELEVATION_WARN:
            logger.warning(f"Observation dips below {MIN_ELEVATION_WARN} deg elevation.")

        # kinematic safety checks against the instrument's drive limits
        # (reference: maria/sim/observation.py:74-85 warns on az velocity;
        # we check az/el velocity and acceleration)
        t = np.asarray(plan.time, dtype=float)
        dt = np.gradient(t)
        az_unwrapped = np.degrees(np.unwrap(np.asarray(self.boresight.az, dtype=float)))
        el_track = np.degrees(np.asarray(self.boresight.el, dtype=float))
        az_vel = np.gradient(az_unwrapped) / dt
        el_vel = np.gradient(el_track) / dt
        checks = [
            ("az velocity", np.abs(az_vel).max(), instrument.az_vel_limit, "deg/s"),
            ("el velocity", np.abs(el_vel).max(), instrument.el_vel_limit, "deg/s"),
            ("az acceleration", np.abs(np.gradient(az_vel) / dt).max(), instrument.az_acc_limit, "deg/s^2"),
            ("el acceleration", np.abs(np.gradient(el_vel) / dt).max(), instrument.el_acc_limit, "deg/s^2"),
        ]
        for name, value, limit, unit in checks:
            if limit is not None and value > float(limit.to(unit)):
                logger.warning(
                    f"The maximum {name} of the plan ({value:.1f} {unit}) exceeds the "
                    f"limit of the instrument ({float(limit.to(unit)):.1f} {unit})."
                )

        # detector offsets (in the az/el frame), with optional boresight roll
        offsets = instrument.dets.offsets
        if plan.roll:
            offsets = offsets @ rotation_matrix_2d(plan.roll).T
        self.offsets = offsets

        # frame-rotation angle q(t): tangent-plane offsets in az/el map to
        # offsets rotated by q in ra/dec (rigid-rotation property of the
        # frame transform; replaces materializing (n_det, n_t) coordinates)
        from ..coords.transforms import phi_theta_to_offsets

        eps = 1e-5
        probe = self.boresight.broadcast(np.array([[0.0, eps]]), frame="az/el")
        probe_pt = np.stack([np.asarray(probe.ra), np.asarray(probe.dec)], axis=-1)  # (1, n_t, 2)
        probe_offsets = np.asarray(
            phi_theta_to_offsets(probe_pt, np.asarray(self.boresight.ra), np.asarray(self.boresight.dec))
        )[0]  # (n_t, 2)
        # the el-direction probe lands at angle q from the dec direction:
        # offsets_radec = R(q) @ offsets_azel
        self.q = np.arctan2(-probe_offsets[:, 0], probe_offsets[:, 1])

        self.t = plan.time
        self.sample_rate = float(plan.sample_rate.Hz)

        if atmosphere is not None:
            from ..atmosphere import Atmosphere

            if isinstance(atmosphere, Atmosphere):
                self.atmosphere = atmosphere
            else:
                self.atmosphere = Atmosphere(
                    model=atmosphere,
                    timestamp=float(np.mean(plan.time)),
                    region=site.region,
                    altitude=float(site.altitude.m),
                    **atmosphere_kwargs,
                )

        self.loading = {}

    @property
    def shape(self):
        return (self.instrument.dets.n, len(self.t))

    @property
    def n_samples(self):
        return self.shape[0] * self.shape[1]

    @property
    def coords(self):
        """Full (n_det, n_t) coordinates — materialized on demand for API
        parity with the reference; the sim engine never calls this."""
        return self.boresight.broadcast(self.offsets, frame="az/el")

    def __repr__(self):
        return (
            f"Observation(instrument={self.instrument.name}, site={self.site.name}, "
            f"shape={self.shape}, duration={Quantity(float(np.ptp(self.t)), 's')})"
        )
