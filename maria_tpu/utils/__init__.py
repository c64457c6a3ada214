"""Generic numerics. Rule inherited from the reference (maria/utils/__init__.py:3):
nothing in here imports from other maria_tpu modules (except functions/constants).
"""

from __future__ import annotations

import time as _time
from datetime import datetime, timezone

import numpy as np
import scipy as sp

from .linalg import fast_psd_inverse, generate_spatial_basis, pointing_indices_and_weights  # noqa: F401
from .rotations import (  # noqa: F401
    compute_aligning_transform,
    principal_angle_2d,
    rotation_matrix_2d,
    rotation_matrix_3d,
)

__all__ = [
    "compute_diameter",
    "get_utc_day_hour",
    "get_utc_year_day",
    "grouper",
    "humanize_time",
    "fast_psd_inverse",
    "generate_spatial_basis",
    "pointing_indices_and_weights",
    "compute_aligning_transform",
    "rotation_matrix_2d",
    "rotation_matrix_3d",
    "principal_angle_2d",
]


def compute_diameter(points, lazy=False, MAX_SAMPLE_SIZE: int = 10000) -> float:
    """Diameter of a point cloud via its convex hull
    (reference: maria/utils/__init__.py:57)."""
    points = np.atleast_2d(points)
    if len(points) < 2:
        return 0.0
    if lazy or len(points) > MAX_SAMPLE_SIZE:
        index = np.random.default_rng(0).choice(len(points), size=MAX_SAMPLE_SIZE, replace=True)
        points = points[index]
    dims_vary = np.ptp(points, axis=0) > 0
    if dims_vary.sum() == 0:
        return 0.0
    if dims_vary.sum() == 1:
        return float(np.ptp(points[:, dims_vary]))
    try:
        hull = sp.spatial.ConvexHull(points[:, dims_vary])
        vertices = points[hull.vertices][:, dims_vary]
    except sp.spatial.QhullError:
        vertices = points[:, dims_vary]
    d2 = np.square(vertices[:, None] - vertices[None]).sum(axis=-1)
    return float(np.sqrt(d2.max()))


def get_utc_day_hour(t: float) -> float:
    dt = datetime.fromtimestamp(float(t), tz=timezone.utc)
    return dt.hour + dt.minute / 60 + dt.second / 3600 + dt.microsecond / 3.6e9


def get_utc_year_day(t: float) -> float:
    dt = datetime.fromtimestamp(float(t), tz=timezone.utc)
    return float(dt.timetuple().tm_yday - 1) + get_utc_day_hour(t) / 24


def humanize_time(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{1e6 * seconds:.0f} µs"
    if seconds < 1:
        return f"{1e3 * seconds:.0f} ms"
    if seconds < 60:
        return f"{seconds:.02f} s"
    minutes, s = divmod(seconds, 60)
    if minutes < 60:
        return f"{int(minutes)}m{s:02.0f}s"
    hours, m = divmod(minutes, 60)
    return f"{int(hours)}h{int(m):02d}m{s:02.0f}s"


def grouper(iterable, n):
    out = []
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) == n:
            out.append(buf)
            buf = []
    if buf:
        out.append(buf)
    return out


class Timer:
    """Context-manager phase timer (duration-logging parity with the
    reference's log_duration, maria/io/logging.py:10)."""

    def __init__(self, logger=None, message: str = ""):
        self.logger = logger
        self.message = message

    def __enter__(self):
        self.start = _time.monotonic()
        return self

    def __exit__(self, *exc):
        self.duration = _time.monotonic() - self.start
        if self.logger is not None:
            self.logger.debug(f"{self.message} in {humanize_time(self.duration)}")
        return False


# -- sexagesimal angles (reference: maria/utils/coords.py) -----------------------
def dms_to_rad(d: float = 0, m: float = 0, s: float = 0) -> float:
    """Degrees/arcminutes/arcseconds -> radians."""
    return np.radians(d + m / 60 + s / 3600)


def hms_to_rad(h: float = 0, m: float = 0, s: float = 0) -> float:
    """Hours/minutes/seconds of right ascension -> radians."""
    return np.radians(15 * (h + m / 60 + s / 3600))


def deg_to_signed_dms(x: float, precision: int = 6):
    """Degrees -> (sign, deg, arcmin, arcsec)."""
    x = round(float(x), precision)
    sign = -1 if x < 0 else 1
    mnt, sec = divmod(abs(x) * 3600, 60)
    deg, mnt = divmod(mnt, 60)
    return int(sign), int(deg), int(mnt), sec


def deg_to_signed_hms(x: float, precision: int = 6):
    """Degrees -> (sign, hours, minutes, seconds) of right ascension."""
    x = round(float(x), precision)
    sign = -1 if x < 0 else 1
    mnt, sec = divmod(abs(x) * 3600 / 15, 60)
    hrs, mnt = divmod(mnt, 60)
    return int(sign), int(hrs), int(mnt), sec


def great_circle_distance(phi1, theta1, phi2, theta2):
    """Haversine angular separation between (lon, lat) points in rad
    (reference: maria/utils/functions.py)."""
    dphi = np.asarray(phi2) - np.asarray(phi1)
    dtheta = np.asarray(theta2) - np.asarray(theta1)
    hav = (
        np.sin(dtheta / 2) ** 2
        + np.cos(theta1) * np.cos(theta2) * np.sin(dphi / 2) ** 2
    )
    return 2 * np.arcsin(np.sqrt(np.clip(hav, 0.0, 1.0)))
