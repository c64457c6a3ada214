from __future__ import annotations

import numpy as np

from .coordinates import Coordinates  # noqa: F401
from .earth import EarthLocation  # noqa: F401
from .frame import FRAMES, Frame, parse_frame  # noqa: F401
from .transforms import (  # noqa: F401
    get_center_phi_theta,
    offsets_to_phi_theta,
    phi_theta_to_offsets,
    phi_theta_to_xyz,
    xyz_to_phi_theta,
)


def infer_center_width_height(coords_list, frame="ra/dec"):
    """Pointing-driven map geometry (reference: maria/coords/__init__.py:18)."""
    centers = []
    for coords in coords_list:
        cphi, ctheta = coords.center(frame=frame)
        centers.append((float(np.asarray(cphi)), float(np.asarray(ctheta))))
    xyz = phi_theta_to_xyz(
        np.array([c[0] for c in centers]), np.array([c[1] for c in centers])
    )
    center_xyz = np.asarray(xyz).mean(axis=0)
    center_xyz /= np.sqrt((center_xyz**2).sum())
    cphi, ctheta = xyz_to_phi_theta(center_xyz[None])
    center = (float(np.asarray(cphi)[0]), float(np.asarray(ctheta)[0]))

    width, height = 0.0, 0.0
    for coords in coords_list:
        offsets = coords.offsets(frame=frame, center=center).reshape(-1, 2)
        width = max(width, 2 * float(np.abs(offsets[:, 0]).max()))
        height = max(height, 2 * float(np.abs(offsets[:, 1]).max()))
    return center, width, height
