"""Rotations and aligning transforms.

The reference finds its extrusion-aligning transform with SLSQP over
orthogonal matrices (maria/utils/rotations.py:45-77). Here the same
transform is closed-form: the optimal rotation-about-vertical that
minimizes the cross-section extent of a point cloud is given by the
principal axis of its horizontal covariance (2D PCA) — deterministic,
O(n), and trivially differentiable.
"""

from __future__ import annotations

import numpy as np


def rotation_matrix_2d(a):
    """(..., 2, 2) rotation matrices for angles `a`."""
    a = np.asarray(a)
    c, s = np.cos(a), np.sin(a)
    return np.stack(
        [np.stack([c, -s], axis=-1), np.stack([s, c], axis=-1)],
        axis=-2,
    )


def rotation_matrix_3d(**rotations):
    """Compose rotations about named axes, e.g. rotation_matrix_3d(z=a, x=b).

    Matches the reference semantics (maria/utils/rotations.py:11-22):
    successive right-handed rotations applied left-to-right.
    """
    axes = {"x": 0, "y": 1, "z": 2}
    R = np.eye(3)
    for axis, angle in rotations.items():
        i, j = (index for dim, index in axes.items() if dim != axis)
        c, s = np.cos(angle), np.sin(angle)
        S = np.eye(3)
        S[i, i], S[i, j], S[j, i], S[j, j] = c, s, -s, c
        R = S @ R
    return R


def principal_angle_2d(points: np.ndarray) -> float:
    """Angle of the principal axis of a 2D point cloud.

    The first principal component of the centered covariance; the returned
    angle rotates the cloud so its long axis lies along x.
    """
    p = np.asarray(points, dtype=float).reshape(-1, 2)
    p = p - p.mean(axis=0)
    cxx = np.mean(p[:, 0] ** 2)
    cyy = np.mean(p[:, 1] ** 2)
    cxy = np.mean(p[:, 0] * p[:, 1])
    return 0.5 * np.arctan2(2 * cxy, cxx - cyy)


def compute_aligning_transform(points: np.ndarray) -> np.ndarray:
    """3x3 transform rotating about vertical so the first axis is the
    principal (extrusion) direction of the horizontal footprint.

    Closed-form replacement for the reference's SLSQP search with
    signature (True, True, False) — rotation in the x-y plane only,
    preserving height (maria/atmosphere/atmosphere.py:191-195).

    Points transform as `p @ T`.
    """
    angle = principal_angle_2d(np.asarray(points)[..., :2])
    c, s = np.cos(angle), np.sin(angle)
    # p @ T rotates (x, y) by -angle so the principal axis maps onto x
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
