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


def get_rotation_matrix_2d(a):
    """Reference-named alias of rotation_matrix_2d: (..., 2, 2) rotation
    matrices for a broadcastable array of angles (reference
    maria/utils/rotations.py:5-8, which uses a matrix exponential; the
    closed form is identical)."""
    return rotation_matrix_2d(a)


def get_rotation_matrix_3d(**rotations):
    """Successive named-axis rotations with broadcastable angles
    (reference maria/utils/rotations.py:11-22).

    `get_rotation_matrix_3d(z=a, x=b)` rotates about z by `a`, then
    about x by `b`; angle arrays broadcast into leading axes of the
    returned (..., 3, 3) stack. Closed-form per-axis matrices replace
    the reference's expm of a skew generator (same result)."""
    axes = {"x": 0, "y": 1, "z": 2}
    R = np.eye(3)
    for axis, angle in rotations.items():
        i, j = (index for dim, index in axes.items() if dim != axis)
        a = np.asarray(angle, dtype=float)
        c, s = np.cos(a), np.sin(a)
        S = np.zeros((*a.shape, 3, 3))
        S[..., 0, 0] = S[..., 1, 1] = S[..., 2, 2] = 1.0
        S[..., i, i], S[..., j, j] = c, c
        S[..., i, j], S[..., j, i] = s, -s
        R = S @ R
    return R


def get_orthogonal_transform(signature, entries):
    """Orthogonal matrix from skew entries on the axes selected by
    `signature` (reference maria/utils/rotations.py:25-42)."""
    import scipy.linalg

    signature = np.asarray(signature, dtype=bool)
    axes = np.where(signature)[0]
    n_dim = len(signature)
    n_axes = int(signature.sum())
    if n_axes * (n_axes - 1) // 2 != len(entries):
        raise ValueError(
            f"Bad shape for entries (for signature {signature.tolist()} we expect "
            f"len(entries) = {n_axes * (n_axes - 1) // 2})."
        )
    i, j = np.triu_indices(n=n_axes, k=1)
    S = np.zeros((n_dim, n_dim))
    S[axes[i], axes[j]] = entries
    return scipy.linalg.expm(S - S.T)


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
