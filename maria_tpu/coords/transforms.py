"""Spherical geometry, backend-generic (numpy float64 on host, jnp under jit).

Tangent-plane (azimuthal-equidistant) offsets around a center, unit-sphere
embeddings, and spherical means. Offset conventions match the reference
(maria/coords/transforms.py:10-52): positive dx decreases phi (sky seen
from inside the sphere), positive dy increases theta; derived here with
real spherical trigonometry instead of the complex-plane trick.

Small-offset limits (used as tests):
    phi   ≈ cphi - dx / cos(ctheta)
    theta ≈ ctheta + dy
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "offsets_to_phi_theta",
    "phi_theta_to_offsets",
    "phi_theta_to_xyz",
    "xyz_to_phi_theta",
    "get_center_phi_theta",
    "offsets_to_phi_theta_jit",
    "phi_theta_to_offsets_jit",
]


def _sinc(x, xp):
    # sin(x)/x; numpy's sinc is sin(pi x)/(pi x)
    return xp.sinc(x / xp.pi)


def _offsets_to_phi_theta(dX, cphi, ctheta, xp):
    dx, dy = dX[..., 0], dX[..., 1]
    # grad-safe norm: sqrt'(0) is NaN and jnp.where passes the untaken
    # branch's NaN through the VJP, so a detector at the exact array
    # center poisons jax.grad through the pointing chain (the sim is
    # end-to-end differentiable; tests/test_autodiff.py)
    r2 = dx**2 + dy**2
    nonzero = r2 > 0
    r = xp.where(nonzero, xp.sqrt(xp.where(nonzero, r2, 1.0)), 0.0)
    sin_r_over_r = _sinc(r, xp)  # safe at r=0
    cos_r = xp.cos(r)

    sin_c, cos_c = xp.sin(ctheta), xp.cos(ctheta)

    sin_theta = sin_c * cos_r + cos_c * sin_r_over_r * dy
    merid = cos_c * cos_r - sin_c * sin_r_over_r * dy
    dphi = xp.arctan2(-sin_r_over_r * dx, merid)

    theta = xp.arcsin(xp.clip(sin_theta, -1.0, 1.0))
    return xp.stack([cphi + dphi, theta], axis=-1)


def _phi_theta_to_offsets(pt, cphi, ctheta, xp):
    phi, theta = pt[..., 0], pt[..., 1]
    dphi = phi - cphi
    sin_c, cos_c = xp.sin(ctheta), xp.cos(ctheta)
    cos_t = xp.cos(theta)

    # direction cosines of the point in the frame whose pole is the center
    u = xp.sin(dphi) * cos_t                                     # toward -dx
    v = xp.cos(dphi) * cos_t * sin_c - xp.sin(theta) * cos_c     # toward -dy
    w = xp.cos(dphi) * cos_t * cos_c + xp.sin(theta) * sin_c     # toward center

    s2 = u**2 + v**2  # grad-safe norm (see _offsets_to_phi_theta)
    nonzero = s2 > 0
    sin_r = xp.where(nonzero, xp.sqrt(xp.where(nonzero, s2, 1.0)), 0.0)
    r = xp.arctan2(sin_r, w)
    scale = xp.where(sin_r > 0, r / xp.where(sin_r > 0, sin_r, 1.0), 1.0)
    return xp.stack([-u * scale, -v * scale], axis=-1)


def offsets_to_phi_theta(dX, cphi, ctheta):
    """Map tangent-plane offsets (..., 2) around (cphi, ctheta) to (phi, theta)."""
    if isinstance(dX, jnp.ndarray) and not isinstance(dX, np.ndarray):
        return _offsets_to_phi_theta(dX, cphi, ctheta, jnp)
    return _offsets_to_phi_theta(
        np.asarray(dX, dtype=np.float64), np.float64(cphi), np.float64(ctheta), np
    )


def phi_theta_to_offsets(pt, cphi, ctheta):
    """Map (phi, theta) (..., 2) to tangent-plane offsets around (cphi, ctheta)."""
    if isinstance(pt, jnp.ndarray) and not isinstance(pt, np.ndarray):
        return _phi_theta_to_offsets(pt, cphi, ctheta, jnp)
    return _phi_theta_to_offsets(
        np.asarray(pt, dtype=np.float64), np.float64(cphi), np.float64(ctheta), np
    )


offsets_to_phi_theta_jit = jax.jit(lambda dX, cphi, ctheta: _offsets_to_phi_theta(dX, cphi, ctheta, jnp))
phi_theta_to_offsets_jit = jax.jit(lambda pt, cphi, ctheta: _phi_theta_to_offsets(pt, cphi, ctheta, jnp))


def phi_theta_to_xyz(phi, theta):
    """Angular coordinates onto the 3D unit sphere (..., 3)."""
    xp = jnp if (isinstance(phi, jnp.ndarray) and not isinstance(phi, np.ndarray)) else np
    cos_theta = xp.cos(theta)
    return xp.stack(
        [xp.cos(phi) * cos_theta, xp.sin(phi) * cos_theta, xp.sin(theta)],
        axis=-1,
    )


def xyz_to_phi_theta(xyz):
    """(phi in [0, 2pi), theta) of 3-vectors."""
    xp = jnp if (isinstance(xyz, jnp.ndarray) and not isinstance(xyz, np.ndarray)) else np
    norm = xp.sqrt(xp.sum(xyz**2, axis=-1))
    phi = xp.arctan2(xyz[..., 1], xyz[..., 0]) % (2 * xp.pi)
    theta = xp.arcsin(xp.clip(xyz[..., 2] / norm, -1.0, 1.0))
    return phi, theta


def get_center_phi_theta(phi, theta, keep_dims=()):
    """Spherical mean via unit-sphere embedding
    (reference: maria/coords/transforms.py:77-90)."""
    xyz = np.asarray(phi_theta_to_xyz(np.atleast_1d(np.asarray(phi, dtype=np.float64)),
                                      np.atleast_1d(np.asarray(theta, dtype=np.float64))))
    axes = list(range(xyz.ndim - 1))
    for dim in keep_dims:
        axes.pop(dim)
    center = xyz.mean(axis=tuple(axes)) if axes else xyz
    center = center / np.sqrt(np.sum(center**2, axis=-1, keepdims=True))
    phi_c, theta_c = xyz_to_phi_theta(center)
    return np.asarray(phi_c), np.asarray(theta_c)


# reference-named alias: the reference exposes the un-jitted host variant
# under this name (maria/coords/transforms.py)
unjitted_offsets_to_phi_theta = offsets_to_phi_theta
