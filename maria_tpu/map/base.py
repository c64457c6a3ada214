"""Map base class (reference: maria/map/base.py:53-560).

A Map is a data cube with *slice dims* (stokes, nu, t/z/v) times *map
dims* (eta/xi for projections, pixel for HEALPix). The third slice slot
carries ONE labeled axis: time (`t`), redshift (`z`), or velocity (`v`)
— matching how the reference's optional z/v dims are used in practice
(container bookkeeping for spectral-line cubes and redshift stacks;
reference map/base.py:36-40,104-108). Data lives as jnp arrays; units
convert through the calibration graph per frequency channel.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..calibration import Calibration
from ..units import Quantity, parse_units

logger = logging.getLogger("maria_tpu")

VALID_MAP_QUANTITIES = [
    "rayleigh_jeans_temperature",
    "cmb_temperature_anisotropy",
    "brightness_temperature",
    "spectral_flux_density_per_pixel",
    "spectral_flux_density_per_beam",
    "spectral_radiance",
    "compton_y",
]

STOKES_ORDER = "IQUV"

# Slice-axis spec: dtype and default for each leading (non-map) dim
# (reference: map/base.py:23-40; we additionally label a 'v' velocity axis).
SLICE_DIMS = {
    "stokes": {"dtype": str, "default": "I"},
    "nu": {"dtype": float, "default": 150e9},
    "t": {"dtype": float, "default": 0.0},
    "z": {"dtype": float, "default": 0.0},
    "v": {"dtype": float, "default": 0.0},
}


class Map:
    """Base for sky maps; subclasses define the map dims."""

    map_dims: tuple = ()

    def __init__(
        self,
        data,
        stokes: str = None,
        nu=None,
        t=None,
        z=None,
        v=None,
        units: str = "K_RJ",
        weight=None,
        dtype=jnp.float32,
        degrees: bool = True,
    ):
        u = parse_units(units)
        if u.quantity not in VALID_MAP_QUANTITIES:
            raise ValueError(
                f"Invalid map units '{units}' (quantity '{u.quantity}')."
            )
        self.units = units
        self.dtype = dtype

        # host-side numpy storage: maps are scene/analysis containers
        # (the fused device programs copy what they need at build time),
        # and numpy keeps the reference's mutation idioms working
        # (m.data[mask] = 0, m.data *= 2; e.g. reference docs
        # tutorials/mustang-nebula.ipynb)
        data = np.asarray(data, dtype=dtype)
        n_map_dims = len(self.map_dims)

        # normalize to (stokes, nu, t, *map_dims): when slice axes are
        # missing, place them where the metadata says they belong — e.g.
        # (stokes, nu, pixels) must become (stokes, nu, 1, pixels), not
        # (1, stokes, nu, pixels) (reference docs usage/inputs/maps)
        if data.ndim != n_map_dims + 3:
            if data.ndim > n_map_dims + 3:
                raise ValueError(f"Map data has too many dims ({data.ndim}).")
            axis3_vals = next((val for val in (t, z, v) if val is not None), None)
            target = (
                len(stokes) if stokes else 1,
                len(np.atleast_1d(nu)) if nu is not None else 1,
                len(np.atleast_1d(axis3_vals)) if axis3_vals is not None else 1,
                *data.shape[-n_map_dims:],
            )
            if int(np.prod(data.shape)) == int(np.prod(target)):
                data = data.reshape(target)
            else:
                while data.ndim < n_map_dims + 3:
                    data = data[None]
        self.data = data

        self.stokes = stokes or STOKES_ORDER[: data.shape[0]]
        if len(self.stokes) != data.shape[0]:
            raise ValueError(f"Stokes '{self.stokes}' does not match data shape {data.shape}.")

        self.nu = np.atleast_1d(np.asarray(nu if nu is not None else [150e9], dtype=float))
        if len(self.nu) != data.shape[1]:
            raise ValueError(f"nu axis ({len(self.nu)}) does not match data shape {data.shape}.")

        # the labeled third slice axis: time (default), redshift, or
        # velocity (reference's optional z/v slice dims, map/base.py:36-40)
        given = {k: val for k, val in (("t", t), ("z", z), ("v", v)) if val is not None}
        if len(given) > 1:
            raise ValueError(f"Give at most one of t/z/v (got {sorted(given)}).")
        self.axis3_label = next(iter(given), "t")
        vals = given.get(self.axis3_label)
        self.t = np.atleast_1d(np.asarray(vals if vals is not None else [0.0], dtype=float))
        if len(self.t) != data.shape[2]:
            raise ValueError(
                f"{self.axis3_label} axis ({len(self.t)}) does not match data shape {data.shape}."
            )

        self.weight = np.asarray(weight, dtype=dtype) if weight is not None else np.ones_like(self.data)

    # -- structure ----------------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def n_stokes(self):
        return len(self.stokes)

    @property
    def n_nu(self):
        return len(self.nu)

    @property
    def z(self):
        """Redshift axis (only when the third slice axis is labeled z)."""
        if self.axis3_label != "z":
            raise AttributeError("This map's third slice axis is "
                                 f"'{self.axis3_label}', not 'z'.")
        return self.t

    @property
    def v(self):
        """Velocity axis (only when the third slice axis is labeled v)."""
        if self.axis3_label != "v":
            raise AttributeError("This map's third slice axis is "
                                 f"'{self.axis3_label}', not 'v'.")
        return self.t

    def _axis3_kwargs(self):
        """Constructor kwargs that re-create the labeled third axis."""
        return {self.axis3_label: self.t}

    @property
    def nu_bin_bounds(self):
        """Channel boundaries: midpoints between adjacent nu
        (reference map/base.py nu_bin_bounds)."""
        if self.n_nu == 1:
            return [(Quantity(0.0, "Hz"), Quantity(np.inf, "Hz"))]
        edges = [0.0, *(0.5 * (self.nu[1:] + self.nu[:-1])), np.inf]
        return [
            (Quantity(lo, "Hz"), Quantity(hi, "Hz")) for lo, hi in zip(edges[:-1], edges[1:])
        ]

    # -- units -----------------------------------------------------------------------
    def _calibration_kwargs(self, **kwargs):
        return kwargs

    def to(self, units: str, band=None) -> "Map":
        """Convert per frequency channel (reference map/base.py:392).
        Weights are inverse variances, so they scale with 1/slope^2 of
        the conversion (the reference leaves them in the old units)."""
        if parse_units(units).dims == parse_units(self.units).dims and parse_units(units).factor == parse_units(self.units).factor:
            return self
        new_data = []
        new_weight = []
        for i, nu in enumerate(self.nu):
            cal = Calibration(
                f"{self.units} -> {units}",
                nu=nu,
                band=band,
                **self._calibration_kwargs(),
            )
            if cal.linear():
                factor = float(np.asarray(cal(1.0)))
                new_data.append(self.data[:, i] * factor)
                new_weight.append(self.weight[:, i] / factor**2)
            else:
                x = np.asarray(self.data[:, i])
                new_data.append(jnp.asarray(cal(x)))
                # local slope for inverse-variance propagation
                eps = 1e-6 * max(float(np.abs(x).max()), 1e-30)
                slope = (np.asarray(cal(x + eps)) - np.asarray(cal(x))) / eps
                new_weight.append(self.weight[:, i] / jnp.asarray(slope**2 + 1e-300))
        return self._replace(
            data=jnp.stack(new_data, axis=1),
            weight=jnp.stack(new_weight, axis=1),
            units=units,
        )

    def _replace(self, **kwargs):
        raise NotImplementedError

    # -- structure manipulation (reference map/base.py:297-351) ----------------
    def squeeze(self, dim: str) -> "Map":
        axis = {"stokes": 0, "nu": 1, "t": 2, "z": 2, "v": 2}[dim]
        if self.data.shape[axis] != 1:
            raise ValueError(f"Cannot squeeze dim '{dim}' of size {self.data.shape[axis]}.")
        return self  # dims are always carried explicitly; squeeze is a no-op view

    def unsqueeze(self, dim: str, value=None) -> "Map":
        """All slice dims always exist here, so unsqueezing only assigns
        the coordinate value when one is given — e.g.
        `m.unsqueeze("nu", 150e9)` tags a frequency-less map with its
        frequency (reference docs usage/inputs/maps)."""
        if value is None:
            return self
        axis = {"stokes": 0, "nu": 1, "t": 2, "z": 2, "v": 2}[dim]
        if self.data.shape[axis] != 1:
            raise ValueError(
                f"Cannot assign a single {dim}={value} to a {dim} axis of "
                f"size {self.data.shape[axis]}."
            )
        if dim == "nu":
            return self._replace(nu=np.atleast_1d(float(value)))
        if dim == "stokes":
            return self._replace(stokes=str(value))
        # t/z/v: route the relabel through the constructor (validation
        # included); only the default unlabeled axis (t=[0]) may change label
        if dim != self.axis3_label and not (
            self.axis3_label == "t" and len(self.t) == 1 and self.t[0] == 0.0
        ):
            raise ValueError(
                f"Cannot relabel axis '{self.axis3_label}' as '{dim}'."
            )
        return self._replace(**{dim: np.atleast_1d(float(value))})

    @property
    def dims(self):
        return {
            "stokes": self.n_stokes,
            "nu": self.n_nu,
            self.axis3_label: len(self.t),
            **{d: n for d, n in zip(self.map_dims, self.data.shape[3:])},
        }

    def apply_parity(self, **signs):
        """Flip map axes to a given parity signature
        (reference map/base.py:198-229). Returns self for chaining."""
        flips = []
        for i, dim in enumerate(self.map_dims):
            if signs.get(dim, 1) == -1:
                flips.append(3 + i)
        if flips:
            self.data = np.flip(self.data, axis=flips)
            self.weight = np.flip(self.weight, axis=flips)
        return self

    @classmethod
    def concatenate(cls, maps: list, dim: str = "t") -> "Map":
        """Concatenate along a slice dim (reference map/base.py:534)."""
        axis = {"stokes": 0, "nu": 1, "t": 2, "z": 2, "v": 2}[dim]
        first = maps[0]
        data = jnp.concatenate([m.data for m in maps], axis=axis)
        weight = jnp.concatenate([m.weight for m in maps], axis=axis)
        kwargs = {}
        if dim == "nu":
            kwargs["nu"] = np.concatenate([m.nu for m in maps])
        elif axis == 2:
            if any(m.axis3_label != dim for m in maps):
                raise ValueError(f"Not every map's third axis is labeled '{dim}'.")
            kwargs[dim] = np.concatenate([m.t for m in maps])
        elif dim == "stokes":
            kwargs["stokes"] = "".join(m.stokes for m in maps)
        return first._replace(data=data, weight=weight, **kwargs)

    def __repr__(self):
        rms = float(np.asarray(self.data).std())
        axis3 = "" if self.axis3_label == "t" and len(self.t) == 1 else (
            f", {self.axis3_label}=[{self.t.min():.3g}..{self.t.max():.3g}] (n={len(self.t)})"
        )
        return (
            f"{type(self).__name__}(shape={tuple(self.shape)}, stokes='{self.stokes}', "
            f"nu={[f'{n/1e9:.0f} GHz' for n in self.nu]}{axis3}, units='{self.units}', rms={rms:.3e})"
        )


def concatenate(maps: list, dim: str = "t"):
    """Module-level concatenation along a slice dim (reference: map/base.py:534)."""
    return type(maps[0]).concatenate(maps, dim=dim)
