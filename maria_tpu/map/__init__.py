"""Sky maps: input skies and mapper outputs
(reference: maria/map/__init__.py:26-107)."""

from __future__ import annotations

import logging
import zlib
import os

import numpy as np

from .base import Map  # noqa: F401
from .healpix import HEALPixMap  # noqa: F401
from .projection import ProjectionMap  # noqa: F401

logger = logging.getLogger("maria_tpu")

# named example maps; the reference fetches FITS files from maria-data
# (registry maps.txt); offline we synthesize equivalents
EXAMPLE_MAPS = {
    "cluster": {
        "description": "A beta-model galaxy-cluster decrement at 150 GHz",
        "width": 0.25,
        "n": 256,
        "units": "K_RJ",
        "nu": 150e9,
    },
    "big_cluster": {
        "description": "A large, bright beta-model cluster",
        "width": 0.5,
        "n": 512,
        "units": "K_RJ",
        "nu": 93e9,
    },
    "point_sources": {
        "description": "A field of point sources",
        "width": 0.5,
        "n": 512,
        "units": "K_RJ",
        "nu": 150e9,
    },
}

all_maps = sorted(EXAMPLE_MAPS)


def _synthesize_example(name: str, center=(150.0, 10.0), **overrides) -> ProjectionMap:
    cfg = {**EXAMPLE_MAPS[name], **overrides}
    n = cfg["n"]
    width_rad = np.radians(cfg["width"])
    x = np.linspace(-width_rad / 2, width_rad / 2, n)
    X, Y = np.meshgrid(x, x)
    rng = np.random.default_rng(zlib.crc32(name.encode()))  # stable across processes

    if "cluster" in name:
        # isothermal beta model, theta_c ~ 1/10 of the map
        theta_c = width_rad / 12
        amp = 1e-4 if name == "cluster" else 5e-4  # K_RJ decrement scale
        data = -amp * (1 + (X**2 + Y**2) / theta_c**2) ** (-1.0)
        # a couple of substructure blobs
        for _ in range(3):
            cx, cy = rng.uniform(-width_rad / 4, width_rad / 4, 2)
            s = width_rad / 40
            data -= 0.3 * amp * np.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / (2 * s**2))
    elif name == "point_sources":
        data = np.zeros((n, n))
        for _ in range(30):
            cx, cy = rng.uniform(-width_rad / 2.2, width_rad / 2.2, 2)
            s = width_rad / n  # ~1 pixel
            amp = 10 ** rng.uniform(-5, -3.3)
            data += amp * np.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / (2 * s**2))
    else:
        raise KeyError(name)

    return ProjectionMap(
        data=data[None, None, None].astype(np.float32),
        center=center,
        width=cfg["width"],
        frame="ra/dec",
        nu=[cfg["nu"]],
        units=cfg["units"],
        degrees=True,
    )


def get(name: str, **kwargs) -> ProjectionMap:
    """Load a named input map (reference: maria/map/__init__.py:58)."""
    if name in EXAMPLE_MAPS:
        return _synthesize_example(name, **kwargs)
    if os.path.exists(name):
        return load(name, **kwargs)
    raise ValueError(f"'{name}' is not a known map (known: {all_maps}) or an existing file.")


def load(path: str, **kwargs) -> Map:
    if path.endswith((".h5", ".hdf5")):
        return read_hdf_map(path, **kwargs)
    if path.endswith((".fits", ".fits.gz")):
        from ..io.fits import read_fits_map

        return read_fits_map(path, **kwargs)
    raise ValueError(f"Cannot infer map format from '{path}'.")


def read_hdf_map(path: str, **kwargs) -> Map:
    import h5py

    with h5py.File(path, "r") as f:
        data = f["data"][:]
        attrs = dict(f.attrs)
        nu = f["nu"][:] if "nu" in f else None
        t = f["t"][:] if "t" in f else None
        weight = f["weight"][:] if "weight" in f else None
    if "resolution_deg" in attrs:
        return ProjectionMap(
            data=data,
            weight=weight,
            center=attrs["center_deg"],
            resolution=attrs["resolution_deg"],
            frame=attrs.get("frame", "ra/dec"),
            stokes=attrs.get("stokes"),
            nu=nu,
            t=t,
            units=attrs.get("units", "K_RJ"),
            degrees=True,
        )
    return HEALPixMap(
        data=data, frame=attrs.get("frame", "galactic"), stokes=attrs.get("stokes"),
        nu=nu, t=t, units=attrs.get("units", "K_CMB"),
    )
