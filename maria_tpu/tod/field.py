"""Offset-factored TOD field storage (reference maria/tod/field.py:5-23).

A detector-power timestream sits at ~1e2 pW with fluctuations of ~1e-4
pW; storing it raw in float32 wastes most of the mantissa on the DC
level. `Field` factors out the per-detector time mean (kept at float64)
and stores only the residual at the requested dtype — the same
precision trick the fused device program uses internally (loadings
accumulate mean-subtracted; ops/program.py). The reference backs the
residual with a dask array; here it is a plain numpy array (device
arrays are handed to jax explicitly at the program boundary).
"""

from __future__ import annotations

import numpy as np


class Field:
    __slots__ = ("_offset", "_residual", "dtype")

    def __init__(self, data, dtype: type = np.float32):
        self.dtype = dtype
        self.data = data

    @property
    def data(self) -> np.ndarray:
        return self._offset[..., None] + self._residual

    @data.setter
    def data(self, value):
        value = np.asarray(value)
        self._offset = np.asarray(value.mean(axis=-1), dtype=np.float64)
        self._residual = np.asarray(value - self._offset[..., None], dtype=self.dtype)

    @property
    def offset(self) -> np.ndarray:
        """Per-detector DC level, float64."""
        return self._offset

    @property
    def residual(self) -> np.ndarray:
        """Mean-subtracted timestream at storage dtype."""
        return self._residual

    @property
    def shape(self):
        return self._residual.shape

    def __getitem__(self, key) -> "Field":
        return Field(data=self.data[key], dtype=self.dtype)

    def __repr__(self) -> str:
        return f"Field(shape={self._residual.shape}, dtype={np.dtype(self.dtype).name})"
