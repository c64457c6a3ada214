"""Conditional-Gaussian autoregressive extrusion
(reference: maria/atmosphere/process.py:19-209; model paper arXiv:2111.01319).

The streaming-capable turbulence generator: each new edge row of the
screen is conditioned on an exponentially-decimated set of previously
extruded samples. Covariance setup (Matérn matrices, the A = C_ES C_SS^-1
propagator and the Cholesky innovation factor B) runs on the host in
float64; the sequential extrusion runs on device as a `lax.scan` whose
body is two dense matmuls (A: n_edge x n_sample, B: n_edge x n_edge) —
MXU work — plus a gather.

This path exists for parity and for streaming arbitrarily long
observations at O(1) memory; the default synthesis path is
`fourier.synthesize_matern_field_2d`.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..functions import approximate_normalized_matern
from ..utils import fast_psd_inverse

logger = logging.getLogger("maria_tpu")

COV_MAT_JITTER = 1e-6


def _ar_extrude_noise(A, B, buffer_init, ext_idx, cross_idx, noise):
    """Run the AR loop with explicit innovations: fill buffer rows from
    high index down to 0. buffer has shape (n_steps + n_lookback, n_cross);
    row b is conditioned on rows b + ext_idx + 1 at columns cross_idx.
    noise is (n_steps, n_live_edge), consumed newest-row-first."""
    n_steps = noise.shape[0]

    def step(buffer, inputs):
        b_index, eps = inputs
        sample = buffer[b_index + ext_idx + 1, cross_idx]
        new_row = A @ sample + B @ eps
        buffer = jax.lax.dynamic_update_index_in_dim(buffer, new_row, b_index, axis=0)
        return buffer, None

    b_indices = jnp.arange(n_steps - 1, -1, -1)
    buffer, _ = jax.lax.scan(step, buffer_init, (b_indices, noise))
    return buffer


@partial(jax.jit, static_argnames=("n_steps",))
def _ar_extrude(key, A, B, buffer_init, ext_idx, cross_idx, n_steps: int):
    """PRNG-keyed wrapper around `_ar_extrude_noise`."""
    noise = jax.random.normal(key, (n_steps, A.shape[0]), dtype=buffer_init.dtype)
    return _ar_extrude_noise(A, B, buffer_init, ext_idx, cross_idx, noise)


class AutoregressiveProcess:
    def __init__(
        self,
        cross_section: np.ndarray,
        extrusion: np.ndarray,
        callback=approximate_normalized_matern,
        callback_kwargs: dict = {},
        jitter: float = 1e-8,
        MIN_SAMPLES_PER_LAYER: int = 4,
    ):
        """`cross_section` is (n_cross, 2) points in the (transverse, height)
        plane; `extrusion` is the 1-D grid along the extrusion axis."""
        self.cross_section = np.asarray(cross_section, dtype=float)
        self.extrusion = np.asarray(extrusion, dtype=float)
        self.callback = callback
        self.callback_kwargs = dict(callback_kwargs)
        self.jitter = jitter

        self.n_cross_section = len(self.cross_section)
        self.n_extrusion = len(self.extrusion)

        # exponentially-decimated lookback: extrusion indices 0,1,2,4,...,
        # with cross-section sampling density halved at each ring
        # (reference process.py:44-67)
        extrusion_indices = [
            0,
            *(2 ** np.arange(0, np.log2(max(self.n_extrusion, 2)))).astype(int),
            self.n_extrusion - 1,
        ]
        cross_idx_list, ext_idx_list = [], []
        for i, e_idx in enumerate(extrusion_indices):
            n_ring = int(np.clip(self.n_cross_section * 2**-i, MIN_SAMPLES_PER_LAYER, self.n_cross_section))
            c_idx = np.unique(np.linspace(0, self.n_cross_section - 1, n_ring).astype(int))
            cross_idx_list.append(c_idx)
            ext_idx_list.append(np.full(len(c_idx), e_idx))
        self.cross_section_sample_index = np.concatenate(cross_idx_list)
        self.extrusion_sample_index = np.concatenate(ext_idx_list)

        e_res = float(np.gradient(self.extrusion).mean())
        self.extrusion_res = e_res

        self.sample_points = np.c_[
            self.extrusion[self.extrusion_sample_index],
            self.cross_section[self.cross_section_sample_index],
        ]
        self.n_sample = len(self.sample_points)

        # the live edge sits one extrusion step ahead of row 0
        self.live_edge_points = np.c_[
            np.full(self.n_cross_section, self.extrusion[0] - e_res),
            self.cross_section,
        ]
        self.n_live_edge = self.n_cross_section

        if self.n_sample > 4000:
            logger.warning(
                f"Large covariance matrix (n_side={self.n_sample}); setup is O(n^3) on the host.",
            )

        self._computed = False

    def compute_covariance_matrices(self):
        """Host float64 setup (reference process.py:111-189)."""
        def cov(p, q):
            d = np.sqrt(np.square(p[:, None] - q[None]).sum(axis=-1))
            return self.callback(d, **self.callback_kwargs)

        COV_E_E = cov(self.live_edge_points, self.live_edge_points)
        np.fill_diagonal(COV_E_E, 1.0 + self.jitter)
        COV_E_E += np.diag(COV_MAT_JITTER * np.diag(COV_E_E))

        COV_E_S = cov(self.live_edge_points, self.sample_points)

        COV_S_S = cov(self.sample_points, self.sample_points)
        np.fill_diagonal(COV_S_S, 1.0 + self.jitter)
        COV_S_S += np.diag(COV_MAT_JITTER * np.diag(COV_S_S))

        A = COV_E_S @ fast_psd_inverse(COV_S_S)
        if (A.sum(axis=-1) > 1.0).any():
            raise ValueError(
                f"Propagation operator is unstable (max row sum = {A.sum(axis=-1).max():.4f}).",
            )
        B = np.linalg.cholesky(COV_E_E - A @ COV_E_S.T)

        self.A = jnp.asarray(A, dtype=jnp.float32)
        self.B = jnp.asarray(B, dtype=jnp.float32)
        self._ext_idx = jnp.asarray(self.extrusion_sample_index)
        self._cross_idx = jnp.asarray(self.cross_section_sample_index)
        self._computed = True

    def run_setup(self):
        """Factorize the covariance operators (host), escalating the
        jitter if the matrix is numerically singular."""
        if self._computed:
            return
        for jitter in (self.jitter, 1e-6, 1e-4):
            self.jitter = jitter
            try:
                self.compute_covariance_matrices()
                return
            except np.linalg.LinAlgError:
                logger.debug(f"Singular covariance with jitter={jitter}")
        raise np.linalg.LinAlgError("Covariance matrix singular at max jitter.")

    def run(self, key=None) -> jnp.ndarray:
        """Generate a (n_extrusion, n_cross_section) unit-variance screen."""
        self.run_setup()

        key = key if key is not None else jax.random.key(np.random.randint(2**31))
        key_init, key_scan = jax.random.split(key)

        n_steps = 2 * self.n_extrusion
        buffer_init = jax.random.normal(
            key_init, (self.n_extrusion + n_steps, self.n_cross_section), dtype=jnp.float32
        )
        buffer = _ar_extrude(
            key_scan, self.A, self.B, buffer_init, self._ext_idx, self._cross_idx, n_steps
        )
        self.values = buffer[: self.n_extrusion]
        return self.values
