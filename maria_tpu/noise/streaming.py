"""Streaming 1/f noise for bounded-memory long observations.

The batch generator (noise/__init__.py) synthesizes pink noise with one
FFT over the whole observation — O(n_t) memory, and a chunked FFT would
lose all power below 1/chunk. This module streams the same spectrum at
O(1) state per detector: a sum of K independent AR(1) processes with
log-spaced poles approximates the 1/f^beta spectrum over many decades
(each pole contributes a Lorentzian knee; nonnegative least squares
fits the amplitudes to the target PSD). The recursion over a block is
one `associative_scan` — parallel-prefix, so the time axis still
vectorizes on device.

Chunk-invariance: a block's output depends only on (carried state,
block key), so any grouping of blocks gives identical streams. The
spectrum matches the FFT path's above ~1/T_ref and flattens below it
(stationary, finite variance) — choose T_ref at least the observation
length (tested against the batch generator's periodogram).

Reference behavior: maria/noise/generation.py:11 (white + pink with a
knee); the reference synthesizes eagerly over the full observation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PinkCascade", "StreamingBandNoise"]


def _fit_cascade(sample_rate: float, knee: float, beta: float, T_ref: float, poles_per_decade: float):
    """Fit AR(1) pole/amplitude pairs so that the incoherent sum
    sum_k a_k^2 / |1 - p_k e^{-iw}|^2 matches the batch pink filter's
    squared magnitude 2 * fs * (knee/2) / f^beta on a log grid."""
    # fit one decade below f_min so [f_min, fs/2] sits in the interior of
    # the fit (edge scalloping lands below the band anyone observes)
    f_min = 1.0 / T_ref
    f_lo = f_min / 10
    f_max = sample_rate / 2
    n_decades = np.log10(f_max / f_lo)
    K = max(3, int(np.ceil(n_decades * poles_per_decade)) + 1)
    f_poles = np.geomspace(f_lo / 2, f_max / 2, K)
    p = np.exp(-2 * np.pi * f_poles / sample_rate)

    f_grid = np.geomspace(f_lo, f_max * 0.99, 16 * K)
    w = 2 * np.pi * f_grid / sample_rate
    # design matrix: per-pole AR(1) spectra on the grid
    G = 1.0 / (1 - 2 * p[None, :] * np.cos(w[:, None]) + p[None, :] ** 2)
    target = 2 * sample_rate * (knee / 2) / f_grid**beta
    # weighted NNLS in log-f measure (equal weight per octave)
    import scipy.optimize

    Wt = 1.0 / target  # relative error metric
    A = G * Wt[:, None]
    col = np.linalg.norm(A, axis=0)  # unit columns keep the solve well-conditioned
    res = scipy.optimize.lsq_linear(A / col, target * Wt, bounds=(0.0, np.inf))
    amps2 = res.x
    return p.astype(np.float32), np.sqrt(amps2 / col).astype(np.float32)


class PinkCascade:
    """K independent AR(1) streams whose sum has the pink spectrum."""

    def __init__(
        self,
        sample_rate: float,
        knee: float,
        beta: float = 1.0,
        T_ref: float = 4096.0,
        poles_per_decade: float = 2.0,
    ):
        self.sample_rate = float(sample_rate)
        self.knee = float(knee)
        p, a = _fit_cascade(sample_rate, knee, beta, T_ref, poles_per_decade)
        self.p = jnp.asarray(p)  # (K,)
        self.a = jnp.asarray(a)  # (K,)
        self.K = len(p)

    def init_state(self, key, shape: tuple):
        """Stationary start: x_k ~ N(0, 1/(1-p_k^2))."""
        std = 1.0 / jnp.sqrt(1.0 - self.p**2)
        return std * jax.random.normal(key, (*shape, self.K), dtype=jnp.float32)

    def block(self, state, key, n: int):
        """(state, key, n) -> (new_state, pink (..., n)). The AR(1)
        recursions x_t = p x_{t-1} + w_t run as one parallel prefix
        (associative_scan over the affine maps x -> A x + B)."""
        shape = state.shape[:-1]
        w = jax.random.normal(key, (*shape, self.K, n), dtype=jnp.float32)
        A = jnp.broadcast_to(self.p[:, None], w.shape).astype(jnp.float32)
        B = w.at[..., 0].add(self.p * state)

        def combine(l, r):  # compose affine maps, left-to-right in time
            return (r[0] * l[0], r[0] * l[1] + r[1])

        _, x = jax.lax.associative_scan(combine, (A, B), axis=-1)
        pink = jnp.einsum("k,...kn->...n", self.a, x)
        return x[..., -1], pink


class StreamingBandNoise:
    """Streaming counterpart of `generate_noise_with_knee` for one band:
    white + pink cascade + optional spatially-correlated modes projected
    through the focal-plane basis. Unit NEP; scale outside."""

    def __init__(self, sample_rate, knee, beta=1.0, basis=None, corr_prop=0.0, T_ref=4096.0):
        self.sample_rate = float(sample_rate)
        self.knee = float(knee)
        self.basis = None if basis is None else jnp.asarray(basis, dtype=jnp.float32)
        self.corr_prop = float(corr_prop) if self.basis is not None else 0.0
        self.cascade = PinkCascade(sample_rate, knee, beta, T_ref=T_ref) if knee > 0 else None

    def init_state(self, key, n_det: int):
        if self.cascade is None:
            return ()
        key_det, key_modes = jax.random.split(key)
        det_state = self.cascade.init_state(key_det, (n_det,))
        if self.corr_prop > 0:
            k = self.basis.shape[-1]
            return (det_state, self.cascade.init_state(key_modes, (k,)))
        return (det_state,)

    def block(self, state, key, n_det: int, n: int):
        key_white, key_pink, key_modes = jax.random.split(key, 3)
        noise = jnp.sqrt(self.sample_rate) * jax.random.normal(
            key_white, (n_det, n), dtype=jnp.float32
        )
        if self.cascade is None:
            return state, noise
        det_state, pink = self.cascade.block(state[0], key_pink, n)
        if self.corr_prop > 0:
            mode_state, mode_pink = self.cascade.block(state[1], key_modes, n)
            pink = (
                jnp.sqrt(self.corr_prop) * self.basis @ mode_pink
                + jnp.sqrt(1 - self.corr_prop) * pink
            )
            return (det_state, mode_state), noise + pink
        return (det_state,), noise + pink
