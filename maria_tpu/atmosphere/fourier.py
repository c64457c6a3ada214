"""FFT spectral synthesis of Matérn turbulence fields.

This is the TPU-native default path for turbulence generation: instead of
the reference's sequential conditional-Gaussian extrusion (reference
maria/atmosphere/process.py:191-209, an inherently serial loop), each
layer's screen is drawn *at once* as a stationary Gaussian random field
with the exact Whittle-Matérn spectral density, via two FFTs on a
padded grid. Beam smoothing fuses into the same spectral multiply
(the reference smooths separately with scipy.ndimage.gaussian_filter,
atmosphere.py:341-344).

Spectra and covariances agree with the AR path by construction (both
target normalized_matern); the test suite checks the realized covariance
against the closed form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..functions import matern_spectral_density

__all__ = [
    "good_fft_size",
    "white_rfft2_spectrum",
    "synthesize_matern_field_2d",
    "field_spectral_weights_2d",
    "layered_matern_kz_nodes",
    "layered_field_spectral_weights",
    "synthesize_layered_matern_2d",
]


def white_rfft2_spectrum(key, batch, ny: int, nx: int):
    """Draw Z distributed exactly as rfft2(normal(*batch, ny, nx)) — the
    half-spectrum of 2-D white noise — WITHOUT the forward FFT.

    Interior columns 0 < kx < nx/2 of an rfft2 half-spectrum are free:
    their conjugate partners live in the discarded half, so every entry
    is an independent complex normal with per-component variance N/2
    (N = ny*nx). The self-conjugate columns kx=0 and kx=nx/2 obey a 1-D
    Hermitian symmetry along ky (rows 0 and ny/2 real with variance N),
    restored here by symmetrizing those two columns: (z + conj(z∘rev))/√2
    with rev the ky negation map. Sampling in k-space removes the
    2J-deep stack of forward FFTs from the layered synthesis (the
    heaviest FLOP block of the 3-D atmosphere) while leaving the field
    distribution exactly unchanged.
    """
    if nx % 2:
        raise ValueError("white_rfft2_spectrum requires even nx (good_fft_size sizes)")
    nxr = nx // 2 + 1
    scale = jnp.sqrt(jnp.float32(ny * nx) / 2.0)
    g = scale * jax.random.normal(key, (*batch, ny, nxr, 2), dtype=jnp.float32)
    z = jax.lax.complex(g[..., 0], g[..., 1])
    # Hermitian-symmetrize the kx=0 and kx=nx/2 columns along ky
    cols = z[..., :, (0, nxr - 1)]  # (*batch, ny, 2)
    rev = jnp.roll(cols[..., ::-1, :], 1, axis=-2)  # ky -> (-ky) mod ny
    sym = (cols + jnp.conj(rev)) * np.float32(1 / np.sqrt(2))
    z = z.at[..., :, 0].set(sym[..., 0]).at[..., :, nxr - 1].set(sym[..., 1])
    return z


def good_fft_size(n: int) -> int:
    """Smallest m * 2^k >= n with odd part m in {1, 3, 5, 9}.

    TPU XLA FFTs are fast only when the length's odd part is tiny:
    measured on v5e, n=3072 (3*2^10) runs ~25x faster than n=3000
    (2^3*3*5^3). Restricting the odd factor to <=9 keeps padding
    overhead <=12.5% over the next power of two while staying on the
    fast path.
    """
    n = max(int(n), 16)
    best = 1 << (n - 1).bit_length()
    for m in (3, 5, 9):
        size = m << max(0, (-(-n // m) - 1).bit_length()) if n > m else m
        while size < n:
            size *= 2
        best = min(best, size)
    return best


def _rfft2_double_weights(S):
    """Multiplicity of each rfft2 bin when summing over the full grid
    (columns 0 and nx/2 are not doubled)."""
    weights_full = np.ones_like(S)
    weights_full[:, 1:] = 2.0
    if (2 * (S.shape[1] - 1)) % 2 == 0:
        weights_full[:, -1] = 1.0
    return weights_full


def field_spectral_weights_2d(ny: int, nx: int, dy: float, dx: float, nu: float, r0: float, beam_sigma: float = 0.0):
    """Host-precomputed spectral weights W(k) such that
    irfft2(rfft2(white) * W) is a unit-variance Matérn(nu, r0) field,
    optionally beam-smoothed with a Gaussian of width `beam_sigma`
    (all lengths in meters).

    The DC bin is ZEROED and excluded from the normalization: a
    screen's constant offset is the weather-level mean pwv's job, and
    because S(k) is steep, a retained S(0) bin swallows most of the
    variance budget on any box not much larger than r0 (measured: a
    240 m box left 0.7% of the variance in actual structure)."""
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=dy)
    kx = 2 * np.pi * np.fft.rfftfreq(nx, d=dx)
    k = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    S = matern_spectral_density(k, nu=nu, r0=r0, d=2)
    S[0, 0] = 0.0

    # unit variance: Var(x) = (1/N) sum_k |W_k|^2 over the FULL grid
    norm = np.sqrt(ny * nx / np.sum(_rfft2_double_weights(S) * S))
    W = np.sqrt(S) * norm

    if beam_sigma > 0:
        W = W * np.exp(-0.5 * beam_sigma**2 * k**2)
    return W.astype(np.float32)


def band_split_spectral_weights_2d(
    ny_f: int, nx_f: int, res_f: float,
    ny_c: int, nx_c: int, res_c: float,
    k_c: float, nu: float, r0: float,
    beam_sigma: float = 0.0, order: int = 8,
):
    """(W_fine, W_coarse) for a TWO-BAND screen pair that jointly
    carries the Matérn spectrum: the fine box holds k >~ k_c on a
    footprint-sized grid, the coarse box holds k <~ k_c over a
    spectrum-spanning extent at coarse resolution, and sampling the SUM
    of the two (independently drawn) fields reproduces the one-screen
    statistics — at a tiny fraction of the synthesis cost when the
    footprint is much smaller than r0 (a 10 s stare needs 64^2 + 48^2
    cells instead of 512^2; the single big box regressed the small-
    scene benchmark 3.7x).

    The split is an order-`order` power partition t(k) = k^o/(k^o+k_c^o)
    (t + (1-t) = 1 exactly, so the total spectral density is preserved);
    `k_c` must sit >= 2x above the fine box's fundamental and >= 2x
    below the coarse box's Nyquist so neither box is asked to carry
    modes it cannot represent (residuals < 0.5% at order 8). Both
    bands share one normalization so the SUMMED field has unit
    variance; the beam rides both."""

    def grid_k(ny, nx, d):
        ky = 2 * np.pi * np.fft.fftfreq(ny, d=d)
        kx = 2 * np.pi * np.fft.rfftfreq(nx, d=d)
        return np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)

    def taper(k):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(k > 0, 1.0 / (1.0 + (k_c / np.maximum(k, 1e-30)) ** order), 0.0)
        return t

    k_f = grid_k(ny_f, nx_f, res_f)
    k_cg = grid_k(ny_c, nx_c, res_c)
    S_f = matern_spectral_density(k_f, nu=nu, r0=r0, d=2) * taper(k_f)
    S_c = matern_spectral_density(k_cg, nu=nu, r0=r0, d=2) * (1.0 - taper(k_cg))
    S_f[0, 0] = 0.0
    S_c[0, 0] = 0.0

    var = (np.sum(_rfft2_double_weights(S_f) * S_f) / (ny_f * nx_f)
           + np.sum(_rfft2_double_weights(S_c) * S_c) / (ny_c * nx_c))
    amp = 1.0 / np.sqrt(var)
    W_f = amp * np.sqrt(S_f)
    W_c = amp * np.sqrt(S_c)
    if beam_sigma > 0:
        W_f = W_f * np.exp(-0.5 * beam_sigma**2 * k_f**2)
        W_c = W_c * np.exp(-0.5 * beam_sigma**2 * k_cg**2)
    return W_f.astype(np.float32), W_c.astype(np.float32)


def layered_matern_kz_nodes(nu: float, r0: float, dz_max: float, dz_min: float, J1: int = 64, J2: int = 32):
    """Vertical-wavenumber quadrature for the layered (slab) synthesis of a
    3-D Matérn field: kz nodes and relative weights such that
    sum_j w_j cos(kz_j dz) ~ normalized_matern(dz) for dz in [dz_min, dz_max].

    Hybrid rule: J1 midpoint-uniform nodes with spacing pi/dz_max resolve
    the oscillatory low-kz region (long-range decorrelation), and J2
    geometric tail nodes up to pi/dz_min capture the heavy spectral tail
    that sets the short-range cusp. Weights come from the exact 1-D
    restriction spectrum S1(kz) ∝ (2 nu / r0^2 + kz^2)^-(nu + 1/2).
    Measured accuracy: max abs corr error <= 0.035 for nu=1/3, r0>=1 km.
    """
    s2 = 2 * nu / r0**2
    dkz = np.pi / dz_max
    kz1 = (np.arange(J1) + 0.5) * dkz
    w1 = (s2 + kz1**2) ** -(nu + 0.5) * dkz
    # tail must start where the uniform rule ends and extend upward
    kz_hi = max(np.pi / dz_min, 4 * J1 * dkz)
    edges = np.geomspace(J1 * dkz, kz_hi, J2 + 1)
    kz2 = np.sqrt(edges[:-1] * edges[1:])
    w2 = (s2 + kz2**2) ** -(nu + 0.5) * np.diff(edges)
    kz = np.concatenate([kz1, kz2])
    w = np.concatenate([w1, w2])
    return kz, w / w.sum()


def layered_field_spectral_weights(
    ny: int,
    nx: int,
    dy: float,
    dx: float,
    heights,
    nu: float,
    r0: float,
    beam_sigmas=None,
    J1: int = 64,
    J2: int = 32,
):
    """Host-precomputed operators for vertically-correlated layer screens.

    The L layers at `heights` are modeled as horizontal slices of ONE
    isotropic 3-D Matérn(nu, r0) field, synthesized spectrally: per
    vertical-wavenumber node kz_j, two independent 2-D white fields are
    shaped by W[j](k) = sqrt(S3(sqrt(k^2 + kz_j^2)) * dkz_j); layers mix
    them with cos(kz_j h_l) / sin(kz_j h_l) matrices — an MXU matmul in
    k-space — so every pair of layers has the exact (quadrature-limited)
    3-D cross-covariance. This replaces the reference's stacked-cross-
    section AR process (maria/atmosphere/atmosphere.py:203-257) on the
    synthesis side with FFT/matmul work that XLA maps onto the MXU.

    Returns (W, M_cos, M_sin, beam):
      W:      (J, ny, nx//2+1) per-node 2-D spectral amplitudes
      M_cos:  (L, J), M_sin: (L, J) layer mixing matrices
      beam:   (L, ny, nx//2+1) per-layer Gaussian beam factors, or None
    normalized so each layer field has unit variance before smoothing.
    """
    heights = np.asarray(heights, dtype=np.float64)
    span = max(float(heights.max() - heights.min()), 1.0)
    dz_min = max(5.0, 0.5 * np.diff(np.sort(heights)).min()) if len(heights) > 1 else 5.0
    kz, w_node = layered_matern_kz_nodes(nu, r0, dz_max=2.5 * span + 1e3, dz_min=dz_min, J1=J1, J2=J2)

    ky = 2 * np.pi * np.fft.fftfreq(ny, d=dy)
    kx = 2 * np.pi * np.fft.rfftfreq(nx, d=dx)
    k2 = ky[:, None] ** 2 + kx[None, :] ** 2

    S3 = matern_spectral_density(
        np.sqrt(k2[None] + kz[:, None, None] ** 2), nu=nu, r0=r0, d=3
    )
    # zero + exclude every node's horizontal DC bin: a screen-constant
    # offset is the weather-level mean pwv's job, and the steep density
    # otherwise concentrates each low-kz node's variance budget there
    # (measured 16-32% of layer variance lost to DC on 4-5 km boxes;
    # same disease field_spectral_weights_2d had)
    S3[:, 0, 0] = 0.0

    # normalize PER NODE so each node's grid-summed variance equals its
    # validated quadrature weight w_node (the finite horizontal grid
    # truncates each node's analytic k-integral differently, which would
    # otherwise skew the vertical correlation); cos^2 + sin^2 = 1 then
    # makes every layer's total variance exactly 1
    rfft_w = np.ones((ny, kx.size))
    rfft_w[:, 1:] = 2.0
    if nx % 2 == 0:
        rfft_w[:, -1] = 1.0
    node_var = np.sum(S3 * rfft_w[None], axis=(1, 2)) / (ny * nx)
    W = np.sqrt(S3 * (w_node / node_var)[:, None, None]).astype(np.float32)

    M_cos = np.cos(kz[None, :] * heights[:, None]).astype(np.float32)
    M_sin = np.sin(kz[None, :] * heights[:, None]).astype(np.float32)

    beam = None
    if beam_sigmas is not None:
        sig = np.asarray(beam_sigmas, dtype=np.float64)
        beam = np.exp(-0.5 * sig[:, None, None] ** 2 * k2[None]).astype(np.float32)
    return W, M_cos, M_sin, beam


@partial(jax.jit, static_argnames=("ny", "nx"))
def synthesize_layered_matern_2d(key, W, M_cos, M_sin, beam, ny: int, nx: int):
    """Draw the (L, ny, nx) stack of vertically-correlated layer fields.

    The 2J white half-spectra are drawn directly in k-space (see
    white_rfft2_spectrum — no forward FFTs), then one complex (L, 2J) x
    (2J, ny*nxr) matmul (MXU), per-layer beam multiply, one batched
    irfft2 over L layers: total FFT work is L transforms, not 2J + L.
    """
    J = W.shape[0]
    spec = white_rfft2_spectrum(key, (2 * J,), ny, nx) * jnp.concatenate([W, W], axis=0)
    M = jnp.concatenate([M_cos, M_sin], axis=1)  # (L, 2J)
    mixed = jnp.einsum("lj,jyx->lyx", M.astype(spec.dtype), spec)
    if beam is not None:
        mixed = mixed * beam
    return jnp.fft.irfft2(mixed, s=(ny, nx))


@partial(jax.jit, static_argnames=("ny", "nx"))
def synthesize_matern_field_2d(key, W, ny: int, nx: int):
    """Draw the (ny, nx) real field with spectral weights W (host-built).

    One k-space white draw (white_rfft2_spectrum) + one irfft2 — no
    forward FFT; everything fuses under jit with downstream sampling.
    """
    return jnp.fft.irfft2(white_rfft2_spectrum(key, (), ny, nx) * W, s=(ny, nx))
