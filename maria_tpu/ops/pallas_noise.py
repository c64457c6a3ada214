"""Pallas TPU kernel for banded (white + pink) noise synthesis.

The jnp noise path (noise/generate_noise_with_knee -> ops/fft.irfft_
matmul) is HBM-bound: XLA materializes ~35 det x frequency temporaries
(Hermitian packing concatenates/reverses, complex matmuls decomposed
into real planes with layout copies, the final interleave) — measured
21.5 GB / ~40 ms per AtLAST-50k x 60 s field on v5e for an output that
is 0.6 GB. This kernel runs the whole spectrum -> time chain in VMEM
per detector tile, so HBM traffic drops to one read of the normal draws
plus one write of the time-domain noise.

The math avoids every in-kernel reversal/concatenate by folding the
irfft's Hermitian packing into precomputed spectral weights. For even
n, m = n/2, half-spectrum S = c * z (c real >= 0, z complex unit
normals, z_0/z_m real):

    x[2t] + i x[2t+1] = y[t],   y = ifft_m(u),
    u_k = alpha_k z_k + beta_k conj(z_{m-k}),
    alpha_k = (1 + i W_k) c_k / 2,  beta_k = (1 - i W_k) c_{m-k} / 2,
    W_k = exp(2 pi i k / n)

and the flipped-conjugate branch collapses via
ifft(beta * flip(conj(z))) = conj(ifft(gamma * z)), gamma_j =
conj(beta_{m-j}) — so y = ifft(alpha*z) + conj(ifft(gamma*z)). The
DC/Nyquist pair rides the draw's k=0 slot (two real normals z_0, z_m)
with its constant-in-time term folded into the k=0 weights:
alpha_0 = (a0 - i b0)/2, gamma_0 = conj(a0 + i b0)/2 for the original
a0 = alpha_0, b0 = beta_0. Verified exact against numpy.fft.irfft
(tests/test_pallas_noise.py).

The inverse DFT itself is the same two-factor Cooley-Tukey split as
ops/fft.ifft_matmul (m = n1*n2, two small MXU matmuls + a twiddle), on
a frequency layout permuted host-side so both contractions run on the
last axis (Mosaic inserts slow relayouts for dim-0 contractions — see
ops/pallas_binning.py's notes). m <= 512 uses one dense m x m matmul.

Distribution contract: identical to generate_noise_with_knee's
detector-noise component for the SAME normal draws (sample-exact,
tested); the draws themselves use the same threefry key stream shapes,
reordered — so realizations differ from the jnp path but the process
(PSD fs + (1-corr_prop) * w(f)^2) is identical.

Reference behavior: maria/noise/generation.py:11-47.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pink_noise_pallas", "use_pallas_noise", "pink_consts"]

_SINGLE_MAX = 512  # same threshold as ops/fft._idft_constants
_TILE_D = 128


def use_pallas_noise() -> bool:
    """Whether the Pallas noise kernel should replace the jnp path.

    Default: yes on TPU. Override with MARIA_TPU_PALLAS_NOISE=0|1.
    NOTE for explicitly det-sharded batch programs on real multi-chip
    meshes: pallas_call does not partition — pass
    MARIA_TPU_PALLAS_NOISE=0 there (the CPU-mesh test paths are already
    excluded by the backend gate)."""
    import os

    mode = os.environ.get("MARIA_TPU_PALLAS_NOISE", "").lower()
    if mode in ("0", "false", "off"):
        return False
    if mode in ("1", "true", "on"):
        return True
    return jax.default_backend() == "tpu"


def _best_split(m: int):
    best = None
    for f1 in range(2, int(np.sqrt(m)) + 1):
        if m % f1 == 0:
            best = (m // f1, f1)
    return best


@lru_cache(maxsize=64)
def pink_consts(n: int, weights_key: tuple):
    """Host constants for the kernel. `weights_key` is the hashable
    (rounded) tuple of the m+1 real spectral weights c_k (including the
    sqrt(n/2)/sqrt(n) spectral-white scales)."""
    c = np.asarray(weights_key, dtype=np.float64)
    m = n // 2
    if n % 2 or len(c) != m + 1:
        raise ValueError("pink_consts needs even n and m+1 weights")
    W = np.exp(2j * np.pi * np.arange(m) / n)
    alpha = 0.5 * (1 + 1j * W) * c[:m]
    beta = 0.5 * (1 - 1j * W) * c[m - np.arange(m)]
    a0, b0 = alpha[0], beta[0]
    gamma = np.zeros(m, dtype=np.complex128)
    j = np.arange(1, m)
    gamma[j] = np.conj(beta[m - j])
    # DC/Nyquist: the draw's k=0 slot carries the two real edge normals
    # (z0, zm); their constant-in-time contribution (a0 z0 + b0 zm)/m
    # folds exactly into the two branches' k=0 weights (tested):
    alpha[0] = 0.5 * (a0 - 1j * b0)
    gamma[0] = np.conj(0.5 * (a0 + 1j * b0))

    split = _best_split(m) if m > _SINGLE_MAX else None

    def planes(z):  # complex (..., ) -> (2, ...) f32
        return np.stack([z.real, z.imag]).astype(np.float32)

    if split is None:
        k = np.arange(m)
        E = np.exp(2j * np.pi * np.outer(k, k) / m) / m  # symmetric
        return {
            "mode": "single",
            "m": m,
            "ag": np.stack([planes(alpha), planes(gamma)]),  # (branch, re/im, m)
            "E": planes(E),  # (2, m, m)
        }
    n1, n2 = split
    k1, k2 = np.arange(n1), np.arange(n2)
    E1 = np.exp(2j * np.pi * np.outer(k1, k1) / n1)  # symmetric
    E2 = np.exp(2j * np.pi * np.outer(k2, k2) / n2)  # symmetric
    T = np.exp(2j * np.pi * np.outer(k2, k1) / m) / m  # (k2, a) layout

    def perm(v):  # linear k = k2 + n2*k1 -> (k2, k1) storage
        return np.ascontiguousarray(v.reshape(n1, n2).T)

    return {
        "mode": "split",
        "m": m,
        "n1": n1,
        "n2": n2,
        # (branch, re/im, n2, n1)
        "ag": np.stack([planes(perm(alpha)), planes(perm(gamma))]),
        "E1": planes(E1),  # (2, n1, n1)
        "E2": planes(E2),  # (2, n2, n2)
        "T": planes(T),  # (2, n2, n1)
    }


def _cmm(ar, ai, br, bi):
    """Complex matmul from real planes, f32 accumulate on the MXU."""
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


def _box_muller(shape):
    """Two independent standard-normal arrays from the in-kernel PRNG.

    Exactly normal apart from a ~5.9-sigma tail clip (u1 >= 2^-25 by
    construction) — below one expected event per ~5e8 samples, far under
    threefry+erfinv's own f32 tail behavior."""
    inv24 = jnp.float32(1.0 / (1 << 24))

    def uniform():
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # >>8 leaves 24 bits, so the int32 reinterpretation is positive
        # (Mosaic has no uint32 -> float32 cast)
        hi24 = pltpu.bitcast(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
        )
        return (hi24.astype(jnp.float32) + 0.5) * inv24

    u1, u2 = uniform(), uniform()
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = jnp.float32(2.0 * np.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _split_kernel(n1: int, n2: int, in_kernel_prng: bool = False):
    """Kernel output: y planes (D, 2, n1, n2) = [d, re/im, a, s] with
    t = a + n1*s. The final interleave x[2t]=Re y, x[2t+1]=Im y is a
    pure layout op Mosaic cannot reshape in-register (lane-crossing);
    it runs OUTSIDE as transpose(0,3,2,1).reshape — XLA fuses it into
    the consumer's elementwise pass, so it costs no extra HBM trip.

    Both DFT stages run as ONE matmul each: the four real planes
    (re/im x two branches) stack into the M dimension and [Er | Ei]
    concatenates into N. Sixteen small matmuls per tile ran ~5x slower
    than their padded-MAC bound from per-op MXU startup; two batched
    ones approach it (measured on v5e).

    With `in_kernel_prng` the draw never touches HBM: Box-Muller
    normals from the Mosaic PRNG, seeded per (key, tile) — the
    narrow-lane (48-wide) z DMA was the largest single cost of the
    input variant. Compiled-TPU only (the interpreter lacks prng_seed);
    the input variant stays as the CPU-testable reference."""

    def body(zre, zim, D, ag_ref, E1_ref, E2_ref, T_ref, out_ref):
        E1cat = jnp.concatenate([E1_ref[0], E1_ref[1]], axis=1)  # (n1, 2n1)
        E2cat = jnp.concatenate([E2_ref[0], E2_ref[1]], axis=1)  # (n2, 2n2)
        Tr, Ti = T_ref[0], T_ref[1]
        dot = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)

        # stage 1: rows = [vr_a; vi_a; vr_g; vi_g], cols = [E1r | E1i]
        vs = []
        for branch in (0, 1):
            wr = ag_ref[branch, 0][None]  # (1, n2, n1)
            wi = ag_ref[branch, 1][None]
            vs.append(zre * wr - zim * wi)
            vs.append(zre * wi + zim * wr)
        lhs1 = jnp.concatenate(vs, axis=0).reshape(-1, n1)  # (4 D n2, n1)
        X = dot(lhs1, E1cat).reshape(4, D, n2, 2 * n1)
        Bs = []
        for branch in (0, 1):
            XrE = X[2 * branch]  # vr @ [E1r | E1i]
            XiE = X[2 * branch + 1]  # vi @ [E1r | E1i]
            Ar = XrE[..., :n1] - XiE[..., n1:]
            Ai = XrE[..., n1:] + XiE[..., :n1]
            Bs.append(Ar * Tr[None] - Ai * Ti[None])
            Bs.append(Ar * Ti[None] + Ai * Tr[None])

        # stage 2: one transpose + one matmul for all four planes
        C = jnp.swapaxes(jnp.concatenate(Bs, axis=0), 1, 2)  # (4D, n1, n2)
        X2 = dot(C.reshape(-1, n2), E2cat).reshape(4, D, n1, 2 * n2)
        Yr_a = X2[0][..., :n2] - X2[1][..., n2:]
        Yi_a = X2[0][..., n2:] + X2[1][..., :n2]
        Yr_g = X2[2][..., :n2] - X2[3][..., n2:]
        Yi_g = X2[2][..., n2:] + X2[3][..., :n2]
        out_ref[:, 0] = Yr_a + Yr_g
        out_ref[:, 1] = Yi_a - Yi_g  # conj branch

    if in_kernel_prng:

        def kernel(seed_ref, ag_ref, E1_ref, E2_ref, T_ref, out_ref):
            # two-word seed + tile index (three-operand prng_seed hits a
            # Mosaic lowering bug; mix the tile in arithmetically)
            golden = jnp.int32(np.int32(np.uint32(0x9E3779B9)))
            pltpu.prng_seed(seed_ref[0] + golden * pl.program_id(0), seed_ref[1])
            D = out_ref.shape[0]
            zre, zim = _box_muller((D, n2, n1))
            body(zre, zim, D, ag_ref, E1_ref, E2_ref, T_ref, out_ref)

    else:

        def kernel(z_ref, ag_ref, E1_ref, E2_ref, T_ref, out_ref):
            body(z_ref[:, 0], z_ref[:, 1], z_ref.shape[0], ag_ref, E1_ref, E2_ref, T_ref, out_ref)

    return kernel


def _single_kernel(m: int):
    """Kernel output: y planes (D, 2, m) = [d, re/im, t]."""

    def kernel(z_ref, ag_ref, E_ref, out_ref):
        zre, zim = z_ref[:, 0], z_ref[:, 1]  # (D, m)
        Er, Ei = E_ref[0], E_ref[1]
        ys = []
        for branch in (0, 1):
            wr = ag_ref[branch, 0][None]
            wi = ag_ref[branch, 1][None]
            vr = zre * wr - zim * wi
            vi = zre * wi + zim * wr
            Yr, Yi = _cmm(vr, vi, Er, Ei)
            if branch:
                Yi = -Yi
            ys.append((Yr, Yi))
        out_ref[:, 0] = ys[0][0] + ys[1][0]
        out_ref[:, 1] = ys[0][1] + ys[1][1]

    return kernel


def pink_noise_pallas(
    key,
    n_det: int,
    n: int,
    weights: np.ndarray,
    n_fft: int = None,
    interpret: bool = False,
    draw: str = "auto",
):
    """(n_det, n) f32 noise x = irfft(weights * z)[..., :n] with z the
    standard spectral-white complex draw — the detector component of
    generate_noise_with_knee, computed in VMEM per detector tile.

    `weights` is the (n_fft//2 + 1,) REAL half-spectrum amplitude
    (spectral-white scales included), host numpy. Same key -> same
    realization on every call and every tiling.

    `draw`: "kernel" generates the normals with the in-kernel Mosaic
    PRNG (no HBM round-trip for the draw; compiled-TPU only), "input"
    draws with threefry outside and passes them in (the CPU-testable
    reference — sample-exact vs irfft for the same draw), "auto" picks
    "kernel" when compiling for TPU. The two modes are the same
    process, different realizations."""
    n_fft = int(n_fft if n_fft is not None else n)
    if n_fft % 2:
        raise ValueError("pink_noise_pallas requires even n_fft")
    m = n_fft // 2
    consts = pink_consts(n_fft, tuple(np.asarray(weights, dtype=np.float32).tolist()))
    Dp = -(-n_det // _TILE_D) * _TILE_D
    if draw == "auto":
        draw = "kernel" if (not interpret and jax.default_backend() == "tpu") else "input"

    if consts["mode"] == "split":
        n2, n1 = consts["n2"], consts["n1"]
        args = (
            jnp.asarray(consts["ag"]),
            jnp.asarray(consts["E1"]),
            jnp.asarray(consts["E2"]),
            jnp.asarray(consts["T"]),
        )
        const_specs = [
            pl.BlockSpec((2, 2, n2, n1), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, n2, n2), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, n2, n1), lambda i: (0, 0, 0)),
        ]
        if draw == "kernel":
            seed = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
            lead, lead_spec = seed, pl.BlockSpec(memory_space=pltpu.SMEM)
        else:
            lead = jax.random.normal(key, (Dp, 2, n2, n1), dtype=jnp.float32)
            lead_spec = pl.BlockSpec((_TILE_D, 2, n2, n1), lambda i: (i, 0, 0, 0))
        kernel = _split_kernel(n1, n2, in_kernel_prng=(draw == "kernel"))
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Dp, 2, n1, n2), jnp.float32),
            grid=(Dp // _TILE_D,),
            in_specs=[lead_spec] + const_specs,
            out_specs=pl.BlockSpec((_TILE_D, 2, n1, n2), lambda i: (i, 0, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                # the narrow-lane (48/32-wide) relayout temporaries push
                # past the default 16 MB scoped-vmem budget at 128-det
                # tiles; the hardware has far more
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lead, *args)
        # [d, p, a, s], t = a + n1*s -> x[d, 2t+p]: dims (s, a, p) C-order.
        # Pure layout; XLA fuses it into the consumer's elementwise pass.
        x = y.transpose(0, 3, 2, 1).reshape(Dp, n_fft)
    else:
        z = jax.random.normal(key, (Dp, 2, m), dtype=jnp.float32)
        kernel = _single_kernel(m)
        args = (
            jnp.asarray(consts["ag"]),
            jnp.asarray(consts["E"]),
        )
        in_specs = [
            pl.BlockSpec((_TILE_D, 2, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, 2, m), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, m, m), lambda i: (0, 0, 0)),
        ]
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Dp, 2, m), jnp.float32),
            grid=(Dp // _TILE_D,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_TILE_D, 2, m), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(z, *args)
        x = y.transpose(0, 2, 1).reshape(Dp, n_fft)
    return x[:n_det, :n]


def pink_time_reference(z, weights, n: int):
    """jnp reference of the kernel math from an EXPLICIT draw `z` of
    kernel layout ((D, 2, n2, n1) or (D, 2, m)): maps z back to the
    linear spectrum and runs numpy-convention irfft. Used by the
    equality tests; also documents the draw-slot convention."""
    weights = np.asarray(weights)
    m = len(weights) - 1
    D = z.shape[0]
    zre, zim = z[:, 0].reshape(D, -1), z[:, 1].reshape(D, -1)
    if z.ndim == 4:  # split layout (k2, k1) -> linear k = k2 + n2*k1
        n2, n1 = z.shape[2], z.shape[3]
        zre = jnp.swapaxes(z[:, 0], 1, 2).reshape(D, m)
        zim = jnp.swapaxes(z[:, 1], 1, 2).reshape(D, m)
    S = jnp.zeros((D, m + 1), dtype=jnp.complex64)
    S = S.at[:, :m].set(zre + 1j * zim)
    S = S.at[:, 0].set(zre[:, 0])  # k=0 slot re -> real DC normal
    S = S.at[:, m].set(zim[:, 0])  # k=0 slot im -> real Nyquist normal
    return jnp.fft.irfft(jnp.asarray(weights) * S, n=2 * m, axis=-1)[:, :n]


def _shared_v_call(seeds, n_det: int, c_np, batch: int, interpret: bool):
    """pallas_call for `shared_v_pallas`: `batch` independent draws
    flattened into the grid (grid tile i serves batch member
    i // tiles_per_member). `seeds` is (batch, 2) int32 in SMEM."""
    m1 = len(c_np)
    Dp = -(-n_det // _TILE_D) * _TILE_D
    tiles = Dp // _TILE_D

    def kernel(seed_ref, c_ref, re_ref, im_ref):
        golden = jnp.int32(np.int32(np.uint32(0x9E3779B9)))
        i = pl.program_id(0)
        b = i // tiles
        t = i % tiles
        pltpu.prng_seed(seed_ref[b, 0] + golden * t, seed_ref[b, 1])
        z_re, z_im = _box_muller((re_ref.shape[0], m1))
        c = c_ref[...]
        re_ref[...] = (z_re * c).astype(jnp.bfloat16)
        im_ref[...] = (z_im * c).astype(jnp.bfloat16)

    re, im = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch * Dp, m1), jnp.bfloat16),
            jax.ShapeDtypeStruct((batch * Dp, m1), jnp.bfloat16),
        ),
        grid=(batch * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m1,), lambda i: (0,)),
        ],
        out_specs=(
            pl.BlockSpec((_TILE_D, m1), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_D, m1), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(seeds, jnp.asarray(c_np))
    # [re | im] column order matches the matmul basis B = [C; S]
    V = jnp.concatenate([re, im], axis=1)
    return V.reshape(batch, Dp, 2 * m1)[:, :n_det]


def shared_v_pallas(key, n_det: int, c, interpret: bool = False):
    """(n_det, 2*(m+1)) bf16 V rows for the shared-shape matmul-noise
    path (noise/dft.py): columns [re_0..re_m, im_0..im_m] of c * z with
    z standard normal from the in-kernel Mosaic PRNG, seeded per
    (key, tile) — the threefry bits->normals chain this replaces
    measured ~5 ms of VPU per AtLAST-50k x 60 s realization. Same
    process as the threefry draw, different realization for the same
    key. Compiled-TPU only (the interpreter lacks prng_seed).

    vmap over `key` (the bench chains batched realizations) folds the
    batch into the grid via a custom batching rule — each member draws
    from its own seed, so batched == stacked unbatched calls."""
    c_np = np.asarray(c, dtype=np.float32)

    @jax.custom_batching.custom_vmap
    def core(seed2):
        return _shared_v_call(seed2[None], n_det, c_np, 1, interpret)[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, seeds):  # noqa: ARG001
        return _shared_v_call(seeds, n_det, c_np, axis_size, interpret), True

    return core(jax.random.key_data(key).astype(jnp.int32).reshape(2))
