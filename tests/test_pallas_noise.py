"""The Pallas pink-noise kernel: exact math vs the irfft convention,
tiling invariance, and the generate_noise_with_knee wiring.

All kernel runs here use interpret mode (tests run on CPU); the
compiled-TPU path is exercised on-chip by bench.py / tpu_session.sh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maria_tpu.noise import (
    _pink_weights_np,
    _spectral_white_scale_np,
    generate_noise_with_knee,
)
from maria_tpu.ops.pallas_noise import (
    _TILE_D,
    pink_consts,
    pink_noise_pallas,
    pink_time_reference,
)


def _weights(n_fft, sample_rate=50.0, knee=1.0, beta=1.0):
    w = _pink_weights_np(n_fft, sample_rate, knee, beta)
    return np.sqrt(sample_rate + w**2) * _spectral_white_scale_np(n_fft)


@pytest.mark.parametrize(
    "n,n_fft",
    [
        (3000, 3072),  # split path (m=1536 = 48*32), truncated
        (500, 512),  # single path (m=256), truncated
        (3072, 3072),  # split, full length
    ],
)
def test_kernel_matches_irfft_reference(n, n_fft):
    """For the SAME draw, the kernel equals irfft(weights * spectrum)."""
    key = jax.random.key(7)
    n_det = 5  # forces a partial tile
    c = _weights(n_fft)
    x = pink_noise_pallas(key, n_det, n, c, n_fft=n_fft, interpret=True)

    consts = pink_consts(n_fft, tuple(np.asarray(c, dtype=np.float32).tolist()))
    Dp = -(-n_det // _TILE_D) * _TILE_D
    if consts["mode"] == "split":
        z = jax.random.normal(key, (Dp, 2, consts["n2"], consts["n1"]), dtype=jnp.float32)
    else:
        z = jax.random.normal(key, (Dp, 2, consts["m"]), dtype=jnp.float32)
    ref = pink_time_reference(z, np.asarray(c, dtype=np.float32), n)[:n_det]

    scale = float(jnp.std(ref))
    assert x.shape == (n_det, n)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=2e-4 * scale)


def test_same_key_same_noise_any_tiling():
    """The realization depends only on the key, not on n_det padding."""
    c = _weights(512)
    a = pink_noise_pallas(jax.random.key(3), 3, 500, c, n_fft=512, interpret=True)
    b = pink_noise_pallas(jax.random.key(3), 9, 500, c, n_fft=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b[:3]))


def test_psd_matches_jnp_path():
    """Per-frequency mean power of the kernel output equals the jnp
    path's (the distribution contract), including the pink end."""
    fs, knee = 50.0, 2.0
    n = n_fft = 2048
    c = _weights(n_fft, fs, knee)
    n_det = 512
    x = np.asarray(
        pink_noise_pallas(jax.random.key(11), n_det, n, c, n_fft=n_fft, interpret=True)
    )
    import os

    os.environ["MARIA_TPU_PALLAS_NOISE"] = "0"
    try:
        y = np.asarray(
            generate_noise_with_knee(
                jax.random.key(12), shape=(n_det, n), sample_rate=fs, knee=knee
            )
        )
    finally:
        os.environ.pop("MARIA_TPU_PALLAS_NOISE", None)

    def mean_power(a):
        return (np.abs(np.fft.rfft(a, axis=-1)) ** 2).mean(axis=0)

    px, py = mean_power(x), mean_power(y)
    f = np.fft.rfftfreq(n, d=1 / fs)
    sel = f > 0
    # n_det=512 draws -> ~4.4% rms per bin; compare octave-binned means
    edges = np.geomspace(f[1], f[-1], 12)
    idx = np.digitize(f[sel], edges)
    for b in np.unique(idx):
        bsel = idx == b
        if bsel.sum() < 4:
            continue
        r = px[sel][bsel].mean() / py[sel][bsel].mean()
        assert abs(r - 1.0) < 0.2, (b, r)
    assert abs(px[sel].mean() / py[sel].mean() - 1.0) < 0.03


def test_generate_noise_with_knee_pallas_path(monkeypatch):
    """The wired path (MARIA_TPU_PALLAS_NOISE=1) produces the same
    process as the jnp path: finite, right shape, matching variance."""
    monkeypatch.setenv("MARIA_TPU_PALLAS_NOISE", "1")
    import maria_tpu.ops.pallas_noise as pn

    # interpret-mode shim: the CPU backend cannot compile Mosaic kernels
    orig = pn.pink_noise_pallas
    monkeypatch.setattr(
        pn, "pink_noise_pallas", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    kw = dict(shape=(64, 700), sample_rate=50.0, knee=1.0)
    x = np.asarray(generate_noise_with_knee(jax.random.key(5), **kw))
    monkeypatch.setenv("MARIA_TPU_PALLAS_NOISE", "0")
    y = np.asarray(generate_noise_with_knee(jax.random.key(5), **kw))
    assert x.shape == y.shape == (64, 700)
    assert np.isfinite(x).all()
    # same process, different realization: variances agree to sqrt(2/N)
    vx, vy = x.var(), y.var()
    assert abs(vx / vy - 1.0) < 0.05
