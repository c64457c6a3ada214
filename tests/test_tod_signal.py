"""TOD signal toolkit: cuts, phase templates, downsampling, circular
statistics (reference maria/tod/signal.py)."""

import numpy as np
import pytest

from maria_tpu.tod import Field
from maria_tpu.tod.signal import (
    apply_cuts,
    contiguous_runs,
    downsample,
    get_kernel,
    get_phase_template,
    make_cuts,
    unwrap_angle,
    weighted_binned_mean,
)


def test_weighted_binned_mean(rng):
    x = rng.uniform(0, 10, 5000)
    y = 2 * x + rng.normal(0, 0.01, 5000)
    y[::97] = np.nan
    bins = np.linspace(0, 10, 11)
    m = weighted_binned_mean(x, y, bins)
    centers = 0.5 * (bins[1:] + bins[:-1])
    assert np.allclose(m, 2 * centers, atol=0.05)


def test_kernel_normalized():
    k = get_kernel(5)
    assert len(k) == 9
    assert np.isclose(k.sum(), 1.0)
    assert np.argmax(k) == 4


def test_unwrap_angle_across_branch_cut():
    # a sweep crossing ±pi must come back contiguous
    sweep = np.angle(np.exp(1j * np.linspace(np.pi - 0.3, np.pi + 0.3, 100)))
    assert np.abs(np.diff(sweep)).max() > 1.0  # wrapped input jumps
    un = unwrap_angle(sweep)
    assert np.abs(np.diff(un)).max() < 0.05


@pytest.mark.parametrize("method", ["flat", "triangle"])
def test_downsample_preserves_level(rng, method):
    data = 3.0 + rng.normal(0, 1, (4, 1000))
    out = downsample(data, rate=5, method=method)
    assert out.shape[0] == 4
    assert 150 < out.shape[1] <= 200
    assert np.allclose(out.mean(), 3.0, atol=0.05)
    # a smooth signal survives downsampling (window centers: triangle
    # kernels span [5j, 5j+8], flat blocks span [5j+1, 5j+5])
    t = np.linspace(0, 1, 1000)
    smooth = np.sin(2 * np.pi * 3 * t)[None]
    ds = downsample(smooth, rate=5, method=method)
    center = 4 if method == "triangle" else 3
    t_ds = t[center : center + 5 * ds.shape[1] : 5]
    assert np.allclose(ds[0, 10:-10], np.sin(2 * np.pi * 3 * t_ds)[10:-10], atol=0.02)


def test_phase_template_recovers_synchronous_signal(rng):
    n_det, n_t = 8, 2000
    phase = (2 * np.pi * 0.011 * np.arange(n_t)) % (2 * np.pi)
    sync = np.cos(phase)
    gains = rng.uniform(0.5, 2.0, n_det)
    data = np.outer(gains, sync) + rng.normal(0, 0.05, (n_det, n_t))
    template = get_phase_template(data, phase, n_phase_bins=32)
    resid = data - template
    assert resid.std() < 0.3 * data.std()


def test_contiguous_runs_merging():
    mask = np.zeros(20, dtype=bool)
    mask[3:6] = True
    mask[7:9] = True  # gap of 1 -> merged at tol=1
    mask[15] = True
    runs = contiguous_runs(mask, tol=1)
    assert runs == [(3, 8), (15, 15)]
    assert contiguous_runs(np.zeros(5, dtype=bool)) == []


def test_make_and_apply_cuts(rng):
    n_det, n_t = 3, 4000
    data = np.cumsum(rng.normal(0, 1e-3, (n_det, n_t)), axis=1)
    data[1, 2000:2012] += 50.0  # a glitch on one detector
    cuts = make_cuts(data)
    assert len(cuts) == n_det
    assert len(cuts[1]) >= 1
    s, e = cuts[1][0]
    assert s < 2012 and e > 2000

    spliced = apply_cuts(data, cuts, method="splice")
    assert np.nanmax(np.abs(spliced[1])) < 10.0
    flattened = apply_cuts(data, cuts, method="flatten")
    assert np.isfinite(flattened[1]).all()


def test_field_offset_factorization(rng):
    # DC of ~1e2 with 1e-4 fluctuations: raw float32 would quantize at
    # ~6e-6 relative; factored storage keeps the fluctuation structure
    raw = 150.0 + 1e-4 * rng.normal(0, 1, (4, 256)).astype(np.float64)
    f = Field(raw)
    assert f.residual.dtype == np.float32
    assert f.offset.dtype == np.float64
    assert np.allclose(f.data, raw, atol=1e-9)
    sub = f[1:3]
    assert sub.shape == (2, 256)
    assert np.allclose(sub.data, raw[1:3], atol=1e-9)
