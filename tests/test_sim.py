"""End-to-end simulation tests (modelled on the reference strategy,
maria/tests/atmosphere/test_atmosphere.py:21-28 and tests/tod/test_tod.py)."""

import numpy as np
import pytest

import maria_tpu
from maria_tpu import Simulation, get_plan


@pytest.fixture(scope="module")
def m2_stare_tod():
    sim = Simulation(
        instrument="MUSTANG-2",
        plans="ten_second_zenith_stare",
        site="green_bank",
        atmosphere="2d",
        noise=True,
        seed=42,
    )
    return sim.run()[0]


def test_atmosphere_sim(m2_stare_tod):
    tod = m2_stare_tod
    assert tod.shape == (217, 500)
    sig = np.asarray(tod.signal)
    assert not np.isnan(sig).any()
    atm = np.asarray(tod.data["atmosphere"])
    # plausible sky loading in K_RJ at 93 GHz
    assert 3 < atm.mean() < 290
    # turbulence is detector-detector correlated for a stare
    c = np.corrcoef(atm[::40])
    assert c.min() > 0.9


def test_atmosphere_fluctuations_scale_with_pwv_rms(m2_stare_tod):
    # the atmosphere field should actually fluctuate in time
    atm = np.asarray(m2_stare_tod.data["atmosphere"])
    demeaned = atm - atm.mean(axis=-1, keepdims=True)
    assert demeaned.std() > 0


def test_unit_roundtrip(m2_stare_tod):
    tod_pw = m2_stare_tod.to("pW")
    back = tod_pw.to("K_RJ")
    a = np.asarray(m2_stare_tod.signal)
    b = np.asarray(back.signal)
    assert np.allclose(a, b, rtol=1e-5)
    assert np.abs(np.asarray(tod_pw.signal)).mean() < 1e3  # picowatts are small


def test_uK_conversion(m2_stare_tod):
    tod_uK = m2_stare_tod.to("uK_RJ")
    ratio = np.asarray(tod_uK.signal).mean() / np.asarray(m2_stare_tod.signal).mean()
    assert np.isclose(ratio, 1e6, rtol=1e-5)


def test_noise_level():
    sim = Simulation(
        instrument="test/1deg",
        plans="ten_second_zenith_stare",
        site="chajnantor",
        atmosphere=None,
        noise=True,
        noise_kwargs={"correlated_noise_proportion": 0.0},
        seed=3,
    )
    tod = sim.run(units="pW")[0]
    noise = np.asarray(tod.data["noise"])
    fs = tod.fs
    for band in tod.dets.bands:
        mask = tod.dets.band_name == band.name
        # white level: PSD at high f should be ~2 NEP^2 (one-sided, pW^2/Hz)
        d = noise[mask] * 1e-12
        ps = np.abs(np.fft.rfft(d, axis=-1)) ** 2 / (d.shape[-1] * fs)
        f = np.fft.rfftfreq(d.shape[-1], 1 / fs)
        white = 2 * ps[:, f > 4 * band.knee].mean()
        assert 0.5 < white / (2 * band.NEP**2) < 2.0


@pytest.mark.slow
def test_3d_atmosphere_ar_smoke():
    sim = Simulation(
        instrument="test/one_detector",
        plans=get_plan("five_second_stare"),
        site="chajnantor",
        atmosphere="3d",
        atmosphere_kwargs={"max_height": 1500.0},
        noise=False,
        seed=1,
    )
    tod = sim.run()[0]
    assert not np.isnan(np.asarray(tod.signal)).any()


@pytest.mark.slow
def test_fourier_vs_ar_statistics():
    """The FFT synthesis path and the AR path should produce pwv
    fluctuations of comparable magnitude (distribution-level parity)."""
    # Compare on a SCANNING plan: a zenith stare only sees ~60 m of
    # advection, where both models are deep in the aperture-smoothing
    # cutoff and the residual variance measures each path's cutoff
    # implementation, not the resolved Matern statistics (measured
    # 5-10x apart there, both ~100x below the unsmoothed structure
    # function). A daisy scan sweeps resolved scales, where the two
    # syntheses must agree in magnitude. Averaged over seeds for a
    # stable oracle.
    stds = {}
    plan_kwargs = dict(
        start_time=1.75e9, scan_center=(120.0, 70.0), frame="az/el",
        duration=30.0, sample_rate=20.0,
        scan_options={"radius": 0.25, "speed": 0.1},
    )
    for method in ("fourier", "ar"):
        var = 0.0
        for seed in (7, 8, 9):
            sim = Simulation(
                instrument="MUSTANG-2",
                plans=get_plan("daisy_5arcmin_60s", **plan_kwargs),
                site="chajnantor",
                atmosphere="2d",
                atmosphere_kwargs={"method": method},
                noise=False,
                seed=seed,
            )
            obs = sim.obs_list[0]
            sim._simulate_atmosphere(obs, sim._next_key())
            pwv = np.asarray(obs.atmosphere.zenith_scaled_pwv)
            var += float((pwv - pwv.mean()).var())
        stds[method] = np.sqrt(var / 3)
    ratio = stds["fourier"] / stds["ar"]
    assert 0.33 < ratio < 3.0, stds


@pytest.mark.slow
def test_gain_error_applied():
    sim = Simulation(
        instrument="MUSTANG-2",
        plans="ten_second_zenith_stare",
        site="green_bank",
        atmosphere="2d",
        noise=False,
        seed=5,
    )
    tod = sim.run()[0]
    atm = np.asarray(tod.data["atmosphere"])
    # per-detector gains spread the means by ~gain_error (5%)
    spread = atm.mean(axis=-1).std() / atm.mean()
    assert 0.01 < spread < 0.2


def test_tod_processing(m2_stare_tod):
    processed = m2_stare_tod.process(
        remove_slope=True,
        window={"name": "tukey", "kwargs": {"alpha": 0.1}},
        remove_modes={"n": 1},
    )
    sig = np.asarray(processed.signal)
    assert not np.isnan(sig).any()
    # common-mode removal kills the detector-correlated atmosphere
    raw_std = np.asarray(m2_stare_tod.signal).std()
    assert sig.std() < 0.1 * raw_std


def test_tod_subset(m2_stare_tod):
    sub = m2_stare_tod[np.arange(10)]
    assert sub.shape[0] == 10
    assert sub.dets.n == 10


def test_despike_flags_and_repairs_glitches():
    """A cosmic-ray-like spike must be replaced by the local baseline
    and zero-weighted, leaving clean detectors untouched."""
    import jax.numpy as jnp

    from maria_tpu.tod.processing import despike

    rng = np.random.default_rng(0)
    n_det, n_t = 8, 512
    data = rng.standard_normal((n_det, n_t)).astype(np.float32)
    clean = data.copy()
    data[3, 100] += 200.0  # single-sample glitch
    data[5, 300:303] += 150.0  # short burst
    weight = np.ones_like(data)

    out, w = despike(jnp.asarray(data), jnp.asarray(weight), threshold=10.0)
    out, w = np.asarray(out), np.asarray(w)
    assert w[3, 100] == 0 and (w[5, 300:303] == 0).all()
    assert np.abs(out[3, 100]) < 10  # repaired to baseline scale
    # untouched detectors unchanged
    np.testing.assert_allclose(out[0], clean[0])
    assert (w[0] == 1).all()
    # flags confined to the spiked detectors; overall fraction tiny
    assert (w[[0, 1, 2, 4, 6, 7]] == 1).all()
    assert (w == 0).mean() < 0.02


@pytest.mark.slow
def test_despike_in_pipeline():
    import maria_tpu

    sim = maria_tpu.Simulation(
        instrument="test/1deg",
        plans=maria_tpu.get_plan("five_second_stare", start_time=1.75e9, scan_center=(60.0, 45.0)),
        site="chajnantor", atmosphere=None, noise=True, seed=0,
    )
    tod = sim.run()[0]
    processed = tod.process(despike={"threshold": 8.0}, remove_slope=True)
    assert not np.isnan(np.asarray(processed.signal)).any()


def test_kinematic_limits_warn(caplog):
    """A too-fast daisy on MUSTANG-2 must warn about the az drive limits
    (reference: maria/sim/observation.py:74-85)."""
    import logging

    import maria_tpu

    fast = maria_tpu.get_plan(
        "daisy", start_time=1.75e9, scan_center=(150.0, 50.0), frame="az/el",
        duration=10, sample_rate=50, scan_options={"x_throw": 2.0, "y_throw": 2.0, "speed": 8.0},
    )
    with caplog.at_level(logging.WARNING, logger="maria_tpu"):
        maria_tpu.Simulation(instrument="MUSTANG-2", plans=fast, site="GBT", atmosphere=None, noise=True)
    assert any("exceeds" in r.message and "velocity" in r.message for r in caplog.records)

    caplog.clear()
    slow = maria_tpu.get_plan(
        "daisy", start_time=1.75e9, scan_center=(150.0, 50.0), frame="az/el",
        duration=10, sample_rate=50, scan_options={"x_throw": 0.05, "y_throw": 0.05, "speed": 0.02},
    )
    with caplog.at_level(logging.WARNING, logger="maria_tpu"):
        maria_tpu.Simulation(instrument="MUSTANG-2", plans=slow, site="GBT", atmosphere=None, noise=True)
    assert not any("exceeds" in r.message for r in caplog.records)


def test_nonlinear_tod_conversion_stays_accurate():
    """Elementwise nonlinear TOD.to() runs through a device-side
    interpolation table; it must match the exact host calibration to
    high precision. (Atmosphere-aware chains with per-sample elevation
    kwargs take the exact host path instead.)"""
    import jax.numpy as jnp

    import maria_tpu
    from maria_tpu.tod.tod import TOD

    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans="ten_second_zenith_stare",
        site="green_bank", atmosphere=None, noise=True, seed=0,
    )
    base = sim.run()[0]
    # a brightness-temperature TOD: K_b -> pW is a nonlinear chain whose
    # kwargs are band-only (elementwise -> table path)
    tod = TOD(
        data={"signal": jnp.asarray(base.signal) * 10.0 + 50.0},
        pointing=base.pointing, weight=base.weight,
        units="K_b", dets=base.dets, metadata={},
    )
    out = tod.to("pW")
    band = tod.dets.bands[0]
    mask = np.where(tod.dets.band_name == band.name)[0]
    cal = band.cal("K_b -> pW", **tod.calibration_kwargs(band))
    exact = np.asarray(cal(np.asarray(tod.signal)[mask]))
    got = np.asarray(out.signal)[mask]
    scale = np.abs(exact).max()
    assert scale > 0
    assert np.abs(got - exact).max() < 1e-5 * scale
