"""Bounded-memory streaming executor (reference behavior anchor:
maria README.rst:34-36 "arbitrarily long periods of atmospheric
evolution"; maria/tod/tod.py:63 dask-lazy TOD fields)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maria_tpu
from maria_tpu.noise import generate_noise_with_knee
from maria_tpu.noise.streaming import StreamingBandNoise
from maria_tpu.ops.interp import upsample_time_phases
from maria_tpu.ops.program import build_tod_program
from maria_tpu.ops.streaming_exec import (
    StreamingExecutor,
    pad_coarse_for_blocks,
    upsample_block_phases,
)


def test_blockwise_upsample_equals_full():
    """The haloed per-block phase-stencil upsample must be bitwise equal
    to upsample_time_phases over the whole series."""
    rng = np.random.default_rng(0)
    n_det, n_c, r = 7, 53, 16
    block_tc = 8
    v = jnp.asarray(rng.standard_normal((n_det, n_c)).astype(np.float32))
    for n_fine in (n_c * r, (n_c - 1) * r + 3, n_c * r - 5):
        full = np.asarray(upsample_time_phases(v, r, n_fine, kind="cubic"))
        n_blocks = -(-n_fine // (block_tc * r))
        pad = pad_coarse_for_blocks(v, block_tc, n_blocks)
        blocks = [
            np.asarray(
                upsample_block_phases(pad, b * block_tc, block_tc, r, n_c, v[:, -1])
            )
            for b in range(n_blocks)
        ]
        chunked = np.concatenate(blocks, axis=-1)[:, :n_fine]
        np.testing.assert_array_equal(chunked, full)


def test_streaming_noise_psd_matches_fft_generator():
    """The AR-cascade stream must carry the same pink spectrum as the
    batch FFT generator, octave by octave, down to ~1/T."""
    fs, knee, n, n_det = 50.0, 0.5, 2**14, 96
    model = StreamingBandNoise(fs, knee, T_ref=4096.0)
    key = jax.random.key(0)
    state = model.init_state(jax.random.key(1), n_det)
    blocks = []
    for b in range(8):
        state, blk = model.block(state, jax.random.fold_in(key, b), n_det, n // 8)
        blocks.append(np.asarray(blk))
    x_stream = np.concatenate(blocks, axis=-1)
    x_fft = np.asarray(
        generate_noise_with_knee(jax.random.key(2), (n_det, n), sample_rate=fs, knee=knee)
    )

    def psd(x):
        return (np.abs(np.fft.rfft(x, axis=-1)) ** 2).mean(0) * 2 / (fs * x.shape[-1])

    f = np.fft.rfftfreq(n, 1 / fs)
    p_s, p_f = psd(x_stream), psd(x_fft)
    edges = np.geomspace(4 / (n / fs), fs / 3, 10)
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (f >= lo) & (f < hi)
        ratio = p_s[m].mean() / p_f[m].mean()
        # the lowest octaves hold only a few Fourier bins, so the
        # chi^2 sampling noise of both estimates dominates there
        tol = (0.80, 1.25) if m.sum() < 30 else (0.93, 1.08)
        assert tol[0] < ratio < tol[1], (lo, hi, ratio, int(m.sum()))


def test_cascade_fit_quality():
    """The rational-filter fit must track the 1/f target to a few
    percent everywhere except the structurally-uncatchable last
    fraction of an octave at Nyquist (any rational filter's PSD has
    zero slope there)."""
    from maria_tpu.noise.streaming import PinkCascade

    for fs, knee, T_ref in ((50.0, 0.5, 4096.0), (100.0, 1.0, 36000.0), (20.0, 0.05, 4096.0)):
        c = PinkCascade(fs, knee, T_ref=T_ref)
        p = np.asarray(c.p, dtype=np.float64)
        a = np.asarray(c.a, dtype=np.float64)
        f = np.geomspace(1.0 / T_ref, fs / 2 * 0.999, 600)
        w = 2 * np.pi * f / fs
        H = 1.0 / (1 - p[None, :] * np.exp(-1j * w[:, None]))
        logratio = np.abs(np.log(np.abs(H @ a) ** 2 / (fs * knee / f)))
        assert logratio.max() < 0.15, (fs, knee, T_ref, logratio.max())
        assert logratio[f < 0.7 * fs / 2].max() < 0.07, (fs, knee, T_ref)


@pytest.fixture(scope="module")
def mustang_program():
    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s", start_time=1.75e9, scan_center=(150.0, 41.0),
        frame="az/el", duration=60.0, sample_rate=50.0,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan, site="GBT", atmosphere="2d", noise=True, seed=0
    )
    obs = sim.obs_list[0]
    return build_tod_program(obs, noise_kwargs=sim.noise_kwargs), obs


def test_chunked_equals_unchunked_map(mustang_program):
    """Grouping blocks differently must not change the binned map at all
    (same blocks, same state chain -> identical float ops)."""
    program, obs = mustang_program
    ex = StreamingExecutor(program, obs, block_tc=32)
    key = jax.random.key(5)
    res_chunked = ex.run(key, group_size=1)
    res_onego = ex.run(key, group_size=ex.n_blocks)
    assert res_chunked.map_wgt.sum() == program.offsets.shape[0] * len(program.t_fine)
    # not bitwise: XLA reassociates the f32 reductions differently for a
    # 1-block scan vs an n-block scan (measured max rel diff ~2e-7)
    np.testing.assert_allclose(res_chunked.map_sum, res_onego.map_sum, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(res_chunked.map_wgt, res_onego.map_wgt)


def test_streaming_atmosphere_equals_batch_program(mustang_program):
    """With noise off, the streamed TOD must equal the batch fused
    program's atmosphere field exactly (same key -> same coarse fields;
    the blockwise upsample is bitwise; gains are the same stream)."""
    program, obs = mustang_program
    import copy

    p = copy.copy(program)
    p.with_noise = False
    key = jax.random.key(3)
    batch = np.asarray(jax.jit(p.total_power_fn())(*p.example_args(key), p.device_tables()))

    ex = StreamingExecutor(p, obs, block_tc=32)
    stream = np.concatenate([blk for _, blk in ex.tod_blocks(key)], axis=-1)
    np.testing.assert_allclose(stream, batch, rtol=1e-6, atol=1e-6)


def test_tod_blocks_shapes(mustang_program):
    program, obs = mustang_program
    ex = StreamingExecutor(program, obs, block_tc=32)
    total = 0
    for b, blk in ex.tod_blocks(jax.random.key(0), group_size=4):
        assert blk.shape[0] == len(program.offsets)
        total += blk.shape[1]
    assert total == len(program.t_fine)
    assert np.isfinite(blk).all()


@pytest.mark.slow
def test_streaming_det_sharded_equals_single_device(mustang_program):
    """Long-observation streaming + det sharding compose: the same run
    with the carried state laid out over an 8-device mesh must equal the
    single-device result (XLA inserts the binning psum)."""
    import copy

    from maria_tpu.parallel import create_mesh

    program, obs = mustang_program
    program = copy.deepcopy(program)  # pad_detectors mutates bands in place
    program.pad_detectors(8)
    ex = StreamingExecutor(program, obs, block_tc=32)
    key = jax.random.key(7)
    single = ex.run(key, group_size=4)
    mesh = create_mesh(8, axis_names=("det",), shape=(8,))
    sharded = ex.run(key, group_size=4, mesh=mesh)
    np.testing.assert_array_equal(single.map_wgt, sharded.map_wgt)
    np.testing.assert_allclose(single.map_sum, sharded.map_sum, rtol=1e-5, atol=1e-3)
    # padded (replicated) detectors must never reach the map: exactly
    # n_real_det x n_t hits, not n_padded x n_t
    assert program.n_real_det == 217 and len(program.offsets) == 224
    assert single.map_wgt.sum() == program.n_real_det * len(program.t_fine)
    assert single.n_samples == program.n_real_det * len(program.t_fine)


@pytest.mark.slow
def test_streamed_welch_psd_matches_full_tod(mustang_program):
    """The executor's per-band Welch accumulators (the ML mapper's noise
    statistics without holding the TOD) must match the PSD of the full
    streamed TOD within Welch-vs-periodogram tolerance."""
    import scipy.signal

    program, obs = mustang_program
    ex = StreamingExecutor(program, obs, block_tc=32)
    key = jax.random.key(11)
    res = ex.run(key, group_size=4, accumulate_psd=True)
    assert res.psds is not None and len(res.psds) == len(program.bands)

    tod = np.concatenate([blk for _, blk in ex.tod_blocks(key, group_size=4)], axis=-1)
    band = program.bands[0]
    x = tod[band.det_index]
    f_ref, p_ref = scipy.signal.welch(
        x, fs=program.sample_rate, nperseg=ex.B, window="hann", detrend="constant",
        noverlap=0,
    )
    p_ref = p_ref.mean(axis=0)
    f, p = res.psd_freqs, res.psds[0]
    # compare away from DC; scipy drops no bins, grids match exactly
    np.testing.assert_allclose(f, f_ref, atol=1e-9)
    sel = f > 0.5
    ratio = p[sel] / p_ref[sel]
    assert np.median(np.abs(ratio - 1)) < 0.15, np.median(ratio)


@pytest.fixture(scope="module")
def radec_sim_ingredients():
    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    from maria_tpu.plan import Planner

    plans = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=60, chunk_duration=60,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=50,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plans[0], site="GBT",
        atmosphere="2d", noise=False, seed=2,
    )
    return input_map, sim.obs_list[0]


@pytest.mark.slow
def test_streaming_map_stage_matches_batch(radec_sim_ingredients):
    """map= streamed per block must match the batch program's baked
    static timelines (identical calibration tables and channel maps; the
    only difference is f32 vs f64 pointing rotation round-off)."""
    input_map, obs = radec_sim_ingredients
    key = jax.random.key(4)

    batch_prog = build_tod_program(obs, with_noise=False, input_map=input_map)
    batch = np.asarray(
        jax.jit(batch_prog.total_power_fn())(*batch_prog.example_args(key), batch_prog.device_tables())
    )

    stream_prog = build_tod_program(obs, with_noise=False)
    ex = StreamingExecutor(stream_prog, obs, block_tc=32, input_map=input_map)
    stream = np.concatenate([blk for _, blk in ex.tod_blocks(key)], axis=-1)

    assert stream.shape == batch.shape
    scale = np.abs(batch).max()
    np.testing.assert_allclose(stream, batch, atol=2e-4 * scale, rtol=2e-4)


@pytest.mark.slow
def test_streaming_map_stage_nearest_matches_batch(radec_sim_ingredients):
    """bilinear_sampling=False must reach the streamed sampler too (it
    was once stored and silently ignored): streamed nearest-pixel sky ==
    the batch program's nearest-pixel timelines, and != the bilinear
    stream."""
    input_map, obs = radec_sim_ingredients
    key = jax.random.key(4)
    mk = {"bilinear_sampling": False}

    batch_prog = build_tod_program(obs, with_noise=False, input_map=input_map, map_kwargs=mk)
    batch = np.asarray(
        jax.jit(batch_prog.total_power_fn())(*batch_prog.example_args(key), batch_prog.device_tables())
    )

    stream_prog = build_tod_program(obs, with_noise=False)
    ex = StreamingExecutor(stream_prog, obs, block_tc=32, input_map=input_map, map_kwargs=mk)
    stream = np.concatenate([blk for _, blk in ex.tod_blocks(key)], axis=-1)

    scale = np.abs(batch).max()
    np.testing.assert_allclose(stream, batch, atol=2e-4 * scale, rtol=2e-4)

    # the two samplers are distinct programs (the beam-smoothed map is
    # smooth enough that they agree to ~1e-6, so exact inequality is the
    # right discriminator)
    ex_bl = StreamingExecutor(stream_prog, obs, block_tc=32, input_map=input_map)
    stream_bl = np.concatenate([blk for _, blk in ex_bl.tod_blocks(key)], axis=-1)
    assert (stream != stream_bl).any()


def test_streaming_time_evolving_map_matches_batch():
    """A time-evolving input map streamed per block must match the batch
    program's baked frame-blended timelines (reference behavior anchor:
    maria/tests/sim/test_time_evolving.py:16-36 — a brightening sky must
    ramp up in the TOD; here we additionally require streamed == batch)."""
    from maria_tpu.map.projection import ProjectionMap

    n = 32
    t0 = 1.75e9
    frames = np.zeros((1, 1, 3, n, n), dtype=np.float32)
    frames[0, 0, 0] = 0.0
    frames[0, 0, 1] = 1e-3
    frames[0, 0, 2] = 2e-3
    # a spatial gradient so bilinear sampling is actually exercised
    frames += np.linspace(0, 2e-4, n, dtype=np.float32)[None, None, None, None, :]
    input_map = ProjectionMap(
        data=frames, center=(150.0, 41.0), width=2.0, frame="az/el",
        t=[t0, t0 + 5.0, t0 + 10.0], units="K_RJ", degrees=True,
    )
    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s", start_time=t0, scan_center=(150.0, 41.0),
        frame="az/el", duration=10.0, sample_rate=20.0,
    )
    sim = maria_tpu.Simulation(
        instrument="test/1deg", plans=plan, site="chajnantor",
        atmosphere="2d", noise=False, seed=3,
    )
    obs = sim.obs_list[0]
    key = jax.random.key(5)

    batch_prog = build_tod_program(obs, with_noise=False, input_map=input_map)
    batch = np.asarray(
        jax.jit(batch_prog.total_power_fn())(
            *batch_prog.example_args(key), batch_prog.device_tables()
        )
    )

    stream_prog = build_tod_program(obs, with_noise=False)
    ex = StreamingExecutor(stream_prog, obs, block_tc=16, input_map=input_map)
    stream = np.concatenate([blk for _, blk in ex.tod_blocks(key)], axis=-1)

    assert stream.shape == batch.shape
    scale = np.abs(batch).max()
    np.testing.assert_allclose(stream, batch, atol=2e-4 * scale, rtol=2e-4)
    # and the physics: the brightening sky ramps the streamed map signal
    atm_only = np.asarray(
        jax.jit(stream_prog.total_power_fn())(
            *stream_prog.example_args(key), stream_prog.device_tables()
        )
    )
    ramp = (stream - atm_only).mean(axis=0)
    assert ramp[-40:].mean() > ramp[:40].mean() * 1.5


@pytest.mark.slow
def test_streaming_cmb_stage_matches_batch(radec_sim_ingredients):
    """cmb= streamed per block: same power tables, same HEALPix sampling
    math; boundary pixels may flip from f32 rotation round-off, so the
    comparison is quantile-based."""
    from maria_tpu.cmb import generate_cmb

    _, obs = radec_sim_ingredients
    cmb = generate_cmb(nside=64, lmax=128, seed=0)
    key = jax.random.key(6)

    batch_prog = build_tod_program(obs, with_noise=False, cmb=cmb)
    batch = np.asarray(
        jax.jit(batch_prog.total_power_fn())(*batch_prog.example_args(key), batch_prog.device_tables())
    )

    stream_prog = build_tod_program(obs, with_noise=False)
    ex = StreamingExecutor(stream_prog, obs, block_tc=32, cmb=cmb)
    stream = np.concatenate([blk for _, blk in ex.tod_blocks(key)], axis=-1)

    diff = np.abs(stream - batch)
    fluct = np.std(batch - batch.mean())
    assert np.quantile(diff, 0.999) < 1e-3 * max(fluct, 1e-12) + 1e-9
    assert (diff > 0.05 * fluct).mean() < 1e-3  # isolated pixel-boundary flips only


@pytest.mark.slow
def test_streaming_radec_binning_matches_host(radec_sim_ingredients):
    """frame='ra/dec': streamed binning must follow the sky (match an
    independent host bincount from Pointing.det_radec on the same
    streamed TOD and grid)."""
    from maria_tpu.coords.transforms import phi_theta_to_offsets_jit
    from maria_tpu.tod.tod import Pointing

    input_map, obs = radec_sim_ingredients
    key = jax.random.key(9)
    prog = build_tod_program(obs, with_noise=False)
    ex = StreamingExecutor(
        prog, obs, block_tc=32, input_map=input_map, frame="ra/dec",
        center=(float(input_map.center[0]), float(input_map.center[1])),
    )
    res = ex.run(key, group_size=8)

    tod = np.concatenate([blk for _, blk in ex.tod_blocks(key, group_size=8)], axis=-1)
    ra, dec = Pointing(obs.boresight, obs.offsets, obs.q).det_radec()
    pt = jnp.stack([ra, dec], axis=-1)
    offs = np.asarray(phi_theta_to_offsets_jit(pt, ex.center[0], ex.center[1]))
    x0 = -(ex.n_x - 1) / 2 * ex.res
    y0 = -(ex.n_y - 1) / 2 * ex.res
    ixh = np.round((offs[..., 0] - x0) / ex.res).astype(int)
    iyh = np.round((offs[..., 1] - y0) / ex.res).astype(int)
    inside = (ixh >= 0) & (ixh < ex.n_x) & (iyh >= 0) & (iyh < ex.n_y)
    ref = np.bincount(
        (iyh[inside] * ex.n_x + ixh[inside]).ravel(), weights=tod[inside].ravel(),
        minlength=ex.n_y * ex.n_x,
    ).reshape(ex.n_y, ex.n_x)
    wgt_ref = np.bincount(
        (iyh[inside] * ex.n_x + ixh[inside]).ravel(), minlength=ex.n_y * ex.n_x
    ).reshape(ex.n_y, ex.n_x)

    # pointing rotation runs in f32 on device vs f64 on host: a tiny
    # fraction of samples can land one pixel over near boundaries
    assert np.abs(res.map_wgt - wgt_ref).sum() / wgt_ref.sum() < 2e-3
    scale = np.abs(ref).max() or 1.0
    close = np.isclose(res.map_sum, ref, atol=2e-3 * scale, rtol=1e-3)
    assert close.mean() > 0.995


def test_checkpoint_resume_equals_uninterrupted(mustang_program, tmp_path):
    """A run killed mid-stream and resumed from its checkpoint must
    produce exactly the uninterrupted run's accumulators (blocks depend
    only on carried state + block index; checkpoints align with group
    boundaries)."""
    program, obs = mustang_program
    ex = StreamingExecutor(program, obs, block_tc=8)
    key = jax.random.key(11)
    ckpt = str(tmp_path / "stream.ckpt.npz")
    assert ex.n_blocks >= 6

    full = ex.run(key, group_size=2, accumulate_psd=True)

    # simulate a crash: run only the first few groups, checkpointing each
    # (same binning mode as run()'s default, else the accumulators fork)
    state = ex.init_state(key)
    n_groups_before_crash = 2
    for i, (g1, state) in enumerate(
        ex._iterate(state, 2, with_tod=False, with_psd=True,
                    use_blocked=ex._auto_blocked(None))
    ):
        ex._save_ckpt(ckpt, state, g1, key, ex._auto_blocked(None))
        if i + 1 >= n_groups_before_crash:
            break
    assert g1 < ex.n_blocks, "test needs a mid-stream crash point"

    resumed = ex.run(key, group_size=2, accumulate_psd=True, checkpoint_path=ckpt)
    np.testing.assert_array_equal(resumed.map_sum, full.map_sum)
    np.testing.assert_array_equal(resumed.map_wgt, full.map_wgt)
    for a, b in zip(resumed.psds, full.psds):
        np.testing.assert_array_equal(a, b)

    # wrong key or wrong geometry must refuse to resume
    with pytest.raises(ValueError, match="PRNG key"):
        ex.run(jax.random.key(12), group_size=2, accumulate_psd=True, checkpoint_path=ckpt)
    ex2 = StreamingExecutor(program, obs, block_tc=8, n_x=64, n_y=64)
    with pytest.raises(ValueError, match="different run"):
        ex2.run(key, group_size=2, accumulate_psd=True, checkpoint_path=ckpt)


def test_mxu_binning_equals_scatter(mustang_program):
    """The MXU binning (mxu_binning=True) must produce the same map as
    the scatter path with zero window-dropped samples — the HBM-resident
    plan default at shifted precision (the batch headline's ~1e-4
    accumulation class). Frames/precisions/fallback variants live in the
    slow-tier sibling below."""
    program, obs = mustang_program
    key = jax.random.key(9)
    ex = StreamingExecutor(program, obs, block_tc=32)
    assert ex._bin_plan is not None, "window geometry should be coverable here"
    assert ex._run_params is not None, "runs should compress a daisy scan"
    a = ex.run(key, group_size=4, mxu_binning=False)
    b = ex.run(key, group_size=4, mxu_binning=True)
    assert ex._resident is not None, "resident plans should build here"
    np.testing.assert_array_equal(a.map_wgt, b.map_wgt)
    scale = np.abs(a.map_sum).max()
    np.testing.assert_allclose(b.map_sum, a.map_sum, atol=1e-3 * scale)
    # identical hit totals: nothing was window- or slot-dropped
    assert b.map_wgt.sum() == program.offsets.shape[0] * len(program.t_fine)


@pytest.mark.slow
def test_mxu_binning_modes_equal_scatter(mustang_program, monkeypatch):
    """The ra/dec binning frame, the hilo (~2^-16) precision contract,
    and the in-scan per-sample fallback (beyond the resident HBM
    budget) all match the scatter path."""
    program, obs = mustang_program
    key = jax.random.key(9)

    ex_r = StreamingExecutor(program, obs, block_tc=32, frame="ra/dec")
    a = ex_r.run(key, group_size=4, mxu_binning=False)
    b = ex_r.run(key, group_size=4, mxu_binning=True)
    np.testing.assert_array_equal(a.map_wgt, b.map_wgt)
    scale = np.abs(a.map_sum).max()
    np.testing.assert_allclose(b.map_sum, a.map_sum, atol=1e-3 * scale)

    # hilo precision: the tight (~2^-16) accumulation contract
    monkeypatch.setenv("MARIA_TPU_STREAM_BIN_PRECISION", "hilo")
    ex_h = StreamingExecutor(program, obs, block_tc=32)
    a_h = ex_h.run(key, group_size=4, mxu_binning=False)
    b_h = ex_h.run(key, group_size=4, mxu_binning=True)
    np.testing.assert_array_equal(a_h.map_wgt, b_h.map_wgt)
    scale = np.abs(a_h.map_sum).max()
    np.testing.assert_allclose(b_h.map_sum, a_h.map_sum, atol=2e-5 * scale)
    monkeypatch.delenv("MARIA_TPU_STREAM_BIN_PRECISION")

    # in-scan per-sample fallback (beyond the resident HBM budget)
    monkeypatch.setenv("MARIA_TPU_STREAM_RESIDENT", "0")
    ex2 = StreamingExecutor(program, obs, block_tc=32)
    a2 = ex2.run(key, group_size=4, mxu_binning=False)
    b2 = ex2.run(key, group_size=4, mxu_binning=True)
    assert ex2._resident is None
    np.testing.assert_array_equal(a2.map_wgt, b2.map_wgt)
    scale = np.abs(a2.map_sum).max()
    np.testing.assert_allclose(b2.map_sum, a2.map_sum, atol=2e-5 * scale)


@pytest.mark.slow
def test_mxu_binning_wide_field_blocks():
    """Wide-field case (multi-det-block): a synthetic large array whose
    focal plane spans many windows still bins exactly."""
    import maria_tpu
    from maria_tpu.ops.program import build_tod_program

    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s", start_time=1.75e9, scan_center=(150.0, 41.0),
        frame="az/el", duration=20.0, sample_rate=20.0,
        scan_options={"radius": 0.25, "speed": 0.1},
    )
    inst = maria_tpu.get_instrument(
        array={"n": 1200, "field_of_view": 0.8, "primary_size": 9,
               "bands": ["act/pa5/f090"]}
    )
    sim = maria_tpu.Simulation(
        instrument=inst, plans=plan, site="ALMA", atmosphere="2d", noise=True, seed=0,
    )
    obs = sim.obs_list[0]
    program = build_tod_program(obs, noise_kwargs=sim.noise_kwargs)
    ex = StreamingExecutor(program, obs, block_tc=16)
    assert ex._bin_plan is not None and ex._bin_plan.n_blocks > 1
    key = jax.random.key(2)
    a = ex.run(key, group_size=4, mxu_binning=False)
    b = ex.run(key, group_size=4, mxu_binning=True)
    np.testing.assert_array_equal(a.map_wgt, b.map_wgt)
    scale = np.abs(a.map_sum).max()
    np.testing.assert_allclose(b.map_sum, a.map_sum, atol=2e-5 * scale)


@pytest.mark.slow
def test_cascade_toeplitz_equals_scan():
    """The Toeplitz-matmul cascade block must reproduce the
    associative_scan reference exactly (same process, different f32
    order), including the carried state across multiple blocks and the
    sub-chunk boundary at _CHUNK."""
    from maria_tpu.noise.streaming import PinkCascade

    c = PinkCascade(50.0, 0.5, T_ref=4096.0)
    key = jax.random.key(0)
    for shape, n in (((13,), 257), ((5,), 2 * c._CHUNK + 100), ((3,), 64)):
        s_mm = s_sc = c.init_state(jax.random.key(1), shape)
        for b in range(3):
            kb = jax.random.fold_in(key, b)
            s_mm, y_mm = c.block(s_mm, kb, n)
            s_sc, y_sc = c.block_scan(s_sc, kb, n)
            scale = float(np.abs(np.asarray(y_sc)).max())
            np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_sc),
                                       atol=2e-5 * scale, rtol=2e-4)
            np.testing.assert_allclose(np.asarray(s_mm), np.asarray(s_sc),
                                       atol=2e-5 * max(1.0, float(np.abs(np.asarray(s_sc)).max())),
                                       rtol=2e-4)
