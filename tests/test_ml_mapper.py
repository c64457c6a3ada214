import jax.numpy as jnp
import numpy as np
import pytest

import maria_tpu
from maria_tpu.mappers import BinMapper, MaximumLikelihoodMapper
from maria_tpu.plan import Planner


@pytest.fixture(scope="module")
def noisy_tod_and_map():
    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    plans = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=60, chunk_duration=60,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=50,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plans[0], site="GBT",
        atmosphere=None, noise=True, map=input_map, seed=2,
    )
    return input_map, sim.run()[0]


def test_ml_mapper_beats_nothing(noisy_tod_and_map):
    """Random cross-product smoke in the reference style
    (tests/conftest.py:15-52 fits the ML mapper for 2 epochs and asserts
    positive map weight)."""
    input_map, tod = noisy_tod_and_map
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=2, n_cg_iters=30,
    )
    out = mapper.fit()
    w = np.asarray(out.weight)
    assert (w > 0).any()
    assert np.nansum(w) > 0
    assert not np.isnan(np.nan_to_num(np.asarray(out.data))).any()


@pytest.fixture(scope="module")
def clean_tod_and_map():
    input_map = maria_tpu.map.get("big_cluster", center=(150.0, 10.0))
    plans = Planner(target=(150.0, 10.0), site="GBT").generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=60, chunk_duration=60,
        scan_pattern="daisy", scan_options={"radius": 0.083, "speed": 0.017}, sample_rate=50,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plans[0], site="GBT",
        atmosphere=None, noise=False, map=input_map, seed=2,
    )
    return input_map, sim.run()[0]


def test_ml_recovers_source(clean_tod_and_map):
    input_map, tod = clean_tod_and_map
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=2, n_cg_iters=40,
    )
    out = mapper.fit()
    m = np.asarray(out.data[0, 0, 0])
    w = np.asarray(out.weight[0, 0, 0])
    m_in = np.asarray(input_map.data[0, 0, 0])
    mask = w > np.percentile(w[w > 0], 50)
    # the recovered map correlates with the input cluster decrement
    a = m[mask] - m[mask].mean()
    b = m_in[mask] - m_in[mask].mean()
    corr = (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum())
    assert corr > 0.9, corr


def _azel_plan():
    return maria_tpu.get_plan(
        "five_second_stare", start_time=1.75e9, sample_rate=20,
        scan_center=(150.0, 41.0), frame="az/el",
        scan_pattern="daisy", scan_options={"radius": 0.4, "speed": 0.25},
    )


def test_ml_recovers_polarized_source():
    """IQU ML map: an injected pure-Q sky must come back in the Q plane
    (reference feature: per-Stokes normal equations, ml_mapper.py:127-171)."""
    from maria_tpu.array import Array
    from maria_tpu.instrument import Instrument
    from maria_tpu.map import ProjectionMap

    n = 32
    data = np.zeros((3, 1, 1, n, n), dtype=np.float32)
    yy, xx = np.mgrid[:n, :n]
    blob = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (2 * (n / 7) ** 2))
    data[1] = 2e-3 * blob  # Q-only source
    input_map = ProjectionMap(
        data=data, center=(150.0, 41.0), width=2.0, frame="az/el",
        stokes="IQU", units="K_RJ", degrees=True,
    )
    arr = Array.from_config(
        {"name": "pol", "n": 60, "field_of_view": 1.0, "primary_size": 10,
         "polarized": True, "bands": ["test/f150"]}
    )
    sim = maria_tpu.Simulation(
        instrument=Instrument(arrays=[arr]), plans=_azel_plan(), site="chajnantor",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run()[0]
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 41.0), width=2.0, resolution=2.0 / n,
        frame="az/el", units="K_RJ", n_epochs=1, n_cg_iters=60,
    )
    out = mapper.fit()
    assert "Q" in out.stokes
    q_idx = out.stokes.index("Q")
    q = np.nan_to_num(np.asarray(out.data[q_idx, 0, 0]))
    w = np.asarray(out.weight[q_idx, 0, 0])
    mask = w > 0
    tgt = data[1, 0, 0]
    a = q[mask] - q[mask].mean()
    b = tgt[mask] - tgt[mask].mean()
    corr = (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum() + 1e-30)
    assert corr > 0.7, corr
    # and the recovered Q amplitude dominates any leakage into I
    i_rms = np.nan_to_num(np.asarray(out.data[0, 0, 0]))[mask].std()
    assert q[mask].std() > 2 * i_rms


@pytest.mark.slow
def test_ml_beats_binmapper_on_correlated_noise(noisy_tod_and_map):
    """With a common-mode corrupted TOD, the ML mapper's low-rank noise
    model (Woodbury, reference ml_mapper.py:282-286) must beat plain
    binning on map-domain residual RMS."""
    import jax

    from maria_tpu.tod import TOD

    input_map, tod = noisy_tod_and_map
    # inject a strong common mode across all detectors (fresh TOD: do
    # not mutate the module-scoped fixture)
    common = 5e-3 * np.cumsum(np.random.default_rng(0).standard_normal(tod.shape[-1]))
    data = dict(tod.data)
    data["common"] = np.broadcast_to(common, tod.shape).astype(np.float32)
    corrupted = TOD(
        data=data, dets=tod.dets, pointing=tod.pointing,
        units=tod.units, metadata=dict(tod.metadata),
    )

    kwargs = dict(
        center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution), frame="ra/dec", units="K_RJ",
    )
    binned = BinMapper([corrupted], **kwargs).run()
    ml = MaximumLikelihoodMapper(
        [corrupted], n_epochs=2, n_cg_iters=40, k=2, **kwargs
    ).fit()

    m_in = np.asarray(input_map.data[0, 0, 0])

    def resid_rms(out):
        m = np.nan_to_num(np.asarray(out.data[0, 0, 0]))
        w = np.asarray(out.weight[0, 0, 0])
        mask = w > np.percentile(w[w > 0], 50)
        a = m[mask] - m[mask].mean()
        b = m_in[mask] - m_in[mask].mean()
        scale = (a * b).sum() / ((b**2).sum() + 1e-30)
        return np.sqrt(((a - scale * b) ** 2).mean())

    assert resid_rms(ml) < resid_rms(binned), (resid_rms(ml), resid_rms(binned))


def test_ml_gradient_descent_solver(clean_tod_and_map):
    input_map, tod = clean_tod_and_map
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=1, n_cg_iters=40,
    )
    out = mapper.fit(method="gradient_descent")
    m = np.nan_to_num(np.asarray(out.data[0, 0, 0]))
    w = np.asarray(out.weight[0, 0, 0])
    m_in = np.asarray(input_map.data[0, 0, 0])
    mask = w > np.percentile(w[w > 0], 50)
    a = m[mask] - m[mask].mean()
    b = m_in[mask] - m_in[mask].mean()
    corr = (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum() + 1e-30)
    assert corr > 0.8, corr


def test_woodbury_inverse_is_exact():
    """_apply_inverse_N with low-rank modes must equal a dense per-frequency
    solve of N_f = diag(A_f) + U diag(lam_f) U^T."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_det, n_t, k = 6, 64, 2
    n_f = n_t // 2 + 1

    A_inv = jnp.asarray(rng.uniform(0.5, 2.0, (n_det, n_f)).astype(np.float32))
    U = jnp.asarray(rng.standard_normal((n_det, k)).astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.1, 3.0, (k, n_f)).astype(np.float32))

    import jax
    G = jnp.einsum("df,dk,dl->fkl", A_inv, U, U)
    D = jax.vmap(jnp.diag, in_axes=1)(1.0 / lam)
    block = {"A_inv": A_inv, "U": U, "core": jnp.linalg.inv(D + G)}

    mapper = MaximumLikelihoodMapper.__new__(MaximumLikelihoodMapper)
    mapper.k = k
    v = rng.standard_normal((n_det, n_t)).astype(np.float32)
    out = np.asarray(mapper._apply_inverse_N(block, jnp.asarray(v)))

    # dense reference: per rfft frequency, solve N_f x = fv
    fv = np.fft.rfft(v, axis=-1)
    x_ref = np.empty_like(fv)
    A = 1.0 / np.asarray(A_inv)
    for f in range(n_f):
        N_f = np.diag(A[:, f]) + np.asarray(U) @ np.diag(np.asarray(lam)[:, f]) @ np.asarray(U).T
        x_ref[:, f] = np.linalg.solve(N_f, fv[:, f])
    ref = np.fft.irfft(x_ref, n=n_t, axis=-1)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_noise_model_diagnostics(noisy_tod_and_map):
    import matplotlib

    matplotlib.use("Agg")
    input_map, tod = noisy_tod_and_map
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=2, n_cg_iters=5, k=2,
    )
    mapper.fit()
    assert len(mapper.noise_model_history) == 2  # one entry per epoch
    diag = mapper.noise_model_history[-1][0]
    assert diag["median_psd"].shape == diag["f"].shape
    assert (diag["median_psd"][1:] > 0).all()
    assert diag["mode_psd"].shape[0] == 2  # k detector modes
    ax = mapper.plot_noise_model()
    assert len(ax.lines) >= 3
    matplotlib.pyplot.close(ax.figure)


def test_ml_time_bins_solve_independently(clean_tod_and_map):
    """VERDICT round-1 item #6: t_bins > 1 must solve per time bin, not
    duplicate one static map into every frame. With a static sky and a
    scan split into two halves, the two bins cover different pixels, so
    their weight maps must differ while each recovers the source where
    it has coverage."""
    input_map, tod = clean_tod_and_map
    mapper = MaximumLikelihoodMapper(
        [tod], center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=1, n_cg_iters=30, t_bins=2,
    )
    out = mapper.fit()
    assert out.data.shape[2] == 2
    d = np.asarray(out.data[0, 0])
    w = np.asarray(out.weight[0, 0])
    # both bins have coverage, but not the same coverage
    assert (w[0] > 0).any() and (w[1] > 0).any()
    assert not np.array_equal(w[0] > 0, w[1] > 0)
    # the two frames are genuinely different solves
    assert not np.allclose(d[0], d[1])
    # each frame correlates with the input where it has weight
    m_in = np.asarray(input_map.data[0, 0, 0])
    for t in range(2):
        mask = w[t] > np.percentile(w[t][w[t] > 0], 50)
        a = d[t][mask] - d[t][mask].mean()
        b = m_in[mask] - m_in[mask].mean()
        corr = (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum())
        assert corr > 0.8, (t, corr)


@pytest.mark.slow
def test_ml_mapper_det_sharded_equals_single(noisy_tod_and_map):
    """mesh= shards every per-TOD block over detectors (zero-weight
    padding to the shard count); the CG solution must match the
    single-device solve."""
    from maria_tpu.parallel import create_mesh

    input_map, tod = noisy_tod_and_map
    kwargs = dict(
        center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=1, n_cg_iters=25, k=2,
    )
    single = MaximumLikelihoodMapper([tod], **kwargs).fit()
    mesh = create_mesh(8, axis_names=("det",), shape=(8,))
    sharded = MaximumLikelihoodMapper([tod], mesh=mesh, **kwargs).fit()

    a = np.nan_to_num(np.asarray(single.data, dtype=np.float64))
    b = np.nan_to_num(np.asarray(sharded.data, dtype=np.float64))
    scale = np.abs(a).max() or 1.0
    np.testing.assert_allclose(b, a, atol=1e-3 * scale, rtol=1e-3)


def test_fused_epoch_matches_eager(noisy_tod_and_map):
    """The single-dispatch fused epoch (fit(fused=True), the default for
    k=0) must produce the same solution and diagnostics as the
    stage-by-stage eager path — it is the same math, traced once."""
    input_map, tod = noisy_tod_and_map
    kwargs = dict(
        center=(150.0, 10.0), width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec", units="K_RJ", n_epochs=2, n_cg_iters=15,
    )
    eager = MaximumLikelihoodMapper([tod], **kwargs)
    out_eager = eager.fit(fused=False)
    fused = MaximumLikelihoodMapper([tod], **kwargs)
    out_fused = fused.fit(fused=True)

    a = np.nan_to_num(np.asarray(out_eager.data, dtype=np.float64))
    b = np.nan_to_num(np.asarray(out_fused.data, dtype=np.float64))
    scale = np.abs(a).max() or 1.0
    np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_fused.weight), np.asarray(out_eager.weight), rtol=1e-4
    )
    # diagnostics carried identically (median PSD per epoch per TOD)
    assert len(fused.noise_model_history) == len(eager.noise_model_history) == 2
    np.testing.assert_allclose(
        fused.noise_model_history[-1][0]["median_psd"],
        eager.noise_model_history[-1][0]["median_psd"],
        rtol=1e-4,
    )


@pytest.mark.slow
def test_mxu_pointing_matches_segment_sum(noisy_tod_and_map):
    """P^T via the channel-stacked MXU hat contraction must equal the
    segment-sum path: same solution, same weights — including with
    multiple time-bin frames sharing the hats."""
    input_map, tod = noisy_tod_and_map
    for t_bins in (1, 2):
        kwargs = dict(
            center=(150.0, 10.0), width=np.degrees(input_map.width),
            resolution=np.degrees(input_map.resolution),
            frame="ra/dec", units="K_RJ", n_epochs=1, n_cg_iters=15, t_bins=t_bins,
        )
        seg = MaximumLikelihoodMapper([tod], mxu_pointing=False, **kwargs)
        mxu = MaximumLikelihoodMapper([tod], mxu_pointing=True, **kwargs)
        assert mxu._mxu_pointing is True

        # raw operator equality on a fixed vector (tighter than the
        # post-CG comparison): same segments, f32 order differences only
        v = jnp.asarray(
            np.random.default_rng(0).normal(size=tod.shape).astype(np.float32)
        )
        a = np.asarray(seg._project_T(v, seg.blocks[0]))
        b = np.asarray(mxu._project_T(v, mxu.blocks[0]))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=3e-5 * scale)

        # P equality too: the run-plan MXU projection (hat matmuls +
        # run->sample expansion) vs the elementwise gather
        if "rmeta" in mxu.blocks[0]:
            w = jnp.asarray(
                np.random.default_rng(1).normal(size=seg.n_m).astype(np.float32)
            )
            pa = np.asarray(seg._project(w, seg.blocks[0]))
            pb = np.asarray(mxu._project(w, mxu.blocks[0]))
            np.testing.assert_allclose(pb, pa, atol=3e-5 * float(np.abs(pa).max()))

        out_seg = seg.fit()
        out_mxu = mxu.fit()
        aa = np.nan_to_num(np.asarray(out_seg.data, dtype=np.float64))
        bb = np.nan_to_num(np.asarray(out_mxu.data, dtype=np.float64))
        s = np.abs(aa).max() or 1.0
        np.testing.assert_allclose(bb, aa, atol=2e-3 * s, rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out_mxu.weight), np.asarray(out_seg.weight), rtol=1e-3
        )
