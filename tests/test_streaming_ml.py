"""Streamed ML map-making (mappers/streaming_ml.py) — the path that lets
an out-of-HBM observation be ML-mapped (VERDICT r4 item 4b; reference
solver behavior: maria/mappers/ml_mapper.py:359-535)."""

import jax
import numpy as np
import pytest

import maria_tpu
from maria_tpu.mappers.streaming_ml import StreamingMLMapper
from maria_tpu.ops.program import build_tod_program
from maria_tpu.ops.streaming_exec import StreamingExecutor


@pytest.fixture(scope="module")
def map_scene():
    """MUSTANG-2 + injected az/el cluster blob, mild atmosphere + noise."""
    from maria_tpu.map import ProjectionMap

    n = 48
    yy, xx = np.mgrid[:n, :n]
    blob = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (2 * (n / 8) ** 2))
    data = (2e-3 * blob).astype(np.float32)[None, None, None]
    input_map = ProjectionMap(
        data=data, center=(150.0, 41.0), width=0.2, frame="az/el",
        units="K_RJ", degrees=True,
    )
    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s", start_time=1.75e9, scan_center=(150.0, 41.0),
        frame="az/el", duration=30.0, sample_rate=20.0,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan, site="GBT", atmosphere="2d",
        noise=True, seed=11,
    )
    obs = sim.obs_list[0]
    program = build_tod_program(obs, noise_kwargs=sim.noise_kwargs)
    return program, obs, input_map, blob


@pytest.mark.slow
def test_streamed_ml_runs_equals_gather(map_scene):
    """The run-compressed MXU pointing path must match the gather/
    segment-sum path through a full fit (same noise model, same CG)."""
    program, obs, input_map, _ = map_scene
    # default hull-sized resolution: coarse enough pixels that a scan
    # dwells several samples per pixel (the regime runs compress)
    geom = dict(block_tc=16, n_x=64, n_y=64, input_map=input_map)
    ex = StreamingExecutor(program, obs, **geom)
    assert ex._bin_plan is not None and ex._run_params is not None
    key = jax.random.key(21)

    m_gather = StreamingMLMapper(ex, n_epochs=1, n_cg_iters=12, use_runs=False).fit(key)
    ex2 = StreamingExecutor(program, obs, **geom)
    m_runs = StreamingMLMapper(ex2, n_epochs=1, n_cg_iters=12, use_runs=True).fit(key)
    scale = np.abs(m_gather).max()
    np.testing.assert_allclose(m_runs, m_gather, atol=5e-4 * scale)


def test_streamed_ml_recovers_source(map_scene):
    """The streamed ML map must recover the injected blob (correlation
    over well-covered pixels — the batch mapper's oracle,
    tests/test_ml_mapper.py::test_ml_recovers_source)."""
    program, obs, input_map, blob = map_scene
    ex = StreamingExecutor(
        program, obs, block_tc=16, n_x=48, n_y=48, res=np.radians(0.2) / 48,
        input_map=input_map,
    )
    mapper = StreamingMLMapper(ex, n_epochs=2, n_cg_iters=25, use_runs=False)
    m = mapper.fit(jax.random.key(4))
    assert np.isfinite(m).all()
    hits = np.asarray(mapper.hits)
    mask = hits > np.percentile(hits[hits > 0], 60)
    a = m[mask] - m[mask].mean()
    # az/el input map: eta rows are mirrored vs the binning grid's y —
    # compare against the blob, which is symmetric, in K-agnostic form
    b = blob[mask] - blob[mask].mean()
    corr = (a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum() + 1e-30)
    assert corr > 0.8, corr
    # and the ML map should correlate at least as well as the naive map
    naive = mapper.naive_map
    an = naive[mask] - naive[mask].mean()
    corr_naive = (an * b).sum() / np.sqrt((an**2).sum() * (b**2).sum() + 1e-30)
    assert corr > corr_naive - 0.02, (corr, corr_naive)
