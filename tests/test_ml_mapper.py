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
