"""Condensed versions of the reference docs' tutorial flows
(reference: docs/source/tutorials/*.ipynb, docs/source/usage/**), shrunk
to test scale. These lock in the end-user API surface the reference
documents: a reference user's notebook should run against maria_tpu
unchanged (modulo import name)."""

from __future__ import annotations

import numpy as np
import pytest

import maria_tpu as maria


@pytest.fixture(scope="module")
def nebula_tods():
    """mustang-nebula.ipynb, shrunk: real-sky M1 + planner + MUSTANG-2."""
    input_map = maria.map.get("maps/M1.h5", fetch_first=False, n=256).to("K_RJ")
    input_map.data[input_map.weight < 0.2 * input_map.weight.max()] = 0

    planner = maria.Planner(target=input_map, site="green_bank", constraints={"el": (60, 90)})
    plans = planner.generate_plans(total_duration=30, sample_rate=8)

    instrument = maria.get_instrument("m2/mustang-2")
    sim = maria.Simulation(
        instrument, plans=plans[:1], site="green_bank", map=input_map, atmosphere="2d", seed=7
    )
    return input_map, sim.run()


def test_mustang_nebula_flow(nebula_tods):
    input_map, tods = nebula_tods
    from maria_tpu.mappers import MaximumLikelihoodMapper, compute_residual_map

    mapper = MaximumLikelihoodMapper(
        units="K_RJ", tods=tods, resolution=8 * input_map.resolution,
    )
    assert mapper.map.data.shape[0] >= 1  # inspectable before fit
    mapper.fit(epochs=1, steps_per_epoch=5)
    residual = compute_residual_map(input_map[:, 0], mapper.map)
    assert np.isfinite(np.asarray(residual.data)).any()


def test_transfer_function_flow(nebula_tods):
    """transfer-functions.ipynb, shrunk: BinMapper output's propagated
    input map -> windowed transfer function -> plot."""
    input_map, tods = nebula_tods
    from maria_tpu.mappers import BinMapper

    mapper = BinMapper(
        tods=tods,
        units="uK_RJ",
        stokes="I",
        resolution=8 * input_map.resolution,
        tod_preprocessing={"remove_modes": {"modes_to_remove": 1}},
        map_postprocessing={},
    )
    output_map = mapper.run()
    tf = output_map.transfer_function(window=True)
    assert np.isfinite(tf.T).any()
    for kwargs in (dict(window="tukey", taper=0.1), dict(window="hann"), dict(window=False)):
        tf_w = output_map.transfer_function(slices=dict(nu=[0]), **kwargs)
        assert tf_w.T.shape[0] == 1
    import matplotlib

    matplotlib.use("Agg")
    tf.plot(x_unit="arcmin")
    tf.plot(slices=dict(nu=[0]), x_unit="arcmin", add_beam=False)


def test_custom_array_instrument_flow():
    """custom-map-simulations.ipynb: bands + inline array dict."""
    f090 = maria.Band(center=90e9, width=20e9, NET_RJ=40e-6, knee=1e0, gain_error=5e-2)
    f150 = maria.Band(center=150e9, width=30e9, NET_RJ=60e-6, knee=1e0, gain_error=5e-2)
    instrument = maria.get_instrument(
        array={"field_of_view": 0.05, "beam_spacing": 1.5, "primary_size": 50, "bands": [f090, f150]}
    )
    assert instrument.dets.n > 2
    site = maria.get_site("llano_de_chajnantor", altitude=5065)
    assert float(site.altitude.m) == 5065

    from maria_tpu.io import fetch

    path = fetch("maps/30dor.fits")
    input_map = maria.map.load(filename=path, nu=150e9, center=(291.156, -31.23))
    assert input_map.data.shape[-1] > 1


@pytest.mark.slow
def test_polarized_observation_flow():
    """polarized-observations.ipynb, shrunk: IQUV einstein map through a
    polarized array; Q/U power must reach the TOD."""
    input_map = maria.map.get("maps/einstein.h5", fetch_first=False, n=128)
    assert input_map.stokes == "IQUV"
    input_map.data *= 50

    f150 = maria.Band(center=150e9, width=30e9, NET_RJ=60e-6, knee=1e0)
    instrument = maria.get_instrument(
        array={"field_of_view": 0.1, "primary_size": 10, "n": 16,
               "polarized": True, "bands": [f150]}
    )
    planner = maria.Planner(target=input_map, site="mauna_kea", constraints={"el": (45, 90)})
    plans = planner.generate_plans(total_duration=20, sample_rate=16)
    sim = maria.Simulation(instrument, plans=plans[:1], site="mauna_kea",
                           map=input_map, seed=11)
    tod = sim.run()[0]
    assert np.isfinite(np.asarray(tod.signal)).all()


@pytest.mark.slow
def test_doc_mapper_kwargs(nebula_tods):
    input_map, tods = nebula_tods
    from maria_tpu.mappers import BinMapper

    m = BinMapper(
        tods=tods, target=input_map, timestep=30,
        map_postprocessing={"median_filter": {"size": 3}},
    ).run()
    # target geometry copied; timestep -> >= 1 time bins
    assert m.data.shape[-2:] == input_map.data.shape[-2:]
    assert m.data.shape[2] >= 1


@pytest.mark.slow
def test_getting_started_aliases():
    sim = maria.Simulation(instrument="apex/saboca", site="cerro_chajnantor",
                           plan="five_second_stare", noise=True, seed=1)
    tod = sim.run()[0]
    assert tod.signal.shape[0] == sim.instrument.dets.n
