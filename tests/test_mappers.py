"""Map-recovery oracle (modelled on the reference's golden test,
maria/tests/map/test_recover_map.py:16-69) plus mapper unit behavior."""

import numpy as np
import pytest

import maria_tpu
from maria_tpu import Quantity, Simulation
from maria_tpu.beam import compute_angular_fwhm
from maria_tpu.map import get
from maria_tpu.mappers import BinMapper
from maria_tpu.plan import Planner


@pytest.fixture(scope="module")
def recovery():
    input_map = get("cluster", center=(150.0, 10.0))
    planner = Planner(target=(150.0, 10.0), site="GBT", constraints={"el_range": (40, 85)})
    plans = planner.generate_plans(
        start_time=1.75e9, horizon_days=2, total_duration=60, chunk_duration=60,
        sample_rate=50, scan_pattern="daisy",
        scan_options={"radius": 0.083, "speed": 0.017},
    )
    sim = Simulation(
        instrument="MUSTANG-2", plans=plans[0], site="GBT",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run()[0]
    mapper = BinMapper(
        [tod],
        center=(150.0, 10.0),
        width=np.degrees(input_map.width),
        resolution=np.degrees(input_map.resolution),
        frame="ra/dec",
        units="K_RJ",
    )
    output_map = mapper.run()
    return input_map, tod, output_map


def test_recover_map(recovery):
    input_map, tod, output_map = recovery
    w = np.asarray(output_map.weight[0, 0, 0])
    assert (w > 0).mean() > 0.2  # the scan covers a good chunk of the map

    # compare against the beam-smoothed, zero-meaned input
    fwhm = compute_angular_fwhm(fwhm_0=100.0, nu=tod.dets.bands[0].center)
    smoothed = input_map.smooth(Quantity(fwhm, "rad"))
    m0 = np.asarray(smoothed.data[0, 0, 0])
    m1 = np.asarray(output_map.data[0, 0, 0])
    mask = w > 0
    m0 = m0 - m0[mask].mean()

    # the reference's absolute oracle: weighted RMS < 1e-3 (in K_RJ)
    abs_rms = np.sqrt(np.nansum(w * np.where(mask, m1 - m0, 0) ** 2) / np.nansum(w))
    assert abs_rms < 1e-3

    # stricter relative oracle: < 10% of the input fluctuation
    rel = abs_rms / m0[mask].std()
    assert rel < 0.10, rel


def test_output_map_units(recovery):
    _, _, output_map = recovery
    assert output_map.units == "K_RJ"
    converted = output_map.to("mK_RJ")
    ratio = np.nanstd(np.asarray(converted.data)) / np.nanstd(np.asarray(output_map.data))
    assert np.isclose(ratio, 1e3, rtol=1e-4)


def test_transfer_function(recovery):
    input_map, tod, output_map = recovery
    from maria_tpu.map.transfer import compute_transfer_function

    fwhm = compute_angular_fwhm(fwhm_0=100.0, nu=tod.dets.bands[0].center)
    smoothed = input_map.smooth(Quantity(fwhm, "rad"))
    tf = compute_transfer_function(smoothed, output_map)
    # large-scale transfer should be near unity for a noiseless bin mapper
    low_k = tf.tf[tf.k < 2 / np.degrees(input_map.width) * 57.3]
    mid = tf((1 / np.radians(0.05)))
    assert 0.5 < mid < 1.5


def test_map_smooth_conserves_mean():
    m = get("cluster")
    sm = m.smooth(Quantity(np.radians(0.01), "rad"))
    assert np.isclose(float(np.asarray(m.data).mean()), float(np.asarray(sm.data).mean()), rtol=1e-4)


def test_map_io_roundtrip(tmp_path):
    m = get("cluster")
    p = str(tmp_path / "m.h5")
    m.to_hdf(p)
    from maria_tpu.map import load

    m2 = load(p)
    assert np.allclose(np.asarray(m.data), np.asarray(m2.data))
    assert np.isclose(m2.resolution, m.resolution)

    pf = str(tmp_path / "m.fits")
    m.to_fits(pf)
    m3 = load(pf)
    assert m3.data.shape[-2:] == m.data.shape[-2:]
    assert np.allclose(np.asarray(m3.data), np.asarray(m.data), atol=1e-9)


def test_mapper_map_only_units(recovery):
    """Map-only units (Jy/pixel): TODs accumulate in K_RJ and the final
    map converts (reference base.py:46-54)."""
    _, tod, _ = recovery
    from maria_tpu.mappers import BinMapper

    out = BinMapper([tod], frame="ra/dec", units="Jy/pixel").run()
    assert out.units == "Jy/pixel"
    w = np.asarray(out.weight)
    assert (w > 0).any() and np.isfinite(np.nan_to_num(np.asarray(out.data))).all()


@pytest.mark.slow
def test_bin_mapper_sharded_equals_single():
    """BinMapper.run(mesh=...) routes every block through the multi-chip
    MXU binning path and must equal the single-device map."""
    import jax

    from maria_tpu.mappers import BinMapper
    from maria_tpu.parallel import create_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")

    plan = maria_tpu.get_plan(
        "daisy_5arcmin_60s", start_time=1.75e9, scan_center=(150.0, 41.0),
        frame="az/el", duration=20.0, sample_rate=50.0,
    )
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans=plan, site="GBT", atmosphere="2d", noise=True, seed=3
    )
    tod = sim.run()[0]
    kwargs = dict(center=(150.0, 41.0), frame="az/el", width=0.1, resolution=0.1 / 128,
                  units="K_RJ", progress_bars=False)
    single = BinMapper([tod], **kwargs).run()
    sharded = BinMapper([tod], **kwargs).run(mesh=create_mesh(8))

    a = np.nan_to_num(np.asarray(single.data, dtype=np.float64))
    b = np.nan_to_num(np.asarray(sharded.data, dtype=np.float64))
    scale = np.abs(a).max() or 1.0
    np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sharded.weight), np.asarray(single.weight), rtol=1e-5, atol=1e-6
    )
