"""Feature-matrix integration tests (modelled on the reference's
tests/sim/test_polarization.py, test_multifrequency.py,
test_time_evolving.py)."""

import numpy as np
import pytest

import maria_tpu
from maria_tpu.array import Array
from maria_tpu.instrument import Instrument
from maria_tpu.map import ProjectionMap
from maria_tpu.mappers import BinMapper


def _plan(**kwargs):
    return maria_tpu.get_plan(
        "five_second_stare", start_time=1.75e9, sample_rate=20,
        scan_center=(150.0, 41.0), frame="az/el", **kwargs,
    )


def _azel_map(data, stokes=None, nu=None, t=None):
    return ProjectionMap(
        data=data, center=(150.0, 41.0), width=2.0, frame="az/el",
        stokes=stokes, nu=nu, t=t, units="K_RJ", degrees=True,
    )


def test_polarized_map_sampling():
    # a pure-Q sky: polarized detector pairs (gamma, gamma+90°) see
    # opposite signals; their sum sees none (I = 0)
    n = 64
    data = np.zeros((3, 1, 1, n, n), dtype=np.float32)
    data[1] = 1e-3  # Q only
    input_map = _azel_map(data, stokes="IQU")

    arr = Array.from_config(
        {"name": "pol", "n": 20, "field_of_view": 0.2, "primary_size": 10,
         "polarized": True, "bands": ["test/f150"]}
    )
    instrument = Instrument(arrays=[arr])
    sim = maria_tpu.Simulation(
        instrument=instrument, plans=_plan(), site="chajnantor",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run(units="pW")[0]
    d = np.asarray(tod.signal)
    gamma = tod.dets.gamma
    # pair A/B detectors share base_det_index
    base = tod.dets.dets.base_det_index.values
    pol = tod.dets.dets.pol_label.values
    for b in np.unique(base)[:5]:
        a_sig = d[(base == b) & (pol == "A")].mean()
        b_sig = d[(base == b) & (pol == "B")].mean()
        assert np.sign(a_sig) != np.sign(b_sig) or abs(a_sig + b_sig) < 0.2 * (abs(a_sig) + abs(b_sig))
    # detector response follows cos(2 gamma) for a Q sky
    expected = 0.5 * np.cos(2 * gamma)
    measured = d.mean(axis=-1)
    corr = np.corrcoef(expected, measured)[0, 1]
    assert corr > 0.99


def test_iqu_binmapper():
    n = 64
    data = np.zeros((3, 1, 1, n, n), dtype=np.float32)
    data[0] = 2e-3
    data[1] = 1e-3
    input_map = _azel_map(data, stokes="IQU")
    arr = Array.from_config(
        {"name": "pol", "n": 60, "field_of_view": 1.0, "primary_size": 10,
         "polarized": True, "bands": ["test/f150"]}
    )
    sim = maria_tpu.Simulation(
        instrument=Instrument(arrays=[arr]), plans=_plan(scan_pattern="daisy",
        scan_options={"radius": 0.4, "speed": 0.25}), site="chajnantor",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run()[0]
    mapper = BinMapper(
        [tod], center=(150.0, 41.0), width=2.0, resolution=2.0 / n,
        frame="az/el", units="K_RJ",
    )
    out = mapper.run()
    assert "Q" in out.stokes  # polarized dets -> Stokes inference picks up QU


def test_multifrequency_map():
    n = 32
    data = np.zeros((1, 2, 1, n, n), dtype=np.float32)
    data[0, 0] = 1e-3  # bright at 90 GHz
    data[0, 1] = 2e-3  # brighter at 150 GHz
    input_map = _azel_map(data, nu=[90e9, 150e9])
    sim = maria_tpu.Simulation(
        instrument="test/1deg", plans=_plan(), site="chajnantor",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run()[0]
    d = np.asarray(tod.data["map"])
    m90 = d[tod.dets.band_name == "test/f090"].mean()
    m150 = d[tod.dets.band_name == "test/f150"].mean()
    assert m150 > 1.5 * m90  # each band samples its own channel


def test_time_evolving_map():
    n = 32
    t0 = 1.75e9
    frames = np.zeros((1, 1, 3, n, n), dtype=np.float32)
    frames[0, 0, 0] = 0.0
    frames[0, 0, 1] = 1e-3
    frames[0, 0, 2] = 2e-3
    input_map = _azel_map(frames, t=[t0, t0 + 2.5, t0 + 5.0])
    sim = maria_tpu.Simulation(
        instrument="test/one_detector", plans=_plan(), site="chajnantor",
        atmosphere=None, noise=False, map=input_map, seed=0,
    )
    tod = sim.run()[0]
    d = np.asarray(tod.data["map"])[0]
    # the signal ramps up in time as the map brightens
    assert d[-10:].mean() > d[:10].mean() * 1.5


def test_map_parity_and_concat():
    n = 16
    a = _azel_map(np.random.default_rng(0).standard_normal((1, 1, 1, n, n)).astype(np.float32))
    before = np.asarray(a.data).copy()
    a.apply_parity(eta=-1)
    assert np.allclose(np.asarray(a.data), before[..., ::-1, :])
    b = _azel_map(np.zeros((1, 1, 1, n, n), dtype=np.float32))
    from maria_tpu.map.projection import ProjectionMap as PM

    both = PM.concatenate([a, b], dim="t")
    assert both.data.shape[2] == 2


def test_site_data_and_exports():
    import maria_tpu

    sd = maria_tpu.site_data
    assert "GBT" in sd.index and {"region", "latitude", "longitude", "altitude"} <= set(sd.columns)
    assert sd.loc["GBT", "region"] == "green_bank"
    assert maria_tpu.__version_tuple__ == tuple(int(x) for x in maria_tpu.__version__.split("."))
    assert callable(maria_tpu.plot_transfer_function)


def test_plot_transfer_function():
    import matplotlib

    matplotlib.use("Agg")
    from maria_tpu.map.transfer import plot_transfer_function

    u = np.geomspace(10, 1e4, 24)
    T = np.stack([np.exp(-(u / 3e3) ** 2), np.exp(-(u / 1e3) ** 2)])
    ax = plot_transfer_function(u, T, nu=[90e9, 150e9], beam_fwhm=[1e-3, 6e-4])
    assert len(ax.lines) >= 4  # two curves + two beam overlays
    matplotlib.pyplot.close(ax.figure)


def test_generate_2d_fourier_noise():
    import jax

    from maria_tpu.noise import generate_2d_fourier_noise

    F = np.asarray(generate_2d_fourier_noise(jax.random.key(0), nx=128, ny=96, beta=8 / 3))
    assert F.shape == (96, 128)
    assert abs(F.mean()) < 1e-5 and np.isclose(F.std(), 1.0, rtol=1e-4)
    # red spectrum: large scales carry more power than small scales
    P = np.abs(np.fft.fft2(F)) ** 2
    k = np.hypot(*np.meshgrid(np.fft.fftfreq(128), np.fft.fftfreq(96), indexing="xy"))
    lo = P[(k > 0) & (k < 0.05)].mean()
    hi = P[k > 0.25].mean()
    assert lo > 10 * hi


def test_map_zv_axes(tmp_path):
    """The third slice axis may be labeled t (default), z (redshift), or
    v (velocity) — reference maria/map/base.py:36-40,104-108."""
    import pytest

    from maria_tpu.map.projection import ProjectionMap

    data = np.random.default_rng(0).standard_normal((1, 1, 3, 16, 16)).astype(np.float32)
    m = ProjectionMap(data, center=(10.0, 5.0), resolution=0.01, z=[0.1, 0.5, 1.0])
    assert m.dims["z"] == 3 and "t" not in m.dims
    assert np.allclose(m.z, [0.1, 0.5, 1.0])
    with pytest.raises(AttributeError):
        m.v  # noqa: B018 — wrong label must raise
    assert "z=[0.1..1]" in repr(m)

    # label survives structural ops and the HDF round trip
    m2 = m.to("K_CMB")
    assert m2.axis3_label == "z"
    both = ProjectionMap.concatenate([m, m], dim="z")
    assert both.dims["z"] == 6
    with pytest.raises(ValueError):
        ProjectionMap.concatenate([m, m], dim="t")

    path = str(tmp_path / "zcube.h5")
    m.to_hdf(path)
    from maria_tpu.map import read_hdf_map

    loaded = read_hdf_map(path)
    assert loaded.axis3_label == "z" and np.allclose(loaded.z, m.z)

    # velocity cubes work the same way
    mv = ProjectionMap(data, center=(0, 0), resolution=0.01, v=[-1e3, 0.0, 1e3])
    assert mv.dims["v"] == 3 and np.allclose(mv.v, [-1e3, 0.0, 1e3])
    with pytest.raises(ValueError):
        ProjectionMap(data, center=(0, 0), resolution=0.01, z=[1, 2, 3], v=[1, 2, 3])


def test_sim_rejects_multislice_z_cube():
    import pytest

    import maria_tpu
    from maria_tpu.map.projection import ProjectionMap

    data = np.ones((1, 1, 2, 16, 16), dtype=np.float32)
    zmap = ProjectionMap(data, center=(150.0, 10.0), resolution=0.01, z=[0.1, 0.5],
                         frame="ra/dec")
    with pytest.raises(NotImplementedError):
        maria_tpu.Simulation(
            instrument="test/1deg", plans=_plan(), site="chajnantor",
            atmosphere=None, noise=False, map=zmap,
        ).run()


def test_healpix_zv_hdf_roundtrip(tmp_path):
    from maria_tpu.map import read_hdf_map
    from maria_tpu.map.healpix import HEALPixMap

    data = np.random.default_rng(3).standard_normal((1, 1, 2, 12 * 4**2)).astype(np.float32)
    m = HEALPixMap(data, z=[0.1, 0.5], units="K_CMB")
    path = str(tmp_path / "zpix.h5")
    m.to_hdf(path)
    loaded = read_hdf_map(path)
    assert loaded.axis3_label == "z" and np.allclose(loaded.z, [0.1, 0.5])


def test_all_reference_map_names_resolve():
    """Every example-map name the reference ships (maria/map/maps.txt)
    must resolve to a synthetic equivalent offline."""
    import maria_tpu.map as M

    ref_names = [
        "12CO(2-1)", "30dor", "M1", "M51HA", "circinus_galaxy", "cluster1",
        "cluster2", "cluster3", "crab_nebula", "dust", "einstein", "maria",
        "monoceros_R2", "orion_A", "protoplanetary_disk", "quasar_3C_286",
        "radio_galaxy_3C_288", "time_evolving_sun",
    ]
    for n in ref_names:
        m = M.get(n)
        assert np.isfinite(np.asarray(m.data)).all(), n


def test_map_load_overrides_and_unsqueeze(tmp_path):
    """Explicit kwargs to map.load override file metadata; unsqueeze
    with a value tags a singleton axis (reference docs usage/inputs/maps)."""
    import maria_tpu.map as M
    from maria_tpu.map.projection import ProjectionMap

    m = M.get("cluster", center=(150.0, 10.0))
    fpath = str(tmp_path / "m.fits")
    hpath = str(tmp_path / "m.h5")
    m.to_fits(fpath)
    m.to_hdf(hpath)

    # width override rescales; nu/units overrides reinterpret
    m2 = M.load(fpath, width=1.0, units="uK_RJ", nu=90e9)
    assert np.isclose(np.degrees(m2.width), 1.0)
    assert m2.units == "uK_RJ" and np.isclose(m2.nu[0], 90e9)
    m3 = M.load(hpath, units="mK_RJ")
    assert m3.units == "mK_RJ"

    # unsqueeze with values
    tagged = m.unsqueeze("nu", 220e9)
    assert np.isclose(tagged.nu[0], 220e9)
    ztagged = m.unsqueeze("z", 0.5)
    assert ztagged.axis3_label == "z" and np.isclose(ztagged.z[0], 0.5)
    import pytest

    multi = ProjectionMap(np.ones((1, 2, 1, 8, 8)), center=(0, 0), resolution=0.01,
                          nu=[90e9, 150e9])
    with pytest.raises(ValueError):
        multi.unsqueeze("nu", 90e9)


def test_map_unit_conversion_scales_weight():
    """Weights are inverse variances: converting a map's units must
    scale them by 1/slope^2 (the reference leaves them stale)."""
    from maria_tpu.map.projection import ProjectionMap

    m = ProjectionMap(np.ones((1, 1, 1, 8, 8), np.float32), center=(0, 0),
                      resolution=0.01, units="K_RJ",
                      weight=4.0 * np.ones((1, 1, 1, 8, 8), np.float32))
    mk = m.to("mK_RJ")  # x1000 in data
    np.testing.assert_allclose(np.asarray(mk.data), 1000.0)
    np.testing.assert_allclose(np.asarray(mk.weight), 4.0 / 1000.0**2)


def test_polarized_cmb_through_detector_pairs():
    """Round-1 VERDICT item #2: polarized detectors must actually see the
    CMB's Q/U. Orthogonal-gamma pair differences isolate the polarized
    part; with the old scalar-only CMB (Q=U=0) the difference TOD was
    exactly the (zero) anisotropy difference."""
    arr = Array.from_config(
        {"name": "pol", "n": 16, "field_of_view": 0.1, "primary_size": 10,
         "polarized": True, "bands": ["test/f150"]}
    )
    sim = maria_tpu.Simulation(
        instrument=Instrument(arrays=[arr]), plans=_plan(), site="chajnantor",
        atmosphere=None, noise=False, cmb="generate", cmb_kwargs={"nside": 64}, seed=7,
    )
    tod = sim.run(units="pW")[0]
    d = np.asarray(tod.data["cmb"])
    base = tod.dets.dets.base_det_index.values
    pol = tod.dets.dets.pol_label.values
    diffs = []
    for b in np.unique(base):
        a_sig = d[(base == b) & (pol == "A")][0]
        b_sig = d[(base == b) & (pol == "B")][0]
        diffs.append(a_sig - b_sig)
    diffs = np.array(diffs)
    # pair differences carry polarized power: nonzero (was exactly zero
    # with the scalar-only CMB), but far below the monopole loading
    assert np.abs(diffs).mean() > 1e-6
    assert np.abs(diffs).mean() < 0.05 * d.mean()
