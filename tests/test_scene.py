import numpy as np
import pytest

from maria_tpu.array import Array, generate_2d_pattern, get_array
from maria_tpu.band import Band, get_band
from maria_tpu.calibration import Calibration
from maria_tpu.instrument import get_instrument
from maria_tpu.plan import Plan, Planner, get_plan
from maria_tpu.site import get_site


def test_pattern_generation():
    for packing in ("triangular", "square", "sunflower"):
        offsets = generate_2d_pattern(n=100, spacing=1.0, packing=packing, shape="circle")
        assert offsets.shape == (100, 2)
    # implicit n: hit a target diameter
    offsets = generate_2d_pattern(max_diameter=10.0, spacing=1.0)
    from maria_tpu.utils import compute_diameter

    assert abs(np.log(compute_diameter(offsets) / 10.0)) < 0.05


def test_mustang2():
    m2 = get_instrument("MUSTANG-2")
    assert m2.n_dets == 217
    assert abs(m2.field_of_view.deg - 0.07) < 0.01
    assert m2.dets.primary_size[0] == 100
    fwhm = m2.dets.angular_fwhm(z=np.inf)
    # ~9 arcsec beam at 90 GHz on a 100 m dish
    assert 5 < np.degrees(fwhm.rad.min()) * 3600 < 15


def test_polarized_array():
    arr = Array.from_config(
        {"name": "polarized", "n": 50, "field_of_view": 0.5, "primary_size": 10,
         "polarized": True, "bands": ["test/f150"]}
    )
    assert arr.n == 100  # doubled
    sw = arr.stokes_weight()
    assert np.allclose(sw[:, 0], 0.5)  # polarized I weight
    assert np.allclose(np.abs(sw[:, 1] ** 2 + sw[:, 2] ** 2), 0.25, atol=1e-12)


def test_unpolarized_stokes():
    arr = Array.from_config(
        {"name": "unpol", "n": 10, "field_of_view": 0.1, "primary_size": 10, "bands": ["test/f150"]}
    )
    sw = arr.stokes_weight()
    assert np.allclose(sw[:, 0], 1.0)
    assert np.allclose(sw[:, 1:], 0.0)


@pytest.mark.slow
def test_atlast_sz_scale():
    sz = get_instrument("AtLAST-SZ")
    assert sz.n_dets > 20000  # ~50k detectors


def test_plan_generation():
    plan = get_plan("ten_second_zenith_stare")
    assert plan.n == 500
    assert np.allclose(np.degrees(plan.el), 90.0, atol=1e-10)

    daisy = get_plan("daisy_2deg_3min")
    assert daisy.n == 9000
    offsets = np.degrees(daisy.offsets())
    assert 1.5 < np.abs(offsets).max() < 2.5
    # daisy speed normalization: peak speed ~ requested
    assert abs(np.log(np.degrees(daisy.scan_speed.value.max()) / 0.5)) < 0.1


def test_plan_concatenation():
    p1 = get_plan("ten_second_zenith_stare", start_time=1.75e9)
    p2 = get_plan("ten_second_zenith_stare", start_time=1.75e9 + 20)
    both = p1 + p2
    assert both.n == p1.n + p2.n


def test_planner():
    planner = Planner(target=(150.0, -20.0), site="ALMA", constraints={"el_range": (40, 80)})
    plans = planner.generate_plans(
        start_time=1.75e9, horizon_days=2.0, total_duration=1200.0, chunk_duration=600.0,
        scan_options={"radius": 0.5},
    )
    assert len(plans) >= 1
    for plan in plans:
        el = np.degrees(plan.coords.el)
        assert el.min() > 35  # scan offsets can push slightly past the constraint


def test_calibration_roundtrip():
    band = get_band("test/f150")
    cal = Calibration("K_RJ -> pW", band=band)
    inv = Calibration("pW -> K_RJ", band=band)
    x = 1.5e-3
    assert np.isclose(inv(cal(x)), x, rtol=1e-10)


def test_calibration_prefix_scaling():
    band = get_band("test/f150")
    a = Calibration("K_RJ -> pW", band=band)(1.0)
    b = Calibration("mK_RJ -> pW", band=band)(1000.0)
    assert np.isclose(a, b, rtol=1e-12)


def test_calibration_cmb_vs_rj():
    # at 150 GHz, 1 K_CMB is less than ~1.2 K_RJ of power
    band = get_band("test/f150")
    p_rj = Calibration("K_RJ -> W", band=band)(1.0)
    p_cmb = Calibration("K_CMB -> W", band=band)(1.0)
    assert 0.2 < p_cmb / p_rj < 1.0


def test_site():
    site = get_site("green_bank")
    assert site.region == "green_bank"
    assert abs(site.earth_location.lat_deg - 38.433) < 0.01
    gbt = get_site("GBT")
    assert gbt.region == "green_bank"


def test_all_example_maps_synthesize():
    """Every registered example map (and its reference-name aliases)
    loads finite with positive structure."""
    import numpy as np

    import maria_tpu

    for name in list(maria_tpu.all_maps) + ["time_evolving_sun", "circinus_galaxy", "orion_A"]:
        m = maria_tpu.map.get(name)
        d = np.asarray(m.data)
        assert np.isfinite(d).all() and d.std() > 0, name


def test_atmosphere_outer_scale_and_min_height():
    """Reference exposes turbulent_outer_scale / min_atmosphere_height
    (maria/sim/params.yml); both must route through Simulation kwargs."""
    from maria_tpu.atmosphere import Atmosphere

    atm = Atmosphere(model="3d", region="chajnantor", timestamp=1.75e9,
                     outer_scale=500.0, min_height=800.0, n_layers=6)
    assert atm.outer_scale == 500.0 and atm.min_height == 800.0

    from maria_tpu.sim.params import parse_sim_kwargs

    parsed = parse_sim_kwargs({"outer_scale": 500.0, "min_height": 800.0})
    assert parsed["atmosphere"] == {"outer_scale": 500.0, "min_height": 800.0}


def test_min_height_shifts_layers():
    import maria_tpu

    plan = maria_tpu.get_plan("five_second_stare", start_time=1.75e9,
                              scan_center=(60.0, 45.0))
    sim = maria_tpu.Simulation(instrument="test/1deg", plans=plan,
                               site="chajnantor", atmosphere="3d",
                               noise=False, min_height=1000.0, n_layers=5)
    atm = sim.obs_list[0].atmosphere
    assert float(atm.layers.h.min()) >= 1000.0


def test_array_registry_and_new_instruments():
    """Named arrays resolve through the registry (reference
    maria/array/configs/*), incl. CSV pad tables and instruments built
    from registry-name lists."""
    import maria_tpu

    assert {"act/pa4", "alma/cycle-1", "apex/saboca", "apex/artemis", "so/sat-wafer"} <= set(
        maria_tpu.all_arrays
    )
    alma = maria_tpu.get_array("alma/cycle-1")
    assert alma.n == 43
    # co-pointed antennas with nonzero pad baselines
    assert np.allclose(alma.offsets, 0.0)
    assert np.abs(alma.dets.baseline_x).max() > 50

    for name, n in (("ABS", 250), ("saboca", 37), ("artemis", 2304)):
        inst = maria_tpu.get_instrument(name)
        assert inst.dets.n == n, name
    assert maria_tpu.get_instrument("AdvACT").dets.n == 3 * 2 * 2 * 397
    assert maria_tpu.get_instrument("TolTEC").dets.n == 2 * (586 + 1266 + 2006)
    assert maria_tpu.get_instrument("AtLAST-SZ_mini").dets.n > 1000


def test_min_height_layers_strictly_increasing():
    """min_height must not create a duplicated boundary (zero-thickness
    layer that still draws pwv variance)."""
    import maria_tpu

    plan = maria_tpu.get_plan("five_second_stare", start_time=1.75e9,
                              scan_center=(60.0, 45.0))
    sim = maria_tpu.Simulation(instrument="test/1deg", plans=plan,
                               site="chajnantor", atmosphere="3d",
                               noise=False, min_height=1000.0, n_layers=5)
    layers = sim.obs_list[0].atmosphere.layers
    assert (layers.dh > 0).all()
    assert float(layers.h.min()) >= 1000.0


def test_custom_array_with_per_detector_bands():
    """Custom arrays may assign each detector its band explicitly
    (reference PER_DET_KWARGS; docs usage/inputs/instruments/arrays/custom)."""
    import pytest

    from maria_tpu.array import Array
    from maria_tpu.band import Band

    f090 = Band(name="f090", center=90e9, width=20e9, NET_RJ=5e-5)
    f150 = Band(name="f150", center=150e9, width=30e9, NET_RJ=5e-5)
    xi = [0.0, 0.01, 0.02, 0.03]
    eta = [0.0, 0.0, 0.01, 0.01]
    arr = Array.from_config({
        "bands": [f090, f150], "primary_size": 5,
        "xi": xi, "eta": eta,
        "band_name": ["f090", "f090", "f150", "f150"],
    })
    assert arr.n == 4  # NOT replicated per band
    assert sorted(arr.dets.band_name) == ["f090", "f090", "f150", "f150"]
    # detectors keep their own offsets
    assert np.isclose(np.degrees(arr.offsets).max(), 0.03)

    with pytest.raises(ValueError):
        Array.from_config({
            "bands": [f090], "primary_size": 5, "xi": xi, "eta": eta,
            "band_name": ["f090", "nope", "f090", "f090"],
        })


def test_planner_doc_workflows():
    """Reference-docs Planner forms: Map target, constraint aliases,
    singular generate_plan, kwargs-only get_plan with pointing_frame."""
    import maria_tpu

    input_map = maria_tpu.map.get("crab_nebula", center=(150.0, 10.0))
    planner = maria_tpu.Planner(
        target=input_map, site="green_bank",
        constraints={"el": (40, 90), "min_sun_distance": 20, "hour": (6, 18)},
    )
    assert planner.constraints["el_range"] == (40, 90)
    plan = planner.generate_plan(
        start_time=1.75e9, total_duration=120, sample_rate=20,
        scan_pattern="daisy", scan_options={"radius": 0.1},
    )
    assert float(plan.duration.s) >= 119

    stare = maria_tpu.get_plan(
        start_time="2022-02-10T06:00:00", scan_pattern="stare",
        duration=60, sample_rate=20, pointing_frame="az/el", scan_center=(0, 90),
    )
    assert abs(float(stare.duration.s) - 60) < 1


def test_bare_pattern_name_plan():
    """Simulation(plans="stare") builds a default plan from the bare
    pattern name (reference docs usage/getting-started)."""
    import maria_tpu

    plan = maria_tpu.get_plan("stare", start_time=1.75e9, duration=5, sample_rate=20)
    assert abs(float(plan.duration.s) - 5) < 0.1
    daisy = maria_tpu.get_plan("daisy", start_time=1.75e9, duration=5, sample_rate=20,
                               scan_options={"radius": 0.1})
    # the daisy actually scans (boresight wanders)
    assert float(np.asarray(daisy.coords.az).std()) > 0
