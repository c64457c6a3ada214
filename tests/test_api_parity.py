"""Reference-named API surface: symbols a migrating maria user calls by
name (reference maria/utils, maria/io, maria/units, maria/site, ...)."""

import numpy as np
import pytest

from maria_tpu.units import Quantity
from maria_tpu.units.quantity import lazy_nanquantile
from maria_tpu.units.units import UnitError, repr_dim_vec, repr_power


def test_unit_error_alias():
    from maria_tpu.units import InvalidUnitsError

    assert UnitError is InvalidUnitsError
    with pytest.raises(UnitError):
        Quantity(1.0, "furlongs_per_fortnight")


def test_repr_power_and_dim_vec():
    assert repr_power("m", 1) == "m"
    assert repr_power("m", 0) == ""
    assert repr_power("m", 2) == "m^2"
    assert repr_power("m", 0.5, math=True) == "m^{1/2}"
    assert repr_dim_vec({"m": 1, "s": -2}) == "m s^-2"


def test_lazy_nanquantile():
    x = np.arange(10000, dtype=float)
    x[::7] = np.nan
    q = lazy_nanquantile(x, 0.5)
    assert abs(q - 5000) < 200


def test_physical_quantity():
    assert Quantity(1.0, "hr").physical_quantity == "time"
    assert Quantity(1.0, "GHz").physical_quantity == "frequency"


def test_parse_axes():
    from maria_tpu.io.parsing import parse_nu, parse_stokes, parse_t, parse_v

    assert np.allclose(parse_t(Quantity([1, 2], "min")), [60, 120])
    assert np.allclose(parse_t([10.0, 20.0]), [10, 20])
    assert np.allclose(parse_nu(Quantity(90, "GHz")), [90e9])
    assert np.allclose(parse_v(Quantity([1.0], "km/s")), [1000.0])
    assert list(parse_stokes("IQU")) == ["I", "Q", "U"]
    assert list(parse_stokes([0, 3])) == ["I", "V"]
    with pytest.raises(ValueError):
        parse_nu(Quantity(1.0, "m"))
    with pytest.raises(ValueError):
        parse_stokes("IXU")


def test_io_repr_helpers():
    from maria_tpu.io import humanize, leftpad

    assert "s" in humanize(90, "s")
    assert leftpad("a\nb", n=2, char=" ") == "  a\n  b"


def test_caching_helpers(tmp_path):
    from maria_tpu.io.caching import copy_file, test_file

    src = tmp_path / "x.txt"
    src.write_text("hello")
    dst = tmp_path / "sub" / "y.txt"
    copy_file(str(src), str(dst))
    assert dst.read_text() == "hello"
    assert test_file(str(dst))
    bad = tmp_path / "bad.h5"
    bad.write_text("not an hdf5 file")
    assert not test_file(str(bad))


def test_rotation_helpers():
    from maria_tpu.utils.rotations import (
        get_orthogonal_transform,
        get_rotation_matrix_2d,
        get_rotation_matrix_3d,
        rotation_matrix_3d,
    )

    a = np.array([0.1, 0.2, 0.3])
    R2 = get_rotation_matrix_2d(a)
    assert R2.shape == (3, 2, 2)
    assert np.allclose(R2 @ np.swapaxes(R2, -1, -2), np.eye(2))

    # broadcast 3d matches the scalar composition
    R = get_rotation_matrix_3d(z=0.3, x=0.2)
    assert np.allclose(R, rotation_matrix_3d(z=0.3, x=0.2))
    Rb = get_rotation_matrix_3d(z=a)
    assert Rb.shape == (3, 3, 3)
    assert np.allclose(Rb[1], rotation_matrix_3d(z=0.2))

    T = get_orthogonal_transform([True, True, False], [0.7])
    assert np.allclose(T @ T.T, np.eye(3), atol=1e-12)
    assert np.allclose(T[2], [0, 0, 1])
    with pytest.raises(ValueError):
        get_orthogonal_transform([True, True, True], [0.1])


def test_bspline_family(rng):
    from maria_tpu.utils.signal import (
        bspline_basis_domain,
        bspline_knots,
        cross_basis,
        fit_bspline,
    )

    t = np.linspace(0, 100, 800)
    k = bspline_knots(t, spacing=10, order=3)
    assert k.min() < t.min() and k.max() > t.max()
    B = bspline_basis_domain(t, spacing=10, order=3)
    # partition of unity in the interior
    assert np.allclose(B.sum(axis=0), 1.0, atol=1e-8)

    y = np.sin(2 * np.pi * t / 60) + 0.01 * rng.normal(size=(3, len(t)))
    fit = fit_bspline(y, t, spacing=5.0)
    assert fit.shape == y.shape
    assert np.sqrt(np.mean((fit - y) ** 2)) < 0.05

    X = [np.linspace(0, 10, 50), np.linspace(0, 20, 50)]
    basis = cross_basis(X, spacing=[5, 10], order=[2, 2])
    assert basis.ndim == 2 and basis.shape[1] == 50


def test_signal_misc(rng):
    from maria_tpu.utils.signal import (
        bessel_highpass,
        bessel_lowpass,
        fast_downsample,
        grouper,
        remove_slope,
    )

    d = rng.normal(size=(2, 1000))
    ds = fast_downsample(d, r=4)
    assert ds.shape == (2, 249)

    sloped = np.linspace(0, 5, 100)[None] + 1.0
    assert np.allclose(remove_slope(sloped), 0.0, atol=1e-12)

    runs = list(grouper([False, True, True, True, False, True]))
    assert runs == [(1, 4), (5, 6)]
    runs = list(grouper([True] * 10, max_length=4))
    assert all(stop - start <= 4 for start, stop in runs)

    t = np.arange(2048) / 100.0
    sig = np.sin(2 * np.pi * 0.5 * t) + np.sin(2 * np.pi * 20 * t)
    lo = bessel_lowpass(sig, fc=2.0, sample_rate=100.0, order=2)
    hi = bessel_highpass(sig, fc=2.0, sample_rate=100.0, order=2)
    # the slow component survives the lowpass, the fast one the highpass
    assert np.std(lo[500:]) == pytest.approx(np.std(np.sin(2 * np.pi * 0.5 * t)), rel=0.2)
    assert np.corrcoef(hi[500:], np.sin(2 * np.pi * 20 * t)[500:])[0, 1] > 0.9


def test_site_getters():
    from maria_tpu.site import get_height_map, get_location, get_site_config

    cfg = get_site_config("green_bank", altitude=900)
    assert cfg["region"] == "green_bank" and cfg["altitude"] == 900
    loc = get_location("ACT")
    assert abs(float(loc.lat_deg) + 23) < 2
    hm = get_height_map()
    assert hm.ndim == 2
    assert np.isnan(hm).any() and np.nanmax(hm) > 3000


def test_config_getters():
    from maria_tpu.array import get_array_config
    from maria_tpu.band import validate_band_config
    from maria_tpu.instrument import get_instrument_config
    from maria_tpu.plan import validate_pointing_kwargs

    assert "array" in get_instrument_config("MUSTANG-2")
    with pytest.raises(KeyError):
        get_instrument_config("nonexistent-telescope")
    cfg = get_array_config("act/pa4", primary_size=7.0)
    assert cfg["name"] == "act/pa4" and cfg["primary_size"] == 7.0
    validate_band_config({"center": 90e9, "width": 20e9})
    with pytest.raises(ValueError):
        validate_band_config({"center": 90e9})
    validate_pointing_kwargs({"duration": 60})
    with pytest.raises(ValueError):
        validate_pointing_kwargs({"start_time": 0})


def test_packing_and_scan_wrappers():
    from maria_tpu.array.generation import (
        generate_square_packing,
        generate_sunflower_packing,
        generate_triangular_packing,
    )
    from maria_tpu.plan.patterns import daisy_from_phase, generate_scan_offsets, smooth_sawtooth

    df = generate_sunflower_packing(25)
    assert list(df.columns) == ["x", "y"] and len(df) == 25
    assert len(generate_square_packing(3, 4)) == 12
    assert len(generate_triangular_packing(4, 3)) == 12

    offsets = generate_scan_offsets(np.linspace(0, 60, 601), "daisy", radius=1.0, speed=0.25)
    assert offsets.shape == (2, 601)
    assert np.ptp(offsets) > 0
    assert np.isfinite(daisy_from_phase(np.linspace(0, 5, 9), 1.0, 0.2, 2.3, 0.1)).all()
    assert np.all(np.abs(smooth_sawtooth(np.linspace(0, 4, 33))) <= 1.0)


def test_unjitted_transform_alias():
    from maria_tpu.coords.transforms import offsets_to_phi_theta, unjitted_offsets_to_phi_theta

    assert unjitted_offsets_to_phi_theta is offsets_to_phi_theta


def test_process_config_surface():
    from maria_tpu.tod.processing import (
        OPERATION_KWARGS,
        process_operation_kwargs,
        validate_process_config,
    )

    config = process_operation_kwargs(window="hann", f_upper=2.0, modes_to_remove=2)
    assert config == {
        "window": {"name": "hann"},
        "filter": {"f_upper": 2.0},
        "remove_modes": {"n": 2},
    }
    with pytest.raises(ValueError):
        process_operation_kwargs(not_a_kwarg=1)

    # dtype coercion in place
    c = {"filter": {"f_upper": "2.5"}}
    assert validate_process_config(c)["filter"]["f_upper"] == 2.5
    with pytest.raises(ValueError):
        validate_process_config({"not_an_op": {}})
    with pytest.raises(ValueError):
        validate_process_config({"filter": {"bogus": 1}})
    assert set(OPERATION_KWARGS) <= {
        "despike", "remove_slope", "remove_spline", "window", "filter", "remove_modes",
    }


def test_map_concatenate_module_level():
    import maria_tpu

    m = maria_tpu.map.get("cluster")
    both = maria_tpu.map.concatenate([m, m], dim="nu")
    assert both.data.shape[1] == 2 * m.data.shape[1]
    assert maria_tpu.map.SLICE_DIMS["nu"]["dtype"] is float


def test_pointing_matrix_sparse_indices():
    from maria_tpu.utils.linalg import compute_pointing_matrix_sparse_indices

    x = np.array([0.1, 0.5, 1.5, -0.5])   # last two out of range in dim 0
    y = np.array([0.1, 0.9, 0.5, 0.5])
    bins = np.linspace(0, 1, 3)  # 2 bins per dim
    samples, pixels, n_pix = compute_pointing_matrix_sparse_indices([x, y], [bins, bins])
    assert n_pix == 4
    assert list(samples) == [0, 1]
    assert list(pixels) == [0, 3]  # (0,0) and (1,1) row-major
    with pytest.raises(ValueError):
        compute_pointing_matrix_sparse_indices([x], [bins[::-1]])


def test_mapper_class_split():
    from maria_tpu.mappers import BaseMapper, BaseProjectionMapper
    from maria_tpu.mappers.bin_mapper import BinMapper

    assert issubclass(BaseProjectionMapper, BaseMapper)
    assert issubclass(BinMapper, BaseProjectionMapper)


def test_reference_constant_surface():
    import maria_tpu
    from maria_tpu.array import ALLOWED_ARRAY_KWARGS, DET_COLUMN_TYPES, PER_DET_KWARGS
    from maria_tpu.atmosphere import SUPPORTED_MODELS_LIST
    from maria_tpu.band import BAND_FIELD_FORMATS
    from maria_tpu.calibration import KWARGS_UNITS
    from maria_tpu.cmb import CMB_SOURCES, CMB_SPECTRUM_SOURCE_URL
    from maria_tpu.io.fits import FITS_DEFAULT_UNITS, FITS_FRAMES
    from maria_tpu.map import AXIS_MAPPING, MAP_SIZE_KWARGS, VALID_MAP_KWARGS
    from maria_tpu.plan import MAX_ACCELERATION_WARN, PLAN_FIELDS
    from maria_tpu.plan.planner import CONSTRAINT_KEYS, SIDEREAL_DAY_SECONDS
    from maria_tpu.sim import BaseSimulation
    from maria_tpu.units.units import QUANTITIES, QUANTITY_DIMENSION_VECTORS, UnitError
    from maria_tpu.utils.plotting import HEX_CODE_LIST
    from maria_tpu.weather import WEATHER_SOURCE_BASE

    assert SUPPORTED_MODELS_LIST == ["2d", "3d"]
    assert DET_COLUMN_TYPES["gamma"] is float and "xi" in PER_DET_KWARGS
    assert "field_of_view" in ALLOWED_ARRAY_KWARGS
    assert KWARGS_UNITS["elevation"] == "rad"
    assert "planck" in CMB_SOURCES and CMB_SPECTRUM_SOURCE_URL.startswith("https://")
    assert FITS_DEFAULT_UNITS["nu"] == "Hz" and "ra/dec" in FITS_FRAMES
    assert set(MAP_SIZE_KWARGS) < set(VALID_MAP_KWARGS) and "nu" in AXIS_MAPPING
    assert MAX_ACCELERATION_WARN == 10 and PLAN_FIELDS["duration"] is float
    assert "el" in CONSTRAINT_KEYS and abs(SIDEREAL_DAY_SECONDS - 86164.09) < 0.01
    assert BaseSimulation is maria_tpu.Simulation
    assert "power" in QUANTITIES and "angle" in QUANTITY_DIMENSION_VECTORS.index
    assert issubclass(UnitError, ValueError)
    assert len(HEX_CODE_LIST) == 12 and BAND_FIELD_FORMATS["NEP"]["units"] == "W√s"
