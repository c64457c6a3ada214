import numpy as np
import pytest

import maria_tpu
from maria_tpu.io.fits import read_fits, write_fits, write_fits_bintable


@pytest.fixture(scope="module")
def tod():
    sim = maria_tpu.Simulation(
        instrument="MUSTANG-2", plans="ten_second_zenith_stare",
        site="green_bank", atmosphere="2d", noise=True, seed=42,
    )
    return sim.run()[0]


def test_fits_image_roundtrip(tmp_path):
    p = str(tmp_path / "img.fits")
    data = np.arange(48, dtype=np.float32).reshape(6, 8)
    write_fits(p, [("TESTKEY", 3.5)], data)
    hdus = read_fits(p)
    header, back = hdus[0]
    assert np.allclose(back, data)
    assert np.isclose(header["TESTKEY"], 3.5)


def test_fits_bintable_roundtrip(tmp_path):
    p = str(tmp_path / "table.fits")
    x = np.linspace(0, 1, 100).astype(np.float32)
    ids = np.arange(100, dtype=np.int16)
    write_fits_bintable(
        p,
        columns=[("X    ", "E", x, "m"), ("ID   ", "I", ids, "")],
        header_cards=[("FOO", 42)],
    )
    header, rec = read_fits(p)[1]
    assert header["FOO"] == 42
    assert np.allclose(rec["X"], x)
    assert (rec["ID"] == ids).all()


def test_tod_fits_roundtrip(tmp_path, tod):
    p = str(tmp_path / "tod.fits")
    tod.to_fits(p)
    back = maria_tpu.TOD.from_fits(p)
    assert back.shape == tod.shape
    assert np.allclose(np.asarray(back.signal), np.asarray(tod.signal), rtol=1e-5)
    assert np.allclose(back.time, tod.time, atol=1e-2)
    assert back.dets.n == tod.dets.n


def test_tod_splits(tod):
    splits = tod.splits(target_split_time=2.0)
    assert len(splits) >= 1
    for s, e in splits:
        assert 0 <= s < e <= tod.shape[-1]


def test_tod_2d_slicing_and_get_field(tod):
    n_det, n_t = tod.shape

    sub = tod[::2, : n_t // 2]
    assert sub.shape == ((n_det + 1) // 2, n_t // 2)
    assert len(sub.pointing.t) == n_t // 2
    np.testing.assert_allclose(
        np.asarray(sub.signal), np.asarray(tod.signal)[::2, : n_t // 2]
    )
    # time axis of the sliced pointing matches
    np.testing.assert_allclose(np.asarray(sub.time), np.asarray(tod.time)[: n_t // 2])

    atm = tod.get_field("atmosphere")
    assert np.asarray(atm).shape == (n_det, n_t)
    try:
        tod.get_field("nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_tod_hdf_roundtrip(tod, tmp_path):
    """Full-fidelity HDF round trip (the reference documents to_hdf but
    ships it commented out, maria/tod/tod.py:361-363)."""
    from maria_tpu.tod.tod import TOD

    p = str(tmp_path / "tod.h5")
    tod.to_hdf(p)
    back = TOD.from_hdf(p)

    assert back.units == tod.units
    assert sorted(back.fields) == sorted(tod.fields)
    np.testing.assert_allclose(np.asarray(back.signal), np.asarray(tod.signal), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.time), np.asarray(tod.time))
    np.testing.assert_allclose(back.pointing.offsets, tod.pointing.offsets)
    assert list(back.dets.band_name) == list(tod.dets.band_name)
    # calibration still works on the reloaded TOD
    pw = back.to("pW")
    assert np.isfinite(np.asarray(pw.signal)).all()


def test_tod_fancy_indexing_keeps_dets_aligned(tod):
    """Reversed/fancy detector indices must reorder the detector table
    with the data (a membership mask would silently misalign them)."""
    rev = tod[::-1]
    np.testing.assert_allclose(
        np.asarray(rev.signal), np.asarray(tod.signal)[::-1]
    )
    np.testing.assert_allclose(rev.dets.offsets, tod.dets.offsets[::-1])
    dup = tod[[0, 0, 1]]
    assert dup.shape[0] == 3 and dup.dets.n == 3
    np.testing.assert_allclose(dup.dets.offsets[0], dup.dets.offsets[1])


def test_tod_subset_time_range_slices_pointing(tod):
    sub = tod.subset(time_range=(0, 100))
    assert sub.shape[-1] == 100
    assert len(sub.pointing.t) == 100
    np.testing.assert_allclose(np.asarray(sub.time), np.asarray(tod.time)[:100])
