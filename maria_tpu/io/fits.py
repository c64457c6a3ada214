"""Minimal FITS reader/writer, written from scratch.

No astropy in this environment; the FITS format (2880-byte cards/blocks,
big-endian data) is simple enough to implement directly for the subset
the framework needs: primary image HDUs with WCS for maps, and binary
tables for TODs.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("maria_tpu")

BLOCK = 2880

_BITPIX_DTYPES = {
    8: np.dtype(">u1"),
    16: np.dtype(">i2"),
    32: np.dtype(">i4"),
    64: np.dtype(">i8"),
    -32: np.dtype(">f4"),
    -64: np.dtype(">f8"),
}


def _format_card(key: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        card = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, np.integer)):
        card = f"{key:<8}= {value:>20}"
    elif isinstance(value, (float, np.floating)):
        card = f"{key:<8}= {value:>20.13E}"
    elif value is None:
        card = f"{key:<8}"
    else:
        card = f"{key:<8}= '{str(value):<8}'"
    if comment:
        card += f" / {comment}"
    return card[:80].ljust(80).encode("ascii")


def _parse_header(block_bytes: bytes) -> dict:
    header = {}
    for i in range(0, len(block_bytes), 80):
        card = block_bytes[i : i + 80].decode("ascii", errors="replace")
        key = card[:8].strip()
        if key == "END":
            break
        if "=" not in card[8:10]:
            continue
        raw = card[10:].split("/")[0].strip()
        if raw.startswith("'"):
            value = raw.strip("'").strip()
        elif raw in ("T", "F"):
            value = raw == "T"
        else:
            try:
                value = int(raw)
            except ValueError:
                try:
                    value = float(raw)
                except ValueError:
                    value = raw
        header[key] = value
    return header


# binary-table column formats: FITS TFORM letter -> numpy big-endian dtype
_TFORM_DTYPES = {
    "L": ">u1", "B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
    "E": ">f4", "D": ">f8",
}


def _bintable_dtype(header):
    fields = []
    for i in range(1, header["TFIELDS"] + 1):
        name = str(header.get(f"TTYPE{i}", f"col{i}")).strip()
        tform = str(header[f"TFORM{i}"]).strip()
        # repeat count prefix, e.g. '1E', 'E', '3D'
        count = int(tform[:-1]) if tform[:-1] else 1
        letter = tform[-1]
        dt = _TFORM_DTYPES[letter]
        fields.append((name, dt, (count,)) if count > 1 else (name, dt))
    return np.dtype(fields)


def read_fits(path: str):
    """Read all HDUs: list of (header, data-or-None). Image HDUs give
    ndarrays; BINTABLE HDUs give structured arrays."""
    hdus = []
    with open(path, "rb") as f:
        raw = f.read()
    pos = 0
    while pos < len(raw):
        # read header blocks until END
        header_bytes = b""
        while True:
            block = raw[pos : pos + BLOCK]
            if len(block) < BLOCK:
                return hdus
            header_bytes += block
            pos += BLOCK
            if any(block[i : i + 8].rstrip() == b"END" for i in range(0, BLOCK, 80)):
                break
        header = _parse_header(header_bytes)
        data = None
        if str(header.get("XTENSION", "")).startswith("BINTABLE"):
            dtype = _bintable_dtype(header)
            n_rows = header["NAXIS2"]
            n_bytes = dtype.itemsize * n_rows
            data = np.frombuffer(raw[pos : pos + n_bytes], dtype=dtype)
            pos += (-(-n_bytes // BLOCK)) * BLOCK
        elif header.get("NAXIS", 0) and header.get("BITPIX") in _BITPIX_DTYPES:
            naxis = header["NAXIS"]
            shape = [header[f"NAXIS{i}"] for i in range(naxis, 0, -1)]
            dtype = _BITPIX_DTYPES[header["BITPIX"]]
            n_bytes = int(np.prod(shape)) * dtype.itemsize
            data = np.frombuffer(raw[pos : pos + n_bytes], dtype=dtype).reshape(shape)
            data = data * header.get("BSCALE", 1.0) + header.get("BZERO", 0.0)
            pos += (-(-n_bytes // BLOCK)) * BLOCK
        hdus.append((header, data))
    return hdus


def write_fits_bintable(path: str, columns: list, header_cards: list = ()):
    """Append-style writer: primary HDU + one binary table.

    `columns` is a list of (name, tform_letter, array, unit) tuples; all
    arrays must share a length (None arrays become zeros).
    """
    n_rows = max(len(a) for _, _, a, _ in columns if a is not None)
    fields, units = [], []
    arrays = []
    for name, letter, arr, unit in columns:
        dt = _TFORM_DTYPES[letter]
        if arr is None:
            arr = np.zeros(n_rows, dtype=dt)
        arrays.append(np.asarray(arr).astype(dt))
        fields.append((name.strip(), dt))
        units.append(unit)
    rec = np.empty(n_rows, dtype=np.dtype(fields))
    for (name, _), arr in zip(fields, arrays):
        rec[name] = arr

    # primary (empty) HDU
    primary = [
        _format_card("SIMPLE", True),
        _format_card("BITPIX", 8),
        _format_card("NAXIS", 0),
        _format_card("EXTEND", True),
        "END".ljust(80).encode("ascii"),
    ]
    primary_bytes = b"".join(primary)
    primary_bytes += b" " * (-len(primary_bytes) % BLOCK)

    cards = [
        _format_card("XTENSION", "BINTABLE"),
        _format_card("BITPIX", 8),
        _format_card("NAXIS", 2),
        _format_card("NAXIS1", rec.dtype.itemsize),
        _format_card("NAXIS2", n_rows),
        _format_card("PCOUNT", 0),
        _format_card("GCOUNT", 1),
        _format_card("TFIELDS", len(columns)),
    ]
    for i, ((name, letter, _, unit)) in enumerate(columns, start=1):
        cards.append(_format_card(f"TTYPE{i}", name))
        cards.append(_format_card(f"TFORM{i}", letter))
        if unit:
            cards.append(_format_card(f"TUNIT{i}", unit))
    for key, value, *comment in header_cards:
        cards.append(_format_card(key, value, comment[0] if comment else ""))
    cards.append("END".ljust(80).encode("ascii"))
    header_bytes = b"".join(cards)
    header_bytes += b" " * (-len(header_bytes) % BLOCK)

    payload = rec.tobytes()
    payload += b"\x00" * (-len(payload) % BLOCK)
    with open(path, "wb") as f:
        f.write(primary_bytes)
        f.write(header_bytes)
        f.write(payload)


def write_fits(path: str, header_cards: list, data: np.ndarray = None):
    """Write a single image HDU."""
    cards = [_format_card("SIMPLE", True, "conforms to FITS standard")]
    if data is not None:
        data = np.ascontiguousarray(data)
        bitpix = {np.float32: -32, np.float64: -64, np.int32: 32, np.int16: 16}[data.dtype.type]
        cards.append(_format_card("BITPIX", bitpix))
        cards.append(_format_card("NAXIS", data.ndim))
        for i, n in enumerate(reversed(data.shape)):
            cards.append(_format_card(f"NAXIS{i + 1}", n))
    else:
        cards.append(_format_card("BITPIX", 8))
        cards.append(_format_card("NAXIS", 0))
    for key, value, *comment in header_cards:
        cards.append(_format_card(key, value, comment[0] if comment else ""))
    cards.append("END".ljust(80).encode("ascii"))

    header_bytes = b"".join(cards)
    header_bytes += b" " * (-len(header_bytes) % BLOCK)

    with open(path, "wb") as f:
        f.write(header_bytes)
        if data is not None:
            payload = data.astype(data.dtype.newbyteorder(">")).tobytes()
            payload += b"\x00" * (-len(payload) % BLOCK)
            f.write(payload)


def write_fits_map(m, path: str):
    """Write a ProjectionMap with a gnomonic-ish WCS."""
    res_deg = np.degrees(m.resolution)
    cards = [
        ("CTYPE1", "RA---SIN" if m.frame == "ra/dec" else "AZ---SIN"),
        ("CTYPE2", "DEC--SIN" if m.frame == "ra/dec" else "EL---SIN"),
        ("CRVAL1", np.degrees(m.center[0])),
        ("CRVAL2", np.degrees(m.center[1])),
        # +x offsets decrease phi in the tangent-plane convention
        ("CDELT1", -res_deg),
        ("CDELT2", np.degrees(m.y_res)),
        ("CRPIX1", (m.n_x + 1) / 2),
        ("CRPIX2", (m.n_y + 1) / 2),
        ("BUNIT", m.units),
        ("RESTFRQ", float(m.nu[0])),
    ]
    # store with the FITS x-axis convention (RA increases leftward, i.e.
    # CDELT1 < 0): flip the tangent-plane dx axis
    write_fits(path, cards, np.asarray(m.data, dtype=np.float32)[..., ::-1])


def parse_fits_map_header(header: dict) -> dict:
    """Infer map-construction kwargs from a FITS image header: center,
    resolution, frequency, units, frame, and whether the x axis needs
    flipping to put ascending pixel index along ascending tangent-plane
    dx (reference: maria/io/fits/map.py:82-150)."""
    return {
        "resolution": abs(header.get("CDELT1", header.get("CD1_1", np.nan))),
        "center": (header.get("CRVAL1", 0.0), header.get("CRVAL2", 0.0)),
        "nu": header.get("RESTFRQ", 150e9),
        "units": header.get("BUNIT", "K_RJ"),
        "frame": "ra/dec" if str(header.get("CTYPE1", "RA")).startswith("RA") else "az/el",
        "flip_x": header.get("CDELT1", -1) < 0,
    }


def read_fits_map(path: str, index: int = 0, **kwargs):
    """Read a map from FITS (reference: maria/io/fits/map.py:53)."""
    from ..map.projection import ProjectionMap

    hdus = [h for h in read_fits(path) if h[1] is not None]
    if not hdus:
        raise ValueError(f"No image data in '{path}'.")
    header, data = hdus[index]
    parsed = parse_fits_map_header(header)
    res, center, nu, units, frame = (
        parsed["resolution"], parsed["center"], parsed["nu"], parsed["units"], parsed["frame"],
    )
    data = np.asarray(data, dtype=np.float32)
    if parsed["flip_x"]:
        data = data[..., ::-1]
    # explicit kwargs override inferred metadata (reference docs
    # usage/inputs/maps: load("f.fits", width=1, units="uK_RJ", nu=150e9))
    kw = dict(
        data=data, center=center, resolution=res, frame=frame,
        nu=np.atleast_1d(nu), units=units, degrees=True,
    )
    if "width" in kwargs or "height" in kwargs:
        kw.pop("resolution", None)
    if "nu" in kwargs:
        kwargs["nu"] = np.atleast_1d(kwargs["nu"])
    kw.update(kwargs)
    return ProjectionMap(**kw)


# FITS axis/keyword classification tables (reference: io/fits/map.py:16-50).
# parse_fits_map_header consults these; they are exported for users who
# classify their own headers.
FITS_TYPE_ALIASES = {
    "stokes": ["STOKES"],
    "nu": ["NU", "FREQ"],
    "v": ["VRAD", "VELO"],
    "t": ["TIME"],
    "z": ["REDSHIFT"],
}

FITS_KWARG_ALIASES = {
    "units": ["UNIT", "BUNIT", "BUNITS", "OUTTYPE"],
    "nu": ["NU", "FREQ", "RESTFRQ", "RESTFREQ"],
    "z": ["REDSHIFT"],
}

FITS_DEFAULT_UNITS = {
    "stokes": "", "nu": "Hz", "v": "m/s", "z": "", "t": "s", "eta": "deg", "xi": "deg",
}

FITS_FRAMES = {
    "ra/dec": {
        "xi": {"aliases": [r"^RA-*"], "parity": -1},
        "eta": {"aliases": [r"^DEC-*"], "parity": +1},
    },
    "galactic": {
        "xi": {"aliases": [r"^GLON-*"], "parity": -1},
        "eta": {"aliases": [r"^GLAT-*"], "parity": +1},
    },
}
