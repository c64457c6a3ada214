"""Progress bars and duration logging
(reference: maria/io/logging.py:7-13 and the tqdm usage on every long
loop — atmosphere construction, turbulence generation, band loops,
mapping)."""

from __future__ import annotations

import contextlib
import logging
import time as _time

logger = logging.getLogger("maria_tpu")

DEFAULT_BAR_FORMAT = "{l_bar}{bar:16}{r_bar}"


def progress_bar(iterable=None, desc: str = "", disable: bool = True, total: int = None):
    """A tqdm bar with the package's shared format; falls back to the
    bare iterable if tqdm is unavailable."""
    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        return iterable if iterable is not None else contextlib.nullcontext()
    return tqdm(iterable, desc=desc, disable=disable, total=total, bar_format=DEFAULT_BAR_FORMAT)


@contextlib.contextmanager
def log_duration(message: str, level: int = logging.DEBUG):
    """Log `message` with the elapsed wall time on exit
    (reference io/logging.py:10)."""
    start = _time.monotonic()
    yield
    logger.log(level, f"{message} in {_time.monotonic() - start:.2f} s")
