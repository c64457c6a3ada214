from . import signal  # noqa: F401
from .field import Field  # noqa: F401
from .processing import process_tod  # noqa: F401
from .tod import TOD, Pointing  # noqa: F401


def load(fname: str, format: str = "MUSTANG-2", **kwargs) -> TOD:
    """Load a real instrument TOD from disk
    (reference: maria/tod/__init__.py:26-99)."""
    return TOD.from_fits(fname, format=format, **kwargs)
