from .prefixes import PREFIXES, best_prefix  # noqa: F401
from .quantity import Angle, Quantity  # noqa: F401
from .units import UNITS, InvalidUnitsError, Unit, parse_units  # noqa: F401

__all__ = ["Quantity", "Angle", "Unit", "parse_units", "UNITS", "PREFIXES", "best_prefix", "InvalidUnitsError"]
