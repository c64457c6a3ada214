"""Exception types (reference: maria/errors/__init__.py:8-38)."""

from __future__ import annotations

from ..constants import MAX_NU_HZ, MIN_NU_HZ


class PointingError(Exception):
    pass


class IncompatibleMapError(Exception):
    """Raised when a map type cannot be observed the way it was passed
    (e.g. a HEALPix all-sky map given as `map=`; pass it as `cmb=` or
    project it to a ProjectionMap first)."""


class ShapeError(Exception):
    pass


class ConfigurationError(Exception):
    """Bad scene/component configuration (reference errors/__init__.py:14)."""


class MissingCalibrationKwargsError(Exception):
    def __init__(self, missing):
        super().__init__(f"Missing required calibration kwargs {missing}.")


# the reference's name for the same exception (errors/__init__.py:20)
MissingCalibrationKwargs = MissingCalibrationKwargsError


class InvalidInstrumentError(ValueError):
    """Unknown instrument name (reference instrument/__init__.py:69)."""

    def __init__(self, name, valid=None):
        hint = f" Valid instruments are {sorted(valid)}." if valid else ""
        super().__init__(f"Invalid instrument '{name}'.{hint}")


class InvalidArrayError(ValueError):
    """Unknown array name (counterpart of InvalidInstrumentError for the
    array registry, reference array/array.py:100-101)."""

    def __init__(self, name, valid=None):
        hint = f" Valid arrays are {sorted(valid)}." if valid else ""
        super().__init__(f"Invalid array '{name}'.{hint}")


class InvalidSiteError(ValueError):
    """Unknown site name (reference site/__init__.py:34)."""

    def __init__(self, name, valid=None):
        hint = f" Valid sites are {sorted(valid)}." if valid else ""
        super().__init__(f"Invalid site '{name}'.{hint}")


class IncompatibleQuantityError(Exception):
    pass


class InvalidRegionError(Exception):
    def __init__(self, region, valid=None):
        hint = f" Valid regions are {sorted(valid)}." if valid else ""
        super().__init__(f"Invalid region '{region}'.{hint}")


class FrequencyOutOfBoundsError(Exception):
    def __init__(self, nu=None, center_and_width=None):
        if center_and_width is not None:
            detail = f"band with center {center_and_width[0]:.3e} Hz and width {center_and_width[1]:.3e} Hz"
        else:
            detail = f"frequencies {nu}"
        super().__init__(
            f"The {detail} fall outside the supported range "
            f"[{MIN_NU_HZ:.0e}, {MAX_NU_HZ:.0e}] Hz.",
        )


class NoSuitablePlansError(Exception):
    def __init__(self, message="Could not find any plans satisfying the given constraints."):
        super().__init__(message)
