from .interp import RegularGridInterpolator, interp_1d, interp_bilinear_grid  # noqa: F401
