from .interp import RegularGridInterpolator, interp_1d, interp_bilinear_grid, upsample_time  # noqa: F401
