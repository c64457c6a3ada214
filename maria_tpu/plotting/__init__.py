from .map import plot_projection_map  # noqa: F401
from .tod import plot_tod, twinkle_plot  # noqa: F401
from .healpix import plot_healpix_map  # noqa: F401
