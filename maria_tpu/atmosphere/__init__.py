from .atmosphere import Atmosphere  # noqa: F401
from .fourier import synthesize_matern_field_2d  # noqa: F401
from .layers import generate_layers  # noqa: F401
from .process import AutoregressiveProcess  # noqa: F401
