from .atmosphere import Atmosphere  # noqa: F401
from .fourier import synthesize_matern_field_2d  # noqa: F401
from .layers import generate_layers  # noqa: F401
from .process import AutoregressiveProcess  # noqa: F401

# reference: atmosphere/atmosphere.py:28
SUPPORTED_MODELS_LIST = ["2d", "3d"]
