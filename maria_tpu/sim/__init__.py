from .observation import Observation  # noqa: F401
from .simulation import BaseSimulation, Simulation  # noqa: F401
