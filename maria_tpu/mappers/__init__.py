from .base import BaseMapper, BaseProjectionMapper  # noqa: F401
from .bin_mapper import BinMapper  # noqa: F401


def compute_residual_map(input_map, output_map):
    """Weighted residual between an input sky and a recovered map
    (reference: maria/mappers/__init__.py:8)."""
    import numpy as np

    data_in = np.asarray(input_map.data)
    data_out = np.asarray(output_map.data)
    if data_in.shape != data_out.shape:
        raise ValueError(f"Map shapes differ: {data_in.shape} vs {data_out.shape}.")
    w = np.asarray(output_map.weight)
    resid = np.where(w > 0, data_out - data_in, 0.0)
    return resid, w


try:  # the ML mapper needs its own module; keep the import soft during bring-up
    from .ml_mapper import MaximumLikelihoodMapper  # noqa: F401
except ImportError:  # pragma: no cover
    pass
