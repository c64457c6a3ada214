from .base import BaseMapper, BaseProjectionMapper  # noqa: F401
from .bin_mapper import BinMapper  # noqa: F401


def compute_residual_map(input_map, output_map):
    """Weighted residual between an input sky and a recovered map
    (reference: maria/mappers/__init__.py:8)."""
    import numpy as np

    if np.asarray(input_map.data).shape[-2:] != np.asarray(output_map.data).shape[-2:] or not np.allclose(
        input_map.center, output_map.center
    ):
        # align grids like the reference's reproject-based comparison
        data_in = input_map.sampled_onto(output_map)
    else:
        data_in = np.asarray(input_map.data)
    data_out = np.asarray(output_map.data)
    if data_in.shape != data_out.shape:
        # leading slice dims may still differ (e.g. 4-stokes input vs
        # I-only output): compare the common prefix
        ns = min(data_in.shape[0], data_out.shape[0])
        nn = min(data_in.shape[1], data_out.shape[1])
        nt = min(data_in.shape[2], data_out.shape[2])
        data_in = data_in[:ns, :nn, :nt]
        data_out = data_out[:ns, :nn, :nt]
    w = np.asarray(output_map.weight)[: data_out.shape[0], : data_out.shape[1], : data_out.shape[2]]
    resid = np.where(w > 0, data_out - data_in, 0.0)
    # a Map on the output grid (the reference returns a plottable map)
    base = output_map[: data_out.shape[0], : data_out.shape[1], : data_out.shape[2]]
    return base._replace(data=resid.astype(np.float32), weight=w.astype(np.float32))


try:  # the ML mapper needs its own module; keep the import soft during bring-up
    from .ml_mapper import MaximumLikelihoodMapper  # noqa: F401
except ImportError:  # pragma: no cover
    pass

from .streaming_ml import StreamingMLMapper  # noqa: F401,E402
