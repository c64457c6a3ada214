"""TOD post-processing pipeline (reference: maria/tod/processing.py:91-196).

Ordered, validated operations: slope removal, B-spline baseline removal,
windowing (into the weights), frequency-domain filtering, and SVD
common-mode removal. Heavy ops (FFT filters, SVD) run on device.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np
import scipy as sp

from ..utils.signal import bandpass, bspline_basis, highpass, lowpass

logger = logging.getLogger("maria_tpu")

PROCESS_ORDER = ["despike", "remove_slope", "remove_spline", "window", "filter", "remove_modes"]

# Per-op parameter spec: dtype for coercion plus the flat kwarg aliases
# accepted by process_operation_kwargs (reference: tod/processing.py:16-37).
OPERATION_KWARGS = {
    "despike": {
        "threshold": {"dtype": float, "aliases": ["despike_threshold"]},
        "window": {"dtype": int, "aliases": ["despike_window"]},
        "pad": {"dtype": int, "aliases": ["despike_pad"]},
    },
    "remove_slope": {},
    "window": {
        "name": {"dtype": str, "aliases": ["window"]},
        "kwargs": {"dtype": dict, "aliases": ["window_kwargs"]},
    },
    "filter": {
        "f_lower": {"dtype": float, "aliases": ["f_lower"]},
        "f_upper": {"dtype": float, "aliases": ["f_upper"]},
        "order": {"dtype": int, "aliases": ["filter_order"]},
        "method": {"dtype": str, "aliases": ["filter_method"]},
    },
    "remove_modes": {
        "n": {"dtype": int, "aliases": ["modes_to_remove", "n_modes"]},
    },
    "remove_spline": {
        "knot_spacing": {"dtype": float, "aliases": ["remove_spline_knot_spacing"]},
        "remove_el_gradient": {"dtype": bool, "aliases": ["remove_el_gradient"]},
        "remove_el_gradient_order": {"dtype": int, "aliases": ["remove_el_gradient_order"]},
    },
}


def process_operation_kwargs(**kwargs):
    """Regroup flat, alias-named kwargs (e.g. ``f_upper=2.0,
    window='hann'``) into the nested per-op config that ``process_tod``
    takes (reference: tod/processing.py:40-60)."""
    config = {}
    for operation, params in OPERATION_KWARGS.items():
        subconfig = {}
        for key, param in params.items():
            for kwarg in list(kwargs):
                if kwarg in param["aliases"]:
                    subconfig[key] = kwargs.pop(kwarg)
        if subconfig:
            config[operation] = subconfig
    if kwargs:
        raise ValueError(f"Invalid kwargs for TOD processing: {kwargs}.")
    return config


def validate_process_config(config):
    """Check op and parameter names and coerce values to their declared
    dtypes, in place (reference: tod/processing.py:63-90). Boolean
    per-op shorthand (``remove_slope=True``) passes through."""
    for operation, params in config.items():
        if operation not in OPERATION_KWARGS:
            raise ValueError(
                f"Invalid operation '{operation}'. Valid operations are {list(OPERATION_KWARGS)}."
            )
        if not isinstance(params, dict):
            continue
        for key, value in list(params.items()):
            if key in ("el",):  # injected internally by process_tod
                continue
            if key not in OPERATION_KWARGS[operation]:
                # the reference's nested configs use the alias names
                # (e.g. remove_modes: {modes_to_remove: 1}); accept and
                # canonicalize them
                canonical = next(
                    (c for c, p in OPERATION_KWARGS[operation].items() if key in p["aliases"]),
                    None,
                )
                if canonical is None:
                    raise ValueError(
                        f"Invalid param '{key}' for operation '{operation}'. Valid parameters "
                        f"are {list(OPERATION_KWARGS[operation])}."
                    )
                config[operation][canonical] = config[operation].pop(key)
                key = canonical
            dtype = OPERATION_KWARGS[operation][key]["dtype"]
            if not isinstance(value, dtype):
                try:
                    config[operation][key] = dtype(value)
                except Exception:
                    raise TypeError(
                        f"Could not convert param {{{key}: {value}}} for operation "
                        f"'{operation}' to type '{dtype.__name__}'."
                    )
    return config


def _check_nan(name, data):
    if bool(jnp.isnan(data).any()):
        raise RuntimeError(f"Processing op '{name}' introduced NaNs.")


def _boxcar_sum(x, w: int):
    """Batched zero-padded 'same' boxcar SUM along the last axis via
    prefix sums — identical to ``jnp.convolve(row, ones(w), "same")`` per
    row, but O(n) and vectorized over leading axes (one cumsum + two
    gathers instead of an O(n·w) convolution per row)."""
    n = x.shape[-1]
    csum = jnp.concatenate([jnp.zeros((*x.shape[:-1], 1), x.dtype), jnp.cumsum(x, axis=-1)], axis=-1)
    i = jnp.arange(n)
    hi = jnp.clip(i + (w - 1) // 2 + 1, 0, n)
    lo = jnp.clip(i - w // 2, 0, n)
    return jnp.take(csum, hi, axis=-1) - jnp.take(csum, lo, axis=-1)


def despike(data, weight, threshold: float = 10.0, window: int = 16, pad: int = 2):
    """Flag and repair glitches: samples whose deviation from a local
    boxcar baseline exceeds `threshold` robust sigmas are replaced by the
    baseline and zero-weighted (±`pad` neighbors too). The reference
    documents cuts but ships them in a dead module
    (maria/tod/signal.py:make_cuts, never imported); this op is live.
    Pure jnp (jit-safe, no host syncs), runs on device."""
    n = data.shape[-1]
    w = int(min(window, max(3, n // 4)))
    # prefix sums of the raw signal lose precision at f32 (sums reach
    # ~n·|mean|); work on per-row mean-subtracted residuals and restore
    # the mean through the zero-pad edge factor conv(1, ones(w)/w)
    mu = data.mean(axis=-1, keepdims=True)
    xc = data - mu
    edge = _boxcar_sum(jnp.ones((n,), data.dtype), w) / w  # (n,), <1 near edges
    baseline = _boxcar_sum(xc, w) / w + mu * edge
    resid = data - baseline
    sigma = 1.4826 * jnp.median(jnp.abs(resid), axis=-1, keepdims=True)
    bad = jnp.abs(resid) > threshold * jnp.maximum(sigma, 1e-30)
    if pad > 0:
        bad = _boxcar_sum(bad.astype(jnp.float32), 2 * pad + 1) > 0
    # repair with a MASKED boxcar (the plain baseline still contains the
    # spike's own power)
    good = (~bad).astype(data.dtype)
    den = _boxcar_sum(good, w)
    repair = (_boxcar_sum(xc * good, w) + mu * den) / jnp.maximum(den, 1e-6)
    data = jnp.where(bad, repair, data)
    weight = jnp.where(bad, 0.0, weight)
    return data, weight


def remove_slope(data, **kwargs):
    n = data.shape[-1]
    t = jnp.linspace(-1.0, 1.0, n)
    slope = (data @ t) / (t @ t)
    mean = data.mean(axis=-1, keepdims=True)
    return data - mean - slope[..., None] * t


def remove_spline(data, sample_rate, knot_spacing: float = 10.0, remove_el_gradient: bool = False,
                  remove_el_gradient_order: int = 0, el=None, **kwargs):
    """Least-squares B-spline baseline removal
    (reference processing.py:107-130). `remove_el_gradient_order` adds
    polynomial-in-elevation regressors up to that order (the reference
    notebooks' atmosphere-gradient removal)."""
    n = data.shape[-1]
    spacing_samples = max(int(knot_spacing * sample_rate), 2)
    B = bspline_basis(n, spacing=spacing_samples)  # (k, n)
    order = max(int(remove_el_gradient_order), 1 if remove_el_gradient else 0)
    if order and el is not None:
        el_mean = np.asarray(el).mean(axis=0, keepdims=True)
        if el_mean.std() > 1e-12 * max(abs(el_mean.mean()), 1e-12):
            el_mean = (el_mean - el_mean.mean()) / el_mean.std()
            B = np.concatenate([B, *[el_mean**p for p in range(1, order + 1)]], axis=0)
        # a constant-elevation scan (stare) has no gradient to remove
    B = jnp.asarray(B, dtype=data.dtype)
    # coefficients: data @ B^T @ (B B^T + eps)^-1; the ridge guards
    # degenerate bases (e.g. knot spacing longer than the scan)
    gram = B @ B.T
    gram = gram + 1e-6 * jnp.trace(gram) / gram.shape[0] * jnp.eye(gram.shape[0], dtype=gram.dtype)
    coeffs = jnp.linalg.solve(gram, B @ data.T).T
    return data - coeffs @ B


def window(data, weight, name: str = "tukey", kwargs: dict = None, **extra):
    if kwargs is None:
        kwargs = {"alpha": 0.1} if name == "tukey" else {}
    w = sp.signal.get_window((name, *kwargs.values()) if kwargs else name, data.shape[-1])
    w = jnp.asarray(w, dtype=data.dtype)
    return data * w, weight * w


def apply_filter(data, sample_rate, f_lower: float = None, f_upper: float = None, order: int = 4,
                 method: str = "fft", **kwargs):
    """Frequency-domain filter (reference processing.py:146). `method`
    selects the device FFT Butterworth-magnitude filter (default) or the
    reference's host scipy Bessel SOS filters ("bessel")."""
    if method == "bessel":
        from ..utils.signal import bessel_highpass, bessel_lowpass

        out = np.asarray(data)
        if f_lower is not None:
            out = bessel_highpass(out, f_lower, sample_rate, order=order)
        if f_upper is not None:
            out = bessel_lowpass(out, f_upper, sample_rate, order=order)
        return jnp.asarray(out, dtype=jnp.float32)
    if f_lower is not None and f_upper is not None:
        return bandpass(data, f_lower, f_upper, sample_rate, order=order)
    if f_lower is not None:
        return highpass(data, f_lower, sample_rate, order=order)
    if f_upper is not None:
        return lowpass(data, f_upper, sample_rate, order=order)
    return data


def remove_modes(data, n: int = 1, **kwargs):
    """Remove the strongest SVD common modes (reference processing.py:175)."""
    u, s, vh = jnp.linalg.svd(data, full_matrices=False)
    s = s.at[:n].set(0.0)
    return (u * s) @ vh


def process_tod(tod, **config):
    """Apply ordered processing ops; returns a new TOD
    (reference: processing.py:91, attached as TOD.process)."""
    from .tod import TOD

    for key in config:
        if key not in PROCESS_ORDER:
            raise ValueError(f"Invalid processing op '{key}' (valid: {PROCESS_ORDER}).")
    validate_process_config(config)

    data = tod.signal
    weight = tod.weight
    fs = tod.fs

    if "despike" in config and config["despike"]:
        kw = config["despike"] if isinstance(config["despike"], dict) else {}
        weight_before = weight
        data, weight = despike(data, weight, **kw)
        _check_nan("despike", data)
        if logger.isEnabledFor(logging.INFO):  # device sync only when someone listens
            n_cut = int(np.asarray(((weight == 0) & (weight_before != 0)).sum()))
            logger.info(f"despike: flagged {n_cut} samples.")

    if "remove_slope" in config and config["remove_slope"]:
        data = remove_slope(data)
        _check_nan("remove_slope", data)

    if "remove_spline" in config:
        kw = dict(config["remove_spline"]) if isinstance(config["remove_spline"], dict) else {}
        if kw.get("remove_el_gradient") or kw.get("remove_el_gradient_order"):
            kw["el"] = tod.el
        data = remove_spline(data, sample_rate=fs, **kw)
        _check_nan("remove_spline", data)

    if "window" in config:
        kw = config["window"] if isinstance(config["window"], dict) else {}
        data, weight = window(data, weight, **kw)
        _check_nan("window", data)

    if "filter" in config:
        kw = config["filter"] if isinstance(config["filter"], dict) else {}
        data = apply_filter(data, sample_rate=fs, **kw)
        _check_nan("filter", data)

    if "remove_modes" in config:
        kw = config["remove_modes"] if isinstance(config["remove_modes"], dict) else {}
        data = remove_modes(data, **kw)
        _check_nan("remove_modes", data)

    return TOD(
        data={"signal": data},
        pointing=tod.pointing,
        weight=weight,
        units=tod.units,
        dets=tod.dets,
        metadata=tod.metadata,
    )
