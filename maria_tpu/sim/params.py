"""Master simulation-kwarg whitelist
(reference: maria/sim/params.yml via simulation.py:42-64).

Loose kwargs passed to Simulation are routed to their subsystem; unknown
keys raise.
"""

from __future__ import annotations

MASTER_PARAMS = {
    "atmosphere": [
        "model", "region", "altitude", "weather", "weather_quantiles",
        "weather_source", "spectrum_source", "pwv_rms_frac", "pwv",
        "max_height", "min_height", "timestep", "method", "n_layers", "outer_scale",
        "sampler_dec_tol",
    ],
    "cmb": ["nside", "lmax"],
    "map": ["nu", "units", "bilinear_sampling"],
    "noise": ["correlated_noise_proportion", "correlated_noise_spatial_scale"],
}


class InvalidSimulationParameterError(Exception):
    def __init__(self, invalid_keys):
        super().__init__(
            f"The parameters {invalid_keys} are not valid simulation parameters! "
            f"Valid loose parameters per subsystem: {MASTER_PARAMS}",
        )


def parse_sim_kwargs(kwargs: dict, strict: bool = True) -> dict:
    parsed = {group: {} for group in MASTER_PARAMS}
    invalid = {}
    for key, value in kwargs.items():
        matched = False
        for group, valid_keys in MASTER_PARAMS.items():
            if key in valid_keys:
                parsed[group][key] = value
                matched = True
        if not matched:
            invalid[key] = value
    if invalid and strict:
        raise InvalidSimulationParameterError(list(invalid))
    return parsed


# reference-name alias (sim/simulation.py:42)
master_params = MASTER_PARAMS
