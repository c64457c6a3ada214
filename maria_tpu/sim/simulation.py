"""The Simulation engine (reference: maria/sim/simulation.py:67-301).

Builds one Observation per plan, wires the signal models (atmosphere,
CMB, input maps, noise) and produces TODs. All per-sample math runs on
device; the host only orchestrates.
"""

from __future__ import annotations

import logging
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..instrument import Instrument, get_instrument
from ..plan import Plan, PlanList, get_plan
from ..site import Site, get_site
from ..tod import TOD
from ..tod.tod import Pointing
from ..units import Quantity
from .atmosphere import DEFAULT_ATMOSPHERE_SIM_KWARGS, AtmosphereMixin
from .cmb import DEFAULT_CMB_SIM_KWARGS, CMBMixin
from .map import DEFAULT_MAP_SIM_KWARGS, MapMixin
from .noise import NoiseMixin
from .observation import Observation

logger = logging.getLogger("maria_tpu")


class Simulation(AtmosphereMixin, CMBMixin, MapMixin, NoiseMixin):
    """What users should touch, primarily."""

    @classmethod
    def from_config(cls, config: dict = {}, **params):
        return cls(**{**config, **params})

    def __init__(
        self,
        instrument,
        plans=None,
        site=None,
        atmosphere=None,
        atmosphere_kwargs: dict = {},
        cmb=None,
        cmb_kwargs: dict = {},
        map=None,  # noqa: A002
        map_kwargs: dict = {},
        noise: bool = True,
        noise_kwargs: dict = {},
        fused: bool = True,
        progress_bars: bool = False,
        keep_mean_signal: bool = False,
        seed: int = None,
        dtype=jnp.float32,
        plan=None,
        **kwargs,
    ):
        from ..noise import DEFAULT_NOISE_SIM_KWARGS
        from .params import parse_sim_kwargs

        # the reference docs use both plans= and the singular plan=
        # (docs usage/inputs/atmosphere.rst)
        if plans is None:
            plans = plan
        if plans is None:
            raise TypeError("Simulation requires 'plans' (or the docs' alias 'plan').")
        if site is None:
            raise TypeError("Simulation requires 'site'.")

        # route loose kwargs (e.g. pwv=2.0) to their subsystem
        # (reference: sim/params.yml whitelist, simulation.py:42-64)
        loose = parse_sim_kwargs(kwargs)
        atmosphere_kwargs = {**loose["atmosphere"], **atmosphere_kwargs}
        if "pwv" in atmosphere_kwargs:  # sugar: pwv override goes to the weather
            atmosphere_kwargs.setdefault("weather", {})["pwv"] = atmosphere_kwargs.pop("pwv")
        cmb_kwargs = {**loose["cmb"], **cmb_kwargs}
        map_kwargs = {**loose["map"], **map_kwargs}
        noise_kwargs = {**loose["noise"], **noise_kwargs}

        self.dtype = dtype
        self.fused = fused
        self.progress_bars = progress_bars
        self.seed = seed
        self._key = jax.random.key(seed if seed is not None else np.random.randint(2**31))
        self.keep_mean_signal = keep_mean_signal

        self.instrument = instrument if isinstance(instrument, Instrument) else get_instrument(instrument)
        self.site = site if isinstance(site, Site) else get_site(site)

        if isinstance(plans, str):
            plans = [get_plan(plans)]
        elif isinstance(plans, Plan):
            plans = [plans]
        self.plans = PlanList(plans)

        self.atmosphere = atmosphere
        self.atmosphere_kwargs = {**DEFAULT_ATMOSPHERE_SIM_KWARGS, **atmosphere_kwargs}
        self.noise = noise
        self.noise_kwargs = {**DEFAULT_NOISE_SIM_KWARGS, **noise_kwargs}

        self.obs_list = []
        for obs_index, plan in enumerate(self.plans):
            obs_s = _time.monotonic()
            obs = Observation(
                instrument=self.instrument,
                plan=plan,
                site=self.site,
                atmosphere=self.atmosphere,
                atmosphere_kwargs=self.atmosphere_kwargs,
            )
            if hasattr(obs, "atmosphere"):
                obs.atmosphere.initialize(obs)
            self.obs_list.append(obs)
            logger.debug(f"Initialized observation {obs_index + 1}/{len(self.plans)} in {_time.monotonic() - obs_s:.2f} s")

        if cmb:
            self.cmb_kwargs = {**DEFAULT_CMB_SIM_KWARGS, **cmb_kwargs}
            self._init_cmb(cmb, **self.cmb_kwargs)

        if map is not None:
            self.map_kwargs = {**DEFAULT_MAP_SIM_KWARGS, **map_kwargs}
            self._initialize_map(map, **self.map_kwargs)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def run(self, units: str = "K_RJ"):
        from ..io.logging import progress_bar

        tods = []
        pbar = progress_bar(
            self.obs_list, desc="Simulating observations", disable=not self.progress_bars
        )
        for obs_index, obs in enumerate(pbar):
            logger.info(f"Simulating observation {obs_index + 1} of {len(self.obs_list)}")
            obs_s = _time.monotonic()
            tods.append(self.run_obs(obs).to(units))
            logger.info(
                f"Simulated observation {obs_index + 1}/{len(self.obs_list)} in {_time.monotonic() - obs_s:.2f} s"
            )
        return tods

    def run_obs(self, obs: Observation) -> TOD:
        obs.loading = {}

        # fast path: atmosphere + noise (+ gains) as ONE fused jitted
        # program (fourier screens, 3-D layer groups, and AR extrusions
        # all run inside the program); Simulation(fused=False) selects
        # the per-stage mixin path instead
        fused = hasattr(obs, "atmosphere") and self.fused

        if fused:
            from ..ops.program import build_tod_program

            s = _time.monotonic()
            program = build_tod_program(
                obs,
                with_noise=self.noise,
                noise_kwargs=self.noise_kwargs,
                cmb=getattr(self, "cmb", None),
                input_map=getattr(self, "map", None),
                map_kwargs=getattr(self, "map_kwargs", {}),
            )
            fn = jax.jit(program.fields_fn())
            key = self._next_key()
            # the big spectral tables ride as arguments, not HLO
            # constants: compiles of large (e.g. AtLAST 3-D) scenes over
            # the remote-compile boundary are minutes faster
            fields, pwv_fine = fn(
                key, *program.example_args(key)[1:], tables=program.device_tables()
            )
            obs.loading = dict(fields)
            # the SAME screen realization feeds any downstream
            # transmission users through the fine-rate zenith-scaled pwv
            obs.zenith_scaled_pwv = pwv_fine
            logger.debug(
                f"Ran fused program ({'+'.join(obs.loading)}) in {_time.monotonic() - s:.2f} s."
            )
        elif hasattr(obs, "atmosphere"):
            s = _time.monotonic()
            self._simulate_atmosphere(obs, self._next_key())
            obs.loading["atmosphere"] = self._compute_atmospheric_loading(obs)
            logger.debug(f"Ran atmosphere simulation in {_time.monotonic() - s:.2f} s.")

        if hasattr(self, "cmb") and "cmb" not in obs.loading:
            s = _time.monotonic()
            obs.loading["cmb"] = self._compute_cmb_loading(obs)
            logger.debug(f"Ran CMB simulation in {_time.monotonic() - s:.2f} s.")

        if hasattr(self, "map") and "map" not in obs.loading:
            s = _time.monotonic()
            self._sample_maps(obs)
            logger.debug(f"Ran map simulation in {_time.monotonic() - s:.2f} s.")

        if self.noise and "noise" not in obs.loading:
            # the fused program already synthesized noise (with the same
            # NEP_per_loading physics); only the mixin path lands here
            s = _time.monotonic()
            self._simulate_noise(obs, self._next_key())
            logger.debug(f"Ran noise simulation in {_time.monotonic() - s:.2f} s.")

        # multiplicative per-detector gain error on all non-noise fields
        # (reference simulation.py:239-247)
        gain_error = jnp.exp(
            jnp.asarray(self.instrument.dets.gain_error)
            * jax.random.normal(self._next_key(), (self.instrument.dets.n,))
        ).astype(self.dtype)
        for field in obs.loading:
            if field != "noise":
                obs.loading[field] = obs.loading[field] * gain_error[:, None]

        metadata = {
            "atmosphere": hasattr(obs, "atmosphere"),
            "sim_time": _time.time(),
            "altitude": float(obs.site.altitude.m),
            "region": obs.site.region,
        }
        if hasattr(obs, "atmosphere"):
            metadata["pwv"] = float(np.round(obs.atmosphere.weather.pwv, 3))
            metadata["base_temperature"] = float(np.round(obs.atmosphere.weather.temperature[0], 3))
        if hasattr(self, "map"):
            metadata["input_map"] = self.map

        return TOD(
            data=obs.loading,
            dets=obs.instrument.dets,
            pointing=Pointing(obs.boresight, obs.offsets, obs.q),
            units="pW",
            metadata=metadata,
        )

    @property
    def min_time(self):
        return self.obs_list[0].plan.start_time

    @property
    def max_time(self):
        return self.obs_list[-1].plan.end_time

    def __repr__(self):
        parts = [f"Simulation", f"├ {self.instrument!r}".replace("\n", "\n│ ")]
        parts.append(f"├ {self.site!r}".replace("\n", "\n│ "))
        parts.append(f"└ {self.plans!r}".replace("\n", "\n  "))
        return "\n".join(parts)


# reference parity (sim/base.py:55): the reference keeps a legacy
# BaseSimulation superclass; here the mixin composition above plays that
# role, so the name simply points at Simulation.
BaseSimulation = Simulation
