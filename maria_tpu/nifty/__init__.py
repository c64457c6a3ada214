"""Integration shim for the external CMB_denoising / NIFTy project
(reference: maria/nifty/sim.py:4 — a thin Simulation subclass exposing
the raw loading fields the NIFTy pipeline consumes)."""

from __future__ import annotations

from ..sim import Simulation

__all__ = ["NIFTySimulation"]


class NIFTySimulation(Simulation):
    """A Simulation that keeps the per-component loadings accessible as
    raw arrays after run(), for external inference pipelines."""

    def run_obs(self, obs):
        tod = super().run_obs(obs)
        self.components = {k: v for k, v in tod.data.items()}
        return tod
