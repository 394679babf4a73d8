"""Coupler-facing ocean model API.

Analogue of the FMS/NUOPC cap surface (reference:
config_src/drivers/FMS_cap/ocean_model_MOM.F90: ocean_model_init /
update_ocean_model / ocean_model_end): a stateful wrapper a coupler (or
notebook) drives with surface fluxes, receiving the surface state back.
The inner step stays purely functional and jitted.
"""

from __future__ import annotations

import jax

from mom6_tpu.core.mom import Forcing, MOMParams, step_mom
from mom6_tpu.core.dynamics_split_rk2 import MechForcing
from mom6_tpu.diagnostics.diagnostics import SurfaceState, extract_surface_state
from mom6_tpu.physics.vertical.diabatic import BuoyancyForcing

__all__ = ["OceanModel"]


class OceanModel:
    """Stateful coupling shell around the functional core."""

    def __init__(self, grid, vgrid, state, params: MOMParams):
        self.grid = grid
        self.vgrid = vgrid
        self.state = state
        self.params = params
        self.time_seconds = 0.0
        self._step = jax.jit(
            lambda s, f: step_mom(s, f, self.grid, self.vgrid, self.params))

    @property
    def coupling_dt(self) -> float:
        return self.params.dyn.dt * self.params.n_dyn_per_thermo

    def update_ocean_model(self, taux=None, tauy=None, heat_flux=None,
                           salt_flux=None, sw_flux=None,
                           n_cycles: int = 1) -> SurfaceState:
        """Advance ``n_cycles`` coupling intervals under the given surface
        fluxes; returns the surface state for the atmosphere/ice."""
        forcing = Forcing(
            mech=MechForcing(taux=taux, tauy=tauy),
            buoy=BuoyancyForcing(heat_flux=heat_flux, salt_flux=salt_flux,
                                 sw_flux=sw_flux))
        for _ in range(n_cycles):
            self.state = self._step(self.state, forcing)
            self.time_seconds += self.coupling_dt
        return extract_surface_state(self.state, self.grid, self.vgrid)
