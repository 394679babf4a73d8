"""Idealized experiment builders (src/user analogues).

``double_gyre``: the classic 2-layer wind-driven basin
(reference: src/user/ in MOM6 provides this via the "double_gyre"
regression configuration; see also .testing and BASELINE.json's config
ladder).  Closed Cartesian beta-plane basin, sinusoidal zonal wind.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
from mom6_tpu.core.state import OceanState, init_state_resting
from mom6_tpu.grid.grid import Grid, build_cartesian_grid
from mom6_tpu.grid.vertical import VerticalGrid, build_layered_vgrid

__all__ = ["double_gyre", "thermo_gyre"]


def double_gyre(nx: int = 44, ny: int = 40, nz: int = 2, *,
                len_lon_km: float = 1200.0, len_lat_km: float = 1200.0,
                max_depth: float = 2000.0, f0: float = 1e-4,
                beta: float = 2e-11, tau0: float = 0.1,
                dt: float = 1200.0, dtype=jnp.float32
                ) -> Tuple[Grid, VerticalGrid, OceanState, DynParams,
                           MechForcing]:
    """Build the double-gyre experiment: grid, vgrid, state, params, forcing."""
    G = build_cartesian_grid(nx, ny, len_lon_km, len_lat_km,
                             max_depth=max_depth, f0=f0, beta=beta,
                             dtype=dtype)
    GV = build_layered_vgrid(nz, gprime_int=0.02, dtype=dtype)
    thick = np.full(nz, max_depth / nz)
    if nz >= 2:
        thick[0] = min(500.0, max_depth / nz)
        thick[1:] = (max_depth - thick[0]) / (nz - 1)
    state = init_state_resting(G, GV, thick, dtype=dtype)

    nstep, _ = set_dtbt(G, GV, max_depth, dt)
    bt = BTParams(nstep=nstep, nfilter=max(1, nstep // 8), bebt=0.2)
    params = DynParams(dt=dt, bt=bt, kv=1e-4, bottom_drag=1e-4,
                       cdrag=0.0)

    # classic double-gyre wind: tau_x = -tau0 * cos(2*pi*y/L)
    y = np.asarray(G.geoLatT) * 1e3  # [m]
    Ly = len_lat_km * 1e3
    taux = -tau0 * np.cos(2.0 * np.pi * y / Ly)
    forces = MechForcing(taux=jnp.asarray(taux, dtype=dtype) * G.mask2dCu,
                         tauy=jnp.zeros_like(G.mask2dCv))
    return G, GV, state, params, forces


def thermo_gyre(nx: int = 32, ny: int = 32, nz: int = 8, *,
                len_lon_km: float = 2000.0, len_lat_km: float = 2000.0,
                max_depth: float = 3000.0, f0: float = 1e-4,
                beta: float = 2e-11, tau0: float = 0.1,
                dt: float = 1200.0, n_dyn_per_thermo: int = 2,
                heat0: float = 50.0, dtype=jnp.float32):
    """The 'benchmark'-class experiment: wind + differential surface heating
    over a stratified basin, z* ALE coordinate, full EOS, Smagorinsky
    friction (role of MOM6's src/user benchmark configuration)."""
    from mom6_tpu.ale.ale import ALEParams, ZSTAR
    from mom6_tpu.core.mom import Forcing, MOMParams
    from mom6_tpu.physics.lateral.hor_visc import HorViscParams
    from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                    DiabaticParams)
    from mom6_tpu.physics.vertical.set_diffusivity import DiffusivityParams

    G = build_cartesian_grid(nx, ny, len_lon_km, len_lat_km,
                             max_depth=max_depth, f0=f0, beta=beta,
                             dtype=dtype)
    GV = build_layered_vgrid(nz, dtype=dtype)
    dz = np.full(nz, max_depth / nz)
    state = init_state_resting(G, GV, dz, dtype=dtype, with_thermo=True)
    # exponential-ish initial stratification
    zc = np.cumsum(dz) - dz / 2
    T0 = 4.0 + 16.0 * np.exp(-zc / 800.0)
    state = state.replace(
        T=jnp.asarray(np.broadcast_to(T0[:, None, None], state.h.shape),
                      dtype),
        S=jnp.full(state.h.shape, 35.0, dtype))

    nstep, _ = set_dtbt(G, GV, max_depth, dt, cfl=0.5)
    bt = BTParams(nstep=nstep, nfilter=max(1, nstep // 8), bebt=0.2)
    dyn = DynParams(dt=dt, bt=bt, kv=1e-4, bottom_drag=3e-4)

    params = MOMParams(
        dyn=dyn, thermo_enabled=True, eos_name="WRIGHT",
        ale=ALEParams(mode=ZSTAR, dz_nominal=tuple(float(d) for d in dz)),
        hor_visc=HorViscParams(smag_bi_const=0.06, smag_lap_const=0.0,
                               dt=dt, bound_coef=True),
        n_dyn_per_thermo=n_dyn_per_thermo)

    y = np.asarray(G.geoLatT) * 1e3
    Ly = len_lat_km * 1e3
    taux = -tau0 * np.cos(2.0 * np.pi * y / Ly)
    # heating in the south, cooling in the north
    heat = heat0 * np.cos(np.pi * y / Ly)
    forcing = Forcing(
        mech=MechForcing(taux=jnp.asarray(taux, dtype) * G.mask2dCu,
                         tauy=jnp.zeros_like(G.mask2dCv)),
        buoy=BuoyancyForcing(heat_flux=jnp.asarray(heat, dtype) * G.mask2dT))
    return G, GV, state, params, forcing
