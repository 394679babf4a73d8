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


def phillips_2layer(nx: int = 32, ny: int = 32, *,
                    len_lon_km: float = 1200.0, len_lat_km: float = 1200.0,
                    max_depth: float = 4000.0, f0: float = 1e-4,
                    beta: float = 2e-11, u_jet: float = 0.2,
                    dt: float = 900.0, dtype=jnp.float32):
    """Phillips 2-layer baroclinically unstable jet in a reentrant channel
    (role of MOM6's Phillips_initialization, src/user/): upper-layer
    eastward jet in thermal-wind balance with a tilted interface."""
    G = build_cartesian_grid(nx, ny, len_lon_km, len_lat_km,
                             max_depth=max_depth, f0=f0, beta=beta,
                             cyclic_x=True, dtype=dtype)
    GV = build_layered_vgrid(2, gprime_int=0.02, dtype=dtype)
    y = np.asarray(G.geoLatT) * 1e3
    ly = len_lat_km * 1e3
    # gaussian jet in the upper layer
    jet = u_jet * np.exp(-(((y - ly / 2) / (0.1 * ly)) ** 2))
    # thermal wind: g' d(eta_int)/dy = -f0 * u1  => interface tilt
    from scipy import integrate
    eta_int = -np.cumsum(f0 * jet[:, 0] * (ly / ny)) / 0.02
    eta_int -= eta_int.mean()
    h1 = np.clip(max_depth / 2 + eta_int, 100.0, max_depth - 100.0)
    h = np.stack([np.broadcast_to(h1[:, None], (ny, nx)),
                  np.broadcast_to((max_depth - h1)[:, None], (ny, nx))])
    rng = np.random.default_rng(7)
    h = h + rng.standard_normal(h.shape)  # seed instability
    state = init_state_resting(G, GV, np.full(2, max_depth / 2), dtype=dtype)
    state = state.replace(
        h=jnp.asarray(h, dtype),
        u=jnp.asarray(np.stack([np.broadcast_to(jet, (ny, nx)),
                                np.zeros((ny, nx))]), dtype) * G.mask2dCu)
    nstep, _ = set_dtbt(G, GV, max_depth, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2),
                       kv=1e-4, bottom_drag=1e-4)
    return G, GV, state, params, MechForcing()


def lock_exchange(nx: int = 64, nz: int = 10, *,
                  len_km: float = 64.0, depth: float = 20.0,
                  dt: float = 30.0, dtype=jnp.float32):
    """Non-rotating lock exchange (role of MOM6's lock_exchange user
    config): dense water released against light water in a flat channel;
    tests the FV pressure force + ALE under strong fronts."""
    from mom6_tpu.ale.ale import ALEParams, ZSTAR
    from mom6_tpu.core.mom import Forcing, MOMParams
    ny = 4
    G = build_cartesian_grid(nx, ny, len_km, len_km * ny / nx,
                             max_depth=depth, f0=0.0, beta=0.0,
                             reentrant_y=True, dtype=dtype)
    GV = build_layered_vgrid(nz, dtype=dtype)
    dz = np.full(nz, depth / nz)
    state = init_state_resting(G, GV, dz, dtype=dtype, with_thermo=True)
    x = np.asarray(G.geoLonT)
    T = np.where(x[None] < len_km / 2, 20.0, 10.0)
    state = state.replace(
        T=jnp.asarray(np.broadcast_to(T, state.h.shape), dtype),
        S=jnp.full(state.h.shape, 35.0, dtype))
    nstep, _ = set_dtbt(G, GV, depth, dt)
    dyn = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=1e-4)
    params = MOMParams(dyn=dyn, thermo_enabled=True, eos_name="WRIGHT",
                       ale=ALEParams(mode=ZSTAR,
                                     dz_nominal=tuple(float(d) for d in dz)),
                       n_dyn_per_thermo=1)
    return G, GV, state, params, Forcing()


def seamount(nx: int = 32, ny: int = 32, nz: int = 10, *,
             len_km: float = 500.0, max_depth: float = 3000.0,
             height_frac: float = 0.6, dt: float = 600.0,
             dtype=jnp.float32):
    """Stratified resting ocean over a Gaussian seamount (role of MOM6's
    seamount user config): any flow that develops is spurious
    pressure-gradient error — the standard PGF fidelity metric."""
    from mom6_tpu.ale.ale import ALEParams, ZSTAR
    from mom6_tpu.core.mom import Forcing, MOMParams
    x = (np.arange(nx) + 0.5) / nx - 0.5
    y = (np.arange(ny) + 0.5) / ny - 0.5
    r2 = (x[None, :] ** 2 + y[:, None] ** 2) / 0.01
    depth = max_depth * (1.0 - height_frac * np.exp(-r2))
    G = build_cartesian_grid(nx, ny, len_km, len_km, depth=depth,
                             max_depth=max_depth, f0=1e-4, dtype=dtype)
    GV = build_layered_vgrid(nz, dtype=dtype)
    dz = np.full(nz, max_depth / nz)
    state = init_state_resting(G, GV, dz, dtype=dtype, with_thermo=True)
    zc = np.cumsum(dz) - dz / 2
    T0 = 4.0 + 16.0 * np.exp(-zc / 1000.0)
    state = state.replace(
        T=jnp.asarray(np.broadcast_to(T0[:, None, None], state.h.shape),
                      dtype),
        S=jnp.full(state.h.shape, 35.0, dtype))
    nstep, _ = set_dtbt(G, GV, max_depth, dt)
    dyn = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=1e-4)
    params = MOMParams(dyn=dyn, thermo_enabled=True, eos_name="WRIGHT",
                       ale=ALEParams(mode=ZSTAR,
                                     dz_nominal=tuple(float(d) for d in dz)),
                       n_dyn_per_thermo=1)
    return G, GV, state, params, Forcing()
