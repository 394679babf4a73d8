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

__all__ = ["double_gyre"]


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
