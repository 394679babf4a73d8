"""Vertical grid container.

Analogue of MOM6's ``verticalGrid_type`` (reference:
src/core/MOM_verticalGrid.F90:24-96), Boussinesq form: thickness units are
meters (H == Z), ``Rlay`` holds the target potential densities of the layered
coordinate, ``g_prime`` the reduced gravities at interfaces.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mom6_tpu.framework.pytree import pytree_dataclass, static
from mom6_tpu.framework import constants

__all__ = ["VerticalGrid", "build_layered_vgrid"]


@pytree_dataclass
class VerticalGrid:
    nz: int = static()
    g_earth: float = static(default=constants.GRAV)
    rho0: float = static(default=constants.RHO_0)
    angstrom: float = static(default=1e-10)     # negligible thickness [m]
    h_subroundoff: float = static(default=1e-20)
    # BOUSSINESQ (MOM_verticalGrid.F90:24-96): True => thickness h is a
    # geometric height [m] and the continuity conserves VOLUME; False =>
    # h is a mass thickness expressed in rho0-equivalent meters
    # (h = mass / rho0, the H_TO_KG_M2 = RHO_0 convention), the same
    # dynamics conserve MASS exactly, the pressure force switches to the
    # specific-volume (pressure-coordinate) FV form, and geometric
    # heights (SSH etc.) are derived via the EOS specific volume
    # (calc_derived_thermo role, MOM_interface_heights.F90).
    boussinesq: bool = static(default=True)

    g_prime: jnp.ndarray = None   # (nz,) reduced gravity at top interface of each layer [m s-2]
    Rlay: jnp.ndarray = None      # (nz,) target densities [kg m-3]


def build_layered_vgrid(nz: int, g_earth: float = constants.GRAV,
                        rho0: float = constants.RHO_0,
                        gprime_int: float = 9.8e-3,
                        dtype=jnp.float32,
                        boussinesq: bool = True) -> VerticalGrid:
    """Layered vertical grid: g' = g at the surface, ``gprime_int`` at
    interior interfaces (MOM6 COORD_CONFIG="gprime"; reference:
    src/initialization/MOM_coord_initialization.F90:36-333)."""
    gp = np.full(nz, gprime_int, dtype=np.float64)
    gp[0] = g_earth
    rlay = np.empty(nz, dtype=np.float64)
    rlay[0] = rho0
    for k in range(1, nz):
        rlay[k] = rlay[k - 1] + gp[k] * rho0 / g_earth
    return VerticalGrid(
        nz=nz, g_earth=g_earth, rho0=rho0,
        angstrom=1e-10, h_subroundoff=1e-20,
        boussinesq=boussinesq,
        g_prime=jnp.asarray(gp, dtype=dtype),
        Rlay=jnp.asarray(rlay, dtype=dtype),
    )
