"""Diabatic (column physics) driver — ALE mode.

Analogue of MOM6's diabatic_ALE (reference:
src/parameterizations/vertical/MOM_diabatic_driver.F90:1243, call sequence
:1330-1870).  Round-1 sequence:

  set_diffusivity (background + optional shear/KPP contributions)
  -> applyBoundaryFluxesInOut (surface heat/salt fluxes into the top layer)
  -> implicit vertical diffusion of T/S (+ registered tracers)

Geothermal, penetrating shortwave, sponges, CVMix conv/ddiff, and the
nonlocal KPP transport are planned follow-ons; KPP/ePBL boundary-layer
diffusivities plug in through ``kd_extra``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.physics.vertical.set_diffusivity import (DiffusivityParams,
                                                       set_diffusivity)
from mom6_tpu.tracers.vert_diff import tracer_vertdiff

__all__ = ["BuoyancyForcing", "DiabaticParams", "diabatic_ale"]


class BuoyancyForcing(NamedTuple):
    """Surface buoyancy forcing (the ``forcing`` type of
    MOM_forcing_type.F90:262-302, thermodynamic part)."""
    heat_flux: Optional[jnp.ndarray] = None   # net surface heat [W m-2], +down
    salt_flux: Optional[jnp.ndarray] = None   # salt flux [kg m-2 s-1... ppt m s-1]
    sw_flux: Optional[jnp.ndarray] = None     # penetrating shortwave [W m-2]


class DiabaticParams(NamedTuple):
    diff: DiffusivityParams = DiffusivityParams()
    cp: float = 3925.0
    boundary_layer_scheme: str = "NONE"   # NONE | KPP | EPBL
    use_shear_mixing: bool = False
    shear_scheme: str = "LMD94"


def diabatic_ale(T, S, h, forcing: BuoyancyForcing, dt, G, GV,
                 p: DiabaticParams, kd_extra: Optional[jnp.ndarray] = None,
                 extra_tracers: Optional[jnp.ndarray] = None, eos=None):
    """One thermodynamic step of column physics.

    Returns (T_new, S_new, kd, extra_tracers_new)."""
    kd = set_diffusivity(h, G, GV, p.diff, kd_extra=kd_extra,
                         T=T, S=S, eos=eos)

    # surface fluxes -> top-layer tendencies, expressed as tracer fluxes
    # [conc m s-1] for the implicit solve (applyBoundaryFluxesInOut role)
    t_flux = None
    if forcing.heat_flux is not None:
        t_flux = forcing.heat_flux / (GV.rho0 * p.cp)
    if forcing.sw_flux is not None:
        sw = forcing.sw_flux / (GV.rho0 * p.cp)
        t_flux = sw if t_flux is None else t_flux + sw
    s_flux = forcing.salt_flux

    stack = [T, S]
    fluxes = [t_flux if t_flux is not None else jnp.zeros_like(T[0]),
              s_flux if s_flux is not None else jnp.zeros_like(S[0])]
    n_state = 2
    if extra_tracers is not None:
        for i in range(extra_tracers.shape[0]):
            stack.append(extra_tracers[i])
            fluxes.append(jnp.zeros_like(T[0]))
    arr = jnp.stack(stack)
    flux_arr = jnp.stack(fluxes)
    out = tracer_vertdiff(arr, h, kd, dt, sfc_flux=flux_arr)
    T_new, S_new = out[0], out[1]
    extra_new = out[n_state:] if extra_tracers is not None else None
    return T_new, S_new, kd, extra_new
