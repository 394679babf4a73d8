"""Top-level model orchestrator — the step_MOM analogue.

Re-designs MOM6's main stepping logic (reference: src/core/MOM.F90:
step_MOM :513, step_MOM_dynamics :1167, step_MOM_tracer_dyn :1481,
step_MOM_thermo :1591, ALE_regridding_and_remapping :1751) as one pure
jittable function over the state pytree:

  for each baroclinic step:
    dynamics (split RK2, accumulating uhtr/vhtr)
  every thermo cycle:
    tracer advection with the accumulated transports  (step_MOM_tracer_dyn)
    diabatic column physics                            (step_MOM_thermo)
    ALE regrid + remap of tracers and velocities
    reset transport accumulators

The dt_therm/dt split is static (``n_dyn_per_thermo``), so an entire
thermo cycle compiles to one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.ale.ale import ALEParams, LAYER, ale_regrid_remap
from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.core.pressure_force import pressure_force_fv
from mom6_tpu.core.state import OceanState
from mom6_tpu.eos import get_eos
from mom6_tpu.physics.lateral.hor_visc import horizontal_viscosity
from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                DiabaticParams, diabatic_ale)
from mom6_tpu.tracers.advect import advect_tracers

__all__ = ["MOMParams", "Forcing", "step_mom"]


class MOMParams(NamedTuple):
    dyn: DynParams
    thermo_enabled: bool = False
    eos_name: str = "WRIGHT"
    diabatic: DiabaticParams = DiabaticParams()
    ale: ALEParams = ALEParams(mode=LAYER)
    hor_visc: Optional["HorViscParams"] = None
    gm: Optional["GMParams"] = None               # thickness diffusion
    mlrestrat: Optional["MLRestratParams"] = None
    meke: Optional["MEKEParams"] = None
    obc: Optional["OBCParams"] = None             # open boundaries
    int_tides: Optional["InternalTidesParams"] = None  # low-mode propagation
    khtr: float = 0.0          # epineutral/horizontal tracer diff [m2 s-1]
    neutral_diffusion: bool = False   # rotate KHTR along neutral surfaces
    khtr_bl: float = 0.0       # along-boundary-layer diffusivity [m2 s-1]
    n_dyn_per_thermo: int = 1
    tracer_advect_sub: int = 2


class Forcing(NamedTuple):
    mech: MechForcing = MechForcing()
    buoy: BuoyancyForcing = BuoyancyForcing()


def step_mom(state: OceanState, forcing: Forcing, G, GV, p: MOMParams
             ) -> OceanState:
    """Advance one thermo cycle = n_dyn_per_thermo baroclinic steps."""
    eos = get_eos(p.eos_name) if p.thermo_enabled else None

    if p.thermo_enabled:
        def pf_fn(h, st):
            return pressure_force_fv(h, st.T, st.S, G, GV, eos)
    else:
        pf_fn = None

    hv_fn = None
    if p.hor_visc is not None:
        def hv_fn(u, v, h):
            return horizontal_viscosity(u, v, h, G, p.hor_visc)

    # --- lateral eddy parameterizations acting on h (the
    # thickness_diffuse_first path, MOM.F90:1226-1278) -----------------------
    # Capture the pre-advection thickness BEFORE the GM/MLRestrat bolus
    # updates: uhtr accumulates those same bolus transports, so the tracer
    # advection's internal thickness h_pre - div(uhtr) must start from the
    # pre-GM h to land on the final model h (the reference reconstructs
    # hprev from h_end + div(uhtr), MOM_tracer_advect.F90 advect_tracer).
    h_before_dyn = state.h
    dt_therm = p.dyn.dt * p.n_dyn_per_thermo
    if p.thermo_enabled and p.gm is not None:
        from mom6_tpu.physics.lateral.meke import (gm_pe_release,
                                                   meke_diffusivity,
                                                   step_meke)
        from mom6_tpu.physics.lateral.thickness_diffuse import \
            thickness_diffuse
        khth_2d = None
        if p.meke is not None and state.E_meke is not None:
            khth_2d = p.gm.khth + meke_diffusivity(state.E_meke, p.meke)
        h_gm, uhd, vhd = thickness_diffuse(state.h, G, GV, dt_therm, p.gm,
                                           khth_2d=khth_2d,
                                           T=state.T, S=state.S, eos=eos)
        if p.meke is not None and state.E_meke is not None:
            src = gm_pe_release(state.h, uhd, vhd, G, GV)
            e_new = step_meke(state.E_meke, src, state.h, G, dt_therm,
                              p.meke)
            state = state.replace(E_meke=e_new)
        state = state.replace(h=h_gm,
                              uhtr=state.uhtr + dt_therm * uhd,
                              vhtr=state.vhtr + dt_therm * vhd)
    if p.thermo_enabled and p.mlrestrat is not None:
        from mom6_tpu.diagnostics.mld import diagnose_mld
        from mom6_tpu.physics.lateral.mixed_layer_restrat import \
            mixedlayer_restrat
        mld = diagnose_mld(state.h, state.T, state.S, G, GV, eos)
        h_mlr, uh_m, vh_m = mixedlayer_restrat(state.h, state.T, state.S,
                                               mld, G, GV, eos, dt_therm,
                                               p.mlrestrat)
        state = state.replace(h=h_mlr,
                              uhtr=state.uhtr + dt_therm * uh_m,
                              vhtr=state.vhtr + dt_therm * vh_m)

    def dyn_body(st, _):
        out = step_dynamics_split_rk2(st, forcing.mech, G, GV, p.dyn,
                                      pf_fn=pf_fn, hv_fn=hv_fn)
        if p.obc is not None:
            from mom6_tpu.core.open_boundary import apply_obc
            out = apply_obc(out, p.obc, G, GV, p.dyn.dt,
                            u_old=st.u, v_old=st.v)
        return out, None

    state, _ = jax.lax.scan(dyn_body, state, None,
                            length=p.n_dyn_per_thermo)

    if not p.thermo_enabled:
        return state

    # --- tracer transport (step_MOM_tracer_dyn) ---------------------------
    tr = jnp.stack([state.T, state.S])
    tr, h_adv = advect_tracers(tr, h_before_dyn, state.uhtr, state.vhtr, G,
                               n_sub=p.tracer_advect_sub)
    T, S = tr[0], tr[1]
    state = state.replace(T=T, S=S,
                          uhtr=jnp.zeros_like(state.uhtr),
                          vhtr=jnp.zeros_like(state.vhtr))

    # --- lateral tracer diffusion (tracer_hor_diff role) -------------------
    kd_redi = None
    if p.khtr > 0.0:
        dt_trd = p.dyn.dt * p.n_dyn_per_thermo
        tr = jnp.stack([state.T, state.S])
        if p.neutral_diffusion:
            from mom6_tpu.tracers.neutral_diffusion import neutral_diffusion
            tr, kd_redi = neutral_diffusion(tr, state.h, state.T, state.S,
                                            G, GV, eos, p.khtr, dt_trd)
        else:
            from mom6_tpu.tracers.hor_diff import tracer_hordiff
            tr = tracer_hordiff(tr, state.h, p.khtr, dt_trd, G)
        state = state.replace(T=tr[0], S=tr[1])

    if p.khtr_bl > 0.0:
        # along-boundary-layer lateral mixing (MOM_hor_bnd_diffusion)
        from mom6_tpu.diagnostics.mld import diagnose_mld
        from mom6_tpu.tracers.hor_bnd_diffusion import hor_bnd_diffusion
        dt_trd = p.dyn.dt * p.n_dyn_per_thermo
        bld = diagnose_mld(state.h, state.T, state.S, G, GV, eos)
        tr = jnp.stack([state.T, state.S])
        tr = hor_bnd_diffusion(tr, state.h, bld, p.khtr_bl, dt_trd, G)
        state = state.replace(T=tr[0], S=tr[1])

    # --- column physics (step_MOM_thermo -> diabatic) ---------------------
    if p.diabatic.boundary_layer_scheme == "BULKML":
        # layered (isopycnal) mode: bulk mixed layer + diffusive
        # entrainment; no ALE regrid afterwards
        from mom6_tpu.physics.vertical.diabatic import diabatic_layered
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        dt_therm = p.dyn.dt * p.n_dyn_per_thermo
        h_n, T, S, u_n, v_n, _ = diabatic_layered(
            state.T, state.S, state.h, state.u, state.v, forcing.buoy,
            taux, tauy, dt_therm, G, GV, p.diabatic, eos)
        return state.replace(h=h_n, T=T, S=S, u=u_n, v=v_n)

    # ALE mode: boundary-layer + shear mixing feed the diabatic solve as
    # extra interface diffusivities (diabatic_ALE sequence, SURVEY.md §3.5)
    kd_extra = kd_redi     # Redi K S^2 implicit part, if any
    if p.diabatic.boundary_layer_scheme == "KPP":
        from mom6_tpu.physics.vertical.kpp import kpp_diffusivity
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        kd_bl, _ = kpp_diffusivity(state.h, state.u, state.v, state.T,
                                   state.S, G, GV, eos, taux, tauy,
                                   forcing.buoy.heat_flux)
        kd_extra = kd_bl if kd_extra is None else kd_extra + kd_bl
    elif p.diabatic.boundary_layer_scheme == "EPBL":
        from mom6_tpu.physics.vertical.epbl import epbl_diffusivity
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        kd_bl, _ = epbl_diffusivity(state.h, state.T, state.S, G, GV, eos,
                                    taux, tauy, forcing.buoy.heat_flux)
        kd_extra = kd_bl if kd_extra is None else kd_extra + kd_bl
    if p.diabatic.use_shear_mixing:
        if p.diabatic.shear_scheme == "JHL":
            from mom6_tpu.physics.vertical.kappa_shear import kappa_shear
            kd_sh, _ = kappa_shear(state.h, state.u, state.v, state.T,
                                   state.S, G, GV, eos,
                                   dt=p.dyn.dt * p.n_dyn_per_thermo)
        else:
            from mom6_tpu.physics.vertical.shear_mixing import (
                ShearMixingParams, shear_mixing_kd)
            kd_sh = shear_mixing_kd(
                state.h, state.u, state.v, state.T, state.S, G, GV, eos,
                ShearMixingParams(scheme=p.diabatic.shear_scheme))
        kd_extra = kd_sh if kd_extra is None else kd_extra + kd_sh

    # --- low-mode internal tides: propagate energy, deposit the losses
    # as extra diffusivity (MOM_internal_tides + tidal_mixing lowmode)
    if p.int_tides is not None and state.En_itide is not None:
        from mom6_tpu.diagnostics.wave_speed import wave_speed
        from mom6_tpu.physics.lateral.internal_tides import \
            step_internal_tides
        from mom6_tpu.physics.vertical.tidal_mixing import (
            TidalMixingParams, int_tide_input_tke, tidal_mixing_kd)
        dt_it = p.dyn.dt * p.n_dyn_per_thermo
        tmp = p.diabatic.diff.tidal if p.diabatic.diff.tidal is not None \
            else TidalMixingParams()
        tke_in, _ = int_tide_input_tke(state.h, state.T, state.S, G, GV,
                                       eos, tmp)
        cn = wave_speed(state.h, state.T, state.S, G, GV, eos)
        en_new, loss = step_internal_tides(state.En_itide, tke_in, cn,
                                           G, GV, dt_it, p.int_tides)
        state = state.replace(En_itide=en_new)
        # deposit the propagated-loss energy with mixing efficiency mu
        # (lowmode has no additional local-fraction q)
        kd_low = tidal_mixing_kd(state.h, state.T, state.S, G, GV, eos,
                                 tmp,
                                 tke_input=loss / max(tmp.gamma_itides,
                                                      1e-6))
        kd_extra = kd_low if kd_extra is None else kd_extra + kd_low

    dt_therm = p.dyn.dt * p.n_dyn_per_thermo
    T, S, kd, _ = diabatic_ale(state.T, state.S, state.h, forcing.buoy,
                               dt_therm, G, GV, p.diabatic,
                               kd_extra=kd_extra, eos=eos)
    state = state.replace(T=T, S=S)

    # --- ALE regrid + remap ----------------------------------------------
    state, _ = ale_regrid_remap(state, G, GV, p.ale)
    return state
