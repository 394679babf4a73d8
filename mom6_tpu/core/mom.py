"""Top-level model orchestrator — the step_MOM analogue.

Re-designs MOM6's main stepping logic (reference: src/core/MOM.F90:
step_MOM :513, step_MOM_dynamics :1167, step_MOM_tracer_dyn :1481,
step_MOM_thermo :1591, ALE_regridding_and_remapping :1751) as one pure
jittable function over the state pytree:

  lateral thickness parameterizations (GM / ML restrat / interface filter,
    the thickness_diffuse_first block, MOM.F90:1226-1278)
  for each baroclinic step:
    dynamics (split RK2, accumulating uhtr/vhtr; porous-barrier face
    widths, BBL viscosity, Zanna-Bolton closure, tidal geopotential)
  every thermo cycle:
    tracer advection with the accumulated transports  (step_MOM_tracer_dyn)
    diabatic column physics                            (step_MOM_thermo)
    tracer-package column physics (tracer_flow_control role)
    sponges, stochastic (SPPT/SKEB) perturbations
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
from mom6_tpu.core.pressure_force import (find_eta, pressure_force_fv,
                                          pressure_force_fv_nonbous,
                                          pressure_force_montgomery)
from mom6_tpu.core.state import OceanState
from mom6_tpu.eos import get_eos
from mom6_tpu.physics.lateral.hor_visc import horizontal_viscosity
from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                DiabaticParams, diabatic_ale)
from mom6_tpu.tracers.advect import advect_tracers

__all__ = ["MOMParams", "Forcing", "step_mom", "dyn_accel_diag"]


def dyn_accel_diag(state, forcing, G, GV, p):
    """One split dynamics step returning (state, AccelDiag) for the KE
    term budget (MOM_diagnostics.F90 calculate_energy_diagnostics).
    Diagnostic-cadence only: uses the same PF/hor_visc closures as
    step_mom's hot path but omits the tidal/Stanley/ZB extras."""
    eos = get_eos(p.eos_name) if p.thermo_enabled else None
    pf_fn = None
    if p.thermo_enabled:
        def pf_fn(h, st):
            return pressure_force_fv(h, st.T, st.S, G, GV, eos,
                                     p_surf=forcing.mech.p_surf)
    hv_fn = None
    if p.hor_visc is not None:
        def hv_fn(u, v, h):
            return horizontal_viscosity(u, v, h, G, p.hor_visc)
    return step_dynamics_split_rk2(state, forcing.mech, G, GV, p.dyn,
                                   pf_fn=pf_fn, hv_fn=hv_fn,
                                   return_accel=True)


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
    varmix: Optional["VarMixParams"] = None       # MOM_lateral_mixing_coeffs
    obc: Optional["OBCParams"] = None             # open boundaries
    int_tides: Optional["InternalTidesParams"] = None  # low-mode propagation
    khtr: float = 0.0          # epineutral/horizontal tracer diff [m2 s-1]
    khtr_passivity_coeff: float = 0.0   # KHTR_PASSIVITY_COEFF: scale KhTr
    #                                     by max(min, coeff * Rd/dx) — the
    #                                     equatorial enhancement (Rd/dx is
    #                                     large at the equator)
    khtr_passivity_min: float = 0.5     # KHTR_PASSIVITY_MIN
    khtr_max: float = 0.0               # KHTR_MAX (0: no cap)
    khtr_n_sub: int = 1                 # subcycles (MAX_TR_DIFFUSION_CFL
    #                                     role, static count for jit)
    neutral_diffusion: bool = False   # rotate KHTR along neutral surfaces
    # "redi": small-slope rotated tensor with implicit K S^2 vertical
    # piece; "surfaces": matched neutral-surface positions with sublayer
    # exchange (the reference's polynomial surface-finding design)
    ndiff_scheme: str = "redi"
    khtr_bl: float = 0.0       # along-boundary-layer diffusivity [m2 s-1]
    n_dyn_per_thermo: int = 1
    tracer_advect_sub: int = 2
    # DIABATIC_FIRST: apply the diabatic/thermodynamic processes (column
    # physics + ALE) BEFORE the dynamics in each thermo cycle
    # (MOM.F90:863-909); tracer advection still follows the dynamics
    diabatic_first: bool = False
    # HOMOGENIZE_FORCINGS: replace all forcing fields with their global
    # means at step entry (MOM.F90:657-662, debugging aid)
    homogenize_forcings: bool = False
    # --- wired subsystems (each optional; reference wiring cited at the
    # point of use) ------------------------------------------------------
    sponge: Optional["SpongeParams"] = None       # MOM_ALE_sponge role
    interface_filter: Optional["InterfaceFilterParams"] = None
    porous: Optional["PorousBarrier"] = None      # sub-grid sills
    zb: Optional["ZBParams"] = None               # Zanna-Bolton 2020 closure
    bbl_visc: Optional["SetViscParams"] = None    # set_viscous_BBL role
    stanley_coeff: float = -1.0     # >=0: Stanley SGS-T-variance EOS in PF
    pf_recon: bool = False          # PLM T/S reconstruction in the PF
    #                                 integrals (RECONSTRUCT_FOR_PRESSURE)
    tides: Optional["TidalForcingParams"] = None  # astronomical potential
    sal_harmonics: Optional["SALHarmonics"] = None  # spherical-harmonic SAL
    sppt: Optional["SPPTParams"] = None           # stochastic physics
    skeb_scale: float = 0.0                       # SKEB psi scale [m2 s-1]
    waves: Optional["WaveParams"] = None          # Langmuir into KPP/ePBL
    tfc: Optional["TracerFlowControl"] = None     # passive tracer packages
    # ice-shelf coupling: shelf pressure into the PF, 3-equation melt
    # fluxes into the buoyancy forcing (MOM_ice_shelf.F90:1103,1135)
    shelf: Optional["ShelfCoupling"] = None
    # unsplit (no barotropic/baroclinic splitting) stepping: the SPLIT =
    # False path (MOM_dynamics_unsplit[_RK2].F90); "RK3" or "RK2"
    unsplit: Optional["UnsplitParams"] = None
    unsplit_scheme: str = "RK3"


class Forcing(NamedTuple):
    mech: MechForcing = MechForcing()
    buoy: BuoyancyForcing = BuoyancyForcing()
    # time-dependent open-boundary exterior data (file-driven segments;
    # update_OBC_segment_data role) — dense overrides of p.obc's arrays
    obc_data: Optional[object] = None
    # ODA analysis increments (oda_incupd role), applied ramped inside
    # the diabatic sequence
    oda_inc: Optional[object] = None
    # named per-tracer surface fluxes from the coupler (the
    # coupler_2d_bc_type role of ice_ocean_boundary%fluxes): e.g.
    # {"ndep": (ny, nx) nitrogen deposition} consumed by BGC packages
    tr_fluxes: Optional[dict] = None


def _tidal_geopotential(state, G, p: MOMParams):
    """e_tidal = equilibrium astronomical tide + self-attraction/loading
    (MOM_tidal_forcing.F90:817 calc_tidal_forcing +
    MOM_self_attr_load.F90:392 calc_SAL), evaluated once per baroclinic
    step at the current model time and free surface."""
    e_tidal = None
    if p.tides is not None and state.time is not None:
        from mom6_tpu.physics.lateral.tidal_forcing import equilibrium_tide
        deg2rad = jnp.pi / 180.0
        e_tidal = equilibrium_tide(state.time, G.geoLatT * deg2rad,
                                   G.geoLonT * deg2rad, p.tides)
    if p.sal_harmonics is not None:
        from mom6_tpu.physics.lateral.self_attr_load import calc_sal_harmonic
        eta = find_eta(state.h, G)
        e_sal = calc_sal_harmonic(eta, p.sal_harmonics)
        e_tidal = e_sal if e_tidal is None else e_tidal + e_sal
    return e_tidal


def _stack_tracers(state, p: MOMParams):
    """[T, S] + registered passive tracers as one (n, nz, ny, nx) stack."""
    names = p.tfc.registry.names if p.tfc is not None else []
    arrs = [state.T, state.S]
    if names:
        arrs += [state.tr[n] for n in names]
    return jnp.stack(arrs), names


def _unstack_tracers(state, stack, names):
    updates = dict(T=stack[0], S=stack[1])
    if names:
        tr = dict(state.tr)
        for i, n in enumerate(names):
            tr[n] = stack[2 + i]
        updates["tr"] = tr
    return state.replace(**updates)


def step_mom(state: OceanState, forcing: Forcing, G, GV, p: MOMParams,
             *, collect_tend: bool = False) -> OceanState:
    """Advance one thermo cycle = n_dyn_per_thermo baroclinic steps.

    Land columns are held exactly inert (the reference's masked loops
    never touch them): the Angstrom-thin columns under the mask are
    numerically ill-conditioned in float32 — column solves amplify
    roundoff exponentially there, and once a land value overflows, the
    masked stencils spread it (NaN * 0 = NaN).

    ``collect_tend=True`` returns ``(state, tend)`` where ``tend`` maps
    tendency-diagnostic names to per-layer content tendencies in native
    units ([degC m s-1] for heat, [ppt m s-1] for salt; the catalog
    scales to W m-2 / kg m-2 s-1) — the register_tracer_diagnostics
    tier of the reference (MOM_tracer_registry.F90:283-651): advective,
    epineutral-diffusive, diapycnal-diffusive, boundary-forcing, frazil
    and vertical-remap decompositions whose sum is the exact total
    content change of the cycle (gated by tests/test_tendency_diags.py)."""
    tend: Optional[dict] = {} if collect_tend else None
    out = _step_mom_impl(state, forcing, G, GV, p, tend=tend)
    m = G.mask2dT

    def keep(new, old):
        if jnp.ndim(new) == 0:          # package scalars (clocks etc.)
            return new
        if jnp.ndim(new) == jnp.ndim(m):
            return jnp.where(m > 0.5, new, old)
        return jnp.where(m[None] > 0.5, new, old)

    out = out.replace(h=keep(out.h, state.h))
    if out.T is not None:
        out = out.replace(T=keep(out.T, state.T), S=keep(out.S, state.S))
    if out.tr is not None and state.tr is not None:
        out = out.replace(tr={k: keep(v, state.tr[k])
                              for k, v in out.tr.items()})
    if tend is not None:
        dt_therm = p.dyn.dt * p.n_dyn_per_thermo
        mm = m[None]
        if out.T is not None:
            # exact totals from the (masked) states the caller sees;
            # the component captures must sum to these (gated)
            tend["opottemptend"] = (out.T * out.h
                                    - state.T * state.h) / dt_therm
            tend["osalttend"] = (out.S * out.h
                                 - state.S * state.h) / dt_therm
        tend = {k: v * mm for k, v in tend.items()}
        return out, tend
    return out


def _step_mom_impl(state: OceanState, forcing: Forcing, G, GV,
                   p: MOMParams, tend: Optional[dict] = None
                   ) -> OceanState:
    eos = get_eos(p.eos_name) if p.thermo_enabled else None
    dt_therm = p.dyn.dt * p.n_dyn_per_thermo

    # --- HOMOGENIZE_FORCINGS: all forces/fluxes -> their global means
    # (MOM.F90:657-662) ----------------------------------------------------
    if p.homogenize_forcings:
        from mom6_tpu.core.forcing_util import homogenize_forcing
        forcing = homogenize_forcing(forcing, G)

    # --- ice-shelf coupling: fold shelf pressure + melt fluxes into the
    # forcing every downstream consumer sees (add_shelf_pressure +
    # add_shelf_flux, MOM_ice_shelf.F90:1103,1135) -------------------------
    if p.shelf is not None:
        from mom6_tpu.physics.shelf_coupling import apply_shelf_coupling
        forcing, _shelf_melt = apply_shelf_coupling(state, forcing, G, GV,
                                                    p.shelf)

    obc_eff = p.obc
    if p.obc is not None and forcing.obc_data is not None:
        from mom6_tpu.core.open_boundary import merge_obc_data
        obc_eff = merge_obc_data(p.obc, forcing.obc_data)

    # --- Stanley SGS temperature variance for the EOS in the PF
    # (MOM_stoch_eos.F90:261 -> use_Stanley in int_density_dz) -------------
    varT = None
    if p.thermo_enabled and p.stanley_coeff >= 0.0:
        from mom6_tpu.eos.stoch_eos import sgs_t_variance
        varT = sgs_t_variance(state.T, G, p.stanley_coeff)

    def make_pf_fn(st0):
        e_tidal = _tidal_geopotential(st0, G, p)
        if p.thermo_enabled and not GV.boussinesq:
            # non-Boussinesq mode (BOUSSINESQ = False): h is mass/rho0,
            # the PF comes from the specific-volume pressure-coordinate
            # form (PressureForce_FV_nonBouss,
            # MOM_PressureForce_FV.F90:120).  Tides/Stanley/PLM extras
            # are Boussinesq-path-only for now (PARITY.md).
            def pf_fn(h, st):
                return pressure_force_fv_nonbous(
                    GV.rho0 * h, st.T, st.S, G, GV, eos,
                    p_surf=forcing.mech.p_surf)
        elif p.thermo_enabled:
            def pf_fn(h, st):
                return pressure_force_fv(h, st.T, st.S, G, GV, eos,
                                         p_surf=forcing.mech.p_surf,
                                         e_tidal=e_tidal, varT=varT,
                                         plm_ts=p.pf_recon)
        elif e_tidal is not None:
            def pf_fn(h, st):
                return pressure_force_montgomery(h, G, GV, e_tidal=e_tidal)
        else:
            pf_fn = None
        return pf_fn

    # --- variable mixing coefficients (calc_resoln_function +
    # calc_slope_functions, the per-cycle VarMix update of MOM.F90:786)
    res_fn = sn_h = rd_dx = None
    if p.varmix is not None or p.khtr_passivity_coeff > 0.0:
        from mom6_tpu.framework.stencil import im1 as _im1
        from mom6_tpu.framework.stencil import jm1 as _jm1
        from mom6_tpu.physics.lateral.lateral_mixing_coeffs import (
            VarMixParams, calc_resoln_function, calc_slope_functions)
        vm = p.varmix if p.varmix is not None else VarMixParams()
        need_cg1 = (vm.resoln_scaled_kh or vm.resoln_scaled_khth
                    or vm.resoln_scaled_khtr
                    or p.khtr_passivity_coeff > 0.0)
        if need_cg1:
            if p.thermo_enabled:
                from mom6_tpu.diagnostics.wave_speed import wave_speed_wkb
                cg1 = wave_speed_wkb(state.h, state.T, state.S, G, GV,
                                     eos)
            else:
                # layered WKB: c1 = (1/pi) sum sqrt(g'_K hbar_K)
                gp = jnp.asarray(GV.g_prime)[1:, None, None]
                hbar = 0.5 * (state.h[:-1] + state.h[1:])
                cg1 = jnp.sum(jnp.sqrt(jnp.maximum(gp * hbar, 0.0)),
                              axis=0) / jnp.pi
            if p.varmix is not None:
                res_fn = calc_resoln_function(cg1, G, vm)
            if p.khtr_passivity_coeff > 0.0:
                # Rd/dx: deformation radius over grid scale (Rd_dx_h of
                # MOM_lateral_mixing_coeffs; large at the equator)
                f_q = G.CoriolisBu
                f2 = 0.25 * ((f_q ** 2 + _im1(_jm1(f_q ** 2)))
                             + (_im1(f_q ** 2) + _jm1(f_q ** 2)))
                dfdx = (f_q - _im1(f_q)) * G.IdxT
                dfdy = (f_q - _jm1(f_q)) * G.IdyT
                beta_m = jnp.sqrt(dfdx * dfdx + dfdy * dfdy)
                dx = jnp.sqrt(G.dxT * G.dyT)
                rd_dx = cg1 / (jnp.sqrt(f2 + cg1 * beta_m + 1e-30) * dx)
        if vm.use_visbeck and (vm.khth_slope_cff > 0.0
                               or vm.khtr_slope_cff > 0.0):
            sn_u, sn_v = calc_slope_functions(state.h, G, GV, vm)
            sn_h = 0.25 * ((sn_u + _im1(sn_u)) + (sn_v + _jm1(sn_v)))

    # lateral friction + Zanna-Bolton eddy-momentum closure
    # (horizontal_viscosity at MOM_dynamics_split_RK2.F90:886;
    # ZB2020 added to diffu/diffv as in MOM_hor_visc's MOM_Zanna_Bolton
    # coupling)
    hv_fn = None
    if p.hor_visc is not None or p.zb is not None:
        # MEKE backscatter amplitude (MEKE_VISCOSITY_COEFF_KU): a
        # negative Laplacian viscosity returning parameterized eddy
        # energy to the resolved flow, evaluated once per thermo cycle
        # from the current eddy energy
        ku_bs = None
        if (p.meke is not None and state.E_meke is not None
                and p.meke.ku_coeff > 0.0):
            from mom6_tpu.physics.lateral.meke import meke_viscosity
            ku_bs = meke_viscosity(state.E_meke, p.meke, h=state.h, G=G)

        kh_scale = res_fn if (p.varmix is not None
                              and p.varmix.resoln_scaled_kh) else None

        def hv_fn(u, v, h):
            du = dv = 0.0
            if p.hor_visc is not None:
                du, dv = horizontal_viscosity(u, v, h, G, p.hor_visc,
                                              ku_backscatter=ku_bs,
                                              kh_scale=kh_scale)
            if p.zb is not None:
                from mom6_tpu.physics.lateral.zanna_bolton import \
                    zanna_bolton_accel
                zu, zv = zanna_bolton_accel(u, v, h, G, p.zb)
                du, dv = du + zu, dv + zv
            return du, dv

    # --- DIABATIC_FIRST: thermodynamics before the dynamics
    # (MOM.F90:863-909).  The column-physics + ALE block runs here on the
    # start-of-cycle state; tracer advection still follows the dynamics
    # with the accumulated transports, and any Redi implicit part from
    # the lateral diffusion is applied standalone afterwards. ---------------
    if p.thermo_enabled and p.diabatic_first:
        names0 = p.tfc.registry.names if p.tfc is not None else []
        state = _thermo_block(state, forcing, G, GV, p, eos, dt_therm,
                              None, names0, tend=tend)

    # --- lateral eddy parameterizations acting on h (the
    # thickness_diffuse_first path, MOM.F90:1226-1278) -----------------------
    # Capture the pre-advection thickness BEFORE the GM/MLRestrat bolus
    # updates: uhtr accumulates those same bolus transports, so the tracer
    # advection's internal thickness h_pre - div(uhtr) must start from the
    # pre-GM h to land on the final model h (the reference reconstructs
    # hprev from h_end + div(uhtr), MOM_tracer_advect.F90 advect_tracer).
    h_before_dyn = state.h
    if p.thermo_enabled and p.gm is not None:
        from mom6_tpu.physics.lateral.meke import (gm_pe_release,
                                                   meke_diffusivity,
                                                   step_meke)
        from mom6_tpu.physics.lateral.thickness_diffuse import \
            thickness_diffuse
        khth_2d = None
        if p.meke is not None and state.E_meke is not None:
            khth_2d = p.gm.khth + meke_diffusivity(state.E_meke, p.meke,
                                                   h=state.h, G=G)
        if p.varmix is not None:
            vm = p.varmix
            base = khth_2d if khth_2d is not None \
                else jnp.full_like(G.mask2dT, p.gm.khth)
            if sn_h is not None and vm.khth_slope_cff > 0.0:
                base = base + vm.khth_slope_cff \
                    * vm.visbeck_l_scale ** 2 * sn_h
            if res_fn is not None and vm.resoln_scaled_khth:
                base = base * res_fn
            khth_2d = base
        h_gm, uhd, vhd = thickness_diffuse(state.h, G, GV, dt_therm, p.gm,
                                           khth_2d=khth_2d,
                                           T=state.T, S=state.S, eos=eos)
        if p.meke is not None and state.E_meke is not None:
            src = gm_pe_release(state.h, uhd, vhd, G, GV)
            # frictional backscatter source: work extracted by the
            # lateral friction, -(u.F_u + v.F_v), column mean
            # (MEKE%mom_src via MEKE_FRCOEFF)
            src_mom = None
            if p.meke.fr_coeff > 0.0 and p.hor_visc is not None:
                du, dv = horizontal_viscosity(state.u, state.v, state.h,
                                              G, p.hor_visc)
                from mom6_tpu.framework.stencil import im1 as _im1
                from mom6_tpu.framework.stencil import jm1 as _jm1
                wu = state.h * 0.5 * (state.u * du + _im1(state.u * du))
                wv = state.h * 0.5 * (state.v * dv + _jm1(state.v * dv))
                col = jnp.maximum(jnp.sum(state.h, axis=0), 1.0)
                src_mom = jnp.maximum(
                    -jnp.sum(wu + wv, axis=0) / col, 0.0)
            e_new = step_meke(state.E_meke, src, state.h, G, dt_therm,
                              p.meke, src_mom=src_mom)
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
    if p.interface_filter is not None:
        # interface-height smoothing, the GM alternative of
        # MOM_interface_filter.F90 (called from MOM.F90:1226-1278)
        from mom6_tpu.physics.lateral.interface_filter import \
            interface_filter
        h_if, uh_f, vh_f = interface_filter(state.h, G, GV, dt_therm,
                                            p.interface_filter)
        state = state.replace(h=h_if,
                              uhtr=state.uhtr + dt_therm * uh_f,
                              vhtr=state.vhtr + dt_therm * vh_f)

    def dyn_body(st, _):
        pf_fn = make_pf_fn(st)
        # porous-barrier fractional face widths rebuilt from the current
        # interface heights each step (porous_widths_layer,
        # MOM_porous_barriers.F90, called from MOM.F90:1226-1278)
        por = None
        if p.porous is not None:
            from mom6_tpu.core.porous_barriers import porous_face_areas
            por = porous_face_areas(st.h, G, p.porous)
        # BBL viscosity at u/v faces (set_viscous_BBL,
        # MOM_set_viscosity.F90:135) -> bottom-drag piston velocities
        # kv_bbl / bbl_thick for the implicit vertical friction
        bbl_piston = None
        if p.bbl_visc is not None:
            from mom6_tpu.physics.vertical.set_viscosity import \
                set_viscous_bbl
            kv_u, kv_v, th_u, th_v = set_viscous_bbl(st.u, st.v, st.h, G,
                                                     p.bbl_visc)
            bbl_piston = (kv_u / jnp.maximum(th_u, 1e-3),
                          kv_v / jnp.maximum(th_v, 1e-3))
        if p.unsplit is not None:
            from mom6_tpu.core.dynamics_unsplit import (
                step_dynamics_unsplit_rk2, step_dynamics_unsplit_rk3)
            pf1 = (lambda hh: pf_fn(hh, st)) if pf_fn is not None else None
            stepper = step_dynamics_unsplit_rk2 \
                if p.unsplit_scheme.upper() == "RK2" \
                else step_dynamics_unsplit_rk3
            out = stepper(st, forcing.mech, G, GV, p.unsplit, pf_fn=pf1)
        else:
            out = step_dynamics_split_rk2(st, forcing.mech, G, GV, p.dyn,
                                          pf_fn=pf_fn, hv_fn=hv_fn,
                                          por=por, bbl_piston=bbl_piston,
                                          obc=obc_eff,
                                          kv_int=st.kv_shear)
        if obc_eff is not None:
            from mom6_tpu.core.open_boundary import (
                apply_obc, update_tracer_reservoirs)
            out = apply_obc(out, obc_eff, G, GV, p.dyn.dt,
                            u_old=st.u, v_old=st.v)
            if p.thermo_enabled and obc_eff.res_len_in > 0.0:
                out = update_tracer_reservoirs(out, obc_eff, G, p.dyn.dt)
        if out.time is not None:
            out = out.replace(time=out.time + p.dyn.dt)
        return out, None

    state, _ = jax.lax.scan(dyn_body, state, None,
                            length=p.n_dyn_per_thermo)

    # --- stochastic kinetic-energy backscatter (apply_skeb,
    # MOM_stochastics.F90:452) ---------------------------------------------
    if p.skeb_scale > 0.0 and state.skeb_pattern is not None:
        from mom6_tpu.physics.stochastic import SPPTParams, apply_skeb
        sp = p.sppt if p.sppt is not None else SPPTParams()
        u_new, v_new = apply_skeb(state.u, state.v, state.skeb_pattern,
                                  p.skeb_scale, sp)
        state = state.replace(u=u_new * G.mask2dCu, v=v_new * G.mask2dCv)

    if not p.thermo_enabled:
        return state

    # --- tracer transport (step_MOM_tracer_dyn) ---------------------------
    tr, names = _stack_tracers(state, p)
    T_pre_adv, S_pre_adv = tr[0], tr[1]
    tr, h_adv = advect_tracers(tr, h_before_dyn, state.uhtr, state.vhtr, G,
                               n_sub=p.tracer_advect_sub)
    if tend is not None:
        # advective content tendency incl. the GM/MLRestrat bolus part
        # (T_advection_xy of register_tracer_diagnostics; the transports
        # already carry the parameterized fluxes).  The "after" content
        # uses the model's own post-dynamics h (h_adv equals it up to
        # rounding) so the captures telescope exactly to the total.
        tend["T_advection_xy"] = (tr[0] * state.h
                                  - T_pre_adv * h_before_dyn) / dt_therm
        tend["S_advection_xy"] = (tr[1] * state.h
                                  - S_pre_adv * h_before_dyn) / dt_therm
    state = _unstack_tracers(state, tr, names)
    state = state.replace(uhtr=jnp.zeros_like(state.uhtr),
                          vhtr=jnp.zeros_like(state.vhtr))

    # --- lateral tracer diffusion (tracer_hor_diff role) -------------------
    T_pre_pm, S_pre_pm = state.T, state.S
    kd_redi = None
    if p.khtr > 0.0:
        tr, names = _stack_tracers(state, p)
        if p.neutral_diffusion and p.ndiff_scheme == "surfaces":
            from mom6_tpu.tracers.neutral_diffusion import \
                neutral_diffusion_surfaces
            tr = neutral_diffusion_surfaces(tr, state.h, state.T, state.S,
                                            G, GV, eos, p.khtr, dt_therm)
        elif p.neutral_diffusion:
            from mom6_tpu.tracers.neutral_diffusion import neutral_diffusion
            tr, kd_redi = neutral_diffusion(tr, state.h, state.T, state.S,
                                            G, GV, eos, p.khtr, dt_therm)
        else:
            from mom6_tpu.tracers.hor_diff import tracer_hordiff
            khtr_eff = p.khtr
            if p.varmix is not None or rd_dx is not None:
                vm = p.varmix
                khtr_eff = jnp.full_like(G.mask2dT, p.khtr)
                if vm is not None and sn_h is not None \
                        and vm.khtr_slope_cff > 0.0:
                    khtr_eff = khtr_eff + vm.khtr_slope_cff \
                        * vm.visbeck_l_scale ** 2 * sn_h
                if vm is not None and res_fn is not None \
                        and vm.resoln_scaled_khtr:
                    khtr_eff = khtr_eff * res_fn
                if rd_dx is not None and p.khtr_passivity_coeff > 0.0:
                    # equatorial passivity enhancement
                    # (MOM_tracer_hor_diff.F90:251); coeff 0 (the
                    # reference default) disables the scaling entirely
                    # rather than applying the passivity_min floor
                    khtr_eff = khtr_eff * jnp.maximum(
                        p.khtr_passivity_min,
                        p.khtr_passivity_coeff * rd_dx)
                if p.khtr_max > 0.0:
                    khtr_eff = jnp.minimum(khtr_eff, p.khtr_max)
            tr = tracer_hordiff(tr, state.h, khtr_eff, dt_therm, G,
                                n_sub=p.khtr_n_sub)
        state = _unstack_tracers(state, tr, names)

    if p.khtr_bl > 0.0:
        # along-boundary-layer lateral mixing (MOM_hor_bnd_diffusion)
        from mom6_tpu.diagnostics.mld import diagnose_mld
        from mom6_tpu.tracers.hor_bnd_diffusion import hor_bnd_diffusion
        bld = diagnose_mld(state.h, state.T, state.S, G, GV, eos)
        tr, names = _stack_tracers(state, p)
        tr = hor_bnd_diffusion(tr, state.h, bld, p.khtr_bl, dt_therm, G)
        state = _unstack_tracers(state, tr, names)

    if tend is not None and state.T is not None:
        # epineutral/horizontal diffusive tendency (opottemppmdiff /
        # osaltpmdiff; the along-boundary hbd part is folded in).  h is
        # unchanged across these blocks.
        tend["opottemppmdiff"] = (state.T - T_pre_pm) * state.h / dt_therm
        tend["osaltpmdiff"] = (state.S - S_pre_pm) * state.h / dt_therm

    if p.diabatic_first:
        # the diabatic solve already ran at the top of the cycle; apply
        # the lateral diffusion's Redi implicit K S^2 part (if any) as a
        # standalone implicit vertical solve over T/S + passive tracers
        if kd_redi is not None:
            from mom6_tpu.tracers.vert_diff import tracer_vertdiff
            tr, names = _stack_tracers(state, p)
            tr = tracer_vertdiff(tr, state.h, kd_redi, dt_therm)
            if tend is not None:
                tend["opottempdiff"] = tend.get(
                    "opottempdiff", 0.0) + (tr[0] - state.T) \
                    * state.h / dt_therm
                tend["osaltdiff"] = tend.get(
                    "osaltdiff", 0.0) + (tr[1] - state.S) \
                    * state.h / dt_therm
            state = _unstack_tracers(state, tr, names)
        return state
    return _thermo_block(state, forcing, G, GV, p, eos, dt_therm,
                         kd_redi, names, tend=tend)


def assemble_diffusivity_extras(state: OceanState, forcing: Forcing, G,
                                GV, p: MOMParams, eos, dt_therm: float,
                                kd_redi=None,
                                components: Optional[dict] = None):
    """Interface-diffusivity contributions that feed the diabatic solve
    (the set_diffusivity feeders of the diabatic_ALE sequence): the
    boundary-layer scheme (KPP/ePBL, with the Langmuir closure when
    waves are configured), shear mixing (JHL or Ri-number forms), and
    low-mode internal-tide energy deposition.  Shared by _thermo_block
    and the diagnostic catalog's Kd_interface field.

    Returns (kd_extra, bl_mld, kpp_nonlocal, En_itide_new); En_itide_new
    is None unless internal tides advanced their energy field."""
    kd_extra = kd_redi     # Redi K S^2 implicit part, if any

    # Langmuir turbulence: a Langmuir-number closure la_fn(hbl) that
    # KPP/ePBL evaluate at their own boundary-layer depth, built from
    # the configured WAVE_METHOD's Stokes drift (LF17 statistical waves,
    # DHH85 spectrum, SURFBANDS, or the empirical u10 fallback)
    # (MOM_wave_interface.F90 get_Langmuir_Number -> KPP/ePBL)
    la_fn = None
    if p.waves is not None:
        from mom6_tpu.physics.waves import make_la_fn
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        ustar = jnp.sqrt(jnp.sqrt(taux ** 2 + tauy ** 2) / GV.rho0)
        la_fn = make_la_fn(p.waves, ustar, u10=forcing.mech.u10,
                           h=state.h, u=state.u, v=state.v,
                           stk_x=forcing.mech.pstokes_x,
                           stk_y=forcing.mech.pstokes_y,
                           lamult=forcing.mech.lamult)

    kpp_nonlocal = None
    bl_mld = None            # boundary-layer depth for the brine plume
    if p.diabatic.boundary_layer_scheme == "KPP":
        from mom6_tpu.physics.vertical.kpp import kpp_diffusivity
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        kd_bl, bl_mld, kpp_nonlocal = kpp_diffusivity(
            state.h, state.u, state.v, state.T, state.S, G, GV, eos,
            taux, tauy, forcing.buoy.heat_flux,
            cp=p.diabatic.cp, la_fn=la_fn)
        if components is not None:
            components["Kd_BL"] = kd_bl
        kd_extra = kd_bl if kd_extra is None else kd_extra + kd_bl
    elif p.diabatic.boundary_layer_scheme == "EPBL":
        from mom6_tpu.physics.vertical.epbl import epbl_diffusivity
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        kd_bl, bl_mld = epbl_diffusivity(state.h, state.T, state.S, G, GV,
                                         eos, taux, tauy,
                                         forcing.buoy.heat_flux,
                                         cp=p.diabatic.cp, la_fn=la_fn,
                                         waves=p.waves, dt=dt_therm)
        if components is not None:
            components["Kd_BL"] = kd_bl
        kd_extra = kd_bl if kd_extra is None else kd_extra + kd_bl
    if p.diabatic.use_shear_mixing:
        if p.diabatic.shear_scheme == "JHL":
            from mom6_tpu.physics.vertical.kappa_shear import kappa_shear
            kd_sh, _ = kappa_shear(state.h, state.u, state.v, state.T,
                                   state.S, G, GV, eos, dt=dt_therm)
        else:
            from mom6_tpu.physics.vertical.shear_mixing import (
                ShearMixingParams, shear_mixing_kd)
            kd_sh = shear_mixing_kd(
                state.h, state.u, state.v, state.T, state.S, G, GV, eos,
                ShearMixingParams(scheme=p.diabatic.shear_scheme))
        if components is not None:
            components["Kd_shear"] = kd_sh
        kd_extra = kd_sh if kd_extra is None else kd_extra + kd_sh

    # --- low-mode internal tides: propagate energy, deposit the losses
    # as extra diffusivity (MOM_internal_tides + tidal_mixing lowmode)
    en_new = None
    if p.int_tides is not None and state.En_itide is not None:
        from mom6_tpu.diagnostics.wave_speed import (wave_speed,
                                                     wave_speeds)
        from mom6_tpu.physics.lateral.internal_tides import \
            step_internal_tides
        from mom6_tpu.physics.vertical.tidal_mixing import (
            TidalMixingParams, int_tide_input_tke, tidal_mixing_kd)
        tmp = p.diabatic.diff.tidal if p.diabatic.diff.tidal is not None \
            else TidalMixingParams()
        tke_in, _ = int_tide_input_tke(state.h, state.T, state.S, G, GV,
                                       eos, tmp)
        if p.int_tides.n_mode > 1:
            # exact modal speeds (wave_speeds, MOM_wave_speed.F90:750)
            # instead of the WKB cn/m scaling
            cn = wave_speeds(state.h, state.T, state.S, G, GV, eos,
                             n_modes=p.int_tides.n_mode)
        else:
            cn = wave_speed(state.h, state.T, state.S, G, GV, eos)
        en_new, loss = step_internal_tides(state.En_itide, tke_in, cn,
                                           G, GV, dt_therm, p.int_tides)
        # deposit the propagated-loss energy with mixing efficiency mu
        # (lowmode has no additional local-fraction q)
        kd_low = tidal_mixing_kd(state.h, state.T, state.S, G, GV, eos,
                                 tmp,
                                 tke_input=loss / max(tmp.gamma_itides,
                                                      1e-6))
        if components is not None:
            components["Kd_lowmode"] = kd_low
        kd_extra = kd_low if kd_extra is None else kd_extra + kd_low
    return kd_extra, bl_mld, kpp_nonlocal, en_new


def _thermo_block(state: OceanState, forcing: Forcing, G, GV,
                  p: MOMParams, eos, dt_therm: float, kd_redi, names,
                  tend: Optional[dict] = None) -> OceanState:
    """Column physics + ALE regrid/remap (step_MOM_thermo,
    MOM.F90:1591): the diabatic sequence with boundary-layer/shear/tidal
    diffusivities, tracer-package columns, sponges, ODA increments,
    stochastics, then the ALE cycle.  Runs after the dynamics by default
    or before them under DIABATIC_FIRST."""
    # --- column physics (step_MOM_thermo -> diabatic) ---------------------
    if p.diabatic.boundary_layer_scheme == "BULKML":
        # layered (isopycnal) mode: bulk mixed layer + diffusive
        # entrainment; no ALE regrid afterwards
        from mom6_tpu.physics.vertical.diabatic import diabatic_layered
        taux = forcing.mech.taux if forcing.mech.taux is not None else \
            jnp.zeros_like(G.mask2dT)
        tauy = forcing.mech.tauy if forcing.mech.tauy is not None else \
            jnp.zeros_like(G.mask2dT)
        h_n, T, S, u_n, v_n, _ = diabatic_layered(
            state.T, state.S, state.h, state.u, state.v, forcing.buoy,
            taux, tauy, dt_therm, G, GV, p.diabatic, eos)
        state = state.replace(h=h_n, T=T, S=S, u=u_n, v=v_n)
        if p.tfc is not None and state.tr is not None:
            state = state.replace(
                tr=p.tfc.column_physics(state.tr, state.h, dt_therm, G,
                                        GV, T=state.T, S=state.S,
                                        forcing=forcing))
        if p.sponge is not None:
            from mom6_tpu.physics.vertical.sponge import apply_sponge
            state = apply_sponge(state, dt_therm, p.sponge, G)
        return state

    # ALE mode: boundary-layer + shear mixing feed the diabatic solve as
    # extra interface diffusivities (diabatic_ALE sequence, SURVEY.md §3.5)
    kd_parts = {}
    kd_extra, bl_mld, kpp_nonlocal, en_new = assemble_diffusivity_extras(
        state, forcing, G, GV, p, eos, dt_therm, kd_redi=kd_redi,
        components=kd_parts)
    if en_new is not None:
        state = state.replace(En_itide=en_new)
    # momentum viscosity from the boundary-layer + shear schemes with
    # unit Prandtl number (visc%Kv_shear role, MOM_set_viscosity /
    # MOM_kappa_shear.F90 applies the same kappa to momentum; CVMix KPP
    # computes Kv with the same shape function as Kd) — stored on the
    # state so the NEXT cycle's implicit vertical friction mixes wind
    # momentum over the boundary layer instead of trapping it in the
    # top layer (MOM_vert_friction.F90:find_coupling_coef)
    kv_parts = [kd_parts[k] for k in ("Kd_BL", "Kd_shear")
                if k in kd_parts]
    if kv_parts and state.kv_shear is not None:
        # only when the field was allocated at build time — a scan over
        # step_mom needs the carry pytree structure fixed
        kv_sh = kv_parts[0]
        for extra in kv_parts[1:]:
            kv_sh = kv_sh + extra
        state = state.replace(kv_shear=kv_sh)

    passive = None
    if names:
        passive = jnp.stack([state.tr[n] for n in names])
    T0, S0 = state.T, state.S
    collect = {} if tend is not None else None
    T, S, kd, passive_new, frazil = diabatic_ale(
        state.T, state.S, state.h, forcing.buoy, dt_therm, G, GV,
        p.diabatic, kd_extra=kd_extra, extra_tracers=passive, eos=eos,
        u=state.u, v=state.v, mld=bl_mld, collect=collect)
    if frazil is not None and state.frazil is not None:
        # accumulate the heat deficit for the coupler (Fioo_q export)
        state = state.replace(frazil=state.frazil + frazil)

    # --- KPP nonlocal transport of the surface fluxes
    # (KPP_NonLocalTransport_temp/saln, MOM_CVMix_KPP.F90:1660; applied
    # to the nonpenetrative heat flux and the net salt flux) ----------------
    if kpp_nonlocal is not None:
        from mom6_tpu.physics.vertical.kpp import apply_nonlocal_transport
        if forcing.buoy.heat_flux is not None:
            t_sfc = forcing.buoy.heat_flux / (GV.rho0 * p.diabatic.cp)
            T = apply_nonlocal_transport(T, state.h, kpp_nonlocal, t_sfc,
                                         dt_therm)
        s_sfc = None
        if forcing.buoy.salt_flux is not None:
            s_sfc = forcing.buoy.salt_flux
        if forcing.buoy.fw_flux is not None:
            vsf = -S[0] * forcing.buoy.fw_flux
            s_sfc = vsf if s_sfc is None else s_sfc + vsf
        if s_sfc is not None:
            S = apply_nonlocal_transport(S, state.h, kpp_nonlocal, s_sfc,
                                         dt_therm)

    # --- SPPT: perturb the net diabatic T/S tendency (MOM_stochastics
    # SPPT branch) ----------------------------------------------------------
    if p.sppt is not None and state.sppt_pattern is not None:
        from mom6_tpu.physics.stochastic import apply_sppt
        T = T0 + apply_sppt(T - T0, state.sppt_pattern, p.sppt)
        S = S0 + apply_sppt(S - S0, state.sppt_pattern, p.sppt)
    if tend is not None:
        # boundary-forcing tendency: the surface deposit lands in the
        # top layer of the implicit solve; penetrating SW / geothermal /
        # brine-plume injections distribute in-column
        zcol = jnp.zeros_like(T)
        bT = zcol.at[0].add(collect["t_flux"]) \
            if collect.get("t_flux") is not None else zcol
        if "sw_heat3d" in collect:
            bT = bT + collect["sw_heat3d"]
        if "geo_heat3d" in collect:
            bT = bT + collect["geo_heat3d"]
        bS = zcol.at[0].add(collect["s_flux"]) \
            if collect.get("s_flux") is not None else zcol
        if "brine_dS3d" in collect:
            bS = bS + collect["brine_dS3d"]
        fz = collect.get("frazil3d", zcol)
        tend["boundary_forcing_heat_tendency"] = bT
        tend["boundary_forcing_salt_tendency"] = bS
        tend["frazil_heat_tendency"] = fz
        # diapycnal diffusion = the rest of the diabatic change (incl.
        # KPP nonlocal redistribution and any SPPT perturbation)
        tend["opottempdiff"] = tend.get("opottempdiff", 0.0) \
            + (T - T0) * state.h / dt_therm - bT - fz
        tend["osaltdiff"] = tend.get("osaltdiff", 0.0) \
            + (S - S0) * state.h / dt_therm - bS
    state = state.replace(T=T, S=S)
    if names:
        tr_d = dict(state.tr)
        for i, n in enumerate(names):
            tr_d[n] = passive_new[i]
        state = state.replace(tr=tr_d)

    # --- tracer-package column physics (call_tracer_column_fns,
    # MOM_tracer_flow_control.F90:955) --------------------------------------
    if p.tfc is not None and state.tr is not None:
        state = state.replace(
            tr=p.tfc.column_physics(state.tr, state.h, dt_therm, G, GV,
                                    T=state.T, S=state.S,
                                    forcing=forcing))

    # --- sponges (apply_ALE_sponge, MOM_ALE_sponge.F90; sequenced after
    # the diabatic solve as in MOM_diabatic_driver.F90:1770) ----------------
    T_pre_sp, S_pre_sp, h_pre_sp = state.T, state.S, state.h
    if p.sponge is not None:
        from mom6_tpu.physics.vertical.sponge import apply_sponge
        state = apply_sponge(state, dt_therm, p.sponge, G)

    # --- ODA incremental analysis updates (apply_oda_incupd, sequenced
    # with the sponges as in MOM_diabatic_driver.F90:1770-1870); the
    # increments arrive through Forcing from the ensemble ODA driver
    # (physics/oda_driver.py), ramped over inc.ramp_seconds ----------------
    if forcing.oda_inc is not None:
        from mom6_tpu.physics.oda_incupd import apply_oda_increments
        state = apply_oda_increments(state, forcing.oda_inc, dt_therm, G)

    # --- advance the stochastic patterns once per thermo cycle ------------
    if (p.sppt is not None or p.skeb_scale > 0.0) \
            and state.rng_key is not None:
        from mom6_tpu.physics.stochastic import SPPTParams, ar1_pattern
        sp = p.sppt if p.sppt is not None else SPPTParams()
        key = state.rng_key
        if state.sppt_pattern is not None:
            pat, key = ar1_pattern(state.sppt_pattern, key, dt_therm,
                                   state.sppt_pattern.shape, sp)
            state = state.replace(sppt_pattern=pat)
        if state.skeb_pattern is not None:
            pat, key = ar1_pattern(state.skeb_pattern, key, dt_therm,
                                   state.skeb_pattern.shape, sp)
            state = state.replace(skeb_pattern=pat)
        state = state.replace(rng_key=key)

    if tend is not None and (p.sponge is not None
                             or forcing.oda_inc is not None):
        # sponge relaxation + ODA increments (separate bucket so the
        # physical decomposition stays clean)
        tend["T_tendency_sponge"] = (state.T * state.h
                                     - T_pre_sp * h_pre_sp) / dt_therm
        tend["S_tendency_sponge"] = (state.S * state.h
                                     - S_pre_sp * h_pre_sp) / dt_therm

    # --- ALE regrid + remap ----------------------------------------------
    passive = None
    if names:
        passive = jnp.stack([state.tr[n] for n in names])
    T_pre_rm, S_pre_rm, h_pre_rm = state.T, state.S, state.h
    state, passive_new = ale_regrid_remap(state, G, GV, p.ale,
                                          extra_tracers=passive)
    if tend is not None:
        # conservative-remap residual (Th_tendency_vert_remap; ~0 in the
        # column integral for a conservative remap)
        tend["Th_tendency_vert_remap"] = (state.T * state.h
                                          - T_pre_rm * h_pre_rm) / dt_therm
        tend["Sh_tendency_vert_remap"] = (state.S * state.h
                                          - S_pre_rm * h_pre_rm) / dt_therm
    if names and passive_new is not None:
        tr_d = dict(state.tr)
        for i, n in enumerate(names):
            tr_d[n] = passive_new[i]
        state = state.replace(tr=tr_d)
    return state
