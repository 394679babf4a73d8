"""Coupled-model caps: flux exchange types and the init/update/end API.

Analogues of the reference's coupler caps:
* FMS cap  — config_src/drivers/FMS_cap/ocean_model_MOM.F90
  (ocean_model_init :158, update_ocean_model :440, ocean_model_end :730)
  and MOM_surface_forcing_gfdl.F90's ice_ocean_boundary_type with its
  flux sign conventions;
* NUOPC cap — config_src/drivers/nuopc_cap/mom_cap.F90 with its standard
  field names (mean_zonal_moment_flx, mean_sensi_heat_flx, ...).

The exchange lives in two dataclass-free NamedTuples:

* ``IceOceanBoundary`` carries what an atmosphere/ice component sends
  DOWN (stresses, heat-flux components, water fluxes, pressure), in the
  FMS sign conventions (t_flux/q_flux/lw positive = ocean LOSES heat,
  sw positive = ocean gains);
* ``OceanSurface`` (the export) is produced by the existing
  extract_surface_state.

``convert_iob_to_forcing`` folds the components into the model's net
heat + virtual salt flux, exactly the role of convert_IOB_to_fluxes
(MOM_surface_forcing_gfdl.F90:420).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.core.dynamics_split_rk2 import MechForcing
from mom6_tpu.core.mom import Forcing
from mom6_tpu.drivers.ocean_model import OceanModel
from mom6_tpu.physics.vertical.diabatic import BuoyancyForcing

__all__ = ["IceOceanBoundary", "convert_iob_to_forcing",
           "ocean_model_init", "update_ocean_model", "ocean_model_end",
           "export_state_nuopc", "import_state_nuopc"]

_LATENT_VAP = 2.5e6      # latent heat of vaporization [J kg-1]
_LATENT_FUS = 3.34e5     # latent heat of fusion [J kg-1]


class IceOceanBoundary(NamedTuple):
    """Downward exchange fields (ice_ocean_boundary_type role —
    FMS cap MOM_surface_forcing_gfdl.F90 and the wider NUOPC set of
    mom_surface_forcing_nuopc.F90:1 ice_ocean_boundary_type); all
    (ny, nx) or None.  Sign conventions follow the FMS cap: u/v_flux are
    the stresses on the ocean [Pa]; t_flux (sensible), q_flux
    (evaporation [kg m-2 s-1]) and lw_flux positive remove heat from the
    ocean; sw_flux positive adds heat; lprec/fprec/runoff add fresh
    water [kg m-2 s-1]; p is sea-level pressure [Pa]."""
    u_flux: Optional[jnp.ndarray] = None
    v_flux: Optional[jnp.ndarray] = None
    t_flux: Optional[jnp.ndarray] = None
    q_flux: Optional[jnp.ndarray] = None
    lw_flux: Optional[jnp.ndarray] = None
    sw_flux: Optional[jnp.ndarray] = None
    lprec: Optional[jnp.ndarray] = None
    fprec: Optional[jnp.ndarray] = None
    runoff: Optional[jnp.ndarray] = None
    calving: Optional[jnp.ndarray] = None
    p: Optional[jnp.ndarray] = None
    # -- NUOPC-cap extensions (mom_surface_forcing_nuopc.F90) --------
    # frozen runoff [kg m-2 s-1]; melts on arrival (latent heat sink)
    frunoff: Optional[jnp.ndarray] = None
    # direct salt flux from sea ice [kg salt m-2 s-1], + into ocean
    salt_flux: Optional[jnp.ndarray] = None
    # sea-ice/snow melt: heat used [W m-2, + removes ocean heat] and
    # melt water [kg m-2 s-1, + into ocean]
    seaice_melt_heat: Optional[jnp.ndarray] = None
    seaice_melt: Optional[jnp.ndarray] = None
    # 4-band shortwave [W m-2, + into ocean] (vis/nir x dir/dif)
    sw_vis_dir: Optional[jnp.ndarray] = None
    sw_vis_dif: Optional[jnp.ndarray] = None
    sw_nir_dir: Optional[jnp.ndarray] = None
    sw_nir_dif: Optional[jnp.ndarray] = None
    # heat content of the mass fluxes [W m-2, + into ocean]
    hrain: Optional[jnp.ndarray] = None
    hsnow: Optional[jnp.ndarray] = None
    hevap: Optional[jnp.ndarray] = None
    hcond: Optional[jnp.ndarray] = None
    hrofl: Optional[jnp.ndarray] = None
    hrofi: Optional[jnp.ndarray] = None
    # fractional ice area [1] and 10-m wind speed squared [m2 s-2]
    ice_fraction: Optional[jnp.ndarray] = None
    u10_sqr: Optional[jnp.ndarray] = None
    # mass of overlying ice [kg m-2] (adds to surface pressure) and
    # sea-ice rigidity (divergence-damping coefficient) [m3 s-1]
    mi: Optional[jnp.ndarray] = None
    ice_rigidity: Optional[jnp.ndarray] = None
    # wave-model imports: Langmuir enhancement multiplier [1] and
    # partitioned (nb, ny, nx) surface Stokes drift [m s-1]
    lamult: Optional[jnp.ndarray] = None
    ustkb: Optional[jnp.ndarray] = None
    vstkb: Optional[jnp.ndarray] = None
    # BGC deposition/coupling fields (nhx_dep/noy_dep/atm_co2_prog of
    # the NUOPC IOB): nitrogen deposition [mmol N m-2 s-1 after the
    # cap's unit fold] and atmospheric CO2 [ppm]
    ndep: Optional[jnp.ndarray] = None
    atm_co2: Optional[jnp.ndarray] = None


def convert_iob_to_forcing(iob: IceOceanBoundary, sss, GV,
                           penetrating_sw: bool = True) -> Forcing:
    """Fold the IOB components into the model Forcing
    (convert_IOB_to_fluxes, MOM_surface_forcing_gfdl.F90:420).

    Net non-penetrating heat [W m-2, +down] =
        - t_flux - lw_flux - Lv q_flux - Lf (fprec + calving + frunoff)
        - seaice_melt_heat + sum(heat contents of the mass fluxes);
    shortwave stays separate when ``penetrating_sw`` (the four NUOPC
    vis/nir x dir/dif bands sum into it).  Fresh water converts to a
    virtual salt flux -S_sfc * Fw / rho0, plus the ice's direct salt
    flux [ppt m s-1]."""
    z = lambda a: a if a is not None else 0.0
    heat = -(z(iob.t_flux) + z(iob.lw_flux)
             + _LATENT_VAP * z(iob.q_flux)
             + _LATENT_FUS * (z(iob.fprec) + z(iob.calving)
                              + z(iob.frunoff))
             + z(iob.seaice_melt_heat))
    heat = heat + (z(iob.hrain) + z(iob.hsnow) + z(iob.hevap)
                   + z(iob.hcond) + z(iob.hrofl) + z(iob.hrofi))
    sw = z(iob.sw_flux) + (z(iob.sw_vis_dir) + z(iob.sw_vis_dif)
                           + z(iob.sw_nir_dir) + z(iob.sw_nir_dif))
    if not penetrating_sw:
        heat = heat + sw
        sw = 0.0
    # fresh water mass flux into the ocean [kg m-2 s-1]
    fw = (z(iob.lprec) + z(iob.fprec) + z(iob.runoff) + z(iob.calving)
          + z(iob.frunoff) + z(iob.seaice_melt) - z(iob.q_flux))
    salt_flux = -sss * fw / GV.rho0          # virtual salt [ppt m s-1]
    brine = None
    if iob.salt_flux is not None:            # ice brine rejection/uptake
        brine = 1e3 * iob.salt_flux / GV.rho0
        salt_flux = salt_flux + brine
    heat = heat if not isinstance(heat, float) else None
    u10 = jnp.sqrt(iob.u10_sqr) if iob.u10_sqr is not None else None
    p_surf = iob.p
    if iob.mi is not None:                   # weight of overlying ice
        p_surf = z(p_surf) + 9.8 * iob.mi
    tr_fluxes = None
    if iob.ndep is not None or iob.atm_co2 is not None:
        tr_fluxes = {}
        if iob.ndep is not None:
            tr_fluxes["ndep"] = iob.ndep
        if iob.atm_co2 is not None:
            tr_fluxes["atm_co2"] = iob.atm_co2
    return Forcing(
        mech=MechForcing(taux=iob.u_flux, tauy=iob.v_flux,
                         p_surf=p_surf, u10=u10, lamult=iob.lamult,
                         pstokes_x=iob.ustkb, pstokes_y=iob.vstkb,
                         rigidity_ice=iob.ice_rigidity),
        tr_fluxes=tr_fluxes,
        buoy=BuoyancyForcing(
            heat_flux=heat,
            sw_flux=sw if not isinstance(sw, float) else None,
            salt_flux=salt_flux if not isinstance(salt_flux, float)
            else None,
            salt_left_behind=brine))


def ocean_model_init(rundir: str) -> OceanModel:
    """Build a coupled ocean component from a MOM_input run directory
    (ocean_model_init role)."""
    import os

    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    paths = [os.path.join(rundir, "MOM_input")]
    ov = os.path.join(rundir, "MOM_override")
    if os.path.exists(ov):
        paths.append(ov)
    ms = build_model_from_params(ParamFile(paths))
    return OceanModel(ms.grid, ms.vgrid, ms.state, ms.params)


def update_ocean_model(model: OceanModel, iob: IceOceanBoundary,
                       n_cycles: int = 1):
    """Advance the ocean under an IOB (update_ocean_model role,
    FMS_cap/ocean_model_MOM.F90:440).  Returns the new SurfaceState."""
    from mom6_tpu.diagnostics.diagnostics import extract_surface_state
    sfc = extract_surface_state(model.state, model.grid, model.vgrid)
    forcing = convert_iob_to_forcing(iob, sfc.sss, model.vgrid)
    for _ in range(n_cycles):
        model.state = model._step(model.state, forcing)
        model.time_seconds += model.coupling_dt
    return extract_surface_state(model.state, model.grid, model.vgrid)


def ocean_model_end(model: OceanModel, restart_path: Optional[str] = None):
    """Finalize: optionally write a restart (ocean_model_end role)."""
    if restart_path is not None:
        from mom6_tpu.framework.restart import RestartRegistry
        reg = RestartRegistry()
        names = [n for n in ("h", "u", "v", "T", "S")
                 if getattr(model.state, n) is not None]
        reg.register_state_attrs(names)
        reg.save_restart(restart_path, model.state,
                         time_seconds=model.time_seconds)
    return model.state


# -- NUOPC-style named import/export ------------------------------------------

_NUOPC_IMPORTS = {
    "mean_zonal_moment_flx": "u_flux",
    "mean_merid_moment_flx": "v_flux",
    "mean_sensi_heat_flx": "t_flux",
    "mean_evap_rate": "q_flux",
    "mean_net_lw_flx": "lw_flux",
    "mean_net_sw_flx": "sw_flux",
    "mean_prec_rate": "lprec",
    "mean_fprec_rate": "fprec",
    "mean_runoff_rate": "runoff",
    "inst_pres_height_surface": "p",
}


def import_state_nuopc(fields: Dict[str, jnp.ndarray]) -> IceOceanBoundary:
    """Map NUOPC standard field names (mom_cap.F90 advertised imports)
    onto the IOB; unknown names raise so couplers fail loudly."""
    kwargs = {}
    for name, arr in fields.items():
        if name not in _NUOPC_IMPORTS:
            raise KeyError(f"unknown NUOPC import field {name!r}; "
                           f"known: {sorted(_NUOPC_IMPORTS)}")
        kwargs[_NUOPC_IMPORTS[name]] = arr
    return IceOceanBoundary(**kwargs)


def export_state_nuopc(model: OceanModel) -> Dict[str, jnp.ndarray]:
    """NUOPC-named ocean exports (mom_cap.F90 advertised exports)."""
    from mom6_tpu.diagnostics.diagnostics import extract_surface_state
    sfc = extract_surface_state(model.state, model.grid, model.vgrid)
    return {
        "sea_surface_temperature": sfc.sst,
        "s_surf": sfc.sss,
        "ocn_current_zonal": sfc.u_sfc,
        "ocn_current_merid": sfc.v_sfc,
        "sea_lev": sfc.ssh,
    }


def update_components_concurrent(ocean_step, other_steps):
    """Concurrent component stepping — the coupler-concurrency role of
    the reference's coupled driver (components on disjoint PE lists
    advancing simultaneously; here, disjoint device work advancing
    under JAX's asynchronous dispatch).

    ``ocean_step``: a zero-arg callable dispatching the jitted ocean
    segment; ``other_steps``: callables dispatching the other
    components' device work (ice / atmos analogues).  ALL components
    are dispatched before ANY result is awaited, so XLA overlaps their
    execution on the device(s); the returned list contains the
    completed outputs in order (ocean first).  With components placed
    on disjoint meshes (e.g. via ensemble_mesh-style submeshes) this is
    true multi-chip concurrency; on one chip it overlaps with host work
    and transfers."""
    import jax
    results = [ocean_step()] + [f() for f in other_steps]
    for r in results:
        jax.block_until_ready(r)
    return results
