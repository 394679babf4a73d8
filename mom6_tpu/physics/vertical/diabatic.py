"""Diabatic (column physics) driver — ALE mode.

Analogue of MOM6's diabatic_ALE (reference:
src/parameterizations/vertical/MOM_diabatic_driver.F90:1243, call sequence
:1330-1870).  Sequence:

  geothermal heating (geothermal_in_place role)
  -> set_diffusivity (background/Bryan-Lewis/tidal + BBL drag
     + shear/KPP contributions via kd_extra + convection)
  -> double diffusion (separate T/S interface diffusivities, CVMix_ddiff)
  -> penetrating shortwave absorption (set_pen_shortwave + opacity)
  -> applyBoundaryFluxesInOut (surface heat/salt fluxes into the top layer)
  -> implicit vertical diffusion of T/S (+ registered tracers)
  -> frazil formation (diabatic_aux make_frazil role)

Sponges and ODA increments are applied by the orchestrator after this
(they need the full state), matching the reference's ordering.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.physics.vertical.set_diffusivity import (DiffusivityParams,
                                                       set_diffusivity)
from mom6_tpu.tracers.vert_diff import tracer_vertdiff

__all__ = ["BuoyancyForcing", "DiabaticParams", "diabatic_ale",
           "diabatic_layered"]


class BuoyancyForcing(NamedTuple):
    """Surface buoyancy forcing (the ``forcing`` type of
    MOM_forcing_type.F90:262-302, thermodynamic part)."""
    heat_flux: Optional[jnp.ndarray] = None   # net surface heat [W m-2], +down
    salt_flux: Optional[jnp.ndarray] = None   # salt flux [ppt m s-1]
    sw_flux: Optional[jnp.ndarray] = None     # penetrating shortwave [W m-2]
    # net fresh water (P - E + R) [m s-1]; dilutes top-layer salinity
    fw_flux: Optional[jnp.ndarray] = None
    # restoring surface boundary conditions (buoyancy_forcing_linear +
    # RESTOREBUOY, MOM_surface_forcing.F90): piston velocity [m s-1]
    # relaxing the top layer toward the target fields
    t_restore: Optional[jnp.ndarray] = None   # target SST [degC]
    s_restore: Optional[jnp.ndarray] = None   # target SSS [ppt]
    restore_rate: float = 0.0                 # FLUXCONST [m s-1]
    # brine rejected by freezing sea ice [ppt m s-1, + into ocean]
    # (fluxes%salt_left_behind, MOM_forcing_type.F90:163); under
    # DO_BRINE_PLUME a fraction is injected at depth instead of into
    # the top layer
    salt_left_behind: Optional[jnp.ndarray] = None


class DiabaticParams(NamedTuple):
    diff: DiffusivityParams = DiffusivityParams()
    # MOM6 default C_P (MOM_input default 3991.86795711963 J kg-1 K-1)
    cp: float = 3991.87
    boundary_layer_scheme: str = "NONE"   # NONE | KPP | EPBL | BULKML
    use_shear_mixing: bool = False
    shear_scheme: str = "LMD94"
    # column-physics options (all None/False = round-1 behavior)
    geothermal: Optional["GeothermalParams"] = None
    opacity: Optional["OpacityParams"] = None     # penetrating SW absorption
    convection: Optional["ConvectionParams"] = None  # CVMix_conv analogue
    ddiff: Optional["DDiffParams"] = None         # CVMix double diffusion
    frazil: bool = False                          # make_frazil role
    tfreeze_form: str = "LINEAR"                  # TFREEZE_FORM dispatch
    # layered-mode (BULKML) options
    bulkml: Optional["BulkMLParams"] = None
    entrain: Optional["EntrainDiffusiveParams"] = None
    # brine plume (Nguyen et al. 2009; applyBoundaryFluxesInOut,
    # MOM_diabatic_aux.F90:990-1040): mix BRINE_PLUME_FRACTION of the
    # rejected brine over the mixed layer with a z^n profile
    do_brine_plume: bool = False              # DO_BRINE_PLUME
    brine_plume_n: int = 5                    # BRINE_PLUME_EXPONENT
    brine_plume_frac: float = 1.0             # BRINE_PLUME_FRACTION


def _make_frazil(T, S, h, GV, cp, tfreeze_form: str = "LINEAR"):
    """Frazil-ice formation (reference: MOM_diabatic_aux.F90 make_frazil):
    where a layer is below its local freezing point, reset it to freezing
    and account the heat deficit as a frazil heat flux [J m-2] that an ice
    model would extract.  Returns (T_new, frazil_heat)."""
    from mom6_tpu.eos.tfreeze import get_tfreeze
    z_mid = jnp.cumsum(h, axis=0) - 0.5 * h
    p_mid = GV.rho0 * GV.g_earth * z_mid
    t_fr = get_tfreeze(tfreeze_form)(S, p_mid)
    deficit = jnp.maximum(t_fr - T, 0.0)           # [degC]
    frazil = jnp.sum(deficit * h, axis=0) * GV.rho0 * cp   # [J m-2]
    return jnp.maximum(T, t_fr), frazil, deficit * h


def diabatic_ale(T, S, h, forcing: BuoyancyForcing, dt, G, GV,
                 p: DiabaticParams, kd_extra: Optional[jnp.ndarray] = None,
                 extra_tracers: Optional[jnp.ndarray] = None, eos=None,
                 u=None, v=None, mld=None, collect: Optional[dict] = None):
    """One thermodynamic step of column physics.

    ``mld``: (ny, nx) boundary-layer depth [m] from the BL scheme,
    required by the brine plume's mixing depth.

    ``collect``: optional dict into which the boundary-forcing pieces of
    the solve are recorded for the tendency diagnostics
    (register_tracer_diagnostics tier, MOM_tracer_registry.F90:283-651):
    ``t_flux``/``s_flux`` (net surface deposits [conc m s-1] incl.
    restoring + non-penetrating SW + virtual salt flux + brine-plume
    surface loss), ``sw_heat3d``/``geo_heat3d`` (penetrating-SW / geothermal
    in-layer heating [degC m s-1] per layer), ``brine_dS3d``
    [ppt m s-1], and ``frazil3d`` [degC m s-1].

    Returns (T_new, S_new, kd, extra_tracers_new, frazil)."""
    # --- geothermal heating (geothermal_in_place,
    # MOM_geothermal.F90 via opacity.geothermal_heating) -------------------
    if p.geothermal is not None:
        from mom6_tpu.physics.vertical.opacity import geothermal_heating
        geo = geothermal_heating(h, GV, p.geothermal, cp=p.cp) \
            * G.mask2dT[None]
        T = T + dt * geo
        if collect is not None:
            collect["geo_heat3d"] = geo * h

    # --- convective instability -> large interface Kd (CVMix_conv) --------
    if p.convection is not None and eos is not None:
        from mom6_tpu.physics.vertical.convection import convective_kd
        kd_conv = convective_kd(h, T, S, G, GV, eos, p.convection)
        kd_extra = kd_conv if kd_extra is None else kd_extra + kd_conv

    kd = set_diffusivity(h, G, GV, p.diff, kd_extra=kd_extra,
                         T=T, S=S, eos=eos, u=u, v=v)

    # --- double diffusion: separate T and S interface diffusivities -------
    kd_T = kd_S = None
    if p.ddiff is not None and eos is not None:
        from mom6_tpu.physics.vertical.convection import double_diffusion_kd
        dd_T, dd_S = double_diffusion_kd(h, T, S, G, GV, eos, p.ddiff)
        kd_T, kd_S = kd + dd_T, kd + dd_S

    # --- penetrating shortwave (set_pen_shortwave + opacity) --------------
    sw_top = None
    if forcing.sw_flux is not None:
        if p.opacity is not None:
            from mom6_tpu.physics.vertical.opacity import sw_heating
            swh = sw_heating(h, forcing.sw_flux, GV, p.opacity,
                             cp=p.cp) * G.mask2dT[None]
            T = T + dt * swh
            if collect is not None:
                collect["sw_heat3d"] = swh * h
        else:
            sw_top = forcing.sw_flux / (GV.rho0 * p.cp)

    # surface fluxes -> top-layer tendencies, expressed as tracer fluxes
    # [conc m s-1] for the implicit solve (applyBoundaryFluxesInOut role)
    t_flux = None
    if forcing.heat_flux is not None:
        t_flux = forcing.heat_flux / (GV.rho0 * p.cp)
    if sw_top is not None:
        t_flux = sw_top if t_flux is None else t_flux + sw_top
    s_flux = forcing.salt_flux
    # presence of a restoring target gates the branch (structural, so the
    # forcing pytree can be a traced jit argument)
    if forcing.t_restore is not None or forcing.s_restore is not None:
        # restoring surface fluxes (RESTOREBUOY): piston * (target - SST)
        if forcing.t_restore is not None:
            rt = forcing.restore_rate * (forcing.t_restore - T[0])
            t_flux = rt if t_flux is None else t_flux + rt
        if forcing.s_restore is not None:
            rs = forcing.restore_rate * (forcing.s_restore - S[0])
            s_flux = rs if s_flux is None else s_flux + rs
    if forcing.fw_flux is not None:
        # fresh water dilutes the top layer: virtual salt flux -S0 * fw
        vsf = -S[0] * forcing.fw_flux
        s_flux = vsf if s_flux is None else s_flux + vsf

    # --- brine plume (Nguyen et al. 2009; MOM_diabatic_aux.F90:990-1040):
    # move BRINE_PLUME_FRACTION of the rejected brine out of the top
    # layer and inject it over the mixing depth D with the normalized
    # profile A z^n, A = (n+1)/D^(n+1); layer k's share is the
    # sequentially clipped A dK^n h_k, the remainder landing in the
    # first layer below D.  Net salt exactly conserved.
    brine_dS = None
    if p.do_brine_plume and forcing.salt_left_behind is not None:
        if mld is None:
            raise ValueError("DO_BRINE_PLUME requires a boundary-layer "
                             "scheme providing the mixed-layer depth")
        plume = p.brine_plume_frac * forcing.salt_left_behind * G.mask2dT
        min_fd = 1e-3                       # MINIMUM_FORCING_DEPTH floor
        total_h = jnp.sum(h, axis=0)
        D = jnp.minimum(jnp.maximum(mld - min_fd, min_fd),
                        jnp.maximum(total_h, GV.angstrom)) + 1e-30
        n_exp = p.brine_plume_n
        A = (n_exp + 1) / D ** (n_exp + 1)
        dK = jnp.cumsum(h, axis=0) - 0.5 * h       # layer-center depths
        raw = jnp.where(dK <= D[None], A[None] * dK ** n_exp * h, 0.0)
        cum = jnp.minimum(jnp.cumsum(raw, axis=0), 1.0)
        w = jnp.diff(jnp.concatenate([jnp.zeros_like(cum[:1]), cum],
                                     axis=0), axis=0)
        # remainder -> first layer below D (or the bottom layer)
        below = dK > D[None]
        idx = jnp.where(jnp.any(below, axis=0),
                        jnp.argmax(below, axis=0), h.shape[0] - 1)
        onehot = jax.nn.one_hot(idx, h.shape[0], axis=0, dtype=h.dtype)
        w = w + (1.0 - jnp.sum(w, axis=0)) * onehot
        # surface loses the plume portion; layers gain their shares
        s_flux = -plume if s_flux is None else s_flux - plume
        brine_dS = plume[None] * w * dt \
            / jnp.maximum(h, GV.angstrom) * G.mask2dT[None]

    # land columns hold Angstrom-thin layers: any surface flux divided by
    # their thickness produces astronomical tracer values whose EOS
    # evaluation overflows to inf and then poisons wet neighbors through
    # masked stencils (NaN * 0 = NaN) — mask every surface flux
    if t_flux is not None:
        t_flux = t_flux * G.mask2dT
    if s_flux is not None:
        s_flux = s_flux * G.mask2dT
    if collect is not None:
        collect["t_flux"] = t_flux
        collect["s_flux"] = s_flux
        if brine_dS is not None:
            collect["brine_dS3d"] = brine_dS * h / dt
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
    if kd_T is not None:
        # per-tracer diffusivities: T and S get their double-diffusion
        # variants, passive tracers diffuse with the S (mass) diffusivity
        kd_stack = jnp.stack([kd_T, kd_S]
                             + [kd_S] * (arr.shape[0] - 2))
        out = tracer_vertdiff(arr, h, kd_stack, dt, sfc_flux=flux_arr)
    else:
        out = tracer_vertdiff(arr, h, kd, dt, sfc_flux=flux_arr)
    T_new, S_new = out[0], out[1]
    if brine_dS is not None:
        S_new = S_new + brine_dS
    extra_new = out[n_state:] if extra_tracers is not None else None

    frazil = None
    if p.frazil:
        T_new, frazil, fz3d = _make_frazil(T_new, S_new, h, GV, p.cp,
                                           p.tfreeze_form)
        if collect is not None:
            collect["frazil3d"] = fz3d / dt

    return T_new, S_new, kd, extra_new, frazil


def diabatic_layered(T, S, h, u, v, forcing: BuoyancyForcing, taux, tauy,
                     dt, G, GV, p: DiabaticParams, eos):
    """Legacy (non-ALE) diabatic sequence: bulk mixed layer + diffusive
    entrainment between isopycnal layers (the layered branch of
    MOM_diabatic_driver.F90:diabatic, calling bulkmixedlayer then
    entrainment_diffusive).  Velocities are conservatively remapped to
    the post-entrainment grid (the ea/eb velocity update of
    MOM_vert_friction.F90:vertvisc_remnant role).

    Returns (h_new, T_new, S_new, u_new, v_new, h_ml)."""
    from mom6_tpu.ale.remapping import remap_column
    from mom6_tpu.framework.stencil import ip1, jp1
    from mom6_tpu.physics.vertical.bulk_mixed_layer import (BulkMLParams,
                                                            bulkmixedlayer)
    from mom6_tpu.physics.vertical.entrain_diffusive import (
        EntrainDiffusiveParams, entrainment_diffusive)

    bml = p.bulkml if p.bulkml is not None else BulkMLParams()
    ent = p.entrain if p.entrain is not None else EntrainDiffusiveParams()

    # surface fluxes into the top layer (applyBoundaryFluxesInOut role)
    q = forcing.heat_flux if forcing.heat_flux is not None else \
        jnp.zeros_like(G.mask2dT)
    if forcing.sw_flux is not None:
        q = q + forcing.sw_flux
    dT0 = q * dt / (GV.rho0 * p.cp * jnp.maximum(h[0], 1e-3))
    T = T.at[0].add(dT0 * G.mask2dT)
    if forcing.salt_flux is not None:
        S = S.at[0].add(forcing.salt_flux * dt
                        / jnp.maximum(h[0], 1e-3) * G.mask2dT)

    # bulk mixed layer
    tau_mag = jnp.sqrt(taux ** 2 + tauy ** 2)
    ustar = jnp.sqrt(tau_mag / GV.rho0)
    drho_dT, _ = eos.density_derivs(T[0], S[0], jnp.zeros((), T.dtype))
    # buoyancy LOSS [m2 s-3]: positive when cooling (q < 0, drho_dT < 0)
    buoy_loss = (bml.g_accel * drho_dT * q) / (GV.rho0 ** 2 * p.cp)
    h_old = h
    h, T, S, hml = bulkmixedlayer(h, u, v, T, S, G, GV, eos, dt, ustar,
                                  buoy_loss, bml)

    # interior diapycnal mixing as entrainment
    kd = set_diffusivity(h, G, GV, p.diff, T=T, S=S, eos=eos)
    h, T, S, _, _ = entrainment_diffusive(h, T, S, G, GV, kd, dt, ent)

    # velocity remap to the new grid (momentum-conserving)
    h_u_old = 0.5 * (h_old + ip1(h_old))
    h_u_new = 0.5 * (h + ip1(h))
    u_new = remap_column(u, h_u_old, h_u_new) * G.mask2dCu
    h_v_old = 0.5 * (h_old + jp1(h_old))
    h_v_new = 0.5 * (h + jp1(h))
    v_new = remap_column(v, h_v_old, h_v_new) * G.mask2dCv
    return h, T, S, u_new, v_new, hml
