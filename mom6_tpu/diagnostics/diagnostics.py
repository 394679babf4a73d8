"""Derived diagnostics.

Analogue of src/diagnostics/MOM_diagnostics.F90 (KE/PE budget pieces,
speed, thicknesses) and src/core/MOM.F90 extract_surface_state :3954
(the coupler-facing surface fields), plus area-weighted spatial means
(src/diagnostics/MOM_spatial_means.F90, with reproducing sums)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mom6_tpu.framework.repro_sum import reproducing_sum
from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["SurfaceState", "extract_surface_state", "kinetic_energy_3d",
           "column_speed", "global_area_mean", "zonal_mean",
           "meridional_mean", "global_layer_mean", "global_volume_mean",
           "global_mass_integral", "ke_budget"]


class SurfaceState(NamedTuple):
    """The fields a coupler consumes (MOM6 ``surface`` type,
    MOM_variables.F90; filled by extract_surface_state,
    MOM.F90:3954-4354)."""
    sst: jnp.ndarray          # [degC], averaged over HMIX_SFC
    sss: jnp.ndarray          # [ppt]
    ssh: jnp.ndarray          # [m]
    u_sfc: jnp.ndarray        # surface zonal velocity at h points [m s-1]
    v_sfc: jnp.ndarray        # (averaged over HMIX_UV_SFC)
    speed: jnp.ndarray
    mld: jnp.ndarray = None
    # heat available to melt ice: -rho0 cp Int_0^HMIX (T - T_freeze) dz
    # [J m-2] <= 0 (sfc_state%melt_potential, MOM.F90:4090-4120)
    melt_potential: jnp.ndarray = None
    ocean_mass: jnp.ndarray = None   # column mass [kg m-2]
    ocean_heat: jnp.ndarray = None   # column heat  [degC kg m-2]
    ocean_salt: jnp.ndarray = None   # column salt  [kgSalt m-2]
    frazil: jnp.ndarray = None       # accumulated frazil heat [J m-2]


def _top_average(w3, h, depth: float):
    """Thickness-weighted average of a 3-D field over the top ``depth``
    metres of actual water (the depth_ml loops of
    extract_surface_state)."""
    z_top = jnp.cumsum(h, axis=0) - h
    ov = jnp.minimum(z_top + h, depth) - jnp.minimum(z_top, depth)
    return jnp.sum(w3 * ov, axis=0) / jnp.maximum(jnp.sum(ov, axis=0),
                                                  1e-6)


def extract_surface_state(state, G, GV, *, hmix_sfc: float = 0.0,
                          hmix_uv_sfc: float = 0.0, tfreeze_fn=None,
                          cp: float = 3991.87, frazil=None, eos=None
                          ) -> SurfaceState:
    """Build the coupler surface state (extract_surface_state,
    MOM.F90:3954-4354): T/S averaged over HMIX_SFC (0 = top layer),
    velocities over HMIX_UV_SFC, melt potential over the same depth
    from the freezing temperature, and the column mass/heat/salt
    contents the coupler reports.  In non-Boussinesq mode (``eos``
    given and GV.boussinesq False) the reported SSH is the GEOMETRIC
    steric height via specific volume (find_eta nonBouss branch), not
    the column-mass measure."""
    h = state.h
    if (not getattr(GV, "boussinesq", True)) and eos is not None \
            and state.T is not None:
        from mom6_tpu.core.pressure_force import find_eta_nonbouss
        eta = find_eta_nonbouss(h, state.T, state.S, G, GV, eos)
    else:
        eta = jnp.sum(h, axis=0) - G.bathyT
    if hmix_uv_sfc > 0.0:
        h_u = 0.5 * (h + jnp.roll(h, -1, axis=-1))
        h_v = 0.5 * (h + jnp.roll(h, -1, axis=-2))
        u_f = _top_average(state.u, h_u, hmix_uv_sfc)
        v_f = _top_average(state.v, h_v, hmix_uv_sfc)
    else:
        u_f, v_f = state.u[0], state.v[0]
    u_c = 0.5 * (u_f + im1(u_f))
    v_c = 0.5 * (v_f + jm1(v_f))
    if state.T is not None and hmix_sfc > 0.0:
        sst = _top_average(state.T, h, hmix_sfc)
        sss = _top_average(state.S, h, hmix_sfc)
    else:
        sst = state.T[0] if state.T is not None else jnp.zeros_like(eta)
        sss = state.S[0] if state.S is not None else jnp.zeros_like(eta)
    melt_pot = ocean_heat = ocean_salt = None
    ocean_mass = GV.rho0 * jnp.sum(h, axis=0) * G.mask2dT
    if state.T is not None:
        ocean_heat = GV.rho0 * jnp.sum(h * state.T, axis=0) * G.mask2dT
        ocean_salt = GV.rho0 * 1e-3 * jnp.sum(h * state.S, axis=0) \
            * G.mask2dT
        # melt potential over the HMIX_SFC depth (default: top 1 m if
        # HMIX_SFC is unset, mirroring the coupled default depth_ml)
        depth_ml = hmix_sfc if hmix_sfc > 0.0 else 1.0
        if tfreeze_fn is not None:
            t_fr = tfreeze_fn(sss, jnp.zeros_like(sss))
        else:
            t_fr = -0.054 * sss      # linear TFREEZE_S0_P default
        z_top = jnp.cumsum(h, axis=0) - h
        ov = jnp.minimum(z_top + h, depth_ml) - jnp.minimum(z_top,
                                                            depth_ml)
        delT = jnp.sum((state.T - t_fr[None]) * ov, axis=0)
        melt_pot = -GV.rho0 * cp * jnp.maximum(delT, 0.0) * G.mask2dT
    return SurfaceState(
        sst=sst * G.mask2dT, sss=sss * G.mask2dT, ssh=eta * G.mask2dT,
        u_sfc=u_c * G.mask2dT, v_sfc=v_c * G.mask2dT,
        speed=jnp.sqrt(u_c * u_c + v_c * v_c) * G.mask2dT,
        melt_potential=melt_pot, ocean_mass=ocean_mass,
        ocean_heat=ocean_heat, ocean_salt=ocean_salt, frazil=frazil)


def kinetic_energy_3d(state, G):
    """KE per unit mass at h points per layer [m2 s-2] (MOM_diagnostics'
    'KE' field)."""
    u2 = 0.5 * (state.u ** 2 + im1(state.u) ** 2)
    v2 = 0.5 * (state.v ** 2 + jm1(state.v) ** 2)
    return 0.5 * (u2 + v2) * G.mask2dT[None]


def ke_budget(state_old, state_new, accel, G, dt: float):
    """Term-by-term kinetic-energy budget [W m-2 per layer / rho0],
    i.e. h * u·accel averaged to h points (the KE_CorAdv / KE_PG /
    KE_horvisc / KE_visc / KE_BT diagnostics of MOM_diagnostics.F90:
    calculate_energy_diagnostics), plus the actual dKE/dt whose
    difference from the sum of terms is the discretization residual
    (truncation + barotropic filter replacement).

    ``accel`` is the AccelDiag returned by
    ``step_dynamics_split_rk2(..., return_accel=True)``; the budget uses
    the *new* velocities (as the reference does for the corrector-stage
    accelerations)."""
    h, u, v = state_new.h, state_new.u, state_new.v
    h_u = 0.5 * (h + ip1(h)) * G.mask2dCu
    h_v = 0.5 * (h + jp1(h, "h" if getattr(G, "fold_north", False)
                         else None)) * G.mask2dCv

    def t2h(fu, fv):
        """u·f at faces, thickness-weighted, averaged to h points."""
        ku = h_u * u * fu
        kv = h_v * v * fv
        return (0.5 * (ku + im1(ku)) + 0.5 * (kv + jm1(kv))) \
            * G.mask2dT[None]

    terms = {
        "KE_CorAdv": t2h(accel.CAu, accel.CAv),
        "KE_PG": t2h(accel.PFu, accel.PFv),
        "KE_horvisc": t2h(accel.diffu, accel.diffv),
        "KE_visc": t2h(accel.du_dt_visc, accel.dv_dt_visc),
        "KE_BT": t2h(accel.u_bt_accel, accel.v_bt_accel),
    }
    ke_new = state_new.h * kinetic_energy_3d(state_new, G)
    ke_old = state_old.h * kinetic_energy_3d(state_old, G)
    terms["dKE_dt"] = (ke_new - ke_old) / dt
    terms["KE_residual"] = terms["dKE_dt"] - sum(
        terms[k] for k in ("KE_CorAdv", "KE_PG", "KE_horvisc",
                           "KE_visc", "KE_BT"))
    return terms


def column_speed(state, G):
    """Depth-mean current speed [m s-1]."""
    h = state.h
    col = jnp.maximum(jnp.sum(h, axis=0), 1e-10)
    u_c = 0.5 * (state.u + im1(state.u))
    v_c = 0.5 * (state.v + jm1(state.v))
    ub = jnp.sum(h * u_c, axis=0) / col
    vb = jnp.sum(h * v_c, axis=0) / col
    return jnp.sqrt(ub * ub + vb * vb) * G.mask2dT


def global_area_mean(field, G, h=None) -> float:
    """Order-invariant area-weighted (optionally thickness-weighted)
    global mean (MOM_spatial_means.F90 global_area_mean)."""
    area = np.asarray(G.areaT, np.float64) * np.asarray(G.mask2dT, np.float64)
    f = np.asarray(field, np.float64)
    if h is not None:
        w = np.asarray(h, np.float64) * area[None]
        return reproducing_sum(f * w) / max(reproducing_sum(w), 1e-300)
    return reproducing_sum(f * area) / max(reproducing_sum(area), 1e-300)


def zonal_mean(field, G):
    """Wet-area-weighted zonal (x) mean, (ny,) or (nz, ny)."""
    area = np.asarray(G.areaT, np.float64) * np.asarray(G.mask2dT, np.float64)
    f = np.asarray(field, np.float64)
    num = (f * area).sum(axis=-1)
    den = np.maximum(area.sum(axis=-1), 1e-300)
    return num / den


def meridional_mean(field, G):
    """Wet-area-weighted meridional (y) mean, (nx,) or (nz, nx)
    (MOM_spatial_means.F90 global_j_mean role)."""
    area = np.asarray(G.areaT, np.float64) * np.asarray(G.mask2dT,
                                                       np.float64)
    f = np.asarray(field, np.float64)
    num = (f * area).sum(axis=-2)
    den = np.maximum(area.sum(axis=-2), 1e-300)
    return num / den


def global_layer_mean(field, h, G):
    """Per-layer mass-weighted global mean, (nz,)
    (MOM_spatial_means.F90 global_layer_mean): order-invariant via the
    reproducing sum per layer."""
    area = np.asarray(G.areaT, np.float64) * np.asarray(G.mask2dT,
                                                       np.float64)
    f = np.asarray(field, np.float64)
    w = np.asarray(h, np.float64) * area[None]
    return np.array([reproducing_sum(f[k] * w[k])
                     / max(reproducing_sum(w[k]), 1e-300)
                     for k in range(f.shape[0])])


def global_volume_mean(field, h, G) -> float:
    """Volume(mass)-weighted global mean over the whole ocean
    (MOM_spatial_means.F90 global_volume_mean)."""
    return global_area_mean(field, G, h=h)


def global_mass_integral(h, G, field=None, rho0: float = 1035.0) -> float:
    """Total ocean mass [kg], or the mass-weighted integral of ``field``
    (MOM_spatial_means.F90 global_mass_integral), order-invariant."""
    area = np.asarray(G.areaT, np.float64) * np.asarray(G.mask2dT,
                                                       np.float64)
    w = np.asarray(h, np.float64) * area[None] * rho0
    if field is None:
        return reproducing_sum(w)
    return reproducing_sum(np.asarray(field, np.float64) * w)