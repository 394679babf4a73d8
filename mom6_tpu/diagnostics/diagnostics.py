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
    MOM_variables.F90)."""
    sst: jnp.ndarray          # [degC]
    sss: jnp.ndarray          # [ppt]
    ssh: jnp.ndarray          # [m]
    u_sfc: jnp.ndarray        # surface zonal velocity at h points [m s-1]
    v_sfc: jnp.ndarray
    speed: jnp.ndarray
    mld: jnp.ndarray = None


def extract_surface_state(state, G, GV, *, sfc_layer_depth: float = 5.0
                          ) -> SurfaceState:
    """Surface fields, averaging velocities over the top layers
    (extract_surface_state averages over HMIX_SFC... top layer here)."""
    eta = jnp.sum(state.h, axis=0) - G.bathyT
    u_c = 0.5 * (state.u[0] + im1(state.u[0]))
    v_c = 0.5 * (state.v[0] + jm1(state.v[0]))
    sst = state.T[0] if state.T is not None else jnp.zeros_like(eta)
    sss = state.S[0] if state.S is not None else jnp.zeros_like(eta)
    return SurfaceState(
        sst=sst * G.mask2dT, sss=sss * G.mask2dT, ssh=eta * G.mask2dT,
        u_sfc=u_c * G.mask2dT, v_sfc=v_c * G.mask2dT,
        speed=jnp.sqrt(u_c * u_c + v_c * v_c) * G.mask2dT)


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