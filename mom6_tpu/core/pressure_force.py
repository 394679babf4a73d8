"""Hydrostatic pressure-force accelerations.

Round-1 scope: the Montgomery-potential form for layered (adiabatic,
stacked-shallow-water) mode — the analogue of
src/core/MOM_PressureForce_Montgomery.F90.  The finite-volume
analytically-integrated form with a full EOS
(MOM_PressureForce_FV.F90:947) lands with the thermodynamic slice.

For a Boussinesq stack of layers with reduced gravities g'_k at the top
interface of layer k (g'_1 = g at the free surface):

    M_1 = g'_1 * e_1            (e_1 = free surface height, positive up)
    M_k = M_{k-1} + g'_k * e_k  (e_k = height of interface above layer k)

    PFu_k = -dM_k/dx,   PFv_k = -dM_k/dy

Also returns ``pbce`` — the sensitivity of the column-mean pressure-force
to free-surface height used by the barotropic solver (dM_k/d eta = g'_1
for every layer in this stacked form), and ``eta_PF`` — the free surface
used, so btstep can form pressure-force anomalies.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import ip1, jp1

__all__ = ["PressureForceOut", "pressure_force_montgomery",
           "pressure_force_fv", "find_eta"]


class PressureForceOut(NamedTuple):
    PFu: jnp.ndarray      # (nz, ny, nx) zonal accel [m s-2]
    PFv: jnp.ndarray
    pbce: jnp.ndarray     # (nz, ny, nx) d(accel)/d(eta) [s-2... m s-2 per m]
    eta_PF: jnp.ndarray   # (ny, nx) free surface used [m]


def find_eta(h, G):
    """Free-surface height (positive up) from thicknesses and bathymetry
    (analogue of MOM_interface_heights.F90 find_eta)."""
    return jnp.sum(h, axis=0) - G.bathyT


def pressure_force_fv(h, T, S, G, GV, eos, p_surf=None) -> PressureForceOut:
    """Boussinesq pressure force with a full equation of state.

    Role of MOM6's PressureForce_FV_Bouss (reference:
    src/core/MOM_PressureForce_FV.F90:947 with the density integrals of
    MOM_density_integrals.F90).  This round uses the layer-mean
    pressure/geopotential ("contact-force") form

        PFu_k = -(1/rho0) d(pbar_k)/dx  -  g (rho_k/rho0) d(zbar_k)/dx

    with hydrostatic interface pressures accumulated from the EOS density
    at layer-mean pressure; the analytically integrated Adcroft quadrature
    (int_density_dz) is the planned upgrade for steep-topography accuracy.
    """
    g = GV.g_earth
    rho0 = GV.rho0
    # interface heights, positive up
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e_top = csum_below - G.bathyT[None]            # top interface of layer k
    zbar = e_top - 0.5 * h                          # layer centers
    # first pass: pressure from a reference profile, then EOS once
    p_guess = rho0 * g * jnp.maximum(-zbar, 0.0)
    rho = rho0 + eos.density(T, S, p_guess, rho_ref=rho0)
    # hydrostatic interface pressures
    dp = g * rho * h
    p_top = jnp.cumsum(jnp.concatenate([jnp.zeros_like(dp[:1]), dp[:-1]],
                                       axis=0), axis=0)
    if p_surf is not None:
        p_top = p_top + p_surf[None]
    pbar = p_top + 0.5 * dp
    rho_u = 0.5 * (rho + ip1(rho))
    pfu = (-(ip1(pbar) - pbar) * G.IdxCu / rho0
           - g * (rho_u / rho0) * (ip1(zbar) - zbar) * G.IdxCu)
    rho_v = 0.5 * (rho + jp1(rho))
    pfv = (-(jp1(pbar) - pbar) * G.IdyCv / rho0
           - g * (rho_v / rho0) * (jp1(zbar) - zbar) * G.IdyCv)
    pbce = jnp.broadcast_to(jnp.asarray(g, h.dtype), h.shape).astype(h.dtype)
    eta = e_top[0]
    return PressureForceOut(pfu * G.mask2dCu, pfv * G.mask2dCv, pbce, eta)


def pressure_force_montgomery(h, G, GV) -> PressureForceOut:
    """Montgomery-potential PF for the layered stack."""
    # interface heights, positive up: e[k] = top interface of layer k
    # e_bot = -D;  e[k] = -D + sum_{m>=k} h_m
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]      # sum_{m>=k} h_m
    e = csum_below - G.bathyT[None]                     # (nz, ny, nx), top interfaces
    gp = GV.g_prime[:, None, None]
    M = jnp.cumsum(gp * e, axis=0)
    pfu = -(ip1(M) - M) * G.IdxCu * G.mask2dCu
    pfv = -(jp1(M) - M) * G.IdyCv * G.mask2dCv
    pbce = jnp.broadcast_to(jnp.asarray(GV.g_earth, h.dtype),
                            h.shape).astype(h.dtype)
    eta = e[0]
    return PressureForceOut(pfu, pfv, pbce, eta)
