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

__all__ = ["PressureForceOut", "pressure_force_montgomery", "find_eta"]


class PressureForceOut(NamedTuple):
    PFu: jnp.ndarray      # (nz, ny, nx) zonal accel [m s-2]
    PFv: jnp.ndarray
    pbce: jnp.ndarray     # (nz, ny, nx) d(accel)/d(eta) [s-2... m s-2 per m]
    eta_PF: jnp.ndarray   # (ny, nx) free surface used [m]


def find_eta(h, G):
    """Free-surface height (positive up) from thicknesses and bathymetry
    (analogue of MOM_interface_heights.F90 find_eta)."""
    return jnp.sum(h, axis=0) - G.bathyT


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
