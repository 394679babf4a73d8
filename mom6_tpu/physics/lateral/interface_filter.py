"""Interface-height filter (reference:
src/parameterizations/lateral/MOM_interface_filter.F90:499): biharmonic-in-
time smoothing of interface heights, an alternative/adjunct to GM for
controlling grid-scale interface noise.  Same streamfunction construction
as thickness_diffuse but acting on the Laplacian of interface height."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jm1_s0, jp1

__all__ = ["InterfaceFilterParams", "interface_filter"]


class InterfaceFilterParams(NamedTuple):
    time_scale: float = 3600.0     # filter time scale [s]
    order: int = 2                 # 2 = Laplacian smoothing, 4 = biharmonic


def interface_filter(h, G, GV, dt, p: InterfaceFilterParams
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (h_new, uh_filt, vh_filt); volume-conserving per column."""
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e_int = (csum_below - G.bathyT[None])[1:]        # interior interfaces
    fold = getattr(G, "fold_north", False)
    kh = "h" if fold else None

    def lap(e):
        fx = (ip1(e) - e) * G.IdxCu * G.mask2dCu
        fy = (jp1(e, kh) - e) * G.IdyCv * G.mask2dCv
        return G.IareaT * (G.dyCu * fx - im1(G.dyCu * fx)
                           + G.dxCv * fy - jm1_s0(G.dxCv * fy, fold))

    target = e_int
    if p.order == 4:
        target = lap(e_int)

    # L^2 / tau, capped at the explicit-diffusion stability limit for the
    # one-shot update below (dt K / L^2 <= 1/8 in 2-D with safety margin)
    L2 = G.dxT * G.dyT
    coef = jnp.minimum(L2 / p.time_scale, 0.125 * L2 / dt)
    sx = (ip1(target) - target) * G.IdxCu
    sy = (jp1(target, kh) - target) * G.IdyCv
    sign = -1.0 if p.order == 4 else 1.0
    psi_u = sign * 0.5 * (coef + ip1(coef)) * sx * G.mask2dCu
    psi_v = sign * 0.5 * (coef + jp1(coef, kh)) * sy * G.mask2dCv

    zero_u = jnp.zeros_like(psi_u[:1])
    zero_v = jnp.zeros_like(psi_v[:1])
    psi_uf = jnp.concatenate([zero_u, psi_u, zero_u], axis=0)
    psi_vf = jnp.concatenate([zero_v, psi_v, zero_v], axis=0)
    uh = G.dyCu * (psi_uf[1:] - psi_uf[:-1]) * G.mask2dCu
    vh = G.dxCv * (psi_vf[1:] - psi_vf[:-1]) * G.mask2dCv

    # availability limiting as in thickness_diffuse
    vol = h * G.areaT
    out = (jnp.maximum(uh, 0.0) + jnp.maximum(-im1(uh), 0.0)
           + jnp.maximum(vh, 0.0) + jnp.maximum(-jm1_s0(vh, fold), 0.0))
    r = jnp.minimum(1.0, 0.25 * vol / jnp.maximum(dt * out, 1e-30))
    uh = uh * jnp.where(uh > 0.0, r, ip1(r))
    vh = vh * jnp.where(vh > 0.0, r, jp1(r, kh))

    h_new = h - dt * G.IareaT * ((uh - im1(uh)) + (vh - jm1_s0(vh, fold)))
    return jnp.maximum(h_new, GV.angstrom), uh, vh