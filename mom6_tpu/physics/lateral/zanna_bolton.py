"""Zanna-Bolton (2020) data-driven eddy momentum closure.

Analogue of MOM6's MOM_Zanna_Bolton.F90:1095 (ZB2020): the subgrid
momentum stress discovered by symbolic regression on eddy-resolving data,

    Txx = kappa (-zeta*sigma + 1/2(zeta^2 + sigma^2 + delta^2))
    Tyy = kappa (+zeta*sigma + 1/2(zeta^2 + sigma^2 + delta^2))
    Txy = kappa (zeta * delta)

with zeta the vorticity, sigma the shearing strain (du/dy + dv/dx, at q),
delta the horizontal tension (du/dx - dv/dy, at h), and
kappa = -gamma * cell_area (an anti-viscous, energy-backscattering sign).
Accelerations are the thickness-weighted stress divergence, so momentum
is conserved in flux form.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jm1_s0, jp1

__all__ = ["ZBParams", "zanna_bolton_accel"]


class ZBParams(NamedTuple):
    amplitude: float = 0.3     # gamma, ZB_SCALING of the reference


def zanna_bolton_accel(u, v, h, G, p: ZBParams = ZBParams()
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(du/dt, dv/dt) from the ZB2020 stress divergence [m s-2]."""
    fold = getattr(G, "fold_north", False)
    kh, ku = ("h", "u") if fold else (None, None)
    # strain-rate components (sh_xx/sh_xy/vort are all invariant under the
    # fold's 180-degree rotation: both factors of each term flip sign)
    sh_xx = ((u - im1(u)) * G.IdxT
             - (v - jm1_s0(v, fold)) * G.IdyT) * G.mask2dT
    sh_xy = ((ip1(v) - v) / G.dxBu + (jp1(u, ku) - u) / G.dyBu) * G.mask2dBu
    vort = ((ip1(v) - v) / G.dxBu - (jp1(u, ku) - u) / G.dyBu) * G.mask2dBu

    # corner -> center means; the corner row below the domain is a wall
    # (on a fold grid the row-0 wrap would otherwise read the fold row)
    def q_to_h(a):
        am = jm1_s0(a, fold)
        return 0.25 * ((a + im1(a)) + (am + im1(am)))

    vort_h = q_to_h(vort)
    sh_xy_h = q_to_h(sh_xy)
    sh_xx_q = 0.25 * ((sh_xx + ip1(sh_xx))
                      + (jp1(sh_xx, kh) + ip1(jp1(sh_xx, kh))))

    kappa_h = -p.amplitude * G.areaT * G.mask2dT
    kappa_q = -p.amplitude * G.areaBu * G.mask2dBu

    vort_sh = vort_h * sh_xy_h
    sum_sq = 0.5 * ((vort_h * vort_h + sh_xy_h * sh_xy_h)
                    + sh_xx * sh_xx)
    txx = kappa_h * (-vort_sh + sum_sq)
    tyy = kappa_h * (vort_sh + sum_sq)
    txy = kappa_q * (vort * sh_xx_q)

    # thickness-weighted divergence (flux form; cf. hor_visc._stress_accel)
    eps = 1e-10
    h_q = 4.0 / (1.0 / (h + eps) + 1.0 / (ip1(h) + eps)
                 + 1.0 / (jp1(h, kh) + eps)
                 + 1.0 / (ip1(jp1(h, kh)) + eps))
    h_u = jnp.maximum(0.5 * (h + ip1(h)), 1e-3)
    h_v = jnp.maximum(0.5 * (h + jp1(h, kh)), 1e-3)
    fx = ((ip1(h * txx) - h * txx) * G.IdxCu
          + (h_q * txy - jm1_s0(h_q * txy, fold)) * G.IdyCu)
    fy = ((jp1(h * tyy, kh) - h * tyy) * G.IdyCv
          + (h_q * txy - im1(h_q * txy)) * G.IdxCv)
    return (fx / h_u * G.mask2dCu, fy / h_v * G.mask2dCv)