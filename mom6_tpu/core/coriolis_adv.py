"""Coriolis and kinetic-energy-gradient accelerations.

TPU-native re-design of MOM6's CorAdCalc (reference:
src/core/MOM_CoriolisAdv.F90:125; scheme flags :34-44): computes the
vortex-force form of momentum advection,

    du/dt +=  q * vh~   - d(KE)/dx
    dv/dt += -q * uh~   - d(KE)/dy

with q the potential vorticity at corner points and uh~/vh~ thickness fluxes
averaged to the corner.  Supported vorticity schemes:

* ``SADOURNY75_ENERGY`` (default) — energy-conserving (Sadourny 1975);
* ``ARAKAWA_HSU90`` — energy & absolute-enstrophy conserving (Arakawa & Hsu
  1990), implemented in its q-weighted 3-point flux form;
* ``SADOURNY75_ENSTRO`` — enstrophy-conserving.

All expressed as fused elementwise stencils on (nz, ny, nx) arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["coriolis_adv", "relative_vorticity", "kinetic_energy"]

SADOURNY75_ENERGY = "SADOURNY75_ENERGY"
ARAKAWA_HSU90 = "ARAKAWA_HSU90"
SADOURNY75_ENSTRO = "SADOURNY75_ENSTRO"


def relative_vorticity(u, v, G):
    """Relative vorticity at q (NE corner) points: circulation / area."""
    dvdx = ip1(v * G.dyCv) - v * G.dyCv
    dudy = jp1(u * G.dxCu) - u * G.dxCu
    return (dvdx - dudy) * G.IareaBu * G.mask2dBu


def kinetic_energy(u, v, G):
    """KE per unit mass at h points (simple 2-point means; MOM6 KE_SCHEME
    KE_ARAKAWA uses area-weighted means — refinement deferred)."""
    u2 = 0.5 * (u * u + im1(u * u))
    v2 = 0.5 * (v * v + jm1(v * v))
    return 0.5 * (u2 + v2)


def _pv_at_q(u, v, h, G, GV):
    """Potential vorticity (f + zeta) / h_q with h_q an area-weighted 4-point
    thickness mean (hArea_q of MOM_CoriolisAdv.F90)."""
    rv = relative_vorticity(u, v, G)
    area_h = G.areaT * G.mask2dT
    harea = (h * area_h + ip1(h * area_h)
             + jp1(h * area_h) + ip1(jp1(h * area_h)))
    area4 = (area_h + ip1(area_h) + jp1(area_h) + ip1(jp1(area_h)))
    h_q = harea / jnp.maximum(area4, 1e-30)
    return (G.CoriolisBu + rv) / jnp.maximum(h_q, GV.h_subroundoff)


def coriolis_adv(u, v, h, uh, vh, G, GV, *,
                 scheme: str = SADOURNY75_ENERGY
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accelerations (CAu, CAv) from PV flux + KE gradient.

    ``uh``/``vh`` are volume transports [m3 s-1] from continuity.
    """
    q = _pv_at_q(u, v, h, G, GV)

    if scheme == SADOURNY75_ENERGY:
        # CAu = mean over the 2 adjacent corners of [q * (2pt mean of vh)]
        qvh_q = q * 0.5 * (vh + ip1(vh))          # at q points
        cau = 0.5 * (qvh_q + jm1(qvh_q)) * G.IdxCu
        quh_q = q * 0.5 * (uh + jp1(uh))
        cav = -0.5 * (quh_q + im1(quh_q)) * G.IdyCv
    elif scheme == SADOURNY75_ENSTRO:
        # q averaged first (enstrophy form): CAu = q_u * vh_u
        q_u = 0.5 * (q + jm1(q))
        vh_u = 0.25 * ((vh + ip1(vh)) + (jm1(vh) + ip1(jm1(vh))))
        cau = q_u * vh_u * G.IdxCu
        q_v = 0.5 * (q + im1(q))
        uh_v = 0.25 * ((uh + jp1(uh)) + (im1(uh) + im1(jp1(uh))))
        cav = -q_v * uh_v * G.IdyCv
    elif scheme == ARAKAWA_HSU90:
        # Arakawa & Hsu (1990) Eq. 3.17-3.34: each of the four corner-adjacent
        # v-fluxes is weighted by a 3-corner mean of q.
        c12 = 1.0 / 12.0
        # coefficients at the NE corner of cell (j,i), acting on vh neighbors
        a_q = c12 * ((q + ip1(q)) + ip1(jm1(q)))      # couples to vh(i+1, j+1/2)
        b_q = c12 * ((q + im1(q)) + im1(jm1(q)))      # mirrored west weight
        cau = (a_q * ip1(vh) + b_q * vh
               + jm1(a_q * ip1(vh)) + jm1(b_q * vh)) * G.IdxCu
        c_q = c12 * ((q + jp1(q)) + jp1(im1(q)))
        d_q = c12 * ((q + jm1(q)) + jm1(im1(q)))
        cav = -(c_q * jp1(uh) + d_q * uh
                + im1(c_q * jp1(uh)) + im1(d_q * uh)) * G.IdyCv
    else:
        raise ValueError(f"unknown Coriolis scheme {scheme}")

    ke = kinetic_energy(u, v, G)
    cau = (cau - (ip1(ke) - ke) * G.IdxCu) * G.mask2dCu
    cav = (cav - (jp1(ke) - ke) * G.IdyCv) * G.mask2dCv
    return cau, cav
