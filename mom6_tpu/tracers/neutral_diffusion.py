"""Neutral (epineutral/Redi) tracer diffusion.

Role of MOM6's neutral diffusion (reference:
src/tracer/MOM_neutral_diffusion.F90:619 — polynomial neutral-surface
finding + flux assembly).  This implementation uses the small-slope
rotated-tensor (Redi) form with the Griffies stability split:

* explicit along-layer + cross terms:
    F_x = -K (dT/dx + S_x dT/dz)        at u faces (thickness-weighted)
    F_z = -K (S . grad_h T)             at interfaces (the cross term)
* the remaining K S^2 dT/dz vertical component is returned as an
  interface diffusivity ``kd_redi`` for the IMPLICIT vertical solve
  (tracer_vertdiff), which removes the explicit vertical CFL limit —
  the standard stable decomposition.

Slopes come from the locally-referenced EOS derivatives
(core/isopycnal_slopes.py), magnitude-clipped.  All flux-form =>
conservative; a tracer that is a function of density alone feels (to
truncation) no flux.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mom6_tpu.core.isopycnal_slopes import isopycnal_slopes
from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["neutral_diffusion"]

_H_EPS = 1e-3


def _ddz_centers(f, h):
    """d(f)/dz at layer centers (z up; index down).  The z axis is -3
    (works for (nz, ny, nx) and stacked (n_tr, nz, ny, nx) arrays; ``h``
    broadcasts against ``f``)."""
    ax = -3

    def up(a):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, 0, 1, axis=ax),
             jax.lax.slice_in_dim(a, 0, a.shape[ax] - 1, axis=ax)], axis=ax)

    def dn(a):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, a.shape[ax], axis=ax),
             jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax],
                                  axis=ax)], axis=ax)

    dz = 0.5 * (up(h) + 2.0 * h + dn(h))
    return (up(f) - dn(f)) / jnp.maximum(dz, _H_EPS)


def neutral_diffusion(tr, h, T, S, G, GV, eos, khtr, dt, *,
                      slope_max: float = 0.01, bld=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tr_new, kd_redi).

    ``tr``: stacked tracers (n_tr, nz, ny, nx); ``T``/``S`` set the
    neutral directions; ``khtr`` the epineutral diffusivity [m2 s-1].
    Apply ``kd_redi`` afterwards via tracer_vertdiff.

    ``bld``: optional (ny, nx) boundary-layer depth [m].  When given,
    the neutral slopes taper linearly to zero above the boundary-layer
    base (the NDIFF_INTERIOR_ONLY role of MOM_neutral_diffusion.F90:
    interior_only — the neutral framework is invalid inside the mixed
    layer, where diffusion should be horizontal, so the cross terms
    vanish there and the along-layer flux reduces to the plain
    horizontal Laplacian)."""
    sx, sy = isopycnal_slopes(h, T, S, G, GV, eos, slope_max=slope_max)
    if bld is not None:
        # zero above the boundary-layer base, ramping to full neutral
        # rotation over the next 20% of the BLD below it
        z_c = jnp.cumsum(h, axis=0) - 0.5 * h
        bldz = jnp.maximum(bld, _H_EPS)[None]
        ramp = jnp.clip((z_c - bldz) / (0.2 * bldz), 0.0, 1.0)
        sx = sx * 0.5 * (ramp + ip1(ramp))
        sy = sy * 0.5 * (ramp + jp1(ramp))

    # HARMONIC-mean face thicknesses: the flux through a face must vanish
    # with the THINNER neighbor (an arithmetic mean lets a massive layer
    # drive a finite flux into a vanished one, whose tiny volume then
    # receives astronomically wrong tracer values — the reference's
    # neutral-surface fluxes likewise carry no mass through vanished
    # layers)
    h_u = (2.0 * h * ip1(h) / (h + ip1(h) + _H_EPS)) * G.mask2dCu
    h_v = (2.0 * h * jp1(h) / (h + jp1(h) + _H_EPS)) * G.mask2dCv
    vol = jnp.maximum(h * G.areaT, _H_EPS)

    dtr_dz = _ddz_centers(tr, h[None])                  # (n_tr, nz, ny, nx)

    # --- explicit horizontal flux with the slope cross term ---------------
    gx = (ip1(tr) - tr) * G.IdxCu
    dtdz_u = 0.5 * (dtr_dz + ip1(dtr_dz))
    fx = -khtr * (gx + sx[None] * dtdz_u) * (h_u * G.dyCu)[None] \
        * G.mask2dCu
    gy = (jp1(tr) - tr) * G.IdyCv
    dtdz_v = 0.5 * (dtr_dz + jp1(dtr_dz))
    fy = -khtr * (gy + sy[None] * dtdz_v) * (h_v * G.dxCv)[None] \
        * G.mask2dCv

    # --- explicit vertical cross term at interior interfaces --------------
    # S.grad_h(tr) averaged to the interface between layers k-1 and k
    gx_c = 0.5 * (gx + im1(gx))          # at centers
    gy_c = 0.5 * (gy + jm1(gy))
    sx_c = 0.5 * (sx + im1(sx))
    sy_c = 0.5 * (sy + jm1(sy))
    sdot = sx_c[None] * gx_c + sy_c[None] * gy_c       # (n_tr, nz, ...)
    sdot_int = 0.5 * (sdot[:, :-1] + sdot[:, 1:])      # interfaces 1..nz-1
    fz = -khtr * sdot_int * G.areaT[None, None] * G.mask2dT[None, None]
    # gate the cross-interface flux where either bounding layer has
    # vanished (same massless-layer guard as the horizontal faces)
    h_int_min = jnp.minimum(h[:-1], h[1:])
    fz = fz * (h_int_min / (h_int_min + _H_EPS))[None]
    zeros = jnp.zeros_like(fz[:, :1])
    fz_full = jnp.concatenate([zeros, fz, zeros], axis=1)  # (n_tr, nz+1,...)

    div = ((fx - im1(fx)) + (fy - jm1(fy))) \
        + (fz_full[:, :-1] - fz_full[:, 1:])
    tr_new = tr - dt * div / vol[None]
    tr_new = jnp.where(G.mask2dT[None, None] > 0.5, tr_new, tr)

    # --- implicit K S^2 vertical diffusivity ------------------------------
    s2_c = sx_c ** 2 + sy_c ** 2
    s2_int = 0.5 * (s2_c[:-1] + s2_c[1:])
    kd_redi = jnp.concatenate([jnp.zeros_like(h[:1]),
                               khtr * s2_int,
                               jnp.zeros_like(h[:1])], axis=0) \
        * G.mask2dT[None]
    return tr_new, kd_redi