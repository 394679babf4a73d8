"""Neutral (isopycnal) slopes.

Analogue of MOM6's MOM_isopycnal_slopes.F90: the x/y slopes of neutral
surfaces at velocity points, from EOS derivatives (locally referenced):

    S_x = - (alpha dT/dx + beta dS/dx) / (alpha dT/dz + beta dS/dz)

computed at u/v points per layer, with slope magnitude clipping.  Feeds GM
thickness diffusion, MEKE and the Visbeck coefficients."""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.framework.stencil import ip1, jp1

__all__ = ["isopycnal_slopes"]

_EPS = 1e-14


def isopycnal_slopes(h, T, S, G, GV, eos, *, slope_max: float = 0.01):
    """Returns (slope_x (nz, ny, nx) at u points, slope_y at v points)."""
    z_c = jnp.cumsum(h, axis=0) - 0.5 * h
    p = GV.rho0 * GV.g_earth * z_c
    a_t, a_s = eos.density_derivs(T, S, p)

    # vertical density gradient at layer centers (centered differences of
    # neighbors, one-sided at top/bottom), locally referenced
    dT_up = jnp.concatenate([T[:1], T[:-1]], 0) - T
    dS_up = jnp.concatenate([S[:1], S[:-1]], 0) - S
    dT_dn = T - jnp.concatenate([T[1:], T[-1:]], 0)
    dS_dn = S - jnp.concatenate([S[1:], S[-1:]], 0)
    dz_up = 0.5 * (jnp.concatenate([h[:1], h[:-1]], 0) + h)
    dz_dn = 0.5 * (h + jnp.concatenate([h[1:], h[-1:]], 0))
    drho_dz = a_t * (dT_up + dT_dn) / jnp.maximum(dz_up + dz_dn, 1e-3) + \
        a_s * (dS_up + dS_dn) / jnp.maximum(dz_up + dz_dn, 1e-3)
    # stratified: drho_dz < 0 upward... here computed as (upper-lower)/dz
    # so stable stratification gives drho_dz < 0; floor its magnitude
    drho_dz = jnp.minimum(drho_dz, -1e-8)

    def slope(shift_op, idx_metric, mask):
        # EOS derivatives and N2 averaged to the velocity point (the
        # reference's 25%-weighted face alpha/beta,
        # MOM_isopycnal_slopes.F90 calc_isoneutral_slopes): one-sided
        # cell-center values would bias the slope toward the west/south
        # cell and break mirror antisymmetry of the face flux
        a_t_f = 0.5 * (a_t + shift_op(a_t))
        a_s_f = 0.5 * (a_s + shift_op(a_s))
        dz_f = jnp.minimum(0.5 * (drho_dz + shift_op(drho_dz)), -1e-8)
        drho_dx = (a_t_f * (shift_op(T) - T)
                   + a_s_f * (shift_op(S) - S)) * idx_metric
        s = -drho_dx / dz_f
        return jnp.clip(s, -slope_max, slope_max) * mask

    sx = slope(ip1, G.IdxCu, G.mask2dCu)
    kf = "h" if getattr(G, "fold_north", False) else None
    sy = slope(lambda x: jp1(x, kf), G.IdyCv, G.mask2dCv)
    return sx, sy
