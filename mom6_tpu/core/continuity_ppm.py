"""Finite-volume thickness transport with PPM reconstruction.

TPU-native re-design of MOM6's continuity solver (reference:
src/core/MOM_continuity_PPM.F90: continuity_PPM :86, zonal_mass_flux :519,
zonal_flux_adjust :1093, PPM_reconstruction_x :2307, PPM_limit_pos :2578).

Design differences from the Fortran:
* fully vectorized over (nz, ny, nx) with ``jnp.where`` replacing the
  sign-of-u branches — one fused elementwise kernel per sweep on the VPU;
* the per-face Newton iteration that adjusts layer fluxes to match a target
  barotropic transport (``zonal_flux_adjust``) runs a *fixed* number of
  iterations (jit-friendly; MOM6 iterates to tolerance);
* land/walls enforced by face masks (no loop bounds, no do_I masking).

The scheme is directionally split: an x sweep updates h, then a y sweep acts
on the updated field, exactly as in the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["continuity_ppm", "zonal_mass_flux", "meridional_mass_flux",
           "ppm_reconstruction_x", "ppm_reconstruction_y"]

_N_NEWTON = 5  # fixed Newton iterations for flux adjustment


def _ppm_edges(h, hm, hp, mask_m, mask_c, mask_p, h_min, monotonic):
    """Shared PPM edge-value logic given already-shifted neighbors.

    ``hm``/``hp`` are the i-1 / i+1 (or j-+1) neighbor values, ``mask_*`` the
    corresponding wet masks.  Returns (h_W, h_E) ("left"/"right" edges in the
    sweep direction).  Mirrors PPM_reconstruction_* + PPM_limit_pos/CW84.
    """
    # masked neighbors default to the center value
    h_m = mask_m * hm + (1.0 - mask_m) * h
    h_p = mask_p * hp + (1.0 - mask_p) * h

    # 2nd-order slope with Lin (1994) monotonic constraint, zeroed at coasts
    slp = 0.5 * (h_p - h_m)
    dMx = jnp.maximum(jnp.maximum(h_p, h_m), h) - h
    dMn = h - jnp.minimum(jnp.minimum(h_p, h_m), h)
    slp = jnp.sign(slp) * jnp.minimum(jnp.abs(slp), 2.0 * jnp.minimum(dMx, dMn))
    slp = slp * (mask_m * mask_c * mask_p)
    return h_m, h_p, slp


def _ppm_limit_pos(h, h_L, h_R, h_min):
    """Positive-definite limiter (PPM_limit_pos, MOM_continuity_PPM.F90:2578)."""
    curv = 3.0 * ((h_L + h_R) - 2.0 * h)
    dh = h_R - h_L
    # parabola minimum inside the cell and a true (convex-up) minimum
    min_inside = (curv > 0.0) & (jnp.abs(dh) < curv)
    # degenerate thin cell: flatten
    flatten = min_inside & (h <= h_min)
    denom = curv * curv + 3.0 * dh * dh
    needs_scale = min_inside & (~flatten) & (12.0 * curv * (h - h_min) < denom)
    scale = jnp.where(needs_scale, 12.0 * curv * (h - h_min) / jnp.maximum(denom, 1e-30), 1.0)
    h_L2 = h + scale * (h_L - h)
    h_R2 = h + scale * (h_R - h)
    h_L2 = jnp.where(flatten, h, h_L2)
    h_R2 = jnp.where(flatten, h, h_R2)
    return h_L2, h_R2


def _ppm_limit_cw84(h, h_L, h_R):
    """Colella & Woodward (1984) monotonic limiter (PPM_limit_CW84)."""
    not_mono = (h_R - h) * (h - h_L) <= 0.0
    rl_diff = h_R - h_L
    rl_mean = 0.5 * (h_R + h_L)
    fun_fac = 6.0 * rl_diff * (h - rl_mean)
    rl_diff2 = rl_diff * rl_diff
    h_L2 = jnp.where(fun_fac > rl_diff2, 3.0 * h - 2.0 * h_R, h_L)
    h_R2 = jnp.where(fun_fac < -rl_diff2, 3.0 * h - 2.0 * h_L, h_R)
    h_L2 = jnp.where(not_mono, h, h_L2)
    h_R2 = jnp.where(not_mono, h, h_R2)
    return h_L2, h_R2


def ppm_reconstruction_x(h, mask_t, h_min=1e-10, monotonic=False,
                         simple_2nd=False):
    """West/east edge values of the PPM fit in x.  (h: (..., ny, nx))."""
    hm, hp = im1(h), ip1(h)
    mm, mp = im1(mask_t), ip1(mask_t)
    if simple_2nd:
        h_m = mm * hm + (1.0 - mm) * h
        h_p = mp * hp + (1.0 - mp) * h
        return 0.5 * (h_m + h), 0.5 * (h_p + h)
    h_m, h_p, slp = _ppm_edges(h, hm, hp, mm, mask_t, mp, h_min, monotonic)
    one_sixth = 1.0 / 6.0
    h_W = 0.5 * (h_m + h) + one_sixth * (im1(slp) - slp)
    h_E = 0.5 * (h_p + h) + one_sixth * (slp - ip1(slp))
    if monotonic:
        return _ppm_limit_cw84(h, h_W, h_E)
    return _ppm_limit_pos(h, h_W, h_E, h_min)


def ppm_reconstruction_y(h, mask_t, h_min=1e-10, monotonic=False,
                         simple_2nd=False):
    hm, hp = jm1(h), jp1(h)
    mm, mp = jm1(mask_t), jp1(mask_t)
    if simple_2nd:
        h_m = mm * hm + (1.0 - mm) * h
        h_p = mp * hp + (1.0 - mp) * h
        return 0.5 * (h_m + h), 0.5 * (h_p + h)
    h_m, h_p, slp = _ppm_edges(h, hm, hp, mm, mask_t, mp, h_min, monotonic)
    one_sixth = 1.0 / 6.0
    h_S = 0.5 * (h_m + h) + one_sixth * (jm1(slp) - slp)
    h_N = 0.5 * (h_p + h) + one_sixth * (slp - jp1(slp))
    if monotonic:
        return _ppm_limit_cw84(h, h_S, h_N)
    return _ppm_limit_pos(h, h_S, h_N, h_min)


def _zonal_flux_layer(u, h, h_W, h_E, dt, G):
    """Per-layer PPM flux through east faces and its velocity derivative.

    Mirrors zonal_flux_layer / zonal_flux_thickness
    (MOM_continuity_PPM.F90:922-1050): the flux thickness is the exact
    integral of the parabolic reconstruction over the CFL swept region.
    Returns (uh [m3 s-1], duhdu [m2]).
    """
    face = G.dyCu * G.mask2dCu
    # donor cell is i for u>0, i+1 for u<0
    cfl_p = u * dt * G.IdxT
    cfl_m = -u * dt * ip1(G.IdxT)
    curv_p = (h_W + h_E) - 2.0 * h
    curv_m = ip1(curv_p)
    h_avg_p = h_E + cfl_p * (0.5 * (h_W - h_E) + curv_p * (cfl_p - 1.5))
    h_avg_m = ip1(h_W) + cfl_m * (0.5 * (ip1(h_E) - ip1(h_W)) + curv_m * (cfl_m - 1.5))
    h_marg_p = h_E + cfl_p * ((h_W - h_E) + 3.0 * curv_p * (cfl_p - 1.0))
    h_marg_m = ip1(h_W) + cfl_m * ((ip1(h_E) - ip1(h_W)) + 3.0 * curv_m * (cfl_m - 1.0))
    h_zero = 0.5 * (ip1(h_W) + h_E)
    h_avg = jnp.where(u > 0.0, h_avg_p, jnp.where(u < 0.0, h_avg_m, h_zero))
    h_marg = jnp.where(u > 0.0, h_marg_p, jnp.where(u < 0.0, h_marg_m, h_zero))
    return face * u * h_avg, face * h_marg


def _meridional_flux_layer(v, h, h_S, h_N, dt, G):
    face = G.dxCv * G.mask2dCv
    cfl_p = v * dt * G.IdyT
    cfl_m = -v * dt * jp1(G.IdyT)
    curv_p = (h_S + h_N) - 2.0 * h
    curv_m = jp1(curv_p)
    h_avg_p = h_N + cfl_p * (0.5 * (h_S - h_N) + curv_p * (cfl_p - 1.5))
    h_avg_m = jp1(h_S) + cfl_m * (0.5 * (jp1(h_N) - jp1(h_S)) + curv_m * (cfl_m - 1.5))
    h_marg_p = h_N + cfl_p * ((h_S - h_N) + 3.0 * curv_p * (cfl_p - 1.0))
    h_marg_m = jp1(h_S) + cfl_m * ((jp1(h_N) - jp1(h_S)) + 3.0 * curv_m * (cfl_m - 1.0))
    h_zero = 0.5 * (jp1(h_S) + h_N)
    h_avg = jnp.where(v > 0.0, h_avg_p, jnp.where(v < 0.0, h_avg_m, h_zero))
    h_marg = jnp.where(v > 0.0, h_marg_p, jnp.where(v < 0.0, h_marg_m, h_zero))
    return face * v * h_avg, face * h_marg


def zonal_mass_flux(u, h, dt, G, *, uhbt: Optional[jnp.ndarray] = None,
                    visc_rem: Optional[jnp.ndarray] = None,
                    monotonic=False, simple_2nd=False, h_min=1e-10):
    """Zonal thickness flux; optionally Newton-adjusted so the column sum
    matches a barotropic transport ``uhbt`` (zonal_flux_adjust,
    MOM_continuity_PPM.F90:1093 — here with a fixed iteration count)."""
    h_W, h_E = ppm_reconstruction_x(h, G.mask2dT, h_min, monotonic, simple_2nd)
    uh, duhdu = _zonal_flux_layer(u, h, h_W, h_E, dt, G)
    if uhbt is None:
        return uh, u
    rem = visc_rem if visc_rem is not None else jnp.ones_like(u)

    # physical bound on the correction: the barotropic mismatch can demand
    # unreachable velocities at faces whose layers carry almost no
    # transport capacity (all-thin columns over topography); MOM6 bounds
    # the equivalent search range (zonal_flux_adjust's du_max/du_min)
    du_cap = 0.45 / (dt * jnp.maximum(G.IdxT, 1e-30))

    # one flux+derivative evaluation per iteration (the derivative from the
    # current iterate is reused for the next update — secant-like, same
    # convergence in practice at half the cost)
    def newton(_, carry):
        du, uh_cur, duhdu_cur = carry
        err = jnp.sum(uh_cur, axis=0) - uhbt
        denom = jnp.sum(duhdu_cur * rem, axis=0)
        du = du - err / jnp.maximum(denom, 1e-30) * G.mask2dCu
        du = jnp.clip(du, -du_cap, du_cap)
        uh_new, duhdu_new = _zonal_flux_layer(u + du * rem, h, h_W, h_E,
                                              dt, G)
        return du, uh_new, duhdu_new

    du0 = jnp.zeros_like(uhbt)
    du, uh, _ = jax.lax.fori_loop(0, _N_NEWTON, newton, (du0, uh, duhdu))
    return uh, u + du * rem


def meridional_mass_flux(v, h, dt, G, *, vhbt: Optional[jnp.ndarray] = None,
                         visc_rem: Optional[jnp.ndarray] = None,
                         monotonic=False, simple_2nd=False, h_min=1e-10):
    h_S, h_N = ppm_reconstruction_y(h, G.mask2dT, h_min, monotonic, simple_2nd)
    vh, dvhdv = _meridional_flux_layer(v, h, h_S, h_N, dt, G)
    if vhbt is None:
        return vh, v
    rem = visc_rem if visc_rem is not None else jnp.ones_like(v)

    dv_cap = 0.45 / (dt * jnp.maximum(G.IdyT, 1e-30))

    def newton(_, carry):
        dv, vh_cur, dvhdv_cur = carry
        err = jnp.sum(vh_cur, axis=0) - vhbt
        denom = jnp.sum(dvhdv_cur * rem, axis=0)
        dv = dv - err / jnp.maximum(denom, 1e-30) * G.mask2dCv
        dv = jnp.clip(dv, -dv_cap, dv_cap)
        vh_new, dvhdv_new = _meridional_flux_layer(v + dv * rem, h, h_S, h_N,
                                                   dt, G)
        return dv, vh_new, dvhdv_new

    dv0 = jnp.zeros_like(vhbt)
    dv, vh, _ = jax.lax.fori_loop(0, _N_NEWTON, newton, (dv0, vh, dvhdv))
    return vh, v + dv * rem


def continuity_ppm(u, v, h, dt, G, GV, *,
                   uhbt: Optional[jnp.ndarray] = None,
                   vhbt: Optional[jnp.ndarray] = None,
                   visc_rem_u: Optional[jnp.ndarray] = None,
                   visc_rem_v: Optional[jnp.ndarray] = None,
                   monotonic=False, simple_2nd=False, x_first: bool = True
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray, jnp.ndarray]:
    """Directionally-split thickness update (continuity_PPM,
    MOM_continuity_PPM.F90:86).  ``x_first`` is the FIRST_DIRECTION
    parameter of the reference (adjusted by the rotation machinery so
    quarter-turned runs sweep the same physical direction first).
    Returns (h_new, uh, vh, u_adj, v_adj).
    """
    h_min = GV.angstrom
    if x_first:
        uh, u_adj = zonal_mass_flux(u, h, dt, G, uhbt=uhbt,
                                    visc_rem=visc_rem_u,
                                    monotonic=monotonic,
                                    simple_2nd=simple_2nd, h_min=h_min)
        h_x = jnp.maximum(h - dt * G.IareaT * (uh - im1(uh)), h_min)
        vh, v_adj = meridional_mass_flux(v, h_x, dt, G, vhbt=vhbt,
                                         visc_rem=visc_rem_v,
                                         monotonic=monotonic,
                                         simple_2nd=simple_2nd, h_min=h_min)
        h_new = jnp.maximum(h_x - dt * G.IareaT * (vh - jm1(vh)), h_min)
    else:
        vh, v_adj = meridional_mass_flux(v, h, dt, G, vhbt=vhbt,
                                         visc_rem=visc_rem_v,
                                         monotonic=monotonic,
                                         simple_2nd=simple_2nd, h_min=h_min)
        h_y = jnp.maximum(h - dt * G.IareaT * (vh - jm1(vh)), h_min)
        uh, u_adj = zonal_mass_flux(u, h_y, dt, G, uhbt=uhbt,
                                    visc_rem=visc_rem_u,
                                    monotonic=monotonic,
                                    simple_2nd=simple_2nd, h_min=h_min)
        h_new = jnp.maximum(h_y - dt * G.IareaT * (uh - im1(uh)), h_min)
    return h_new, uh, vh, u_adj, v_adj
