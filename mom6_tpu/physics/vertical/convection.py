"""Convective and double-diffusive mixing.

Native implementations of the remaining CVMix interior schemes
(reference: MOM_CVMix_conv.F90, MOM_CVMix_ddiff.F90, and
MOM_full_convection.F90):

* convective instability: large diffusivity where N^2 < 0;
* double diffusion (salt fingering / diffusive convection) from the
  stability ratio R_rho = alpha dT/dz / (beta dS/dz) following the
  LMD94/CVMix forms;
* ``full_convection``: instantaneous homogenization of statically
  unstable columns (iterative mixing as a fixed-pass scan).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ConvectionParams", "DDiffParams", "convective_kd",
           "double_diffusion_kd", "full_convection"]

_H_EPS = 1e-3


class ConvectionParams(NamedTuple):
    kd_conv: float = 1.0          # convective diffusivity [m2 s-1]


class DDiffParams(NamedTuple):
    kd_sf_max: float = 1e-4       # max salt-finger diffusivity
    rrho0: float = 1.9            # salt-finger cutoff stability ratio
    kd_dc_mol: float = 1.5e-6     # molecular diffusivity for diffusive conv


def _ts_gradients(h, T, S, GV, eos):
    z_int = jnp.cumsum(h, axis=0)[:-1]
    p_int = GV.rho0 * GV.g_earth * z_int
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), _H_EPS)
    dTdz = (T[:-1] - T[1:]) / dz      # z positive up
    dSdz = (S[:-1] - S[1:]) / dz
    return a_t, a_s, dTdz, dSdz


def convective_kd(h, T, S, G, GV, eos,
                  p: ConvectionParams = ConvectionParams()):
    """Interface diffusivity where the water column is statically
    unstable (CVMix_conv role)."""
    a_t, a_s, dTdz, dSdz = _ts_gradients(h, T, S, GV, eos)
    drho_dz = a_t * dTdz + a_s * dSdz    # > 0 means unstable (rho up)
    kd_i = jnp.where(drho_dz > 0.0, p.kd_conv, 0.0)
    zeros = jnp.zeros_like(h[:1])
    return jnp.concatenate([zeros, kd_i, zeros], 0) * G.mask2dT[None]


def double_diffusion_kd(h, T, S, G, GV, eos,
                        p: DDiffParams = DDiffParams()):
    """Salt-finger / diffusive-convection diffusivities for (T, S)
    (CVMix_ddiff role).  Returns (kd_T, kd_S) at interfaces."""
    a_t, a_s, dTdz, dSdz = _ts_gradients(h, T, S, GV, eos)
    alpha_dT = -a_t * dTdz              # buoyancy terms (alpha = -drho/dT)
    beta_dS = a_s * dSdz
    r_rho = alpha_dT / jnp.where(jnp.abs(beta_dS) > 1e-30, beta_dS, 1e-30)

    # salt fingering: warm salty over cold fresh (both decrease downward),
    # 1 < R_rho < rrho0
    sf = (alpha_dT > 0.0) & (beta_dS > 0.0) & (r_rho > 1.0) & \
        (r_rho < p.rrho0)
    fac = jnp.clip(1.0 - (r_rho - 1.0) / (p.rrho0 - 1.0), 0.0, 1.0) ** 3
    kd_s_sf = jnp.where(sf, p.kd_sf_max * fac, 0.0)
    kd_t_sf = 0.7 * kd_s_sf

    # diffusive convection: cold fresh over warm salty, 0 < R_rho < 1
    dc = (alpha_dT < 0.0) & (beta_dS < 0.0) & (r_rho > 0.0) & (r_rho < 1.0)
    kd_t_dc = jnp.where(
        dc, p.kd_dc_mol * 0.909 *
        jnp.exp(4.6 * jnp.exp(-0.54 * (1.0 / jnp.maximum(r_rho, 1e-3) - 1.0))),
        0.0)
    kd_s_dc = kd_t_dc * jnp.clip(1.85 * r_rho - 0.85, 0.15 * r_rho, 1.0)

    zeros = jnp.zeros_like(h[:1])
    pad = lambda x: jnp.concatenate([zeros, x, zeros], 0) * G.mask2dT[None]
    return pad(kd_t_sf + kd_t_dc), pad(kd_s_sf + kd_s_dc)


def full_convection(h, T, S, GV, eos, n_passes: int = None):
    """Instantly remove static instability by pairwise mixing sweeps
    (MOM_full_convection role, fixed pass count = nz)."""
    nz = h.shape[0]
    # pairwise sweeps converge geometrically (bubble-like); 3*nz passes
    # stabilize any profile to small tolerance
    n_passes = n_passes or 3 * nz

    def mix_interface(k, TS):
        """Mix cells (k, k+1) where statically unstable (red-black over a
        full pass is unnecessary at these pass counts)."""
        T, S = TS
        t_u = jax.lax.dynamic_index_in_dim(T, k, 0, keepdims=False)
        t_d = jax.lax.dynamic_index_in_dim(T, k + 1, 0, keepdims=False)
        s_u = jax.lax.dynamic_index_in_dim(S, k, 0, keepdims=False)
        s_d = jax.lax.dynamic_index_in_dim(S, k + 1, 0, keepdims=False)
        h_u = jax.lax.dynamic_index_in_dim(h, k, 0, keepdims=False)
        h_d = jax.lax.dynamic_index_in_dim(h, k + 1, 0, keepdims=False)
        a_t, a_s = eos.density_derivs(0.5 * (t_u + t_d), 0.5 * (s_u + s_d),
                                      jnp.zeros_like(t_u))
        unstable = (a_t * (t_u - t_d) + a_s * (s_u - s_d)) > 0.0
        wsum = jnp.maximum(h_u + h_d, 1e-10)
        t_mix = (h_u * t_u + h_d * t_d) / wsum
        s_mix = (h_u * s_u + h_d * s_d) / wsum
        T = jax.lax.dynamic_update_index_in_dim(
            T, jnp.where(unstable, t_mix, t_u), k, 0)
        T = jax.lax.dynamic_update_index_in_dim(
            T, jnp.where(unstable, t_mix, t_d), k + 1, 0)
        S = jax.lax.dynamic_update_index_in_dim(
            S, jnp.where(unstable, s_mix, s_u), k, 0)
        S = jax.lax.dynamic_update_index_in_dim(
            S, jnp.where(unstable, s_mix, s_d), k + 1, 0)
        return T, S

    def one_pass(_, TS):
        return jax.lax.fori_loop(0, nz - 1, mix_interface, TS)

    T, S = jax.lax.fori_loop(0, n_passes, one_pass, (T, S))
    return T, S