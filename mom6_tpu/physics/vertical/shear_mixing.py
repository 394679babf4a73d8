"""Shear-driven interior mixing.

Native implementations of the Richardson-number shear mixing schemes MOM6
gets from CVMix (reference:
src/parameterizations/vertical/MOM_CVMix_shear.F90 — LMD94 and PP81), from
the published formulations:

* LMD94:  nu = nu0 * (1 - (Ri/Ri0)^2)^3  for 0 < Ri < Ri0, nu0 below 0,
          0 above Ri0  (Large et al. 1994, eq. 28);
* PP81:   nu = nu0 / (1 + 5 Ri)^2 + nu_b (Pacanowski & Philander 1981).

The Jackson-Hallberg-Legg iterative scheme (MOM_kappa_shear.F90) is a
planned follow-on.  Returns interface diffusivities (nz+1, ny, nx).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, jm1

__all__ = ["ShearMixingParams", "shear_mixing_kd"]

_EPS = 1e-14


class ShearMixingParams(NamedTuple):
    scheme: str = "LMD94"        # LMD94 | PP81
    nu0: float = 5e-3            # max shear diffusivity [m2 s-1]
    ri0: float = 0.7             # cutoff Richardson number (LMD94)
    pp_alpha: float = 5.0        # PP81 (1 + alpha Ri)
    pp_exp: float = 2.0


def richardson_number(h, u, v, T, S, GV, eos):
    """Gradient Richardson number at interior interfaces (nz-1, ny, nx)."""
    uc = 0.5 * (u + im1(u))
    vc = 0.5 * (v + jm1(v))
    # locally-referenced N^2: density difference from EOS derivatives at the
    # interface pressure (differencing in-situ densities would count
    # adiabatic compression as stratification)
    z_int = jnp.cumsum(h, axis=0)[:-1]
    p_int = GV.rho0 * GV.g_earth * z_int
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    drho = a_t * (T[1:] - T[:-1]) + a_s * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), 1e-3)
    n2 = (GV.g_earth / GV.rho0) * drho / dz
    du = (uc[1:] - uc[:-1]) / dz
    dv = (vc[1:] - vc[:-1]) / dz
    s2 = du * du + dv * dv
    return n2 / jnp.maximum(s2, _EPS)


def shear_mixing_kd(h, u, v, T, S, G, GV, eos,
                    p: ShearMixingParams = ShearMixingParams()):
    """Interface diffusivity from shear instability (nz+1, ny, nx)."""
    ri = richardson_number(h, u, v, T, S, GV, eos)
    if p.scheme == "LMD94":
        x = jnp.clip(ri / p.ri0, 0.0, 1.0)
        kd_i = p.nu0 * (1.0 - x * x) ** 3
        kd_i = jnp.where(ri < 0.0, p.nu0, kd_i)
    elif p.scheme == "PP81":
        kd_i = p.nu0 / (1.0 + p.pp_alpha * jnp.maximum(ri, 0.0)) ** p.pp_exp
    else:
        raise ValueError(f"unknown shear mixing scheme {p.scheme}")
    zeros = jnp.zeros_like(h[:1])
    return jnp.concatenate([zeros, kd_i, zeros], axis=0) * G.mask2dT[None]
