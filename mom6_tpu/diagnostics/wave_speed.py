"""First-mode internal gravity wave speed.

Analogue of MOM6's MOM_wave_speed.F90 (tridiagonal eigen-solve per
column).  Round-1 implementation: the WKB approximation
``c1 = (1/pi) int N dz`` — a few-percent-accurate stand-in that is one
cumulative sum (the full Sturm-sequence eigen-solve is a planned upgrade
and slots behind the same API).  Feeds the resolution function and the
barotropic dt estimate."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["wave_speed_wkb"]


def wave_speed_wkb(h, T, S, G, GV, eos):
    """First-mode internal wave speed c1 (ny, nx) [m s-1]."""
    z_int = jnp.cumsum(h, axis=0)[:-1]
    p_int = GV.rho0 * GV.g_earth * z_int
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    drho = a_t * (T[1:] - T[:-1]) + a_s * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), 1e-3)
    n2 = jnp.maximum((GV.g_earth / GV.rho0) * drho / dz, 0.0)
    n_int = jnp.sqrt(n2)
    c1 = jnp.sum(n_int * dz, axis=0) / jnp.pi
    return c1 * G.mask2dT
