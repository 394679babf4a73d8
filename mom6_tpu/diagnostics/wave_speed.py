"""First-mode internal gravity wave speed.

Analogue of MOM6's MOM_wave_speed.F90 (per-column eigen-solve):

* :func:`wave_speed` — the discrete vertical-mode eigenproblem
  ``M w = -(N^2 dz / c^2) w`` (w at interior interfaces, w=0 at
  top/bottom) solved by batched INVERSE ITERATION: each iteration is one
  tridiagonal solve over all columns at once (the TPU-native replacement
  for the reference's per-column Sturm-sequence root finder);
* :func:`wave_speed_wkb` — the WKB estimate ``c1 = (1/pi) int N dz``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mom6_tpu.framework.solvers import tridiag_solve

__all__ = ["wave_speed", "wave_speed_wkb"]


def _n2_dz(h, T, S, GV, eos):
    z_int = jnp.cumsum(h, axis=0)[:-1]
    p_int = GV.rho0 * GV.g_earth * z_int
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    drho = a_t * (T[1:] - T[:-1]) + a_s * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), 1e-3)
    n2 = jnp.maximum((GV.g_earth / GV.rho0) * drho / dz, 1e-12)
    return n2, dz


def wave_speed(h, T, S, G, GV, eos, n_iter: int = 10):
    """First-mode internal wave speed c1 (ny, nx) [m s-1] from the
    tridiagonal mode eigenproblem (batched inverse iteration)."""
    n2, dz_int = _n2_dz(h, T, S, GV, eos)        # (nz-1, ny, nx)
    inv_h = 1.0 / jnp.maximum(h, 1e-3)           # (nz, ...)
    # second-difference operator on interior interfaces K=1..nz-1:
    # row K: [1/h_K, -(1/h_K + 1/h_{K+1}), 1/h_{K+1}]
    a = inv_h[:-1]                                # sub-diagonal (w_{K-1})
    c = inv_h[1:]                                 # super-diagonal (w_{K+1})
    b = -(inv_h[:-1] + inv_h[1:])
    # Dirichlet BCs: first row has no sub, last no super
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)
    d_weight = n2 * dz_int                        # the B diagonal

    x = jnp.ones_like(n2)

    def iterate(_, x):
        rhs = d_weight * x
        y = tridiag_solve(a, b, c, rhs)
        norm = jnp.sqrt(jnp.sum(y * y, axis=0, keepdims=True))
        return y / jnp.maximum(norm, 1e-30)

    x = jax.lax.fori_loop(0, n_iter, iterate, x)
    # Rayleigh quotient lambda = (x^T M x)/(x^T B x) = -1/c^2
    x_up = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], 0)
    x_dn = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)
    mx = a * x_up + b * x + c * x_dn
    lam = jnp.sum(x * mx, axis=0) / jnp.maximum(
        jnp.sum(x * d_weight * x, axis=0), 1e-30)
    c2 = -1.0 / jnp.minimum(lam, -1e-12)
    return jnp.sqrt(jnp.maximum(c2, 0.0)) * G.mask2dT


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
