"""Jackson-Hallberg-Legg-style shear-driven mixing with feedback.

Role of MOM6's MOM_kappa_shear.F90 (Jackson, Hallberg & Legg 2008): unlike
the instantaneous Ri-based schemes (LMD94/PP81), the JHL closure evolves
kappa together with the profiles it mixes, so the mixing SATURATES once
the shear that drives it has been consumed within the time step.

This implementation keeps the reference's source law

    K_src = 2 * shearmix_rate * sqrt(S2)
            * (Ri_c S2 - N2) / (Ri_c S2 + FRi_curv N2)   where Ri < Ri_c

and its mixing-length bound (distance to boundaries + buoyancy length),
but replaces the per-column predictor-corrector with a fixed-count
fixed-point iteration, batched over all columns: each iteration
(a) implicitly mixes u/v/T/S over dt with the current kappa (four batched
tridiagonal solves) and (b) re-evaluates kappa = K_src * L_eff^2 on the
mixed profiles.  Quantitative parity constants are a follow-on; the
qualitative JHL property (self-limitation) is tested.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, jm1
from mom6_tpu.tracers.vert_diff import tracer_vertdiff

__all__ = ["KappaShearParams", "kappa_shear"]

_H_EPS = 1e-3


class KappaShearParams(NamedTuple):
    ri_crit: float = 0.25         # RINO_CRIT
    shearmix_rate: float = 0.089  # SHEARMIX_RATE
    fri_curvature: float = -0.97  # FRI_CURVATURE
    lambda_buoy: float = 0.82     # LAMBDA (buoyancy length coefficient)
    kappa_max: float = 0.1        # [m2 s-1]
    n_iter: int = 5


def _n2_s2(h, uc, vc, T, S, GV, eos):
    z_int = jnp.cumsum(h, axis=0)[:-1]
    p_int = GV.rho0 * GV.g_earth * z_int
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), _H_EPS)
    n2 = (GV.g_earth / GV.rho0) * (a_t * (T[1:] - T[:-1])
                                   + a_s * (S[1:] - S[:-1])) / dz
    du = (uc[:-1] - uc[1:]) / dz
    dv = (vc[:-1] - vc[1:]) / dz
    return jnp.maximum(n2, 0.0), du * du + dv * dv, z_int


def kappa_shear(h, u, v, T, S, G, GV, eos,
                p: KappaShearParams = KappaShearParams(), dt: float = 3600.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (kappa (nz+1, ny, nx) [m2 s-1], tke-proxy at interfaces)."""
    uc = 0.5 * (u + im1(u))
    vc = 0.5 * (v + jm1(v))
    col = jnp.sum(h, axis=0)

    def kappa_from_profiles(uc_m, vc_m, T_m, S_m):
        n2, s2, z_int = _n2_s2(h, uc_m, vc_m, T_m, S_m, GV, eos)
        ric = p.ri_crit
        src_num = ric * s2 - n2
        src_den = ric * s2 + p.fri_curvature * n2
        k_src = jnp.where(
            (n2 < ric * s2) & (src_den > 0.0),
            2.0 * p.shearmix_rate * jnp.sqrt(s2) * src_num
            / jnp.maximum(src_den, 1e-30), 0.0)          # [s-1]
        # mixing length: bounded by distance to the boundaries and by the
        # buoyancy length lambda * sqrt(S2)/N-ish scale
        l_bdry = jnp.minimum(z_int, col[None] - z_int)
        l_buoy = p.lambda_buoy * jnp.sqrt(jnp.maximum(s2, 1e-14)) \
            / jnp.maximum(jnp.sqrt(n2) + 1e-7, 1e-7) * 10.0
        inv_l2 = 1.0 / jnp.maximum(l_bdry, _H_EPS) ** 2 \
            + 1.0 / jnp.maximum(l_buoy, _H_EPS) ** 2
        l_eff2 = 1.0 / inv_l2
        return jnp.minimum(k_src * l_eff2, p.kappa_max)

    kappa_i = kappa_from_profiles(uc, vc, T, S)           # (nz-1, ...)

    def iterate(_, kappa_i):
        kd = jnp.concatenate([jnp.zeros_like(h[:1]), kappa_i,
                              jnp.zeros_like(h[:1])], axis=0)
        mixed = tracer_vertdiff(jnp.stack([uc, vc, T, S]), h, kd, dt)
        k_new = kappa_from_profiles(mixed[0], mixed[1], mixed[2], mixed[3])
        return 0.5 * (kappa_i + k_new)                    # damped iteration

    kappa_i = jax.lax.fori_loop(0, p.n_iter, iterate, kappa_i)
    zeros = jnp.zeros_like(h[:1])
    kappa = jnp.concatenate([zeros, kappa_i, zeros], axis=0) \
        * G.mask2dT[None]
    tke = kappa * jnp.sqrt(jnp.concatenate(
        [zeros, _n2_s2(h, uc, vc, T, S, GV, eos)[1], zeros], axis=0))
    return kappa, tke