"""Variable lateral mixing coefficients (VarMix).

Analogue of MOM6's MOM_lateral_mixing_coeffs.F90: the resolution function
(how well the deformation radius is resolved) and Visbeck-type
coefficients that scale GM/MEKE diffusivities:

* resolution function: R = L_d / dx with L_d = c1/max(|f|, sqrt(c1 beta));
  res_fn = 1 / (1 + (dx/L_d)^p)^(1/p)-style cutoff (power 2 default) —
  suppresses eddy parameterizations where eddies are resolved;
* Visbeck: kappa = l^2 S N (slope-stratification scaling).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["VarMixParams", "resolution_function", "visbeck_coefficient"]

_EPS = 1e-14


class VarMixParams(NamedTuple):
    res_fn_power: int = 2
    visbeck_l_scale: float = 3e4   # mixing length [m]
    khth_max: float = 3000.0
    khth_min: float = 0.0


def resolution_function(c1, f_h, G, p: VarMixParams = VarMixParams(),
                        beta: float = 0.0):
    """res_fn in [0, 1]: ~1 where the deformation radius is unresolved
    (strong parameterization), ~0 where resolved."""
    f_mag = jnp.maximum(jnp.abs(f_h), jnp.sqrt(jnp.maximum(c1 * beta, 0.0)))
    ld = c1 / jnp.maximum(f_mag, _EPS)
    dx = jnp.sqrt(G.dxT * G.dyT)
    r = dx / jnp.maximum(ld, _EPS)
    rp = r ** p.res_fn_power
    return rp / (1.0 + rp)


def visbeck_coefficient(slope_mag, n_mean, p: VarMixParams = VarMixParams()):
    """Visbeck et al. (1997) kappa = alpha l^2 |S| N."""
    return jnp.clip(p.visbeck_l_scale ** 2 * slope_mag * n_mean * 0.015,
                    p.khth_min, p.khth_max)
