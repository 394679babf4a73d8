"""Surface wave interface: Stokes drift and Langmuir mixing enhancement.

Analogue of MOM6's wave interface (reference:
src/user/MOM_wave_interface.F90:2219 — Stokes profiles from data/DHH85/
LF17, Langmuir number for KPP/ePBL):

* an equilibrium-sea Stokes drift profile from the 10 m wind
  (Donelan-Hamilton-Hui-flavored monochromatic-equivalent fit):
  u_s(z) = u_s0 exp(2 k_p z) with u_s0 ~ 0.016 U10 and the peak
  wavenumber from the wind-sea Pierson-Moskowitz relation;
* the turbulent Langmuir number La_t = sqrt(u*/u_s0);
* the Li et al. (2016)-style mixing enhancement factor applied to
  KPP/ePBL velocity scales.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["WaveParams", "stokes_drift_profile", "langmuir_number",
           "langmuir_enhancement"]

_G = 9.81


class WaveParams(NamedTuple):
    us0_per_u10: float = 0.016     # surface Stokes / 10m wind ratio
    pm_peak_coef: float = 0.877    # PM peak frequency: w_p = coef*g/U10


def stokes_drift_profile(u10, z_depth, p: WaveParams = WaveParams()):
    """Stokes drift magnitude at depths ``z_depth`` (positive down)."""
    us0 = p.us0_per_u10 * u10
    w_p = p.pm_peak_coef * _G / jnp.maximum(u10, 0.1)
    k_p = w_p * w_p / _G
    return us0 * jnp.exp(-2.0 * k_p * z_depth)


def langmuir_number(ustar, u10, p: WaveParams = WaveParams()):
    """Turbulent Langmuir number La_t = sqrt(u*/u_s0)."""
    us0 = jnp.maximum(p.us0_per_u10 * u10, 1e-8)
    return jnp.sqrt(jnp.maximum(ustar, 1e-8) / us0)


def langmuir_enhancement(la_t):
    """Mixing enhancement factor F(La_t) (Li et al. 2016 fit as used for
    ePBL/KPP): F = sqrt(1 + (1.5 La)^-2 + (5.4 La)^-4), capped."""
    la = jnp.maximum(la_t, 0.1)
    f = jnp.sqrt(1.0 + (1.5 * la) ** -2 + (5.4 * la) ** -4)
    return jnp.minimum(f, 5.0)