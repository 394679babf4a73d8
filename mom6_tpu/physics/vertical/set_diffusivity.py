"""Interface diapycnal diffusivities.

Analogue of MOM6's set_diffusivity (reference:
src/parameterizations/vertical/MOM_set_diffusivity.F90:243 with find_N2
:1095) assembling the total interface diffusivity from:

* a constant background (KD),
* optional Bryan-Lewis-style depth profile (MOM_bkgnd_mixing),
* shear-driven mixing (kappa-shear / CVMix LMD94 — see kappa_shear.py),
* tidal dissipation (St Laurent / Polzin — see tidal_mixing.py),
* BBL-drag contributions (planned).

Also provides ``find_n2``: the squared buoyancy frequency at interfaces,
needed by KPP/shear mixing/GM."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

__all__ = ["DiffusivityParams", "set_diffusivity", "find_n2"]

_H_EPS = 1e-3


class DiffusivityParams(NamedTuple):
    kd: float = 1e-5               # background diapycnal diffusivity [m2 s-1]
    kd_min: float = 0.0
    kd_max: float = -1.0           # < 0: no cap (MOM6 KD_MAX default)
    bryan_lewis: bool = False
    bl_kd_surf: float = 1e-5       # surface value of the BL profile
    bl_kd_deep: float = 1.3e-4     # abyssal value
    bl_depth: float = 2500.0       # transition depth [m]
    bl_width: float = 300.0        # transition width [m]
    tidal: Optional["TidalMixingParams"] = None  # INT_TIDE_DISSIPATION


def find_n2(h, T, S, G, GV, eos, p_ref: float = 2e7):
    """N^2 at interior interfaces (nz-1, ny, nx), from locally-referenced
    potential density differences (cf. find_N2, MOM_set_diffusivity.F90:1095)."""
    drho_dT, drho_dS = eos.density_derivs(T, S, jnp.asarray(p_ref, T.dtype))
    # interface-mean coefficients
    a_T = 0.5 * (drho_dT[:-1] + drho_dT[1:])
    a_S = 0.5 * (drho_dS[:-1] + drho_dS[1:])
    drho = a_T * (T[1:] - T[:-1]) + a_S * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), _H_EPS)
    n2 = (GV.g_earth / GV.rho0) * drho / dz
    return jnp.maximum(n2, 0.0)


def set_diffusivity(h, G, GV, p: DiffusivityParams,
                    kd_extra: Optional[jnp.ndarray] = None,
                    T=None, S=None, eos=None):
    """Total interface diffusivity (nz+1, ny, nx) [m2 s-1]."""
    nz = h.shape[0]
    shape = (nz + 1,) + h.shape[1:]
    kd = jnp.full(shape, p.kd, h.dtype)
    if p.tidal is not None and T is not None and eos is not None:
        from mom6_tpu.physics.vertical.tidal_mixing import tidal_mixing_kd
        kd = kd + tidal_mixing_kd(h, T, S, G, GV, eos, p.tidal)
    if p.bryan_lewis:
        # depth of each interface below the surface
        z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                                 jnp.cumsum(h, axis=0)], axis=0)
        prof = p.bl_kd_surf + 0.5 * (p.bl_kd_deep - p.bl_kd_surf) * (
            1.0 + jnp.tanh((z_int - p.bl_depth) / p.bl_width))
        kd = jnp.maximum(kd, prof)
    if kd_extra is not None:
        kd = kd + kd_extra
    kd = jnp.maximum(kd, p.kd_min)
    if p.kd_max > 0:
        kd = jnp.minimum(kd, p.kd_max)
    # no flux through surface/bottom
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return kd * G.mask2dT[None]
