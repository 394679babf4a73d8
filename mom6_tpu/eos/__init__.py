"""Equation-of-state dispatcher.

Analogue of MOM6's MOM_EOS (reference: src/equation_of_state/MOM_EOS.F90:
33-58, variants :157-169).  Implemented variants: LINEAR, WRIGHT /
WRIGHT_RED (Wright 1997 reduced-range fit), WRIGHT_FULL (full-range fit),
UNESCO, ROQUET_RHO, ROQUET_SPV, JACKETT06, and TEOS10 (the Roquet et al.
2015 75-term polynomial fit of TEOS-10 with conservative-temperature /
absolute-salinity inputs — the same polynomial the GSW library evaluates
in gsw_specvol; conversions between potential/conservative temperature
and practical/absolute salinity live in ``temperature_convert.py``).

Every EOS carries a ``density_second_derivs`` API (the reference's
calculate_density_second_derivs, MOM_EOS.F90:33-58, needed by the Stanley
parameterization): computed by forward-mode autodiff of the hand-written
first derivatives — exact to rounding, fused by XLA, no hand-coded second
derivatives to maintain.

All functions are elementwise over arbitrary-shaped jnp arrays (they fuse
into calling kernels); ``p`` is pressure in Pa.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.eos import (jackett06, linear, roquet, roquet_spv, unesco,
                          wright, wright_full)

__all__ = ["EOS", "get_eos"]


def _second_derivs_from(density_derivs: Callable) -> Callable:
    """Build calculate_density_second_derivs via forward-mode autodiff of
    the first derivatives.  Returns
    (d2rho_dS2, d2rho_dSdT, d2rho_dT2, d2rho_dSdp, d2rho_dTdp) in the
    reference's argument order (MOM_EOS.F90 calculate_density_second_derivs).
    """
    def second(T, S, p):
        T = jnp.asarray(T)
        S = jnp.asarray(S, T.dtype)
        p = jnp.asarray(p, T.dtype)
        T, S, p = jnp.broadcast_arrays(T, S, p)
        one = jnp.ones_like(T)
        zero = jnp.zeros_like(T)
        # jvp of (drho_dT, drho_dS) along each input direction
        _, (dT_dT, dS_dT) = jax.jvp(
            lambda t: density_derivs(t, S, p), (T,), (one,))
        _, (dT_dS, dS_dS) = jax.jvp(
            lambda s: density_derivs(T, s, p), (S,), (one,))
        _, (dT_dp, dS_dp) = jax.jvp(
            lambda pp: density_derivs(T, S, pp), (p,), (one,))
        del zero
        return dS_dS, dS_dT, dT_dT, dS_dp, dT_dp
    return second


@dataclass(frozen=True)
class EOS:
    name: str
    density: Callable          # (T, S, p, rho_ref=0.0) -> rho - rho_ref
    density_derivs: Callable   # (T, S, p) -> (drho_dT, drho_dS)
    specific_volume: Callable
    density_second_derivs: Optional[Callable] = None
    # (T, S, p) -> (d2_SS, d2_ST, d2_TT, d2_Sp, d2_Tp)
    # analytic layer integral of g*(rho - rho_ref) dz (Wright family);
    # None -> the pressure force falls back to Boole quadrature
    int_density_dz: Optional[Callable] = None

    def __hash__(self):
        return hash(self.name)


_REGISTRY: Dict[str, EOS] = {}


def _register(name: str, mod) -> None:
    _REGISTRY[name] = EOS(
        name=name, density=mod.density,
        density_derivs=mod.density_derivs,
        specific_volume=mod.specific_volume,
        density_second_derivs=_second_derivs_from(mod.density_derivs),
        int_density_dz=getattr(mod, "int_density_dz", None))


_register("LINEAR", linear)
_register("WRIGHT", wright)
_register("ROQUET_RHO", roquet)
_register("UNESCO", unesco)
_register("JACKETT06", jackett06)
_register("ROQUET_SPV", roquet_spv)
_register("WRIGHT_FULL", wright_full)

import dataclasses as _dc  # noqa: E402

# WRIGHT_RED is the same reduced-range fit as WRIGHT (the reference keeps
# both names, MOM_EOS_Wright_red.F90 being the refactored duplicate)
_REGISTRY["WRIGHT_RED"] = _dc.replace(_REGISTRY["WRIGHT"],
                                      name="WRIGHT_RED")
_REGISTRY["WRIGHT_REDUCED"] = _dc.replace(_REGISTRY["WRIGHT"],
                                          name="WRIGHT_REDUCED")
# TEOS10 evaluates the Roquet 75-term polynomial fit of TEOS-10 (what the
# GSW library's gsw_specvol computes) with CT/SA inputs
_REGISTRY["TEOS10"] = _dc.replace(_REGISTRY["ROQUET_SPV"], name="TEOS10")


def get_eos(name: str) -> EOS:
    key = name.upper()
    if key in _REGISTRY:
        return _REGISTRY[key]
    raise ValueError(f"unknown EOS {name}; available: {sorted(_REGISTRY)}")
