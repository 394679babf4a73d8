"""Equation-of-state dispatcher.

Analogue of MOM6's MOM_EOS (reference: src/equation_of_state/MOM_EOS.F90:
33-58, variants :157-169).  Implemented variants: LINEAR, WRIGHT (Wright
1997 reduced fit).  WRIGHT_FULL/ROQUET/TEOS10/UNESCO/JACKETT06 are planned;
the dispatcher raises for unimplemented names so configs fail loudly.

All functions are elementwise over arbitrary-shaped jnp arrays (they fuse
into calling kernels); ``p`` is pressure in Pa.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

from mom6_tpu.eos import (jackett06, linear, roquet, roquet_spv, unesco,
                          wright)

__all__ = ["EOS", "get_eos"]


@dataclass(frozen=True)
class EOS:
    name: str
    density: Callable          # (T, S, p, rho_ref=0.0) -> rho - rho_ref
    density_derivs: Callable   # (T, S, p) -> (drho_dT, drho_dS)
    specific_volume: Callable

    def __hash__(self):
        return hash(self.name)


_REGISTRY: Dict[str, EOS] = {}


def _register(name: str, mod) -> None:
    _REGISTRY[name] = EOS(name=name, density=mod.density,
                          density_derivs=mod.density_derivs,
                          specific_volume=mod.specific_volume)


_register("LINEAR", linear)
_register("WRIGHT", wright)
_register("ROQUET_RHO", roquet)
_register("UNESCO", unesco)
_register("JACKETT06", jackett06)
_register("ROQUET_SPV", roquet_spv)
# TEOS10 dispatches to the Roquet 75-term polynomial fit of TEOS-10
# (the reference's EOS_TEOS10 calls the GSW library; the Roquet fit is
# its published polynomial approximation with the same CT/SA inputs)
import dataclasses as _dc  # noqa: E402
_REGISTRY["TEOS10"] = _dc.replace(_REGISTRY["ROQUET_SPV"], name="TEOS10")

_PLANNED = ("WRIGHT_FULL", "WRIGHT_REDUCED")


def get_eos(name: str) -> EOS:
    key = name.upper()
    if key in _REGISTRY:
        return _REGISTRY[key]
    if key in _PLANNED:
        raise NotImplementedError(
            f"EOS {name} is recognized but not yet implemented; "
            f"available: {sorted(_REGISTRY)}")
    raise ValueError(f"unknown EOS {name}; available: {sorted(_REGISTRY)}")
