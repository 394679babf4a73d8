"""Shortwave penetration (opacity) and geothermal heating.

Analogues of MOM6's MOM_opacity.F90 (Jerlov-type two-band exponential
shortwave absorption; set_pen_shortwave role) and MOM_geothermal.F90
(bottom heat flux into the deepest massive layer)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["OpacityParams", "sw_heating", "geothermal_heating"]


class OpacityParams(NamedTuple):
    """Jerlov water type IB-ish two-band absorption."""
    r_frac: float = 0.58       # fraction in the short (red) band
    zeta1: float = 0.35        # red e-folding depth [m]
    zeta2: float = 23.0        # blue-green e-folding depth [m]


class GeothermalParams(NamedTuple):
    heat_flux: float = 0.0886  # [W m-2] global-mean geothermal flux


def sw_heating(h, sw_flux, GV, p: OpacityParams = OpacityParams(),
               cp: float = 3991.87):
    """Temperature tendency [degC s-1] per layer from penetrating
    shortwave ``sw_flux`` [W m-2] (positive down)."""
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)

    def transmitted(z):
        return (p.r_frac * jnp.exp(-z / p.zeta1)
                + (1.0 - p.r_frac) * jnp.exp(-z / p.zeta2))

    absorbed = transmitted(z_int[:-1]) - transmitted(z_int[1:])
    # SW reaching the bottom is absorbed in the deepest layer
    absorbed = absorbed.at[-1].add(transmitted(z_int[-1]))
    return sw_flux[None] * absorbed / (GV.rho0 * cp *
                                       jnp.maximum(h, 1e-3))


def geothermal_heating(h, GV, p: GeothermalParams = GeothermalParams(),
                       cp: float = 3991.87, h_min: float = 1.0):
    """Temperature tendency [degC s-1]: the geothermal flux warms the
    deepest layer with significant mass (geothermal_in_place role)."""
    # weight ∝ indicator of being the deepest massive layer: find it with
    # a reversed cummax over the mass indicator
    import jax
    massive = (h > h_min).astype(h.dtype)
    below_has_mass = jnp.concatenate(
        [jax.lax.cummax(massive[::-1], axis=0)[::-1][1:],
         jnp.zeros_like(h[:1])], axis=0)
    deepest = massive * (1.0 - below_has_mass)
    return deepest * p.heat_flux / (GV.rho0 * cp * jnp.maximum(h, h_min))