"""Ice shelf thermodynamic boundary layer (3-equation melt).

Analogue of the melt-rate core of MOM6's ice shelf (reference:
src/ice_shelf/MOM_ice_shelf.F90, ~9.4k LoC subsystem; the dynamic SSA ice
solver is a separate planned subsystem): the Holland & Jenkins (1999)
three-equation balance at the ice-ocean interface,

  T_b = lambda1 S_b + lambda2 + lambda3 p          (freezing line)
  c_w gamma_T (T_w - T_b) = (L + c_i (T_b - T_i)) m'   (heat)
  gamma_S (S_w - S_b) = S_b m'                         (salt; m' = m rho_i/rho_w)

eliminating m' gives a quadratic in S_b, solved in closed form (vectorized
elementwise — no iteration).  Returns the melt rate and the heat/salt
fluxes the ocean's top-under-shelf layer receives.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

__all__ = ["IceShelfParams", "three_equation_melt"]


class IceShelfParams(NamedTuple):
    gamma_t: float = 1e-4        # thermal exchange velocity [m s-1]
    gamma_s: float = 5.05e-7 / 1e-4 * 1e-4  # haline exchange velocity [m s-1]
    lambda1: float = -0.0573     # freezing line dTf/dS [degC / (g/kg)]
    lambda2: float = 0.0832      # freezing point offset [degC]
    lambda3: float = -7.53e-8    # pressure coefficient [degC Pa-1]
    latent: float = 3.34e5       # latent heat of fusion [J kg-1]
    c_w: float = 3974.0          # seawater heat capacity [J kg-1 K-1]
    c_i: float = 2009.0          # ice heat capacity
    t_ice: float = -15.0         # ice interior temperature [degC]
    rho_i: float = 918.0
    rho_w: float = 1028.0


def three_equation_melt(T_w, S_w, p_base, p: IceShelfParams = IceShelfParams()
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (melt_rate [m ice s-1], heat_flux_to_ocean [W m-2],
    salt_flux_to_ocean [g kg-1 m s-1]) for mixed-layer-under-shelf
    properties (T_w, S_w) and interface pressure ``p_base`` [Pa]."""
    gt, gs = p.gamma_t, p.gamma_s
    lat_eff = p.latent  # + c_i (T_b - T_i) folded in below per solution

    # quadratic a Sb^2 + b Sb + c = 0 from eliminating m':
    #   m' = gs (S_w - S_b)/S_b
    #   c_w gt (T_w - lam1 Sb - lam2 - lam3 p) = (L + c_i(Tb - Ti)) m'
    # approximating the ice-heat term with T_b ~ freezing at S_w (small
    # correction), i.e. effective latent heat:
    tb_guess = p.lambda1 * S_w + p.lambda2 + p.lambda3 * p_base
    L_eff = p.latent + p.c_i * (tb_guess - p.t_ice)

    a = -p.c_w * gt * p.lambda1
    b = p.c_w * gt * (T_w - p.lambda2 - p.lambda3 * p_base) + gs * L_eff
    c = -gs * L_eff * S_w
    # physical root (positive salinity): Sb = (-b + sqrt(b^2-4ac))/(2a) with
    # a > 0 (lambda1 < 0)
    disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
    s_b = (-b + disc) / (2.0 * a)
    s_b = jnp.where(s_b > 0, s_b, (-b - disc) / (2.0 * a))
    s_b = jnp.clip(s_b, 1.0, 60.0)

    t_b = p.lambda1 * s_b + p.lambda2 + p.lambda3 * p_base
    m_prime = gs * (S_w - s_b) / jnp.maximum(s_b, 1.0)   # [m s-1, water-eq]
    melt = m_prime * p.rho_w / p.rho_i                   # ice meters / s

    # fluxes received by the ocean (positive heat INTO the ocean is
    # negative here: melting cools the ocean)
    heat_flux = -p.rho_w * p.c_w * gt * (T_w - t_b)      # [W m-2]
    salt_flux = -m_prime * s_b                           # freshening
    return melt, heat_flux, salt_flux