"""UNESCO (Jackett & McDougall 1995) equation of state.

The classic UNESCO-1983 seawater EOS with the Jackett & McDougall (1995)
potential-temperature recasting: in-situ density from the surface density
polynomial and the secant bulk modulus,

    rho(T, S, p) = rho0(T, S) / (1 - p / K(T, S, p)),

with T potential temperature [degC], S salinity [PSU], p pressure [Pa]
(bar internally).  Coefficients are the published constants (this is the
scheme behind the reference's EOS_UNESCO,
src/equation_of_state/MOM_EOS_UNESCO.F90).  Derivatives are computed by
numerically differentiating the (dtype-generic) density — the routine is
for initialization/diagnostics parity rather than the hot path, where
WRIGHT/ROQUET_RHO are preferred.
"""

from __future__ import annotations

__all__ = ["density", "density_derivs", "specific_volume"]

_PA2BAR = 1.0e-5

# surface density rho0(T, S) [kg m-3]
_R0 = (999.842594, 6.793952e-2, -9.095290e-3, 1.001685e-4, -1.120083e-6,
       6.536332e-9)
_RS1 = (0.824493, -4.0899e-3, 7.6438e-5, -8.2467e-7, 5.3875e-9)
_RS15 = (-5.72466e-3, 1.0227e-4, -1.6546e-6)
_RS2 = 4.8314e-4

# secant bulk modulus K(T, S, p) [bar]
_K0_T = (1.965933e4, 1.444304e2, -1.706103, 9.648704e-3, -4.190253e-5)
_K0_S1 = (52.84855, -3.101089e-1, 6.283263e-3, -5.084188e-5)
_K0_S15 = (3.886640e-1, 9.085835e-3, -4.619924e-4)
_K1_T = (3.186519, 2.212276e-2, -2.984642e-4, 1.956415e-6)
_K1_S1 = (6.704388e-3, -1.847318e-4, 2.059331e-7)
_K1_S15 = 1.480266e-4
_K2_T = (2.102898e-4, -1.202016e-5, 1.394680e-7)
_K2_S1 = (-2.040237e-6, 6.128773e-8, 6.207323e-10)


def _poly(t, coeffs):
    total = 0.0
    for c in reversed(coeffs):
        total = total * t + c
    return total


def density(T, S, p, rho_ref: float = 0.0):
    s_root = abs(S) ** 0.5
    rho0 = (_poly(T, _R0) + S * (_poly(T, _RS1) + s_root * _poly(T, _RS15))
            + _RS2 * S * S)
    pb = p * _PA2BAR
    k = (_poly(T, _K0_T) + S * (_poly(T, _K0_S1) + s_root * _poly(T, _K0_S15))
         + pb * (_poly(T, _K1_T) + S * (_poly(T, _K1_S1)
                                        + s_root * _K1_S15))
         + pb * pb * (_poly(T, _K2_T) + S * _poly(T, _K2_S1)))
    return rho0 / (1.0 - pb / k) - rho_ref


def density_derivs(T, S, p):
    eps_t, eps_s = 1e-4, 1e-4
    dT = (density(T + eps_t, S, p) - density(T - eps_t, S, p)) / (2 * eps_t)
    dS = (density(T, S + eps_s, p) - density(T, S - eps_s, p)) / (2 * eps_s)
    return dT, dS


def specific_volume(T, S, p, spv_ref: float = 0.0):
    return 1.0 / density(T, S, p) - spv_ref