"""Jackett et al. (2006) 25-term rational-function equation of state.

rho(T, S, p) = N(T, S, p) / D(T, S, p), the fit of Jackett, McDougall,
Feistel, Wright & Griffies, J. Atmos. Ocean. Tech. 23, 2006 (algorithms
for density, potential temperature, conservative temperature...), using
the published Table-A1 coefficients (the same constants appear in the
reference at src/equation_of_state/MOM_EOS_Jackett06.F90:19-45).

T is potential temperature [degC], S practical salinity [PSU], p
pressure [Pa].  Derivatives follow from the quotient rule with the
analytic polynomial derivatives (the reference's
calculate_density_derivs_elem_Jackett06 role).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["density", "density_derivs", "specific_volume"]

# numerator coefficients RNabc: S**a * T**b * p**c
_RN000 = 9.9984085444849347e+02
_RN001 = 1.1798263740430364e-06
_RN002 = -2.5862187075154352e-16
_RN010 = 7.3471625860981584e+00
_RN020 = -5.3211231792841769e-02
_RN021 = 9.8920219266399117e-12
_RN022 = -3.2921414007960662e-20
_RN030 = 3.6492439109814549e-04
_RN100 = 2.5880571023991390e+00
_RN101 = 4.6996642771754730e-10
_RN110 = -6.7168282786692355e-03
_RN200 = 1.9203202055760151e-03
# denominator coefficients RDabc (a=6 denotes S**1.5)
_RD001 = 6.7103246285651894e-10
_RD010 = 7.2815210113327091e-03
_RD013 = -9.1534417604289062e-30
_RD020 = -4.4787265461983921e-05
_RD030 = 3.3851002965802430e-07
_RD032 = -2.4461698007024582e-25
_RD040 = 1.3651202389758572e-10
_RD100 = 1.7632126669040377e-03
_RD110 = -8.8066583251206474e-06
_RD130 = -1.8832689434804897e-10
_RD600 = 5.7463776745432097e-06
_RD620 = 1.4716275472242334e-09


def _num_den(T, S, p):
    S0 = jnp.maximum(S, 0.0)
    s15 = S0 * jnp.sqrt(S0)
    num = (_RN000 + T * (_RN010 + T * (_RN020 + T * _RN030))
           + S0 * (_RN100 + T * _RN110 + S0 * _RN200)
           + p * (_RN001 + T * T * (_RN021 + p * _RN022)
                  + p * _RN002 + S0 * _RN101))
    den = (1.0 + T * (_RD010 + T * (_RD020 + T * (_RD030 + T * _RD040)))
           + S0 * (_RD100 + T * (_RD110 + T * T * _RD130))
           + s15 * (_RD600 + T * T * _RD620)
           + p * (_RD001 + p * p * T * _RD013 + T ** 3 * p * _RD032))
    return num, den


def density(T, S, p, rho_ref: float = 0.0):
    num, den = _num_den(T, S, p)
    if rho_ref:
        # rho - rho_ref = (num - rho_ref*den)/den, evaluated without the
        # large-term cancellation
        return (num - rho_ref * den) / den
    return num / den


def density_derivs(T, S, p):
    """(drho/dT, drho/dS) by the quotient rule."""
    S0 = jnp.maximum(S, 0.0)
    s05 = jnp.sqrt(S0)
    s15 = S0 * s05
    num, den = _num_den(T, S, p)
    dn_dT = (_RN010 + T * (2.0 * _RN020 + T * 3.0 * _RN030)
             + S0 * _RN110 + p * T * (2.0 * _RN021 + p * 2.0 * _RN022))
    dd_dT = (_RD010 + T * (2.0 * _RD020 + T * (3.0 * _RD030
                                               + T * 4.0 * _RD040))
             + S0 * (_RD110 + T * T * 3.0 * _RD130)
             + s15 * T * 2.0 * _RD620
             + p * (p * p * _RD013 + 3.0 * T * T * p * _RD032))
    dn_dS = _RN100 + T * _RN110 + S0 * 2.0 * _RN200 + p * _RN101
    dd_dS = (_RD100 + T * (_RD110 + T * T * _RD130)
             + 1.5 * s05 * (_RD600 + T * T * _RD620))
    iden = 1.0 / den
    drho_dT = (dn_dT - num * iden * dd_dT) * iden
    drho_dS = (dn_dS - num * iden * dd_dS) * iden
    return drho_dT, drho_dS


def specific_volume(T, S, p, spv_ref: float = 0.0):
    num, den = _num_den(T, S, p)
    if spv_ref:
        return (den - spv_ref * num) / num
    return den / num
