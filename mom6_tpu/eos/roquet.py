"""Roquet et al. (2015) polynomial TEOS-10 equation of state (rho form).

The 55-term polyTEOS10-bsq fit of Roquet, Madec, McDougall & Barker,
Ocean Modelling 90 (2015): in-situ density as a polynomial in
(zs, zt, zp) where zs = sqrt((S_A + 32)/35.16504*0.875...), zt = CT, zp = p,
plus a T/S-independent vertical reference profile rho00(p).  This is the
scheme behind MOM6's EOS_ROQUET_RHO (reference:
src/equation_of_state/MOM_EOS_Roquet_rho.F90; the coefficients are the
published constants of the paper's appendix).

Implementation: one coefficient table keyed by the (zs, zt, zp) exponents,
evaluated as a flat sum of monomials (XLA fuses this into a single
elementwise kernel; the MOM6-style nested Horner factorization buys
nothing under a fusing compiler).  Temperature/salinity derivatives are
generated from the same table by exponent shifting — no hand-maintained
derivative coefficient lists.

Inputs are conservative temperature [degC], absolute salinity [g kg-1]
and pressure [Pa].
"""

from __future__ import annotations

from typing import Dict, Tuple

__all__ = ["density", "density_derivs", "specific_volume"]

_PA2KB = 1.0e-8
_RDELTA_S = 32.0
_R1_S0 = 0.875 / 35.16504
_I_TS = 0.025

# (zs_exp, zt_exp, zp_exp) -> raw coefficient (paper units: kbar for p)
_COEFFS: Dict[Tuple[int, int, int], float] = {
    (0, 0, 0): 8.0189615746e+02,
    (1, 0, 0): 8.6672408165e+02,
    (2, 0, 0): -1.7864682637e+03,
    (3, 0, 0): 2.0375295546e+03,
    (4, 0, 0): -1.2849161071e+03,
    (5, 0, 0): 4.3227585684e+02,
    (6, 0, 0): -6.0579916612e+01,
    (0, 1, 0): 2.6010145068e+01,
    (1, 1, 0): -6.5281885265e+01,
    (2, 1, 0): 8.1770425108e+01,
    (3, 1, 0): -5.6888046321e+01,
    (4, 1, 0): 1.7681814114e+01,
    (5, 1, 0): -1.9193502195e+00,
    (0, 2, 0): -3.7074170417e+01,
    (1, 2, 0): 6.1548258127e+01,
    (2, 2, 0): -6.0362551501e+01,
    (3, 2, 0): 2.9130021253e+01,
    (4, 2, 0): -5.4723692739e+00,
    (0, 3, 0): 2.1661789529e+01,
    (1, 3, 0): -3.3449108469e+01,
    (2, 3, 0): 1.9717078466e+01,
    (3, 3, 0): -3.1742946532e+00,
    (0, 4, 0): -8.3627885467e+00,
    (1, 4, 0): 1.1311538584e+01,
    (2, 4, 0): -5.3563304045e+00,
    (0, 5, 0): 5.4048723791e-01,
    (1, 5, 0): 4.8169980163e-01,
    (0, 6, 0): -1.9083568888e-01,
    (0, 0, 1): 1.9681925209e+01,
    (1, 0, 1): -4.2549998214e+01,
    (2, 0, 1): 5.0774768218e+01,
    (3, 0, 1): -3.0938076334e+01,
    (4, 0, 1): 6.6051753097e+00,
    (0, 1, 1): -1.3336301113e+01,
    (1, 1, 1): -4.4870114575e+00,
    (2, 1, 1): 5.0042598061e+00,
    (3, 1, 1): -6.5399043664e-01,
    (0, 2, 1): 6.7080479603e+00,
    (1, 2, 1): 3.5063081279e+00,
    (2, 2, 1): -1.8795372996e+00,
    (0, 3, 1): -2.4649669534e+00,
    (1, 3, 1): -5.5077101279e-01,
    (0, 4, 1): 5.5927935970e-01,
    (0, 0, 2): 2.0660924175e+00,
    (1, 0, 2): -4.9527603989e+00,
    (2, 0, 2): 2.5019633244e+00,
    (0, 1, 2): 2.0564311499e+00,
    (1, 1, 2): -2.1311365518e-01,
    (0, 2, 2): -1.2419983026e+00,
    (0, 0, 3): -2.3342758797e-02,
    (1, 0, 3): -1.8507636718e-02,
    (0, 1, 3): 3.7969820455e-01,
}

# reference vertical profile rho00(p): coefficients of p, p^2, ... (kbar)
_R_PROF = (4.6494977072e+01, -5.2099962525e+00, 2.2601900708e-01,
           6.4326772569e-02, 1.5616995503e-02, -1.7243708991e-03)

# pre-scale coefficients to SI units (T in degC, p in Pa)
# coefficients stay in paper units; the polynomial is evaluated in the
# O(1) scaled variables zt = T * I_TS and zp = p * Pa2kb — folding the
# scales into the coefficients instead makes p**6 overflow f32 (inf)
# against an underflowed (~1e-48) coefficient, which is NaN
_TERMS = tuple((i, j, k, c) for (i, j, k), c in sorted(_COEFFS.items()))


def _zs(S):
    # dtype-generic (numpy float64 for offline checks, jnp f32 in-model)
    return (abs(S + _RDELTA_S) * _R1_S0) ** 0.5


def _poly(zs, zt, zp, ds: int = 0, dt_: int = 0):
    """Sum of monomials, optionally differentiated ds times in zs and
    dt_ times in zt (exponent shifting)."""
    total = 0.0
    for i, j, k, c in _TERMS:
        if (ds and i < ds) or (dt_ and j < dt_):
            continue
        coef = c
        for n in range(ds):
            coef *= (i - n)
        for n in range(dt_):
            coef *= (j - n)
        term = coef
        if i - ds:
            term = term * zs ** (i - ds)
        if j - dt_:
            term = term * zt ** (j - dt_)
        if k:
            term = term * zp ** k
        total = total + term
    return total


def _rho00(zp):
    total = 0.0
    for n, c in enumerate(_R_PROF):
        total = total + c * zp ** (n + 1)
    return total


def density(T, S, p, rho_ref: float = 0.0):
    """In-situ density [kg m-3] (minus rho_ref)."""
    zs = _zs(S)
    zt = T * _I_TS
    zp = p * _PA2KB
    return (_poly(zs, zt, zp) - rho_ref) + _rho00(zp)


def density_derivs(T, S, p):
    """(drho_dT, drho_dS) at constant pressure."""
    zs = _zs(S)
    zt = T * _I_TS
    zp = p * _PA2KB
    drho_dT = _poly(zs, zt, zp, dt_=1) * _I_TS
    # d(rho)/dS = d(rho)/d(zs) * d(zs)/dS;  zs = sqrt((S+dS0)*r) =>
    # dzs/dS = r / (2 zs)
    dzs_dS = 0.5 * _R1_S0 / zs
    drho_dS = _poly(zs, zt, zp, ds=1) * dzs_dS
    return drho_dT, drho_dS


def specific_volume(T, S, p, spv_ref: float = 0.0):
    rho = density(T, S, p)
    return 1.0 / rho - spv_ref
