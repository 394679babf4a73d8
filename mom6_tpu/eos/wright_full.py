"""Wright (1997) equation of state — FULL-range fit.

The full-range rational-function fit of Wright, J. Atmos. Ocean. Tech. 14,
735-740 (1997), valid over (-2..40 degC, 0..40 PSU, 0..1e8 Pa) — the
scheme behind MOM6's EOS_WRIGHT_FULL (reference:
src/equation_of_state/MOM_EOS_Wright_full.F90; coefficients are the
published constants from the paper's full-range table).  Same functional
form as the reduced fit in ``wright.py``:

    rho(T, S, p) = (p + p0(T,S)) / (lambda(T,S) + alpha0(T,S) * (p + p0))
"""

from __future__ import annotations

__all__ = ["density", "density_derivs", "specific_volume", "compressibility"]

# Wright (1997) full-range fit coefficients
_A0 = 7.133718e-4
_A1 = 2.724670e-7
_A2 = -1.646582e-7
_B0 = 5.613770e8
_B1 = 3.600337e6
_B2 = -3.727194e4
_B3 = 1.660557e2
_B4 = 6.844158e5
_B5 = -8.389457e3
_C0 = 1.609893e5
_C1 = 8.427815e2
_C2 = -6.931554
_C3 = 3.869318e-2
_C4 = -1.664201e2
_C5 = -2.765195


def _fits(T, S):
    al0 = (_A0 + _A1 * T) + _A2 * S
    p0 = (_B0 + _B4 * S) + T * (_B1 + T * (_B2 + _B3 * T) + _B5 * S)
    lam = (_C0 + _C4 * S) + T * (_C1 + T * (_C2 + _C3 * T) + _C5 * S)
    return al0, p0, lam


def density(T, S, p, rho_ref: float = 0.0):
    """In-situ density [kg m-3] (minus ``rho_ref`` for precision)."""
    al0, p0, lam = _fits(T, S)
    pp = p + p0
    denom = lam + al0 * pp
    if rho_ref:
        return (pp - rho_ref * denom) / denom
    return pp / denom


def specific_volume(T, S, p, spv_ref: float = 0.0):
    al0, p0, lam = _fits(T, S)
    pp = p + p0
    return (al0 - spv_ref) + lam / pp


def density_derivs(T, S, p):
    """(drho_dT, drho_dS) [kg m-3 degC-1], [kg m-3 PSU-1]."""
    al0, p0, lam = _fits(T, S)
    pp = p + p0
    I_denom = 1.0 / (lam + al0 * pp)
    I_denom2 = I_denom * I_denom
    dp0_dT = _B1 + T * (2.0 * _B2 + 3.0 * _B3 * T) + _B5 * S
    dp0_dS = _B4 + _B5 * T
    dlam_dT = _C1 + T * (2.0 * _C2 + 3.0 * _C3 * T) + _C5 * S
    dlam_dS = _C4 + _C5 * T
    drho_dT = I_denom2 * (dp0_dT * lam - pp * (dlam_dT + _A1 * pp))
    drho_dS = I_denom2 * (dp0_dS * lam - pp * (dlam_dS + _A2 * pp))
    return drho_dT, drho_dS


def compressibility(T, S, p):
    """drho_dp [kg m-3 Pa-1]."""
    al0, p0, lam = _fits(T, S)
    pp = p + p0
    denom = lam + al0 * pp
    return lam / (denom * denom)


def int_density_dz(T, S, e_t, e_b, g: float, rho0: float,
                   rho_ref: float = 0.0):
    """Analytic layer density integral with the full-range Wright fit
    (int_density_dz_wright_full, MOM_EOS_Wright_full.F90; closed form
    shared with eos/wright.py)."""
    from mom6_tpu.eos.wright import _analytic_int
    return _analytic_int(_fits(T, S), e_t, e_b, g, rho0, rho_ref)
