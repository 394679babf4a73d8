"""Wright (1997) equation of state.

Implements the "reduced range" rational-function fit of Wright, J. Atmos.
Ocean. Tech. 14, 735-740 (1997) — the scheme behind MOM6's EOS_WRIGHT
(reference: src/equation_of_state/MOM_EOS_Wright.F90; coefficients are the
published constants from the paper, Table 1, "reduced fit"):

    rho(T, S, p) = (p + p0(T,S)) / (lambda(T,S) + alpha0(T,S) * (p + p0(T,S)))

with alpha0, p0, lambda low-order polynomials in potential temperature T
[degC] and salinity S [PSU]; p in Pa.

All functions are elementwise jnp expressions (fuse into surrounding
kernels); derivative routines are hand-written closed forms (cheaper and
more precise than autodiff through the rational fit, and they match the
reference's API surface: calculate_density_derivs etc.).
"""

from __future__ import annotations

__all__ = ["density", "density_derivs", "specific_volume", "compressibility"]

# Wright (1997) reduced-range fit coefficients
_A0 = 7.057924e-4
_A1 = 3.480336e-7
_A2 = -1.112733e-7
_B0 = 5.790749e8
_B1 = 3.516535e6
_B2 = -4.002714e4
_B3 = 2.084372e2
_B4 = 5.944068e5
_B5 = -9.643486e3
_C0 = 1.704853e5
_C1 = 7.904722e2
_C2 = -7.984422
_C3 = 5.140652e-2
_C4 = -2.302158e2
_C5 = -3.079464


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
        # rho - rho_ref = (pp - rho_ref*denom) / denom, expanded for accuracy
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
    # d/dT [pp/(lam + al0*pp)] = (dp0_dT*lam - pp*(dlam_dT + dal0_dT*pp)) / denom^2
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
    """ANALYTIC layer integral of g*(rho - rho_ref) dz under the
    Boussinesq linear pressure p = -g*rho0*z, exploiting the rational
    form of the Wright EOS (int_density_dz_wright,
    reference MOM_EOS_Wright.F90:389-655):

      rho(z) = (p(z)+p0) / (lambda + al0*(p(z)+p0))

    integrates in closed form via the odd-power series in
    eps = GxRho*dz/2 / (p0 + lambda/al0 + p_ave), accurate to eps^9 —
    machine precision for any ocean layer (eps ~ 1e-3), with no
    quadrature error (the 5-point Boole PCM path carries O(dz^6)).

    Returns (dpa [Pa], intz_dpa [Pa m]) with the same conventions as
    pressure_force._dpa_column: dpa = pa(e_b) - pa(e_t), intz_dpa the
    in-layer integral of (pa(z) - pa(e_t)) dz."""
    return _analytic_int(_fits(T, S), e_t, e_b, g, rho0, rho_ref)


def _analytic_int(fits, e_t, e_b, g: float, rho0: float, rho_ref: float):
    """Shared closed form for any Wright-family coefficient set (also
    used by wright_full)."""
    al0, p0, lam = fits
    gxrho = g * rho0
    dz = e_t - e_b
    p_ave = -gxrho * 0.5 * (e_t + e_b)
    i_al0 = 1.0 / al0
    i_lzz = 1.0 / (p0 + lam * i_al0 + p_ave)
    eps = 0.5 * gxrho * dz * i_lzz
    eps2 = eps * eps
    rho_anom = (p0 + p_ave) * (i_lzz * i_al0) - rho_ref
    rem = (1.0 / rho0) * (lam * i_al0 * i_al0) * eps2 * (
        (1.0 / 3.0) + eps2 * (0.2 + eps2 * ((1.0 / 7.0)
                                            + (1.0 / 9.0) * eps2)))
    dpa = g * rho_anom * dz - 2.0 * eps * rem
    intz_dpa = 0.5 * g * rho_anom * dz * dz - dz * (1.0 + eps) * rem
    return dpa, intz_dpa
