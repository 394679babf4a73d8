"""Potential <-> conservative temperature and salinity conversions.

Analogue of MOM_temperature_convert.F90 (reference:
src/equation_of_state/MOM_temperature_convert.F90) using the published
TEOS-10 polynomial for potential enthalpy (McDougall 2003 / IOC et al.
2010) — the same constants the reference transcribes from GSW.

Conventions: potential temperature Tp [degC], conservative temperature
Tc [degC], absolute salinity Sa [g kg-1], practical salinity Sp [PSU].
All functions are elementwise jnp expressions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["potemp_to_constemp", "constemp_to_potemp", "dtc_dtp",
           "sr_from_sp", "sp_from_sr"]

# TEOS-10 reference conversion factor between practical and reference
# (absolute) salinity: SR = SP * 35.16504/35
_SPRAC_SREF = 35.0 / 35.16504
_I_S0 = 0.025 * _SPRAC_SREF   # inverse salinity range [kg g-1]
_I_TS = 0.025                 # inverse temperature range [degC-1]
_I_CP0 = 1.0 / 3991.86795711963

# Potential-enthalpy polynomial coefficients (TEOS-10; transcribed with
# the same normalization as the reference's H** table): Tc(Tp, Sa) with
# x = sqrt(Sa * I_S0), y = Tp * I_TS.
_H00 = 61.01362420681071 * _I_CP0
_H01 = 168776.46138048015 * (_I_CP0 * _I_TS)
_H02 = -2735.2785605119625 * (_I_CP0 * _I_TS ** 2)
_H03 = 2574.2164453821433 * (_I_CP0 * _I_TS ** 3)
_H04 = -1536.6644434977543 * (_I_CP0 * _I_TS ** 4)
_H05 = 545.7340497931629 * (_I_CP0 * _I_TS ** 5)
_H06 = -50.91091728474331 * (_I_CP0 * _I_TS ** 6)
_H07 = -18.30489878927802 * (_I_CP0 * _I_TS ** 7)
_H20 = 268.5520265845071 * _I_CP0
_H21 = -12019.028203559312 * (_I_CP0 * _I_TS)
_H22 = 3734.858026725145 * (_I_CP0 * _I_TS ** 2)
_H23 = -2046.7671145057618 * (_I_CP0 * _I_TS ** 3)
_H24 = 465.28655623826234 * (_I_CP0 * _I_TS ** 4)
_H25 = -0.6370820302376359 * (_I_CP0 * _I_TS ** 5)
_H26 = -10.650848542359153 * (_I_CP0 * _I_TS ** 6)
_H30 = 937.2099110620707 * _I_CP0
_H31 = 588.1802812170108 * (_I_CP0 * _I_TS)
_H32 = 248.39476522971285 * (_I_CP0 * _I_TS ** 2)
_H33 = -3.871557904936333 * (_I_CP0 * _I_TS ** 3)
_H34 = -2.6268019854268356 * (_I_CP0 * _I_TS ** 4)
_H40 = -1687.914374187449 * _I_CP0
_H41 = 936.3206544460336 * (_I_CP0 * _I_TS)
_H42 = -942.7827304544439 * (_I_CP0 * _I_TS ** 2)
_H43 = 369.4389437509002 * (_I_CP0 * _I_TS ** 3)
_H44 = -33.83664947895248 * (_I_CP0 * _I_TS ** 4)
_H45 = -9.987880382780322 * (_I_CP0 * _I_TS ** 5)
_H50 = 246.9598888781377 * _I_CP0
_H60 = 123.59576582457964 * _I_CP0
_H70 = -48.5891069025409 * _I_CP0


def sr_from_sp(sp):
    """Reference (absolute) salinity [g kg-1] from practical salinity."""
    return sp / _SPRAC_SREF


def sp_from_sr(sr):
    """Practical salinity from reference salinity [g kg-1]."""
    return sr * _SPRAC_SREF


def potemp_to_constemp(T, Sa):
    """Conservative temperature [degC] from potential temperature and
    absolute salinity (poTemp_to_consTemp role)."""
    x2 = jnp.maximum(_I_S0 * Sa, 0.0)
    x = jnp.sqrt(x2)
    return _H00 + (
        T * (_H01 + T * (_H02 + T * (_H03 + T * (_H04 + T * (
            _H05 + T * (_H06 + T * _H07))))))
        + x2 * (_H20 + (
            T * (_H21 + T * (_H22 + T * (_H23 + T * (_H24 + T * (
                _H25 + T * _H26)))))
            + x * (_H30 + (
                T * (_H31 + T * (_H32 + T * (_H33 + T * _H34)))
                + x * (_H40 + (
                    T * (_H41 + T * (_H42 + T * (_H43 + T * (
                        _H44 + T * _H45))))
                    + x * (_H50 + x * (_H60 + x * _H70)))))))))


def dtc_dtp(T, Sa):
    """d(conservative T)/d(potential T) [nondim]."""
    x2 = jnp.maximum(_I_S0 * Sa, 0.0)
    x = jnp.sqrt(x2)
    return (_H01 + T * (2 * _H02 + T * (3 * _H03 + T * (4 * _H04 + T * (
        5 * _H05 + T * (6 * _H06 + T * (7 * _H07))))))) + x2 * (
        (_H21 + T * (2 * _H22 + T * (3 * _H23 + T * (4 * _H24 + T * (
            5 * _H25 + T * (6 * _H26))))))
        + x * ((_H31 + T * (2 * _H32 + T * (3 * _H33 + T * (4 * _H34))))
               + x * (_H41 + T * (2 * _H42 + T * (3 * _H43 + T * (
                   4 * _H44 + T * (5 * _H45)))))))


def constemp_to_potemp(Tc, Sa):
    """Potential temperature [degC] from conservative temperature by the
    Newton-McDougall 1.5-iteration inversion (consTemp_to_poTemp role) —
    converges to machine precision over oceanographic ranges."""
    tpn00 = -1.446013646344788e-2
    tpn10 = -3.305308995852924e-3 * _SPRAC_SREF
    tpn20 = 1.062415929128982e-4 * _SPRAC_SREF ** 2
    tpn01 = 9.477566673794488e-1
    tpn11 = 2.166591947736613e-3 * _SPRAC_SREF
    tpn02 = 3.828842955039902e-3
    tpd10 = 6.506097115635800e-4 * _SPRAC_SREF
    tpd01 = 3.830289486850898e-3
    tpd02 = 1.247811760368034e-6

    tp_num = tpn00 + (Sa * (tpn10 + tpn20 * Sa)
                      + Tc * (tpn01 + (tpn11 * Sa + tpn02 * Tc)))
    i_tp_den = 1.0 / (1.0 + (tpd10 * Sa + Tc * (tpd01 + tpd02 * Tc)))
    tp = tp_num * i_tp_den
    dtp = ((tpn01 + (tpn11 * Sa + 2 * tpn02 * Tc))
           - (tpd01 + 2 * tpd02 * Tc) * tp) * i_tp_den

    tc_diff = potemp_to_constemp(tp, Sa) - Tc
    tp_old = tp
    tp = tp_old - tc_diff * dtp
    dtp = 1.0 / dtc_dtp(0.5 * (tp + tp_old), Sa)
    return tp_old - tc_diff * dtp
