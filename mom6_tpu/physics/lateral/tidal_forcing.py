"""Astronomical tidal forcing and self-attraction & loading (SAL).

Analogues of MOM6's MOM_tidal_forcing.F90:817 (equilibrium tidal
potential for the major constituents) and MOM_self_attr_load.F90:392
(scalar SAL approximation; the spherical-harmonic SAL lives in
self_attr_load.py).

The equilibrium potential of a constituent with amplitude A, frequency
omega, and Love-number scaling is added to the geopotential used by the
pressure force: here exposed as an extra "eta-like" field
``e_tidal(t)`` whose gradient times g gives the acceleration (exactly how
the reference's PFu adds e_tidal/e_sal, MOM_PressureForce_FV.F90).

Constituent catalogue (amplitudes [m], frequencies [s-1], species):
M2/S2/N2/K2 (semidiurnal, species 2), K1/O1/P1/Q1 (diurnal, species 1) —
standard Doodson values.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

__all__ = ["TidalConstituent", "CONSTITUENTS", "TidalForcingParams",
           "equilibrium_tide", "scalar_sal"]


class TidalConstituent(NamedTuple):
    name: str
    amp: float        # equilibrium amplitude [m]
    freq: float       # [rad s-1]
    species: int      # 1 diurnal, 2 semidiurnal
    love: float       # 1 + k2 - h2 Love number factor


CONSTITUENTS = {
    "M2": TidalConstituent("M2", 0.242334, 1.405189e-4, 2, 0.693),
    "S2": TidalConstituent("S2", 0.112743, 1.454441e-4, 2, 0.693),
    "N2": TidalConstituent("N2", 0.046397, 1.378797e-4, 2, 0.693),
    "K2": TidalConstituent("K2", 0.030684, 1.458423e-4, 2, 0.693),
    "K1": TidalConstituent("K1", 0.141565, 0.7292117e-4, 1, 0.736),
    "O1": TidalConstituent("O1", 0.100661, 0.6759774e-4, 1, 0.695),
    "P1": TidalConstituent("P1", 0.046848, 0.7252295e-4, 1, 0.706),
    "Q1": TidalConstituent("Q1", 0.019273, 0.6495854e-4, 1, 0.695),
}


class TidalForcingParams(NamedTuple):
    names: Tuple[str, ...] = ("M2",)
    sal_scalar: float = 0.094     # scalar SAL coefficient (beta)


def equilibrium_tide(t_seconds, lat_rad, lon_rad,
                     p: TidalForcingParams = TidalForcingParams()):
    """Equilibrium tidal elevation e_tidal(t) [m] at (lat, lon).

    Species-2: A L cos^2(lat) cos(omega t + 2 lon);
    species-1: A L sin(2 lat) cos(omega t + lon)."""
    e = 0.0
    for name in p.names:
        c = CONSTITUENTS[name]
        if c.species == 2:
            e = e + c.amp * c.love * jnp.cos(lat_rad) ** 2 * \
                jnp.cos(c.freq * t_seconds + 2.0 * lon_rad)
        else:
            e = e + c.amp * c.love * jnp.sin(2.0 * lat_rad) * \
                jnp.cos(c.freq * t_seconds + lon_rad)
    return e


def scalar_sal(eta, p: TidalForcingParams = TidalForcingParams()):
    """Scalar self-attraction and loading: e_sal = beta * eta
    (MOM_self_attr_load's SAL_SCALAR_APPROX)."""
    return p.sal_scalar * eta