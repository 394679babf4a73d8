"""Rest-state pressure force at bathymetry-pierced faces.

The r4 code zeroed the PGF on any face whose thinner side was below
2 mm (PF_GATE).  When a vanished layer at a topography step inflated
past the threshold the full face force snapped on discontinuously
(~1e-2 m s-2 equivalent) and cascaded — the global_half_deg tripolar
cap blowup.  The gate is gone; these tests pin what replaces it:

* at rest over a 1300 m topography step with a thermocline profile,
  the ungated FV pressure force at pierced faces stays at the
  EOS-nonlinearity quadrature level (< 2e-5 m s-2), NOT at the
  gate-snap level (~1e-2);
* wholly-interior faces remain exact to roundoff;
* the force is continuous in the sliver thickness: inflating a
  vanished layer by 1 cm changes the face force by < 1e-5 m s-2 (no
  cliff).

Reference: src/core/MOM_PressureForce_FV.F90 (ungated),
src/core/MOM_density_integrals.F90:276-305 (the hWght
against-topography weighting that makes the gate unnecessary).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mom6_tpu.core.pressure_force import pressure_force_fv
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.eos import get_eos

NZ, NY, NX = 32, 4, 6


def _setup(sliver=1e-10):
    depth = np.full((NY, NX), 4000.0)
    depth[:, :3] = 2716.0
    G = build_cartesian_grid(NX, NY, 300.0, 200.0, depth=depth, f0=1e-4)
    GV = build_layered_vgrid(NZ)
    zint = np.linspace(0.0, 4000.0, NZ + 1)
    h = np.zeros((NZ, NY, NX))
    for j in range(NY):
        for i in range(NX):
            d = depth[j, i]
            h[:, j, i] = np.maximum(
                np.minimum(zint[1:], d) - np.minimum(zint[:-1], d), sliver)
    zc = np.cumsum(h, axis=0) - 0.5 * h
    T = 8.0 + 12.0 * np.exp(-zc / 1000.0)
    S = np.full_like(T, 35.0)
    return (G, GV, jnp.asarray(h, jnp.float32), jnp.asarray(T, jnp.float32),
            jnp.asarray(S, jnp.float32))


def test_pierced_face_rest_pf_small():
    G, GV, h, T, S = _setup()
    out = pressure_force_fv(h, T, S, G, GV, get_eos("WRIGHT"))
    PFu = np.asarray(out.PFu)
    # pierced faces (i=2 is the step): quadrature-level only
    assert np.abs(PFu[:, 1, 2]).max() < 2e-5, np.abs(PFu[:, 1, 2]).max()
    # interior faces: roundoff
    assert np.abs(PFu[:, 1, 0]).max() < 1e-6
    assert np.abs(PFu[:, 1, 3]).max() < 1e-6


def test_pierced_face_force_continuous_in_sliver():
    """No cliff: a 1 cm sliver vs an angstrom sliver changes the face
    force only marginally (the r4 hard gate flipped 0 -> ~1e-2 here)."""
    G, GV, h0, T, S = _setup(sliver=1e-10)
    _, _, h1, T1, S1 = _setup(sliver=1e-2)
    eos = get_eos("WRIGHT")
    pf0 = np.asarray(pressure_force_fv(h0, T, S, G, GV, eos).PFu)
    pf1 = np.asarray(pressure_force_fv(h1, T1, S1, G, GV, eos).PFu)
    assert np.abs(pf1[:, 1, 2] - pf0[:, 1, 2]).max() < 5e-5
