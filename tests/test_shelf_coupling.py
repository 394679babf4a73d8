"""Ice-shelf/ocean coupling (MOM_ice_shelf.F90 add_shelf_pressure /
add_shelf_flux + MOM_state_initialization.F90:1250 trim_for_ice).

The round-2 verdict's item 4: melt must respond to ocean temperature,
the ocean must freshen under the shelf, the shelf pressure must reach
the pressure force, and the IC trim must put the ocean top at the
hydrostatic draft.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.physics.ice_shelf import IceShelfParams
from mom6_tpu.physics.shelf_coupling import (ShelfCoupling,
                                             apply_shelf_coupling,
                                             shelf_melt_fluxes,
                                             trim_columns_for_p_surf)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _shelf(ny=4, nx=6, draft=500.0, rho_w=1028.0):
    mass = np.zeros((ny, nx))
    mass[:, : nx // 2] = rho_w * draft
    frac = (mass > 0).astype(float)
    return ShelfCoupling(mass_shelf=jnp.asarray(mass),
                         frac_shelf_h=jnp.asarray(frac))


def test_melt_increases_with_ocean_temperature():
    """Warmer cavity water melts faster; water at the in-situ freezing
    point barely melts (Holland & Jenkins 1999 three-equation balance)."""
    sh = _shelf()
    S = jnp.full((4, 6), 34.5)
    p = sh.melt
    t_freeze = p.lambda1 * 34.5 + p.lambda2 + p.lambda3 * (9.81 * 1028.0
                                                           * 500.0)
    melt_cold, heat_cold, _, _ = shelf_melt_fluxes(
        jnp.full((4, 6), t_freeze), S, sh, 9.81)
    melt_warm, heat_warm, _, _ = shelf_melt_fluxes(
        jnp.full((4, 6), t_freeze + 2.0), S, sh, 9.81)
    m_c = float(melt_cold[0, 0])
    m_w = float(melt_warm[0, 0])
    assert m_w > 10.0 * max(m_c, 1e-12)
    # 2 degC thermal driving with gamma_T=1e-4: melt of order meters/year
    m_per_yr = m_w * 86400.0 * 365.0
    assert 1.0 < m_per_yr < 500.0
    # melting cools the ocean (heat flux out of the ocean)
    assert float(heat_warm[0, 0]) < 0.0
    # open-ocean cells untouched
    assert float(melt_warm[0, -1]) == 0.0


def test_shelf_pressure_and_stress_interception():
    """p_surf gains frac*g*mass (ref :1121); wind stress under the shelf
    is intercepted (scaled by the open fraction at faces)."""
    from mom6_tpu.core.mom import Forcing
    from mom6_tpu.core.dynamics_split_rk2 import MechForcing

    sh = _shelf()
    ny, nx = 4, 6

    class _St:
        T = None
        S = None
        u = None
        v = None

    class _GV:
        g_earth = 9.81
        rho0 = 1028.0

    f0 = Forcing(mech=MechForcing(taux=jnp.ones((ny, nx)),
                                  tauy=jnp.ones((ny, nx)),
                                  p_surf=jnp.zeros((ny, nx))))
    f1, melt = apply_shelf_coupling(_St(), f0, None, _GV(), sh)
    p_expect = 9.81 * 1028.0 * 500.0
    np.testing.assert_allclose(np.asarray(f1.mech.p_surf)[0, 0],
                               p_expect, rtol=1e-6)
    assert float(f1.mech.p_surf[0, -1]) == 0.0
    # fully-covered interior face: stress zeroed; interior open face
    # (both neighbors open, away from the periodic wrap): unchanged
    assert float(f1.mech.taux[0, 0]) == 0.0
    assert float(f1.mech.taux[0, 3]) == 1.0


def test_trim_removes_exactly_the_displaced_mass():
    """The trim removes mass equal to p_surf/g from each column top."""
    nz, ny, nx = 8, 3, 4
    h = jnp.full((nz, ny, nx), 100.0)
    rho = jnp.full((nz, ny, nx), 1000.0)
    p_surf = jnp.asarray(np.broadcast_to(
        np.array([0.0, 150.0, 350.0, 750.0]) * 1000.0 * 9.81, (ny, nx)))
    h_new, _, _ = trim_columns_for_p_surf(h, None, None, rho, p_surf,
                                          9.81)
    col = np.asarray(h_new.sum(0))
    np.testing.assert_allclose(col[0], [800.0, 650.0, 450.0, 50.0],
                               rtol=1e-6)
    # straddled layers cut fractionally: the 150 m case loses layer 0
    # and half of layer 1
    np.testing.assert_allclose(np.asarray(h_new)[:2, 0, 1],
                               [1e-10, 50.0], atol=1e-6)


@pytest.mark.slow
def test_isomip_cavity_melts_and_freshens():
    """End-to-end: the ISOMIP config builds, the cavity columns sit at
    the hydrostatic draft, and stepping melts ice (freshening + cooling
    under the shelf, open ocean untouched)."""
    from mom6_tpu.core.mom import step_mom
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile

    pf = ParamFile([os.path.join(REPO, "configs", "isomip", "MOM_input")])
    ms = build_model_from_params(pf)
    G, GV, state, params = ms.grid, ms.vgrid, ms.state, ms.params
    assert params.shelf is not None

    col = np.asarray(state.h.sum(0))
    # deepest cavity: 900 m bottom - ~700 m draft => ~200 m of water
    assert col[:, 0].mean() < 300.0
    assert abs(col[:, -1].mean() - 900.0) < 1.0

    step = jax.jit(lambda s, f: step_mom(s, f, G, GV, params))
    st = state
    for _ in range(4):
        st = step(st, ms.forcing)
    assert bool(jnp.isfinite(st.h).all())
    assert bool(jnp.isfinite(st.T).all())

    dS_shelf = float((st.S[0] - state.S[0])[:, :8].mean())
    dS_open = float((st.S[0] - state.S[0])[:, 24:].mean())
    assert dS_shelf < -1e-4          # meltwater freshening
    assert abs(dS_open) < 1e-4       # open ocean essentially unchanged
    dT_shelf = float((st.T[0] - state.T[0])[:, :8].mean())
    assert dT_shelf < 0.0            # latent-heat cooling
