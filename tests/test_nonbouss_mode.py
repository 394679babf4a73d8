"""Non-Boussinesq mode as a first-class, config-reachable mode.

The contrast gate (reference semantics, MOM_verticalGrid.F90:24-96;
PressureForce_FV_nonBouss, src/core/MOM_PressureForce_FV.F90:120;
find_eta / calc_derived_thermo SpV_avg, MOM_interface_heights.F90):

* BOUSSINESQ = False: h is mass/RHO_0, so the continuity conserves MASS
  exactly; warming a closed column leaves sum(h) untouched while the
  GEOMETRIC surface (specific-volume integral) rises sterically by the
  EOS thermal-expansion integral.
* BOUSSINESQ = True: the same warming conserves VOLUME (sum h), so the
  geometric surface does not move (no steric response) — the documented
  Boussinesq defect the non-Bouss mode exists to fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.core.mom import Forcing, MOMParams, step_mom
from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.pressure_force import find_eta_nonbouss, spv_avg
from mom6_tpu.core.state import init_state_resting
from mom6_tpu.eos import get_eos
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                DiabaticParams)
from mom6_tpu.ale.ale import ALEParams, ZSTAR

NX, NY, NZ = 12, 10, 6
DEPTH = 2000.0


def _build(boussinesq: bool):
    G = build_cartesian_grid(NX, NY, 240.0, 200.0, max_depth=DEPTH)
    GV = build_layered_vgrid(NZ, boussinesq=boussinesq)
    state = init_state_resting(G, GV, [DEPTH / NZ] * NZ)
    z = jnp.cumsum(state.h, axis=0) - 0.5 * state.h
    T = (14.0 - 8.0 * z / DEPTH).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    state = state.replace(T=T, S=S)
    dt = 1800.0
    nstep, _ = set_dtbt(G, GV, DEPTH, dt)
    params = MOMParams(
        dyn=DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=1e-4),
        thermo_enabled=True, eos_name="WRIGHT",
        diabatic=DiabaticParams(boundary_layer_scheme="NONE", cp=3992.0),
        ale=ALEParams(mode=ZSTAR, dz_nominal=tuple([DEPTH / NZ] * NZ)),
        n_dyn_per_thermo=1)
    return G, GV, state, params


@pytest.mark.parametrize("boussinesq", [False, True])
def test_steric_contrast(boussinesq):
    """Uniform surface warming of a closed resting basin: non-Bouss keeps
    mass exactly and raises the steric SSH by the EOS integral; Bouss
    keeps volume and shows no steric SSH response."""
    G, GV, state, params = _build(boussinesq)
    eos = get_eos(params.eos_name)
    q = 500.0                                  # W m-2, uniform warming
    forcing = Forcing(mech=MechForcing(),
                      buoy=BuoyancyForcing(
                          heat_flux=jnp.full((NY, NX), q, jnp.float32)))
    area = np.asarray(G.areaT * G.mask2dT, np.float64)

    def totals(s):
        h64 = np.asarray(s.h, np.float64)
        col = (h64 * area[None]).sum()          # volume (Bouss) or
        #                                         mass/rho0 (non-Bouss)
        if boussinesq:
            eta_g = np.asarray(jnp.sum(s.h, axis=0) - G.bathyT, np.float64)
        else:
            eta_g = np.asarray(find_eta_nonbouss(s.h, s.T, s.S, G, GV,
                                                 eos), np.float64)
        ssh = (eta_g * area).sum() / area.sum()
        heat = (np.asarray(s.T, np.float64) * h64 * area[None]).sum()
        return col, ssh, heat

    col0, ssh0, heat0 = totals(state)
    n_cyc = 24
    cyc = jax.jit(lambda s: step_mom(s, forcing, G, GV, params))
    s = state
    for _ in range(n_cyc):
        s = cyc(s)
    col1, ssh1, heat1 = totals(s)

    # the column measure (mass in non-Bouss, volume in Bouss) is exactly
    # conserved by the dynamics + diabatic + ALE chain
    assert abs(col1 - col0) / col0 < 2e-6, (col0, col1)

    # heat actually went in: rho0 cp d(heat measure) ~ Q A t
    dt_total = n_cyc * params.dyn.dt * params.n_dyn_per_thermo
    heat_in = q * area.sum() * dt_total
    heat_gain = GV.rho0 * 3992.0 * (heat1 - heat0)
    assert heat_gain == pytest.approx(heat_in, rel=0.02)

    if boussinesq:
        # volume-conserving: no steric rise (SSH change is dynamics
        # noise, orders below the steric signal)
        assert abs(ssh1 - ssh0) < 2e-4, (ssh0, ssh1)
    else:
        # steric gate: the SSH rise equals the EOS specific-volume
        # integral of the warming, d(eta) = sum rho0 h (spv(T1)-spv(T0))
        dz0 = GV.rho0 * np.asarray(
            state.h * spv_avg(state.h, state.T, state.S, GV, eos),
            np.float64)
        dz1 = GV.rho0 * np.asarray(
            state.h * spv_avg(state.h, s.T, s.S, GV, eos), np.float64)
        want = ((dz1 - dz0).sum(axis=0) * area).sum() / area.sum()
        got = ssh1 - ssh0
        assert got > 1e-4                       # a real, resolvable rise
        assert got == pytest.approx(want, rel=0.1), (got, want)


@pytest.mark.slow
def test_nonbouss_basin_config_runs():
    """configs/nonbouss_basin (BOUSSINESQ=False + the tc2 physics suite)
    runs stably through the config driver: finite state, exact-to-f32
    mass conservation modulo surface fluxes, steric SSH finite."""
    import os

    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pf = ParamFile([os.path.join(repo, "configs", "nonbouss_basin",
                                 "MOM_input")])
    st = build_model_from_params(pf)
    assert not st.vgrid.boussinesq
    cyc = jax.jit(lambda s, m=st: step_mom(s, m.forcing, m.grid, m.vgrid,
                                           m.params))
    s = st.state
    for _ in range(12):
        s = cyc(s)
    for name in ("h", "u", "v", "T", "S"):
        arr = np.asarray(getattr(s, name))
        assert np.isfinite(arr).all(), name
    assert float(jnp.min(s.h)) >= 0.0
    eos = get_eos(st.params.eos_name)
    eta_g = np.asarray(find_eta_nonbouss(s.h, s.T, s.S, st.grid, st.vgrid,
                                         eos))
    wet = np.asarray(st.grid.mask2dT) > 0.5
    assert np.isfinite(eta_g[wet]).all()
    # steric SSH differs from the column-mass measure by the in-situ
    # specific-volume deviation from 1/rho0 — nonzero but bounded
    eta_h = np.asarray(jnp.sum(s.h, axis=0) - st.grid.bathyT)
    d = np.abs(eta_g - eta_h)[wet]
    assert d.max() < 50.0 and d.max() > 1e-3
