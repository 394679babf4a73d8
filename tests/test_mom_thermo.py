"""End-to-end thermodynamic model test: step_mom with FV/EOS pressure force,
diabatic physics, tracer advection and z* ALE (the benchmark-config
milestone of SURVEY.md §7)."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import thermo_gyre
from mom6_tpu.core.mom import step_mom


def test_thermo_gyre_runs_and_conserves():
    G, GV, state, params, forcing = thermo_gyre(nx=16, ny=16, nz=6,
                                                dt=1800.0,
                                                n_dyn_per_thermo=2)

    @jax.jit
    def cycle(s):
        return step_mom(s, forcing, G, GV, params)

    area = np.asarray(G.areaT, np.float64)
    wet = np.asarray(G.mask2dT, np.float64)
    h0 = np.asarray(state.h, np.float64)
    vol0 = (h0 * area).sum()
    salt0 = (np.asarray(state.S, np.float64) * h0 * area * wet).sum()
    heat0 = (np.asarray(state.T, np.float64) * h0 * area * wet).sum()

    n_cycles = 12   # 12 h
    for _ in range(n_cycles):
        state = cycle(state)

    h = np.asarray(state.h, np.float64)
    T = np.asarray(state.T, np.float64)
    S = np.asarray(state.S, np.float64)
    u = np.asarray(state.u)

    assert np.isfinite(h).all() and np.isfinite(T).all() and np.isfinite(u).all()
    assert h.min() > 0.0
    assert np.abs(u).max() < 2.0

    # volume conserved
    vol1 = (h * area).sum()
    assert abs(vol1 - vol0) / vol0 < 1e-4

    # salt conserved (no salt forcing)
    salt1 = (S * h * area * wet).sum()
    assert abs(salt1 - salt0) / salt0 < 1e-3

    # heat change matches the (here net-zero-mean) surface heating pattern:
    # total heat change should be small compared to one-sided heating
    dt_therm = params.dyn.dt * params.n_dyn_per_thermo
    q = np.asarray(forcing.buoy.heat_flux, np.float64)
    expected_dheat = (q * area * wet).sum() / (GV.rho0 * params.diabatic.cp) \
        * dt_therm * n_cycles
    heat1 = (T * h * area * wet).sum()
    # the closure residual is f32 accumulation noise: bound it relative to
    # the total heat content (~1e-7/op) rather than the (nearly cancelling)
    # one-sided forcing
    assert abs((heat1 - heat0) - expected_dheat) < 3e-6 * abs(heat0)

    # temperature stays within physical bounds (monotone advection + mixing)
    assert T.max() <= 21.0 and T.min() >= 3.0

    # z* ALE keeps layers close to their nominal thickness
    dz_nom = 3000.0 / 6
    assert abs(h.mean() - dz_nom) / dz_nom < 0.05


def test_adiabatic_mode_matches_plain_dynamics():
    """thermo_enabled=False must reduce step_mom to pure dynamics."""
    from mom6_tpu.drivers.experiments import double_gyre
    from mom6_tpu.core.mom import MOMParams, Forcing
    from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2

    G, GV, state, dynp, mech = double_gyre(nx=12, ny=12, nz=2, dt=1200.0)
    p = MOMParams(dyn=dynp, thermo_enabled=False, n_dyn_per_thermo=1)
    s1 = jax.jit(lambda s: step_mom(s, Forcing(mech=mech), G, GV, p))(state)
    s2 = jax.jit(lambda s: step_dynamics_split_rk2(s, mech, G, GV, dynp))(state)
    np.testing.assert_allclose(np.asarray(s1.h), np.asarray(s2.h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.u), np.asarray(s2.u), atol=1e-8)


def test_thermo_gyre_with_kpp_and_shear():
    """Full mixing suite active inside step_mom: KPP boundary layer +
    LMD94 shear mixing feeding the diabatic solve."""
    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=6,
                                                dt=1800.0,
                                                n_dyn_per_thermo=2)
    params = params._replace(
        diabatic=params.diabatic._replace(boundary_layer_scheme="KPP",
                                          use_shear_mixing=True))

    @jax.jit
    def cycle(s):
        return step_mom(s, forcing, G, GV, params)

    for _ in range(6):
        state = cycle(state)
    T = np.asarray(state.T)
    assert np.isfinite(T).all()
    assert T.max() <= 21.0 and T.min() >= 3.0
    assert np.asarray(state.h).min() > 0.0


def test_thermo_gyre_with_epbl():
    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=6,
                                                dt=1800.0)
    params = params._replace(
        diabatic=params.diabatic._replace(boundary_layer_scheme="EPBL"))

    @jax.jit
    def cycle(s):
        return step_mom(s, forcing, G, GV, params)

    for _ in range(4):
        state = cycle(state)
    assert np.isfinite(np.asarray(state.T)).all()


def test_thermo_gyre_full_suite():
    """GM + MEKE + mixed-layer restrat + KPP all active in step_mom."""
    import jax.numpy as jnp
    from mom6_tpu.physics.lateral.thickness_diffuse import GMParams
    from mom6_tpu.physics.lateral.meke import MEKEParams
    from mom6_tpu.physics.lateral.mixed_layer_restrat import MLRestratParams

    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=6,
                                                dt=1800.0,
                                                n_dyn_per_thermo=2)
    params = params._replace(
        gm=GMParams(khth=500.0),
        meke=MEKEParams(),
        mlrestrat=MLRestratParams(),
        diabatic=params.diabatic._replace(boundary_layer_scheme="KPP"))
    state = state.replace(E_meke=jnp.zeros((12, 12), jnp.float32))

    @jax.jit
    def cycle(s):
        return step_mom(s, forcing, G, GV, params)

    area = np.asarray(G.areaT, np.float64)
    vol0 = (np.asarray(state.h, np.float64) * area).sum()
    for _ in range(6):
        state = cycle(state)
    h = np.asarray(state.h, np.float64)
    assert np.isfinite(h).all() and h.min() > 0
    assert np.isfinite(np.asarray(state.T)).all()
    assert np.isfinite(np.asarray(state.E_meke)).all()
    assert float(np.asarray(state.E_meke).min()) >= 0.0
    vol1 = (h * area).sum()
    assert abs(vol1 - vol0) / vol0 < 1e-4


def test_diabatic_first_ordering():
    """DIABATIC_FIRST (MOM.F90:863-909): the thermodynamics run before
    the dynamics.  Both orderings must be stable, conserve mass, and —
    being the same processes in a different sequence — land close after
    a few cycles."""
    outs = {}
    for first in (False, True):
        G, GV, state, params, forcing = thermo_gyre(
            nx=12, ny=12, nz=6, dt=1800.0, n_dyn_per_thermo=2)
        params = params._replace(
            diabatic_first=first,
            diabatic=params.diabatic._replace(
                boundary_layer_scheme="KPP"))
        step = jax.jit(lambda s, p=params: step_mom(s, forcing, G, GV, p))
        s = state
        for _ in range(6):
            s = step(s)
        assert np.isfinite(np.asarray(s.h)).all(), first
        assert np.isfinite(np.asarray(s.T)).all(), first
        a = np.asarray(G.areaT, np.float64)
        m0 = (np.asarray(state.h, np.float64) * a).sum()
        m1 = (np.asarray(s.h, np.float64) * a).sum()
        np.testing.assert_allclose(m1, m0, rtol=1e-5)
        outs[first] = np.asarray(s.T, np.float64)
    # different operator ordering => different but close trajectories
    np.testing.assert_allclose(outs[True], outs[False], atol=0.2)
    assert not np.array_equal(outs[True], outs[False])
