"""Open boundary condition tests: Flather radiation lets gravity waves
leave; closed walls reflect them (energy comparison)."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.core.state import init_state_resting
from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.open_boundary import OBCSegment, apply_obc, build_obc


def setup_wave(nx=32, ny=8):
    G = build_cartesian_grid(nx, ny, 320.0, 80.0, max_depth=100.0,
                             f0=0.0, reentrant_y=True, dtype=jnp.float32)
    GV = build_layered_vgrid(1)
    state = init_state_resting(G, GV, [100.0])
    # an eta bump in the middle radiating outward
    x = np.arange(nx)
    bump = 0.5 * np.exp(-((x - nx / 2.0) ** 2) / 8.0)
    h = np.asarray(state.h) + bump[None, None, :]
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    dt = 100.0
    nstep, _ = set_dtbt(G, GV, 100.0, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=0.0)
    return G, GV, state, params


def wave_energy(state, G, GV):
    h = np.asarray(state.h, np.float64)
    eta = h.sum(0) - np.asarray(G.bathyT, np.float64)
    u = np.asarray(state.u, np.float64)
    area = np.asarray(G.areaT, np.float64)
    pe = 0.5 * GV.rho0 * GV.g_earth * (eta ** 2 * area).sum()
    ke = 0.5 * GV.rho0 * (h * u * u * area).sum()
    return pe + ke


def test_flather_radiates_waves_out():
    G, GV, state, params = setup_wave()
    obc = build_obc([OBCSegment(edge="E"), OBCSegment(edge="W")],
                    G.ny, G.nx)

    step = jax.jit(lambda s: apply_obc(
        step_dynamics_split_rk2(s, MechForcing(), G, GV, params),
        obc, G, GV, params.dt))
    step_closed = jax.jit(lambda s: step_dynamics_split_rk2(
        s, MechForcing(), G, GV, params))

    e0 = wave_energy(state, G, GV)
    s_open, s_closed = state, state
    # wave crossing time: domain 320km at c=31 m/s ~ 2.8h; run 3h
    for _ in range(108):
        s_open = step(s_open)
        s_closed = step_closed(s_closed)
    e_open = wave_energy(s_open, G, GV)
    e_closed = wave_energy(s_closed, G, GV)
    # the open domain lost most of the wave energy; closed kept much more
    assert e_open < 0.3 * e0, (e_open / e0)
    assert e_open < 0.5 * e_closed
    assert np.isfinite(np.asarray(s_open.h)).all()


def test_obc_tracer_nudging():
    G, GV, state, params = setup_wave()
    state = state.replace(T=jnp.full(state.h.shape, 10.0, jnp.float32),
                          S=jnp.full(state.h.shape, 35.0, jnp.float32))
    obc = build_obc([OBCSegment(edge="E", T_ext=15.0, S_ext=36.0,
                                nudge_timescale=100.0)], G.ny, G.nx)
    s = apply_obc(state, obc, G, GV, dt=100.0)
    T = np.asarray(s.T)
    # boundary cell pulled halfway (w=1): (10+15)/2
    np.testing.assert_allclose(T[:, :, -1], 12.5, rtol=1e-5)
    np.testing.assert_allclose(T[:, :, 10], 10.0, rtol=1e-6)


def test_obc_masks_compile():
    obc = build_obc([OBCSegment(edge="N", lo=2, hi=6)], 8, 8)
    m = np.asarray(obc.mask_v)
    assert m[-2, 2:6].sum() == 4 and m.sum() == 4


def test_orlanski_steady_is_noop():
    """dhdt = 0 (steady field): the Orlanski update leaves the boundary
    unchanged (rx = 0)."""
    G, GV, state, params = setup_wave()
    obc = build_obc([OBCSegment(edge="E", scheme="ORLANSKI")], G.ny, G.nx)
    u = jnp.asarray(np.random.RandomState(0).randn(1, G.ny, G.nx),
                    jnp.float32)
    st = state.replace(u=u * G.mask2dCu)
    out = apply_obc(st, obc, G, GV, dt=100.0, u_old=st.u, v_old=st.v)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(st.u),
                               atol=1e-6)


def test_gradient_scheme_copies_interior():
    G, GV, state, params = setup_wave()
    obc = build_obc([OBCSegment(edge="E", scheme="GRADIENT")], G.ny, G.nx)
    u = jnp.asarray(np.arange(G.nx, dtype=np.float32)[None, None]
                    * np.ones((1, G.ny, 1), np.float32))
    st = state.replace(u=u)
    out = apply_obc(st, obc, G, GV, dt=100.0)
    # boundary face (-2) takes the interior value (-3)
    np.testing.assert_allclose(np.asarray(out.u)[:, :, -2],
                               np.asarray(u)[:, :, -3], atol=1e-6)


def test_orlanski_diagnoses_phase_speed():
    """A right-moving linear ramp sampled at two times: the diagnosed
    rx equals the CFL and the boundary follows the implicit upwind
    update."""
    G, GV, state, params = setup_wave()
    obc = build_obc([OBCSegment(edge="E", scheme="ORLANSKI")], G.ny, G.nx)
    nx = G.nx
    r = 0.4                         # CFL of the outgoing signal
    x = np.arange(nx, dtype=np.float32)
    u_old = np.broadcast_to(x, (1, G.ny, nx)).copy()
    u_new = np.broadcast_to(x - r, (1, G.ny, nx)).copy()
    st = state.replace(u=jnp.asarray(u_new))
    out = apply_obc(st, obc, G, GV, dt=100.0,
                    u_old=jnp.asarray(u_old), v_old=st.v)
    # expected: (u_B + r*u_{B-1})/(1+r) at face -2
    ub = u_new[0, 2, -2]
    nb1 = u_new[0, 2, -3]
    expect = (ub + r * nb1) / (1.0 + r)
    np.testing.assert_allclose(np.asarray(out.u)[0, 2, -2], expect,
                               rtol=1e-5)


def test_orlanski_radiates_waves_out():
    """Orlanski on the layer velocities + Flather-free: waves still lose
    energy vs the closed domain (radiative boundary)."""
    G, GV, state, params = setup_wave()
    obc = build_obc([OBCSegment(edge="E", scheme="OBLIQUE"),
                     OBCSegment(edge="W", scheme="ORLANSKI")],
                    G.ny, G.nx)

    def step2(s, s_prev_u, s_prev_v):
        s2 = step_dynamics_split_rk2(s, MechForcing(), G, GV, params)
        return apply_obc(s2, obc, G, GV, params.dt,
                         u_old=s_prev_u, v_old=s_prev_v)

    step = jax.jit(step2)
    step_closed = jax.jit(lambda s: step_dynamics_split_rk2(
        s, MechForcing(), G, GV, params))

    e0 = wave_energy(state, G, GV)
    s_open, s_closed = state, state
    for _ in range(108):
        u_prev, v_prev = s_open.u, s_open.v
        s_open = step(s_open, u_prev, v_prev)
        s_closed = step_closed(s_closed)
    e_open = wave_energy(s_open, G, GV)
    e_closed = wave_energy(s_closed, G, GV)
    assert np.isfinite(np.asarray(s_open.h)).all()
    assert e_open < e_closed, (e_open, e_closed)


def test_combined_flather_orlanski():
    """A multi-scheme segment (the reference's "FLATHER,ORLANSKI" list,
    .testing/tc3/MOM_input OBC_SEGMENT_001): the thickness-weighted depth
    mean of the boundary face follows the Flather barotropic value while
    the layer anomalies keep the Orlanski-radiated structure."""
    G, GV, state, params = setup_wave()
    GV3 = build_layered_vgrid(3)
    state3 = init_state_resting(G, GV3, [30.0, 30.0, 40.0])
    obc = build_obc([OBCSegment(edge="E", scheme="FLATHER+ORLANSKI")],
                    G.ny, G.nx)
    # sheared boundary velocity with zero depth mean + an eta anomaly
    u = np.zeros((3, G.ny, G.nx), np.float32)
    u[0], u[2] = 0.2, -0.15         # 30*0.2 - 40*0.15 = 0 depth mean
    st = state3.replace(u=jnp.asarray(u) * G.mask2dCu)
    out = apply_obc(st, obc, G, GV3, dt=100.0, u_old=st.u, v_old=st.v)
    h = np.asarray(out.h)
    uo = np.asarray(out.u)
    # Flather value for a resting state (eta = eta_ext = 0, vel_ext = 0)
    # is 0 -> the face depth mean must be ~0 while layers keep shear
    ubar = (h[:, 4, -2] * uo[:, 4, -2]).sum() / h[:, 4, -2].sum()
    assert abs(ubar) < 1e-6, ubar
    assert uo[0, 4, -2] > 0.1 and uo[2, 4, -2] < -0.05, uo[:, 4, -2]


def test_multi_scheme_string_parses():
    obc = build_obc([OBCSegment(edge="W", scheme="flather+oblique")],
                    8, 8)
    assert obc.mask_u is not None and obc.mask_u_obl is not None
    assert float(obc.mask_u.sum()) == 8.0
    assert float(obc.mask_u_obl.sum()) == 8.0
