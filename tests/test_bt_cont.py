"""BT_cont response curves + barotropic drag tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.continuity_ppm import (find_uhbt, find_vhbt, set_bt_cont,
                                          zonal_mass_flux)
from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.core.state import init_state_resting
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid

NX, NY, NZ = 16, 12, 3


def setup(depth=1000.0):
    G = build_cartesian_grid(NX, NY, 160.0, 120.0, max_depth=depth)
    GV = build_layered_vgrid(NZ)
    h = jnp.full((NZ, NY, NX), depth / NZ, jnp.float32)
    return G, GV, h


def test_curve_matches_layer_flux_at_small_u():
    """For a barotropic velocity small vs the CFL cap, find_uhbt equals
    the column sum of the PPM layer fluxes at that uniform velocity."""
    G, GV, h = setup()
    dt = 900.0
    btc = set_bt_cont(h, dt, G, GV)
    for u0 in (0.01, -0.02, 0.3, -0.4):
        u = jnp.full((NZ, NY, NX), u0, jnp.float32) * G.mask2dCu
        uh, _ = zonal_mass_flux(u, h, dt, G)
        got = np.asarray(find_uhbt(jnp.full((NY, NX), u0,
                                            jnp.float32) * G.mask2dCu, btc))
        want = np.asarray(jnp.sum(uh, axis=0))
        mask = np.asarray(G.mask2dCu) > 0.5
        assert np.allclose(got[mask], want[mask], rtol=5e-3,
                           atol=1e-2 * abs(u0) * 1000 * 1e4), u0


def test_curve_monotone_and_saturating():
    """uhbt(u) is monotone, and the marginal d(uh)/du beyond the CFL cap
    (donor-cell draining) is not larger than the small-u marginal."""
    G, GV, h = setup()
    # non-uniform h so the curves have curvature
    h = h.at[:, :, 4:8].multiply(0.3)
    dt = 900.0
    btc = set_bt_cont(h, dt, G, GV)
    us = np.linspace(-30.0, 30.0, 301, dtype=np.float32)
    vals = np.stack([np.asarray(find_uhbt(
        jnp.full((NY, NX), float(u), jnp.float32), btc))[6, 6]
        for u in us])
    dv = np.diff(vals)
    assert np.all(dv >= -1e-3 * np.abs(vals).max()), "non-monotone curve"
    # slope near zero vs slope at the tails
    s0 = (vals[152] - vals[148]) / (us[152] - us[148])
    s_tail = (vals[-1] - vals[-5]) / (us[-1] - us[-5])
    assert s_tail <= s0 * 1.05


def test_btcont_step_conserves_and_runs():
    """Full split step with USE_BT_CONT: stable, mass conserved."""
    G, GV, h0 = setup()
    state = init_state_resting(G, GV, [1000.0 / NZ] * NZ)
    # eta bump to drive barotropic flow
    bump = 1.0 * np.exp(-((np.arange(NX) - NX / 2.0) ** 2) / 8.0)
    h = np.asarray(state.h) + bump[None, None, :] / NZ
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    dt = 300.0
    nstep, _ = set_dtbt(G, GV, 1000.0, dt)
    for use_bt in (False, True):
        params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2,
                                              use_bt_cont=use_bt), kv=0.0)
        step = jax.jit(lambda s, p=params: step_dynamics_split_rk2(
            s, MechForcing(), G, GV, p))
        s = state
        for _ in range(20):
            s = step(s)
        area = np.asarray(G.areaT, np.float64)
        m0 = (np.asarray(state.h, np.float64) * area).sum()
        m1 = (np.asarray(s.h, np.float64) * area).sum()
        assert abs(m1 - m0) / m0 < 1e-6, use_bt
        assert np.isfinite(np.asarray(s.u)).all(), use_bt


def test_bt_drag_damps():
    """Barotropic linear drag removes energy from a free gravity wave."""
    G, GV, h0 = setup()
    state = init_state_resting(G, GV, [1000.0 / NZ] * NZ)
    bump = 1.0 * np.exp(-((np.arange(NX) - NX / 2.0) ** 2) / 8.0)
    h = np.asarray(state.h) + bump[None, None, :] / NZ
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    dt = 300.0
    nstep, _ = set_dtbt(G, GV, 1000.0, dt)

    def energy(s):
        eta = jnp.sum(s.h, axis=0) - G.bathyT
        ke = 0.5 * jnp.sum(s.h * (s.u ** 2 + s.v ** 2) * G.areaT)
        pe = 0.5 * GV.g_earth * jnp.sum(eta ** 2 * G.areaT)
        return float(ke + pe)

    outs = []
    for lin in (0.0, 0.05):
        params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2,
                                              lin_drag=lin), kv=0.0)
        step = jax.jit(lambda s, p=params: step_dynamics_split_rk2(
            s, MechForcing(), G, GV, p))
        s = state
        for _ in range(40):
            s = step(s)
        outs.append(energy(s))
    assert outs[1] < outs[0], outs


def test_rk2b_variant_runs_and_tracks_rk2():
    """SPLIT_RK2B: stable, conserves mass, and stays close to RK2 over a
    short gravity-wave integration (same equations, different corrector
    centring)."""
    G, GV, h0 = setup()
    state = init_state_resting(G, GV, [1000.0 / NZ] * NZ)
    bump = 1.0 * np.exp(-((np.arange(NX) - NX / 2.0) ** 2) / 8.0)
    h = np.asarray(state.h) + bump[None, None, :] / NZ
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    dt = 300.0
    nstep, _ = set_dtbt(G, GV, 1000.0, dt)
    outs = {}
    for sch in ("RK2", "RK2B"):
        params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2),
                           kv=0.0, scheme=sch)
        step = jax.jit(lambda s, p=params: step_dynamics_split_rk2(
            s, MechForcing(), G, GV, p))
        s = state
        for _ in range(20):
            s = step(s)
        outs[sch] = np.asarray(s.u, np.float64)
        assert np.isfinite(outs[sch]).all(), sch
        if sch == "RK2B":
            # the u_av/u_inst correction pair is carried in the state
            # (the du_av_inst restart fields of MOM_dynamics_split_RK2b)
            assert s.du_av_inst is not None
            assert np.isfinite(np.asarray(s.du_av_inst)).all()
            assert float(jnp.max(jnp.abs(s.du_av_inst))) > 0.0
    a, b = outs["RK2"].ravel(), outs["RK2B"].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    assert not np.allclose(a, b)     # genuinely different scheme


def test_wave_drag_map_damps_barotropic():
    """A piston-velocity MAP in BTParams.lin_drag (the tidal wave drag)
    damps the free gravity wave where the map is nonzero."""
    from mom6_tpu.physics.lateral.wave_drag import wave_drag_piston
    from mom6_tpu.eos import get_eos
    G, GV, h0 = setup()
    state = init_state_resting(G, GV, [1000.0 / NZ] * NZ)
    bump = 1.0 * np.exp(-((np.arange(NX) - NX / 2.0) ** 2) / 8.0)
    h = np.asarray(state.h) + bump[None, None, :] / NZ
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    z = jnp.cumsum(state.h, axis=0) - 0.5 * state.h
    T = (12.0 - 6.0 * z / 1000.0).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    piston = wave_drag_piston(state.h, T, S, G, GV, get_eos("LINEAR"),
                              gamma=50.0)   # exaggerated for the test
    assert float(jnp.min(piston)) >= 0.0
    assert float(jnp.max(piston)) > 0.0
    dt = 300.0
    nstep, _ = set_dtbt(G, GV, 1000.0, dt)

    def energy(s):
        eta = jnp.sum(s.h, axis=0) - G.bathyT
        return float(0.5 * jnp.sum(s.h * (s.u ** 2 + s.v ** 2) * G.areaT)
                     + 0.5 * GV.g_earth * jnp.sum(eta ** 2 * G.areaT))

    outs = []
    for lin in (0.0, piston):
        params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2,
                                              lin_drag=lin), kv=0.0)
        step = jax.jit(lambda s, p=params: step_dynamics_split_rk2(
            s, MechForcing(), G, GV, p))
        s = state
        for _ in range(40):
            s = step(s)
        outs.append(energy(s))
    assert outs[1] < outs[0], outs
