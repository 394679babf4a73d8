"""User-experiment suite: Phillips 2-layer instability, lock exchange,
seamount PGF error, freezing point."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import (lock_exchange, phillips_2layer,
                                          seamount)
from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
from mom6_tpu.core.mom import step_mom


def test_phillips_jet_develops_eddies():
    G, GV, state, params, forces = phillips_2layer(nx=24, ny=24, dt=900.0)
    step = jax.jit(lambda s: step_dynamics_split_rk2(s, forces, G, GV,
                                                     params))
    s = state
    for _ in range(96):  # one day
        s = step(s)
    v = np.asarray(s.v)
    assert np.isfinite(v).all()
    # meridional velocity develops (the jet meanders) but stays bounded
    assert 1e-6 < np.abs(v[0]).max() < 2.0
    assert np.asarray(s.h).min() > 0.0


def test_lock_exchange_front_propagates():
    G, GV, state, params, forcing = lock_exchange(nx=32, nz=8, dt=30.0)
    cyc = jax.jit(lambda s: step_mom(s, forcing, G, GV, params))
    s = state
    for _ in range(60):  # 30 min
        s = cyc(s)
    u = np.asarray(s.u)
    T = np.asarray(s.T)
    assert np.isfinite(u).all()
    # gravity current: dense water undercuts light water -> near-bottom
    # flow toward the light side, near-surface flow the other way
    # check at the lock: dense water undercuts toward the light side
    front = 15
    u_bot = u[-1, 2, front]
    u_top = u[0, 2, front]
    assert u_bot * u_top < 0.0  # opposing flows
    assert 0.005 < max(abs(u_bot), abs(u_top)) < 2.0
    # temperature stays within initial bounds
    assert T.min() >= 10.0 - 1e-3 and T.max() <= 20.0 + 1e-3


def test_seamount_spurious_flow_small():
    """PGF fidelity: a resting stratified ocean over a seamount must stay
    nearly at rest (this measures the contact-form PGF error)."""
    G, GV, state, params, forcing = seamount(nx=24, ny=24, nz=8, dt=600.0)
    cyc = jax.jit(lambda s: step_mom(s, forcing, G, GV, params))
    s = state
    for _ in range(36):  # 6 hours
        s = cyc(s)
    u = np.asarray(s.u)
    h = np.asarray(s.h)
    assert np.isfinite(u).all()
    # quadrature FV PGF + mass weighting + massless-face damping:
    # spurious flow at the mm/s level
    assert np.abs(u).max() < 0.01


def test_tfreeze():
    from mom6_tpu.eos.tfreeze import tfreeze_linear, tfreeze_millero
    assert abs(tfreeze_linear(35.0, 0.0) - (-1.89)) < 0.05
    assert abs(tfreeze_millero(35.0, 0.0) - (-1.92)) < 0.05
    # pressure lowers the freezing point
    assert tfreeze_millero(35.0, 1e7) < tfreeze_millero(35.0, 0.0)
