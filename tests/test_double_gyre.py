"""End-to-end: the double-gyre milestone (SURVEY.md §7 step 2).

Spin up a small wind-driven 2-layer basin and check physical sanity:
stability, volume conservation, emergence of circulation, and bounded
energy."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
from mom6_tpu.diagnostics.sum_output import compute_stats


def test_double_gyre_spinup():
    G, GV, state, params, forces = double_gyre(nx=24, ny=22, nz=2, dt=1800.0)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_n(state, n):
        def body(s, _):
            return step_dynamics_split_rk2(s, forces, G, GV, params), None
        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    area = np.asarray(G.areaT, np.float64)
    vol0 = float((np.asarray(state.h, np.float64) * area).sum())

    state = run_n(state, 96)  # 2 model days
    h = np.asarray(state.h)
    u = np.asarray(state.u)

    # stability: finite, positive thickness, sane velocities
    assert np.all(np.isfinite(h)) and np.all(np.isfinite(u))
    assert h.min() > 0.0
    assert np.abs(u).max() < 2.0

    # volume conservation (continuity is finite-volume)
    vol1 = float((np.asarray(state.h, np.float64) * area).sum())
    assert abs(vol1 - vol0) / vol0 < 1e-4

    # wind has driven a circulation
    stats = compute_stats(state, G, GV, params.dt)
    assert stats["KE"] > 0.0
    assert np.abs(u).max() > 1e-4

    # keep running: energy stays bounded (no numerical instability)
    state2 = run_n(state, 96)
    stats2 = compute_stats(state2, G, GV, params.dt)
    assert np.isfinite(stats2["energy"])
    assert np.asarray(state2.h).min() > 0.0
    assert np.abs(np.asarray(state2.u)).max() < 2.0
