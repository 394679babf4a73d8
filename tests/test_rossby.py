"""Barotropic Rossby wave dispersion: a geostrophically balanced
wavenumber-1 surface perturbation on a beta-plane channel must
propagate westward at  c = -beta / (k^2 + 1/LR^2)  (with the finite
deformation-radius correction), one of the classic dynamical-core
validations."""

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.core.state import init_state_resting
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid

NX, NY = 64, 24
LX, LY = 4000.0, 1500.0          # km
H = 1000.0
F0, BETA = 1.0e-4, 2.0e-11


def test_rossby_wave_phase_speed():
    G = build_cartesian_grid(NX, NY, LX, LY, max_depth=H, f0=F0,
                             beta=BETA, cyclic_x=True)
    GV = build_layered_vgrid(1)
    state = init_state_resting(G, GV, [H])
    k = 2.0 * np.pi / (LX * 1e3)
    x = (np.arange(NX) + 0.5) * (LX * 1e3 / NX)
    amp = 0.05
    eta = amp * np.sin(k * x)[None, :] * np.ones((NY, 1))
    h = np.asarray(state.h) + eta[None]
    # geostrophic balance: f v = g d(eta)/dx  (v at north faces)
    xq = (np.arange(NX) + 1.0) * (LX * 1e3 / NX)  # face x? v at cell x
    v = (9.8 / F0) * amp * k * np.cos(k * x)[None, :] * np.ones((NY, 1))
    state = state.replace(h=jnp.asarray(h, jnp.float32),
                          v=(jnp.asarray(v[None], jnp.float32)
                             * G.mask2dCv))
    dt = 1200.0
    nstep, _ = set_dtbt(G, GV, H, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=0.0)
    step = jax.jit(lambda s: step_dynamics_split_rk2(s, MechForcing(),
                                                     G, GV, params))

    def phase(s):
        eta = np.asarray(jnp.sum(s.h, axis=0) - G.bathyT, np.float64)
        row = eta[NY // 2]
        c1 = np.fft.rfft(row)[1]
        return np.angle(c1), np.abs(c1)

    s = state
    _, a0 = phase(s)
    n_days = 12
    steps_per_day = int(86400 / dt)
    phases = [phase(s)[0]]
    for _ in range(n_days):
        for _ in range(steps_per_day):
            s = step(s)
        phases.append(phase(s)[0])
    _, a1 = phase(s)
    # the wave moves ~lambda/8 per day, so daily sampling + unwrap
    # tracks total phase without 2pi ambiguity
    ph = np.unwrap(np.asarray(phases))
    # for eta ~ sin(kx + phi(t)), phi grows in time for WESTWARD motion,
    # so positive c_west is westward propagation
    c_west = (ph[-1] - ph[0]) / (k * n_days * 86400.0)
    # channel walls impose the gravest meridional mode l = pi/Ly
    l = np.pi / (LY * 1e3)
    lr2 = 9.8 * H / F0 ** 2
    c_theory = BETA / (k * k + l * l + 1.0 / lr2)   # westward magnitude
    assert np.isfinite(np.asarray(s.u)).all()
    # wave survived (not dissipated away)
    assert a1 > 0.3 * a0
    assert c_west > 0.0, (c_west, c_theory)          # westward
    assert abs(c_west - c_theory) < 0.2 * c_theory, (c_west, c_theory)
