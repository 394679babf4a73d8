"""Barotropic Rossby wave dispersion: a geostrophically balanced
channel mode on a beta plane propagates westward at
c = beta / (k^2 + l^2 + 1/LR^2), a classic dynamical-core validation.

The initial state is the clean quasigeostrophic channel eigenmode
eta = A sin(kx) sin(ly) with its geostrophic (u, v), and the measured
phase is the projection of eta on sin(ly), so a single (k, l) mode is
tracked.  Zonal mode 2 keeps the deformation term ~7% of the dispersion
denominator, limiting the distortion from the beta-induced f variation
across the channel (beta Ly / f0 = 0.3, which perturbs 1/LR^2 across
the channel); 5% tolerance (measured r3: -2.6%)."""

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
G_EARTH = 9.8


def test_rossby_wave_phase_speed():
    G = build_cartesian_grid(NX, NY, LX, LY, max_depth=H, f0=F0,
                             beta=BETA, cyclic_x=True)
    GV = build_layered_vgrid(1)
    state = init_state_resting(G, GV, [H])
    k = 2.0 * 2.0 * np.pi / (LX * 1e3)       # zonal mode 2
    l = np.pi / (LY * 1e3)                   # gravest channel mode
    dx = LX * 1e3 / NX
    dy = LY * 1e3 / NY
    x = (np.arange(NX) + 0.5) * dx
    y = (np.arange(NY) + 0.5) * dy
    amp = 0.05
    eta = amp * np.sin(k * x)[None, :] * np.sin(l * y)[:, None]
    h = np.asarray(state.h) + eta[None]
    # geostrophic mode: psi = g eta / f0; u = -psi_y, v = psi_x at the
    # C-grid staggered points
    xu = (np.arange(NX) + 1.0) * dx
    yv = (np.arange(NY) + 1.0) * dy
    u = -(G_EARTH / F0) * amp * l * np.sin(k * xu)[None, :] \
        * np.cos(l * y)[:, None]
    v = (G_EARTH / F0) * amp * k * np.cos(k * x)[None, :] \
        * np.sin(l * yv)[:, None]
    state = state.replace(
        h=jnp.asarray(h, jnp.float32),
        u=jnp.asarray(u[None], jnp.float32) * G.mask2dCu,
        v=jnp.asarray(v[None], jnp.float32) * G.mask2dCv)
    dt = 1200.0
    nstep, _ = set_dtbt(G, GV, H, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=0.0)
    step = jax.jit(lambda s: step_dynamics_split_rk2(s, MechForcing(),
                                                     G, GV, params))

    w = np.sin(l * y)

    def phase(s):
        eta = np.asarray(jnp.sum(s.h, axis=0) - G.bathyT, np.float64)
        row = (eta * w[:, None]).sum(0) / (w ** 2).sum()
        c2 = np.fft.rfft(row)[2]
        return np.angle(c2), np.abs(c2)

    s = state
    _, a0 = phase(s)
    n_days = 20
    steps_per_day = int(86400 / dt)
    phases = [phase(s)[0]]
    for _ in range(n_days):
        for _ in range(steps_per_day):
            s = step(s)
        phases.append(phase(s)[0])
    _, a1 = phase(s)
    ph = np.unwrap(np.asarray(phases))
    # for eta ~ sin(kx + phi(t)), phi grows in time for WESTWARD motion
    c_west = (ph[-1] - ph[0]) / (k * n_days * 86400.0)
    lr2 = G_EARTH * H / F0 ** 2
    c_theory = BETA / (k * k + l * l + 1.0 / lr2)    # westward magnitude
    assert np.isfinite(np.asarray(s.u)).all()
    assert a1 > 0.5 * a0                    # mode survives, not dissipated
    assert c_west > 0.0, (c_west, c_theory)
    assert abs(c_west - c_theory) < 0.05 * c_theory, (c_west, c_theory)
