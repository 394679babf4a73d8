"""The classic idealized user configurations (reference src/user/*):
each shipped run directory builds and steps stably for a few cycles,
with case-specific physical checks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.core.mom import step_mom
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.framework.config import ParamFile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = ["seamount", "lock_exchange", "sloshing", "internal_wave",
         "rossby_front", "dome2d_overflow", "dumbbell",
         "phillips_channel", "scm_kpp", "external_gwave", "soliton",
         "dense_water", "supercritical"]


def _run(name, n_cycles=4):
    pf = ParamFile([os.path.join(REPO, "configs", name, "MOM_input")])
    ms = build_model_from_params(pf)
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid, ms.vgrid,
                                      ms.params))
    s0 = ms.state
    s = s0
    for _ in range(n_cycles):
        s = step(s)
    return ms, s0, s


@pytest.mark.parametrize("name", CASES)
def test_config_steps_stably(name):
    ms, s0, s = _run(name)
    for f in ("h", "u", "v"):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), (name, f)
    # mass conservation (open-boundary configs exchange volume with the
    # exterior by design, so the closed-domain check does not apply)
    if ms.params.obc is None:
        a = np.asarray(ms.grid.areaT, np.float64)
        m0 = (np.asarray(s0.h, np.float64) * a).sum()
        m1 = (np.asarray(s.h, np.float64) * a).sum()
        np.testing.assert_allclose(m1, m0, rtol=1e-5)
    # velocities bounded (no blow-up within a few cycles)
    assert float(jnp.max(jnp.abs(s.u))) < 5.0, name


def test_seamount_resting_state_stays_slow():
    """The seamount PGF-error test: a resting stratified column over
    steep topography must generate only weak spurious currents."""
    ms, _, s = _run("seamount", n_cycles=8)
    assert float(jnp.max(jnp.abs(s.u))) < 0.05


def test_lock_exchange_front_propagates():
    """Dense water slumps under light: depth-mean flow develops and the
    bottom-layer T at mid-domain freshens toward the dense side."""
    ms, s0, s = _run("lock_exchange", n_cycles=8)
    assert float(jnp.max(jnp.abs(s.u))) > 1e-3
    # available PE decreases as the front slumps: T variance on the
    # bottom layer spreads in x
    t0 = np.asarray(s0.T[-1, 1])
    t1 = np.asarray(s.T[-1, 1])
    assert np.abs(np.diff(t1)).max() <= np.abs(np.diff(t0)).max() + 1e-6


def test_phillips_jet_is_balanced():
    """The initialized jet is geostrophic: within a few steps the flow
    does not explosively accelerate (balanced initialization of
    Phillips_initialize_velocity)."""
    ms, s0, s = _run("phillips_channel", n_cycles=4)
    u0 = float(jnp.max(jnp.abs(s0.u)))
    u1 = float(jnp.max(jnp.abs(s.u)))
    assert u0 > 0.01                       # the jet is there
    assert u1 < 3.0 * u0 + 0.1             # and stays of the same order


def test_scm_kpp_mixes_under_wind():
    """Single column: wind stress deepens the KPP boundary layer,
    mixing the initially-stratified T profile near the surface."""
    ms, s0, s = _run("scm_kpp", n_cycles=12)
    dT0 = float(s0.T[0, 1, 1] - s0.T[5, 1, 1])
    dT1 = float(s.T[0, 1, 1] - s.T[5, 1, 1])
    assert dT1 < dT0        # near-surface stratification reduced


def test_soliton_moves_west():
    """The equatorial Rossby soliton propagates WESTWARD keeping a
    coherent shape (Boyd 1980; soliton_initialization role).  The
    position is the peak of eta projected on the meridional mode-1
    structure (the equator row itself is the saddle between the twin
    off-equator maxima).  The quantitative Boyd speed gate lives in
    test_analytic_parity.py."""
    import numpy as np
    ms, s0, s = _run("soliton", n_cycles=72)     # 3 days at dt=3600
    G = ms.grid
    c0 = np.sqrt(9.8 * 0.8)
    L_eq = np.sqrt(c0 / 2.3e-11)
    y_nd = np.asarray(G.geoLatT)[:, 0] * 1e3 / L_eq
    w = (3 + 6 * y_nd ** 2) / 4 * np.exp(-0.5 * y_nd ** 2)

    def env(st):
        eta = np.asarray(st.h.sum(0)) - np.asarray(G.bathyT)
        return (eta * w[:, None]).sum(0)

    e0, e1 = env(s0), env(s)
    x0, x1 = int(np.argmax(e0)), int(np.argmax(e1))
    nx = e0.shape[0]
    west = (x0 - x1) % nx           # positive = net westward cells
    assert 0 < west < nx // 2, (x0, x1, west)
    assert e1.max() > 0.5 * e0.max()        # coherent, not dispersed
