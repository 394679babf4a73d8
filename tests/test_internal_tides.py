"""Internal-tide energy propagation tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.lateral.internal_tides import (
    InternalTidesParams, init_int_tide_energy, step_internal_tides)

NX, NY = 32, 24


@pytest.fixture(scope="module")
def setup():
    # reentrant so propagation conserves energy exactly
    G = build_cartesian_grid(NX, NY, 320.0, 240.0, max_depth=2000.0,
                             cyclic_x=True, reentrant_y=True)
    GV = build_layered_vgrid(4)
    return G, GV


def test_free_propagation_conserves_energy(setup):
    G, GV = setup
    p = InternalTidesParams(decay_rate=0.0, drag_coef=0.0)
    En = init_int_tide_energy(p, NY, NX)
    En = En.at[:, NY // 2, NX // 2].set(100.0)
    cn = jnp.full((NY, NX), 2.0, jnp.float32)
    zero = jnp.zeros((NY, NX), jnp.float32)
    e0 = float(jnp.sum(En * G.areaT[None]))
    dt = 600.0
    for _ in range(30):
        En, loss = step_internal_tides(En, zero, cn, G, GV, dt, p)
    e1 = float(jnp.sum(En * G.areaT[None]))
    assert abs(e1 - e0) / e0 < 1e-5
    assert float(jnp.max(loss)) == 0.0


def test_beam_moves_at_group_speed(setup):
    """Energy in the eastward bin translates east at ~cg."""
    G, GV = setup
    p = InternalTidesParams(n_angle=8, decay_rate=0.0, drag_coef=0.0)
    En = init_int_tide_energy(p, NY, NX)
    # bin 0 is centred at th = pi/8; use bin closest to east (k=0) and
    # check x displacement against cg*cos(th)
    En = En.at[0, NY // 2, 5].set(100.0)
    cn = jnp.full((NY, NX), 2.0, jnp.float32)  # f=0 grid: cg = cn
    zero = jnp.zeros((NY, NX), jnp.float32)
    dt = 600.0
    n = 20
    for _ in range(n):
        En, _ = step_internal_tides(En, zero, cn, G, GV, dt, p)
    x = np.arange(NX) * 10e3
    e = np.asarray(jnp.sum(En[0], axis=0))
    xc = (x * e).sum() / e.sum()
    expect = 5 * 10e3 + 2.0 * np.cos(np.pi / 8.0) * dt * n
    assert abs(xc - expect) < 2 * 10e3, (xc, expect)


def test_forcing_and_decay_balance(setup):
    """Steady forcing with decay approaches E = input/decay."""
    G, GV = setup
    p = InternalTidesParams(decay_rate=1e-4, drag_coef=0.0, q_local=0.0)
    En = init_int_tide_energy(p, NY, NX)
    cn = jnp.full((NY, NX), 1.0, jnp.float32)
    inp = jnp.full((NY, NX), 0.01, jnp.float32)   # W/m2
    dt = 600.0
    for _ in range(400):
        En, loss = step_internal_tides(En, inp, cn, G, GV, dt, p)
    e_tot = float(jnp.sum(En, axis=0)[NY // 2, NX // 2])
    assert abs(e_tot - 0.01 / 1e-4) / (0.01 / 1e-4) < 0.05
    # dissipation balances input at equilibrium
    l = float(loss[NY // 2, NX // 2])
    assert abs(l - 0.01) / 0.01 < 0.05


def test_refraction_turns_rays_and_conserves(setup):
    """A mode-speed gradient redistributes energy across angle bins
    without changing the total."""
    G, GV = setup
    p = InternalTidesParams(n_angle=8, decay_rate=0.0, drag_coef=0.0)
    En = init_int_tide_energy(p, NY, NX)
    En = En.at[2].set(1.0)               # all energy in one bin
    # cn increasing northward -> eastward/westward rays turn
    cn = jnp.asarray(1.0 + 1.0 * np.arange(NY)[:, None] / NY
                     * np.ones((NY, NX)), jnp.float32)
    zero = jnp.zeros((NY, NX), jnp.float32)
    e0 = float(jnp.sum(En * G.areaT[None]))
    for _ in range(20):
        En, _ = step_internal_tides(En, zero, cn, G, GV, 600.0, p)
    e1 = float(jnp.sum(En * G.areaT[None]))
    assert abs(e1 - e0) / e0 < 1e-4
    spread = np.asarray(jnp.sum(En, axis=(1, 2)))
    assert (spread > 1e-6 * spread.max()).sum() >= 2  # energy left the bin


def test_land_mask_blocks(setup):
    """Closed (default-wall) domain: no energy enters land; total only
    decreases via losses (here zero => conserved up to boundary walls)."""
    G = build_cartesian_grid(NX, NY, 320.0, 240.0, max_depth=2000.0)
    GV = build_layered_vgrid(4)
    p = InternalTidesParams(decay_rate=0.0, drag_coef=0.0)
    En = init_int_tide_energy(p, NY, NX)
    En = En.at[:, NY // 2, NX // 2].set(10.0)
    cn = jnp.full((NY, NX), 2.0, jnp.float32)
    zero = jnp.zeros((NY, NX), jnp.float32)
    for _ in range(50):
        En, _ = step_internal_tides(En, zero, cn, G, GV, 600.0, p)
    assert np.isfinite(np.asarray(En)).all()
    assert float(jnp.min(En)) >= 0.0


def test_multi_freq_mode_propagation():
    """Multi-frequency / multi-mode energy: K1 is sub-inertial where M2
    propagates (f > w_K1 cutoff), higher modes move slower (cn/m), and
    the full-field update conserves energy in the loss accounting."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.physics.lateral.internal_tides import (
        InternalTidesParams, init_int_tide_energy, step_internal_tides)
    ny = nx = 16
    # f = 1e-4 > K1 frequency 7.29e-5: K1 cannot propagate here
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=600.0,
                             len_lat_km=600.0, max_depth=3000.0, f0=1e-4,
                             beta=0.0)
    GV = build_layered_vgrid(2)
    p = InternalTidesParams(n_angle=8,
                            freqs=(1.4052e-4, 7.2921e-5),
                            freq_frac=(1.0, 1.0), n_mode=2,
                            q_local=0.0, decay_rate=0.0, drag_coef=0.0)
    En = init_int_tide_energy(p, ny, nx)
    assert En.shape == (2, 2, 8, ny, nx)
    src = jnp.zeros((ny, nx)).at[8, 8].set(1.0)   # point source [W m-2]
    cn = jnp.full((ny, nx), 2.0, jnp.float32)
    dt = 1800.0
    for _ in range(6):
        En, loss = step_internal_tides(En, src, cn, G, GV, dt, p)
    e = np.asarray(En)
    # M2 mode-1 energy has left the source cell; K1 is evanescent
    # (cg = 0) so its energy stays exactly where it was deposited
    m2_spread = (e[0, 0].sum(axis=0) > 0).sum()
    k1_spread = (e[1, 0].sum(axis=0) > 0).sum()
    assert m2_spread > k1_spread == 1
    # mode 2 spreads more slowly than mode 1
    def radius(fld):
        tot = fld.sum(axis=0)
        jj, ii = np.nonzero(tot > 1e-12 * tot.max())
        return max(np.abs(jj - 8).max(), np.abs(ii - 8).max())
    assert radius(e[0, 0]) >= radius(e[0, 1])
    # legacy 3-D interface still works
    En3 = jnp.zeros((8, ny, nx)).at[:, 8, 8].set(1.0)
    En3b, _ = step_internal_tides(En3, src, cn, G, GV, dt,
                                  InternalTidesParams(n_angle=8))
    assert En3b.shape == En3.shape
