"""SSA ice-shelf dynamics tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.physics.ice_shelf_dynamics import (SSAParams, _apply_ssa,
                                                 _glen_visc,
                                                 ice_shelf_advect_thickness,
                                                 ssa_solve)

NX, NY = 24, 16


@pytest.fixture(scope="module")
def grid():
    # reentrant in y so a 1-D (x-only) problem stays 1-D
    return build_cartesian_grid(NX, NY, 240.0, 160.0, max_depth=1000.0,
                                reentrant_y=True)


def test_operator_symmetric(grid):
    G = grid
    rng = np.random.RandomState(0)
    nu_h = jnp.asarray(1e14 * (1.0 + rng.rand(NY, NX)), jnp.float32)
    mask_q = jnp.ones((NY, NX), jnp.float32)
    beta = jnp.zeros((NY, NX), jnp.float32)

    def A(x):
        fu, fv = _apply_ssa(x[0], x[1], nu_h, G, mask_q, G.areaT, beta)
        return jnp.stack([fu, fv])

    x = jnp.asarray(rng.randn(2, NY, NX) * 1e-6, jnp.float32)
    y = jnp.asarray(rng.randn(2, NY, NX) * 1e-6, jnp.float32)
    xay = float(jnp.sum(x * A(y)))
    yax = float(jnp.sum(y * A(x)))
    assert abs(xay - yax) < 1e-5 * (abs(xay) + abs(yax) + 1e-30)
    # positive semi-definite
    assert float(jnp.sum(x * A(x))) >= 0.0


def test_van_der_veen_spreading(grid):
    """Unconfined floating shelf of constant thickness: the analytic
    steady spreading rate is du/dx = A (rho_i g (1-ri/rw) H / 4)^n."""
    G = grid
    p = SSAParams(n_picard=12, n_cg=100)
    H = 300.0
    # shelf with an ice front inside the domain (drop to open water); the
    # membrane stress in a freely spreading slab is uniform, so u_x takes
    # the analytic value throughout the interior
    h = jnp.full((NY, NX), H, jnp.float32).at[:, NX - 5:].set(0.0)
    mask = (h > 1.0).astype(jnp.float32)
    u, v = ssa_solve(h, G, p, mask_shelf=mask)
    # measured strain rate in the shelf interior
    dx = 10e3
    ux = np.diff(np.asarray(u), axis=1) / dx
    ux_mid = ux[NY // 2, 4:NX - 10].mean()
    gprime = p.rho_ice * p.g * (1.0 - p.rho_ice / p.rho_water)
    want = p.glen_a * (gprime * H / 4.0) ** 3
    assert abs(ux_mid - want) / want < 0.25, (ux_mid, want)
    # v stays negligible by symmetry
    assert np.abs(np.asarray(v)).max() < 0.2 * np.abs(np.asarray(u)).max()


def test_thicker_flows_faster(grid):
    G = grid
    p = SSAParams(n_picard=6, n_cg=60)
    us = []
    for H in (200.0, 400.0):
        h = jnp.full((NY, NX), H, jnp.float32).at[:, NX - 5:].set(0.0)
        u, _ = ssa_solve(h, G, p)
        # compare interior velocities (front corners carry noise modes)
        us.append(float(jnp.max(jnp.abs(u[:, 2:NX - 8]))))
    # du/dx ~ H^3 -> much faster for thicker ice
    assert us[1] > 4.0 * us[0], us


def test_advect_conserves_and_bounds(grid):
    G = grid
    h = jnp.full((NY, NX), 300.0, jnp.float32)
    h = h.at[:, NX // 2:].set(0.0)
    mask = (h > 1.0).astype(jnp.float32)
    u = jnp.full((NY, NX), 100.0 / 3.15e7, jnp.float32)   # 100 m/yr
    v = jnp.zeros_like(u)
    dt = 86400.0 * 30
    h1 = h
    for _ in range(5):
        m = (h1 > 1.0).astype(jnp.float32)
        h1 = ice_shelf_advect_thickness(h1, u, v, dt, G, m)
    assert float(jnp.min(h1)) >= 0.0
    # mass conserved while no flux exits the domain (front is interior)
    m0 = float(jnp.sum(h * G.areaT))
    m1 = float(jnp.sum(h1 * G.areaT))
    assert abs(m1 - m0) / m0 < 1e-5
    # the front advanced eastward
    assert float(h1[NY // 2, NX // 2]) > 0.0


def test_ice_solo_driver(tmp_path):
    """The standalone ice-shelf driver (ice_shelf_driver.F90 role) runs,
    writes ice.stats + ICE.res.nc, and the wedge flows seaward."""
    import os
    import numpy as np
    from mom6_tpu.drivers import ice_solo
    (tmp_path / "MOM_input").write_text("""
NIGLOBAL = 16
NJGLOBAL = 16
LENLON = 80.0
LENLAT = 80.0
DT = 43200.0
DAYMAX = 2.0
""")
    ice_solo.main([str(tmp_path)])
    assert os.path.exists(tmp_path / "ice.stats")
    from mom6_tpu.io.netcdf import read_nc
    res = read_nc(str(tmp_path / "ICE.res.nc"))
    assert np.isfinite(res["h_ice"]).all()
    # the shelf flows: nonzero velocities somewhere
    sp = np.hypot(res["u_ice"], res["v_ice"])
    assert sp.max() > 0.0


def test_fold_grid_rejected():
    """Ice-shelf dynamics on a TRIPOLAR_N fold grid must be a loud
    config error, not a silent fold-row approximation (round-5 verdict
    item 10; PARITY.md fold section)."""
    import jax.numpy as jnp
    import pytest
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.physics.ice_shelf_dynamics import SSAParams, ssa_solve

    G = build_cartesian_grid(8, 8, 100.0, 100.0, max_depth=1000.0)
    G = G._replace(fold_north=True) if hasattr(G, "_replace") else G
    if not getattr(G, "fold_north", False):
        object.__setattr__(G, "fold_north", True)
    h = jnp.full((8, 8), 200.0, jnp.float32)
    with pytest.raises(ValueError, match="fold"):
        ssa_solve(h, G, SSAParams())
