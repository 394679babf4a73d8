"""Mosaic supergrid reader tests: write a synthetic ocean_hgrid.nc,
rebuild the grid, compare against the analytic spherical grid."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.grid import build_spherical_grid
from mom6_tpu.grid.mosaic import build_grid_from_supergrid, read_supergrid

NX, NY = 16, 12
LON0, LAT0, DLON, DLAT = 10.0, -30.0, 32.0, 24.0
RE = 6.378e6


def _make_supergrid():
    """Uniform lat-lon supergrid at 2x resolution (numpy, float64)."""
    xs = LON0 + DLON * np.arange(2 * NX + 1) / (2 * NX)
    ys = LAT0 + DLAT * np.arange(2 * NY + 1) / (2 * NY)
    x = np.broadcast_to(xs, (2 * NY + 1, 2 * NX + 1)).copy()
    y = np.broadcast_to(ys[:, None], (2 * NY + 1, 2 * NX + 1)).copy()
    rad = np.pi / 180.0
    dlam = (DLON / (2 * NX)) * rad
    dphi = (DLAT / (2 * NY)) * rad
    # edge lengths between adjacent supergrid nodes
    ymid_x = 0.5 * (y[:, :-1] + y[:, 1:])
    dx = RE * np.cos(ymid_x * rad) * dlam            # (2ny+1, 2nx)
    dy = np.full((2 * NY, 2 * NX + 1), RE * dphi)
    ymid_c = 0.5 * (y[:-1, :-1] + y[1:, :-1])
    area = (RE ** 2 * dphi * dlam
            * np.cos(0.5 * (y[:-1, :-1] + y[1:, :-1]) * rad))[:, :]
    area = area[:, : 2 * NX] * np.ones((2 * NY, 2 * NX))
    return dict(x=x, y=y, dx=dx, dy=dy, area=area)


def test_roundtrip_through_netcdf(tmp_path):
    from mom6_tpu.io.netcdf import NCWriter
    sg = _make_supergrid()
    path = str(tmp_path / "ocean_hgrid.nc")
    w = NCWriter(path)
    for k, v in sg.items():
        w.write_static(k, v)
    w.close()
    sg2 = read_supergrid(path)
    for k in sg:
        np.testing.assert_allclose(sg2[k], sg[k], rtol=1e-6)


def test_matches_analytic_spherical_grid():
    sg = _make_supergrid()
    depth = np.full((NY, NX), 1000.0)
    Gm = build_grid_from_supergrid(sg, depth)
    Ga = build_spherical_grid(NX, NY, LON0, LAT0, DLON, DLAT,
                              max_depth=1000.0, radius=RE)
    for name in ("dxT", "dyT", "areaT", "dxCu", "dyCv"):
        a = np.asarray(getattr(Gm, name), np.float64)
        b = np.asarray(getattr(Ga, name), np.float64)
        # interior comparison (edge faces differ by wrap conventions)
        rel = np.abs(a[1:-1, 1:-1] - b[1:-1, 1:-1]) / b[1:-1, 1:-1]
        assert rel.max() < 2e-2, (name, rel.max())
    np.testing.assert_allclose(np.asarray(Gm.geoLatT),
                               np.asarray(Ga.geoLatT), atol=1e-4)
    # Coriolis at corners agrees
    np.testing.assert_allclose(np.asarray(Gm.CoriolisBu)[:-1, :-1],
                               np.asarray(Ga.CoriolisBu)[:-1, :-1],
                               rtol=1e-3, atol=1e-9)


def test_land_mask_from_depth():
    sg = _make_supergrid()
    depth = np.full((NY, NX), 800.0)
    depth[4:7, 5:9] = 0.0                     # an island
    G = build_grid_from_supergrid(sg, depth)
    m = np.asarray(G.mask2dT)
    assert m[5, 6] == 0.0 and m[0, 0] == 1.0
    assert np.asarray(G.mask2dCu)[5, 4] == 0.0   # face into the island


def test_dynamics_step_on_mosaic_grid():
    """A dynamics step runs on the file-based grid."""
    import jax
    from mom6_tpu.core.barotropic import BTParams, set_dtbt
    from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                                  step_dynamics_split_rk2)
    from mom6_tpu.core.state import init_state_resting
    from mom6_tpu.grid.vertical import build_layered_vgrid

    sg = _make_supergrid()
    depth = np.full((NY, NX), 1000.0)
    G = build_grid_from_supergrid(sg, depth)
    GV = build_layered_vgrid(2)
    state = init_state_resting(G, GV, [500.0, 500.0])
    bump = 0.5 * np.exp(-((np.arange(NX) - NX / 2.0) ** 2) / 4.0)
    h = np.asarray(state.h) + bump[None, None, :] / 2.0
    state = state.replace(h=jnp.asarray(h, jnp.float32))
    dt = 300.0
    nstep, _ = set_dtbt(G, GV, 1000.0, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=0.0)
    step = jax.jit(lambda s: step_dynamics_split_rk2(s, MechForcing(),
                                                     G, GV, params))
    s = state
    for _ in range(10):
        s = step(s)
    assert np.isfinite(np.asarray(s.h)).all()
    m0 = (np.asarray(state.h, np.float64)
          * np.asarray(G.areaT, np.float64)).sum()
    m1 = (np.asarray(s.h, np.float64)
          * np.asarray(G.areaT, np.float64)).sum()
    assert abs(m1 - m0) / m0 < 1e-6


def test_mercator_grid_is_isotropic():
    """GRID_CONFIG=mercator: dy == dx*cos-ish at every row (locally
    square cells, set_grid_metrics_mercator role), and the Coriolis /
    metric arrays stay consistent."""
    import numpy as np
    from mom6_tpu.grid.grid import build_spherical_grid
    G = build_spherical_grid(24, 20, 0.0, -50.0, 40.0, 70.0,
                             isotropic=True)
    dx = np.asarray(G.dxT)[:, 0]
    dy = np.asarray(G.dyT)[:, 0]
    np.testing.assert_allclose(dy, dx, rtol=0.03)   # locally square
    # dy shrinks with |lat| like cos(lat) (rows crowd poleward)
    lat = np.asarray(G.geoLatT)[:, 0]
    k_eq = int(np.argmin(np.abs(lat)))
    assert dy[k_eq] >= dy[0] - 1.0
    # non-isotropic grid keeps uniform dlat
    Gs = build_spherical_grid(24, 20, 0.0, -50.0, 40.0, 70.0)
    np.testing.assert_allclose(np.diff(np.asarray(Gs.geoLatT)[:, 0]),
                               70.0 / 20, rtol=1e-6)
