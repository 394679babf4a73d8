"""NPZD generic-tracer package tests: nitrogen conservation, bloom
dynamics, detritus sinking, coupler nitrogen deposition, and the full
config -> step_mom -> cap integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.core.dynamics_split_rk2 import MechForcing
from mom6_tpu.core.mom import Forcing
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.vertical.diabatic import BuoyancyForcing
from mom6_tpu.tracers.bgc import NPZD


def _setup(nz=8, sw=200.0):
    G = build_cartesian_grid(nx=4, ny=4, len_lon_km=100.0,
                             len_lat_km=100.0, max_depth=400.0)
    GV = build_layered_vgrid(nz)
    h = jnp.full((nz, 4, 4), 400.0 / nz, jnp.float32)
    pkg = NPZD()
    fields = pkg.init_fields(h.shape, jnp.float32)
    f = Forcing(buoy=BuoyancyForcing(
        sw_flux=jnp.full((4, 4), sw, jnp.float32)))
    return G, GV, h, pkg, fields, f


def _total_n(fields, h):
    return float(sum((np.asarray(fields[k]) * np.asarray(h)).sum()
                     for k in ("no3", "phy", "zoo", "det")))


def test_nitrogen_exactly_conserved():
    G, GV, h, pkg, fields, f = _setup()
    n0 = _total_n(fields, h)
    for _ in range(50):
        fields = pkg.column_physics(fields, h, 3600.0, G, GV,
                                    T=jnp.full_like(h, 12.0), forcing=f)
    n1 = _total_n(fields, h)
    assert abs(n1 - n0) / n0 < 1e-5
    for k in ("no3", "phy", "zoo", "det"):
        arr = np.asarray(fields[k])
        assert (arr >= 0.0).all() and np.isfinite(arr).all(), k


def test_bloom_requires_light_and_draws_down_nutrient():
    G, GV, h, pkg, fields, f = _setup(sw=250.0)
    _, _, _, _, dark_fields, f_dark = _setup(sw=0.0)
    for _ in range(200):
        fields = pkg.column_physics(fields, h, 3600.0, G, GV,
                                    T=jnp.full_like(h, 15.0), forcing=f)
        dark_fields = pkg.column_physics(dark_fields, h, 3600.0, G, GV,
                                         T=jnp.full_like(h, 15.0),
                                         forcing=f_dark)
    # lit surface: phytoplankton bloomed, surface nitrate drawn down
    assert float(fields["phy"][0, 1, 1]) > 5 * pkg.phy_0
    assert float(fields["no3"][0, 1, 1]) < pkg.no3_0
    # dark ocean: no growth, phytoplankton only decays
    assert float(dark_fields["phy"][0, 1, 1]) <= pkg.phy_0
    # light attenuates: deep growth far weaker than surface
    assert float(fields["phy"][-1, 1, 1]) < float(fields["phy"][0, 1, 1])


def test_detritus_sinks_conservatively():
    G, GV, h, pkg, fields, f = _setup(sw=0.0)
    det = np.zeros(h.shape, np.float32)
    det[0] = 1.0                      # all detritus at the surface
    fields = {**fields, "no3": jnp.zeros_like(h),
              "phy": jnp.zeros_like(h), "zoo": jnp.zeros_like(h),
              "det": jnp.asarray(det)}
    pkg_nr = NPZD(remin0=0.0)        # isolate sinking
    n0 = _total_n(fields, h)
    for _ in range(100):
        fields = pkg_nr.column_physics(fields, h, 3600.0, G, GV,
                                       forcing=f)
    assert abs(_total_n(fields, h) - n0) / n0 < 1e-5
    d = np.asarray(fields["det"])
    # explicit upwind decay of the source layer: (1 - dt w/h)^n
    dt, n, hh = 3600.0, 100, 50.0
    want = (1.0 - dt * pkg_nr.w_sink / hh) ** n
    np.testing.assert_allclose(d[0, 1, 1], want, rtol=1e-3)
    assert d[1:, 1, 1].sum() > 0.5    # the rest moved down, not lost


def test_nitrogen_deposition_from_coupler():
    G, GV, h, pkg, fields, _ = _setup(sw=0.0)
    ndep = 1e-5                       # mmol N m-2 s-1
    f = Forcing(buoy=BuoyancyForcing(),
                tr_fluxes={"ndep": jnp.full((4, 4), ndep, jnp.float32)})
    n0 = _total_n(fields, h)
    dt, steps = 3600.0, 20
    for _ in range(steps):
        fields = pkg.column_physics(fields, h, dt, G, GV, forcing=f)
    gained = _total_n(fields, h) - n0
    want = ndep * dt * steps * 16     # x16 wet cells (area weight = 1)
    np.testing.assert_allclose(gained, want, rtol=1e-3)


def test_config_and_cap_integration(tmp_path):
    """USE_generic_tracer=True builds the NPZD registry through the
    config driver; Faxa_ndep imported through the NUOPC cap raises
    nitrate; all four pools advect with the model and stay positive."""
    from mom6_tpu.drivers.nuopc import NUOPCCap
    (tmp_path / "MOM_input").write_text("""
NIGLOBAL = 10
NJGLOBAL = 8
NK = 4
LENLON = 500.0
LENLAT = 400.0
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
DT = 900.0
DT_THERM = 1800.0
ENABLE_THERMODYNAMICS = True
USE_generic_tracer = True
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
""")
    cap = NUOPCCap(str(tmp_path))
    cap.advertise()
    cap.realize(stop_days=1.0)
    assert {"no3", "phy", "zoo", "det"} <= set(cap.model.state.tr)
    no3_0 = float(jnp.sum(cap.model.state.tr["no3"]))
    ny, nx = cap.model.grid.ny, cap.model.grid.nx
    one = jnp.ones((ny, nx), jnp.float32)
    imports = {"Foxx_swnet_vdr": 200.0 * one,
               "Faxa_ndep": 1e-4 * one}
    for _ in range(4):
        exp = cap.advance(imports)
    st = cap.model.state
    for k in ("no3", "phy", "zoo", "det"):
        arr = np.asarray(st.tr[k])
        assert np.isfinite(arr).all() and (arr >= -1e-6).all(), k
    assert float(jnp.sum(st.tr["no3"])) > no3_0   # deposition landed
