"""Sanitizer tests: per-field NaN surveillance of the state pytree,
wet/land separation, the NanFault report, and the solo driver's
DEBUG_CHECK_NANS wiring."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.core.state import OceanState, init_state_resting
from mom6_tpu.framework.sanitize import (NanFault, check_finite_state,
                                         field_nan_report)
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid


def _setup():
    G = build_cartesian_grid(nx=8, ny=6, len_lon_km=100.0,
                             len_lat_km=80.0, max_depth=500.0)
    GV = build_layered_vgrid(3)
    st = init_state_resting(G, GV, np.full(3, 500.0 / 3),
                            with_thermo=True)
    return G, GV, st


def test_clean_state_passes():
    G, GV, st = _setup()
    assert field_nan_report(st, G) == {}
    check_finite_state(st, G)       # no raise


def test_wet_nan_named_and_counted(tmp_path):
    G, GV, st = _setup()
    u = np.asarray(st.u).copy()
    u[1, 2, 3] = np.nan             # a wet u-face
    T = np.asarray(st.T).copy()
    T[0, 3, 4] = np.inf
    st = st.replace(u=jnp.asarray(u), T=jnp.asarray(T))
    rep = field_nan_report(st, G)
    assert rep["u"][0] == 1 and rep["u"][2] == (1, 2, 3)
    assert rep["T"][0] == 1
    fatal = tmp_path / "FATAL_NANS"
    with pytest.raises(NanFault) as e:
        check_finite_state(st, G, step=7, fatal_path=str(fatal))
    msg = str(e.value)
    assert "u" in msg and "T" in msg and "step 7" in msg
    assert fatal.exists() and "first at (1, 2, 3)" in fatal.read_text()


def test_land_junk_tolerated():
    """Non-finite values confined to land cells are reported but do not
    fail the check (masks zero them before they matter)."""
    G, GV, st = _setup()
    mask = np.asarray(G.mask2dT)
    land = np.argwhere(mask < 0.5)
    if len(land) == 0:
        pytest.skip("grid has no land points")
    j, i = land[0]
    T = np.asarray(st.T).copy()
    T[0, j, i] = np.nan
    st = st.replace(T=jnp.asarray(T))
    rep = field_nan_report(st, G)
    assert rep["T"][0] == 0 and rep["T"][1] == 1
    check_finite_state(st, G)       # land-only: no raise


def test_tracer_registry_scanned():
    G, GV, st = _setup()
    tr = {"dye": jnp.full_like(st.h, 1.0)}
    dye = np.asarray(tr["dye"]).copy()
    dye[2, 1, 1] = np.nan
    st = st.replace(tr={"dye": jnp.asarray(dye)})
    rep = field_nan_report(st, G)
    assert "tr[dye]" in rep and rep["tr[dye]"][0] == 1


def test_solo_debug_check_nans_clean_run(tmp_path):
    """A healthy run under DEBUG_CHECK_NANS completes and leaves no
    FATAL_NANS breadcrumb."""
    from mom6_tpu.drivers import solo
    rd = tmp_path / "run"
    rd.mkdir()
    (rd / "MOM_input").write_text("""
NIGLOBAL = 10
NJGLOBAL = 8
NK = 2
LENLON = 400.0
LENLAT = 300.0
MAXIMUM_DEPTH = 800.0
TOPO_CONFIG = flat
F_0 = 1.0e-4
DT = 600.0
DAYMAX = 0.1
DEBUG_CHECK_NANS = True
""")
    solo.main([str(rd)])
    assert os.path.exists(rd / "ocean.stats")
    assert not os.path.exists(rd / "FATAL_NANS")
