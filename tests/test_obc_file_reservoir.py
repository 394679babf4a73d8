"""OBC completeness: partial-edge extents, file-driven segment data,
per-tracer segment reservoirs (reference: MOM_open_boundary.F90:41-60,
update_OBC_segment_data, update_segment_tracer_reservoirs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.mom import step_mom
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.framework.config import ParamFile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_text(text, tmp_path):
    p = tmp_path / "MOM_input"
    p.write_text(text)
    return build_model_from_params(ParamFile([str(p)]))


def test_partial_edge_extent(tmp_path):
    """A segment given as I=4:8 covers exactly cells 4..7 of the edge
    (the reference's partial-extent strings, tc3-style)."""
    ms = _build_text("""
NIGLOBAL = 16
NJGLOBAL = 12
NK = 1
LENLON = 100.0
LENLAT = 80.0
MAXIMUM_DEPTH = 100.0
TOPO_CONFIG = flat
DT = 300.0
ENABLE_THERMODYNAMICS = False
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "J=N,I=4:8,FLATHER"
""", tmp_path)
    mv = np.asarray(ms.params.obc.mask_v)
    assert mv[-2, 4:8].all()
    assert mv[-2, :4].sum() == 0 and mv[-2, 8:].sum() == 0
    assert mv[:-2].sum() == 0
    # reversed order = same extent (orientation marker only)
    ms2 = _build_text("""
NIGLOBAL = 16
NJGLOBAL = 12
NK = 1
LENLON = 100.0
LENLAT = 80.0
MAXIMUM_DEPTH = 100.0
TOPO_CONFIG = flat
DT = 300.0
ENABLE_THERMODYNAMICS = False
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "J=N,I=8:4,FLATHER"
""", tmp_path)
    np.testing.assert_array_equal(np.asarray(ms2.params.obc.mask_v), mv)


def test_tidal_bay_file_forcing():
    """configs/tidal_bay: western-boundary SSH follows an M2 series read
    from obc_forcing.nc; the bay (much smaller than the tidal
    wavelength) responds in the pumping-mode regime — the interior
    surface tracks the forcing with amplitude ratio 1/sqrt(1+(w tau)^2)
    ~ 0.85-1 and a fraction-of-a-radian lag.  Gate: ratio in
    [0.8, 1.05] (measured r3: 0.945), lag < 1 rad, stable."""
    pf = ParamFile([os.path.join(REPO, "configs", "tidal_bay",
                                 "MOM_input")])
    ms = build_model_from_params(pf)
    G, params = ms.grid, ms.params
    assert params.obc is not None and ms.forcing_provider is not None
    step = jax.jit(lambda s, f: step_mom(s, f, G, ms.vgrid, params))
    s = ms.state
    dtc = params.dyn.dt * params.n_dyn_per_thermo
    m2 = 12.4206012 * 3600.0
    n = int(1.5 * m2 / dtc)
    eta_mid, eta_f = [], []
    for k in range(n):
        f = ms.forcing_provider((k + 0.5) * dtc)
        s = step(s, f)
        eta = np.asarray(s.h.sum(0) - G.bathyT, np.float64)
        eta_mid.append(eta[12, 24])
        eta_f.append(float(np.asarray(f.obc_data.eta_ext)[12, 0]))
    eta_mid = np.asarray(eta_mid)
    eta_f = np.asarray(eta_f)
    half = n // 3
    amp_i = 0.5 * (eta_mid[half:].max() - eta_mid[half:].min())
    amp_f = 0.5 * (eta_f[half:].max() - eta_f[half:].min())
    assert np.isfinite(np.asarray(s.h)).all()
    assert 0.8 < amp_i / amp_f < 1.05, (amp_i, amp_f)
    c = np.correlate(eta_mid[half:] - eta_mid[half:].mean(),
                     eta_f[half:] - eta_f[half:].mean(), "full")
    lag = (np.argmax(c) - (len(eta_f[half:]) - 1)) * dtc
    assert 0.0 <= 2 * np.pi * lag / m2 < 1.0, lag


def test_tracer_reservoir_outflow_inflow():
    """Reservoir dynamics: sustained OUTFLOW relaxes the reservoir to
    the adjacent interior tracer over ~L_out/|u| seconds; the boundary
    strip then carries the reservoir value.  Checked directly against
    the update law res <- (res + a T_adj)/(1 + a)."""
    from mom6_tpu.core.open_boundary import (OBCSegment, build_obc,
                                             update_tracer_reservoirs)
    from mom6_tpu.core.state import init_state_resting
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid

    ny, nx = 8, 12
    G = build_cartesian_grid(nx, ny, 120.0, 80.0, max_depth=100.0)
    GV = build_layered_vgrid(1)
    obc = build_obc([OBCSegment(edge="E", scheme="FLATHER")], ny, nx,
                    res_len_in=2000.0, res_len_out=10000.0)
    st = init_state_resting(G, GV, [100.0], with_thermo=True)
    # interior warm, reservoir starts cold
    T = np.full((1, ny, nx), 12.0, np.float32)
    st = st.replace(T=jnp.asarray(T), S=jnp.full((1, ny, nx), 35.0,
                                                 jnp.float32),
                    obc_res_T=jnp.full((1, ny, nx), 5.0, jnp.float32),
                    obc_res_S=jnp.full((1, ny, nx), 30.0, jnp.float32),
                    u=jnp.full((1, ny, nx), 0.5, jnp.float32)
                    * G.mask2dCu)
    dt = 1000.0
    # a = |u| dt / L_out = 0.5*1000/10000 = 0.05 per call (outflow)
    s1 = update_tracer_reservoirs(st, obc, G, dt)
    res = np.asarray(s1.obc_res_T)[0, 3, -1]
    expect = (5.0 + 0.05 * 12.0) / 1.05
    np.testing.assert_allclose(res, expect, rtol=1e-5)
    # the strip cell now carries the reservoir value
    np.testing.assert_allclose(np.asarray(s1.T)[0, 3, -1], expect,
                               rtol=1e-5)
    # interior untouched
    np.testing.assert_allclose(np.asarray(s1.T)[0, 3, -3], 12.0)
    # inflow uses the (shorter) L_in: a = 0.5*1000/2000 = 0.25
    st_in = st.replace(u=-st.u)
    s2 = update_tracer_reservoirs(st_in, obc, G, dt)
    res_in = np.asarray(s2.obc_res_T)[0, 3, -1]
    np.testing.assert_allclose(res_in, (5.0 + 0.25 * 12.0) / 1.25,
                               rtol=1e-5)
