"""Config-driven model build + the benchmark-config stability gate.

The bowl-topography benchmark exercises the pathologies the flat-bottom
tests can't: vanished layers over topography in every module (PPM
continuity Newton, tracer advection, the implicit column solves, GM,
ALE remap, hor_visc)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile, param_file_from_text
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.core.mom import step_mom

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_double_gyre_config_builds_and_runs():
    pf = ParamFile([os.path.join(REPO, "configs/double_gyre/MOM_input")])
    st = build_model_from_params(pf)
    assert st.grid.nx == 44 and st.vgrid.nz == 2
    assert not st.params.thermo_enabled
    out = jax.jit(lambda s: step_mom(s, st.forcing, st.grid, st.vgrid,
                                     st.params))(st.state)
    assert np.isfinite(np.asarray(out.h)).all()


def test_benchmark_config_full_physics_stability():
    """All features on over bowl topography: stable, conserving, bounded."""
    pf = ParamFile([os.path.join(REPO, "configs/benchmark/MOM_input")],
                   text="NIGLOBAL = 16\nNJGLOBAL = 16\nNK = 6\n")
    st = build_model_from_params(pf)
    G, GV = st.grid, st.vgrid
    assert st.params.thermo_enabled and st.params.gm is not None
    assert st.params.hor_visc is not None
    assert st.params.diabatic.boundary_layer_scheme == "KPP"

    cyc = jax.jit(lambda s: step_mom(s, st.forcing, G, GV, st.params))
    s = st.state
    area = np.asarray(G.areaT, np.float64)
    wet = np.asarray(G.mask2dT, np.float64)
    vol0 = (np.asarray(s.h, np.float64) * area * wet).sum()
    for _ in range(24):  # one model day
        s = cyc(s)
    u = np.asarray(s.u)
    h = np.asarray(s.h, np.float64)
    T = np.asarray(s.T)
    assert np.isfinite(u).all() and np.isfinite(h).all()
    assert h.min() >= 0.0
    # T in massive layers stays within physical bounds
    sig = h > 1.0
    assert T[sig].min() > 3.0 and T[sig].max() < 17.0
    # volume conservation
    vol1 = (h * area * wet).sum()
    assert abs(vol1 - vol0) / vol0 < 1e-5


def test_parameter_doc_written(tmp_path):
    pf = ParamFile([os.path.join(REPO, "configs/double_gyre/MOM_input")])
    build_model_from_params(pf, doc_dir=str(tmp_path))
    doc = (tmp_path / "MOM_parameter_doc.all").read_text()
    assert "NIGLOBAL" in doc and "DT" in doc


def test_unknown_coordinate_mode_fails_loudly():
    pf = param_file_from_text(
        "NIGLOBAL = 8\nNJGLOBAL = 8\nNK = 2\nDT = 600.0\n"
        "USE_REGRIDDING = True\n"
        "REGRIDDING_COORDINATE_MODE = NO_SUCH_MODE\n")
    try:
        build_model_from_params(pf)
        assert False, "should raise for an unimplemented coordinate"
    except NotImplementedError:
        pass


def test_rho_and_meke_mlr_config():
    pf = param_file_from_text(
        "NIGLOBAL = 8\nNJGLOBAL = 8\nNK = 3\nDT = 600.0\n"
        "USE_REGRIDDING = True\nREGRIDDING_COORDINATE_MODE = RHO\n"
        "THICKNESSDIFFUSE = True\nUSE_MEKE = True\n"
        "MIXEDLAYER_RESTRAT = True\nT_RANGE = 8.0\n")
    st = build_model_from_params(pf)
    assert st.params.ale.mode == "RHO"
    assert st.params.meke is not None and st.params.mlrestrat is not None
    assert st.state.E_meke is not None
    out = jax.jit(lambda s: step_mom(s, st.forcing, st.grid, st.vgrid,
                                     st.params))(st.state)
    assert np.isfinite(np.asarray(out.h)).all()
    assert np.isfinite(np.asarray(out.T)).all()
