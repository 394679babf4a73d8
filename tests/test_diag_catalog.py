"""The diagnostic field catalog (mom6_tpu/diagnostics/catalog.py).

The reference registers ~1200 diagnostic fields
(src/framework/MOM_diag_mediator.F90:45-66 register sites;
src/core/MOM.F90 register_diags) and an OM4 diag_table asks for the
CMOR set (thetao/so/volcello/zos/umo/vmo/...).  Gates here:

* every field of the shipped OM4-style ``configs/global_2deg/diag_table``
  either lands in ocean_diags.nc (>= 50 distinct fields) or is
  *explicitly* rejected with a config reason (diag_rejected) — no
  silent misses;
* unknown field names fail loudly at startup with a near-miss hint;
* catalog values are physically right on a state we control (volcello
  sums to the basin volume, masscello = rho0 h, umo = rho0 uh, ...).
"""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_ctx():
    from mom6_tpu.core.barotropic import BTParams
    from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
    from mom6_tpu.core.mom import Forcing, MOMParams
    from mom6_tpu.core.state import init_state_resting
    from mom6_tpu.diagnostics.catalog import DiagContext
    from mom6_tpu.eos import get_eos
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                    DiabaticParams)

    nx, ny, nz, depth = 8, 6, 4, 1000.0
    G = build_cartesian_grid(nx, ny, 100.0, 80.0, max_depth=depth,
                             f0=1e-4)
    GV = build_layered_vgrid(nz)
    state = init_state_resting(G, GV, [depth / nz] * nz)
    z = jnp.cumsum(state.h, axis=0) - 0.5 * state.h
    T = (16.0 - 10.0 * z / depth).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    state = state.replace(T=T, S=S, uh=0.5 * jnp.ones_like(state.h),
                          vh=jnp.zeros_like(state.h))
    params = MOMParams(dyn=DynParams(dt=900.0,
                                     bt=BTParams(nstep=10, nfilter=2)),
                       thermo_enabled=True, eos_name="WRIGHT",
                       diabatic=DiabaticParams())
    forcing = Forcing(
        mech=MechForcing(taux=0.1 * jnp.ones((ny, nx), jnp.float32),
                         tauy=jnp.zeros((ny, nx), jnp.float32)),
        buoy=BuoyancyForcing(
            heat_flux=jnp.full((ny, nx), 50.0, jnp.float32)))
    ctx = DiagContext(state, G, GV, params, forcing=forcing,
                      eos=get_eos("WRIGHT"))
    return ctx, G, GV, state


def test_catalog_values_tiny_state():
    from mom6_tpu.diagnostics.catalog import CATALOG, serve
    ctx, G, GV, state = _tiny_ctx()

    vol = serve("volcello", ctx)
    want = float((np.asarray(state.h, np.float64)
                  * np.asarray(G.areaT, np.float64)[None]).sum())
    assert float(np.sum(vol)) == pytest.approx(want, rel=1e-6)

    assert np.allclose(serve("masscello", ctx),
                       GV.rho0 * np.asarray(state.h), rtol=1e-6)
    assert np.allclose(serve("umo", ctx),
                       GV.rho0 * np.asarray(state.uh), rtol=1e-6)
    assert np.allclose(serve("uhbt", ctx),
                       np.asarray(state.uh).sum(0), rtol=1e-6)
    # aliases agree with the native names
    assert np.array_equal(serve("thetao", ctx), serve("T", ctx))
    assert np.array_equal(serve("tauuo", ctx), serve("taux", ctx))
    # surface warming: hfds = fixed flux (no restoring here)
    assert np.allclose(serve("hfds", ctx)[1:-1, 1:-1], 50.0)
    # stratified column: N2 positive in the interior, cg1 a few m/s
    n2 = serve("N2_int", ctx)
    assert (n2[1:-1][:, 2:-2, 2:-2] > 0).all()
    cg1 = serve("cg1", ctx)
    assert 0.1 < float(np.median(cg1[2:-2, 2:-2])) < 10.0
    # every entry either serves or returns None without raising
    served = sum(serve(k, ctx) is not None for k in CATALOG)
    assert served >= 45, served


def test_rejection_reasons():
    from mom6_tpu.diagnostics.catalog import rejection_reason, resolve
    ctx, G, GV, state = _tiny_ctx()
    p = ctx.params
    assert rejection_reason("thetao", state, p, ctx.forcing) is None
    assert "USE_MEKE" in rejection_reason("MEKE", state, p, ctx.forcing)
    assert "FRAZIL" in rejection_reason("frazil", state, p, ctx.forcing)
    assert "fresh-water" in rejection_reason("wfo", state, p, ctx.forcing)
    assert "KPP or EPBL" in rejection_reason("h_ML", state, p,
                                             ctx.forcing)
    with pytest.raises(KeyError) as ei:
        resolve("thetaoo")
    assert "did you mean" in str(ei.value)


@pytest.mark.slow
def test_global_2deg_catalog_coverage(tmp_path):
    """configs/global_2deg + its shipped OM4-style diag_table: >= 120
    distinct requested fields (incl. the round-5 tendency/budget tier)
    land in ocean_diags.nc, the known-unservable ones are explicitly
    listed in diag_rejected."""
    rundir = tmp_path / "run"
    rundir.mkdir()
    src = os.path.join(REPO, "configs", "global_2deg")
    for f in ("MOM_input", "ocean_hgrid.nc", "ocean_topog.nc",
              "diag_table"):
        shutil.copy(os.path.join(src, f), rundir / f)

    from mom6_tpu.drivers import solo
    solo.main([str(rundir), "--days", "0.05"])

    from mom6_tpu.io.netcdf import read_nc
    out = read_nc(str(rundir / "ocean_diags.nc"))
    fields = [k for k in out if k.startswith("ocean_model_")]
    assert len(fields) >= 120, (len(fields), sorted(fields))
    bad = [k for k in fields if not np.isfinite(out[k]).all()]
    assert not bad, bad
    # the CMOR names specifically, incl. the round-5 tendency tier
    for nm in ("thetao", "so", "volcello", "zos", "umo", "vmo",
               "tauuo", "masscello", "thetao_z", "opottemptend",
               "osalttend", "opottempdiff", "opottemppmdiff",
               "boundary_forcing_heat_tendency", "opottemptend_2d",
               "Kd_bkgnd", "Kd_BL", "GMwork", "ustar", "obvfsq",
               "mlotst", "pbo", "T_adx", "wo", "opottemptend_z"):
        assert f"ocean_model_{nm}" in out, nm
    # the tendency closure on the real global grid: depth-integrated
    # boundary heat tendency == hfds pointwise (both in the file)
    bt = out["ocean_model_boundary_forcing_heat_tendency_2d"]
    hf = out["ocean_model_hfds"]
    assert np.allclose(bt, hf, rtol=2e-4, atol=1.0), \
        float(np.abs(bt - hf).max())
    # explicit rejections, with reasons
    rej = (rundir / "diag_rejected").read_text()
    for nm in ("MEKE", "frazil", "wfo"):
        assert nm in rej, rej
    for nm in ("MEKE", "frazil", "wfo"):
        assert f"ocean_model_{nm}" not in out


def test_unknown_diag_table_field_raises(tmp_path):
    rundir = tmp_path / "run"
    rundir.mkdir()
    shutil.copy(os.path.join(REPO, "configs", "benchmark", "MOM_input"),
                rundir / "MOM_input")
    (rundir / "diag_table").write_text(
        '"bad"\n1 1 1 0 0 0\n'
        '"ocean_daily", 1, "days", 1, "days", "time"\n'
        '"ocean_model", "thetaoo", "t", "ocean_daily", "all", "mean", '
        '"none", 2\n')
    from mom6_tpu.drivers import solo
    with pytest.raises(KeyError):
        solo.main([str(rundir), "--days", "0.05"])
