"""diag_table parsing, time reductions, diagnostic vertical axes and the
KE term budget (reference: MOM_diag_mediator.F90:45-66 + diag_remap,
MOM_diagnostics.F90 calculate_energy_diagnostics,
framework/_Diagnostics.dox diag_table format)."""

import os

import jax
import numpy as np
import pytest

from mom6_tpu.framework.diag_mediator import DiagMediator, parse_diag_table

DIAG_TABLE = '''
"test config"
1 1 1 0 0 0
"ocean_daily", 1, "days", 1, "days", "time"
"ocean_month", 30, "days", 1, "days", "time"
# field lines
"ocean_model", "SSH",  "ssh",  "ocean_daily", "all", "mean", "none", 2
"ocean_model", "T",    "temp", "ocean_month", "all", ".true.", "none", 2
"ocean_model", "T_z",  "temp_z", "ocean_month", "all", "mean", "none", 2
"ocean_model", "u",    "u_max", "ocean_daily", "all", "max", "none", 2
"ocean_model", "speed", "spd_rms", "ocean_daily", "all", "rms", "none", 2
'''


@pytest.fixture
def table_path(tmp_path):
    p = tmp_path / "diag_table"
    p.write_text(DIAG_TABLE)
    return str(p)


def test_parse_diag_table(table_path):
    t = parse_diag_table(table_path)
    assert t.title == "test config"
    assert t.base_date == (1, 1, 1, 0, 0, 0)
    assert set(t.files) == {"ocean_daily", "ocean_month"}
    assert t.files["ocean_month"][0] == 30
    mods = {(m, f): (o, fl, r) for m, f, o, fl, r in t.fields}
    assert mods[("ocean_model", "SSH")] == ("ssh", "ocean_daily", "mean")
    assert mods[("ocean_model", "T")][2] == "mean"
    assert mods[("ocean_model", "u")][2] == "max"
    assert mods[("ocean_model", "speed")][2] == "rms"


def test_from_diag_table_detects_coords(table_path):
    dm = DiagMediator.from_diag_table(table_path,
                                      z_targets=np.full(4, 25.0))
    hid = dm.requested("ocean_model", "T_z")
    assert hid is not None
    assert dm._diags[hid].vertical_coord == "z"
    assert dm.requested("ocean_model", "nope") is None


def test_reductions():
    dm = DiagMediator()
    ids = {r: dm.register_diag_field("m", r, reduction=r)
           for r in ("mean", "none", "min", "max", "rms")}
    samples = [np.array([1.0, -2.0]), np.array([3.0, 0.0])]
    for s in samples:
        for hid in ids.values():
            dm.post_data(hid, s)
    fin = {r: dm._finalize(dm._diags[h]) for r, h in ids.items()}
    np.testing.assert_allclose(fin["mean"], [2.0, -1.0])
    np.testing.assert_allclose(fin["none"], [3.0, 0.0])   # last snapshot
    np.testing.assert_allclose(fin["min"], [1.0, -2.0])
    np.testing.assert_allclose(fin["max"], [3.0, 0.0])
    np.testing.assert_allclose(fin["rms"], [np.sqrt(5.0), np.sqrt(2.0)])


def _column_setup(nz=6, ny=4, nx=4):
    rng = np.random.default_rng(0)
    h = rng.uniform(10.0, 50.0, (nz, ny, nx))
    T = 20.0 - 1.5 * np.cumsum(h, axis=0) / 100.0
    return h, T


def test_z_and_sigma_axes_conserve():
    h, T = _column_setup()
    dm = DiagMediator(z_targets=np.full(8, 40.0), nz_sigma=5)
    dm.update_remap_grids(h)
    iz = dm.register_diag_field("m", "T_z", vertical_coord="z")
    isg = dm.register_diag_field("m", "T_sigma", vertical_coord="sigma")
    dm.post_data(iz, T)
    dm.post_data(isg, T)
    tz = dm._diags[iz].acc
    tsg = dm._diags[isg].acc
    assert tz.shape[0] == 8 and tsg.shape[0] == 5
    # conservative remap: column integrals match (targets span the column)
    col = (h * T).sum(axis=0)
    np.testing.assert_allclose((dm._h_target["z"] * tz).sum(axis=0), col,
                               rtol=2e-4)
    np.testing.assert_allclose((dm._h_target["sigma"] * tsg).sum(axis=0),
                               col, rtol=2e-4)


def test_rho_axis():
    from mom6_tpu.eos import get_eos
    from mom6_tpu.grid.vertical import build_layered_vgrid
    h, T = _column_setup()
    GV = build_layered_vgrid(h.shape[0])
    eos = get_eos("LINEAR")
    rho_t = 1035.0 + np.linspace(-2.0, 2.0, 5)
    dm = DiagMediator(rho_targets=rho_t)
    dm.update_remap_grids(h, T=T, S=np.full_like(T, 35.0), GV=GV, eos=eos)
    ir = dm.register_diag_field("m", "T_rho", vertical_coord="rho")
    dm.post_data(ir, T)
    assert dm._diags[ir].acc.shape[0] == 5
    np.testing.assert_allclose(
        (dm._h_target["rho"] * dm._diags[ir].acc).sum(axis=0),
        (h * T).sum(axis=0), rtol=2e-4)


def test_downsample_block_mean():
    area = np.ones((4, 6))
    dm = DiagMediator(areaT=area)
    hid = dm.register_diag_field("m", "f", downsample=2)
    f = np.arange(24.0).reshape(4, 6)
    dm.post_data(hid, f)
    out = dm._diags[hid].acc
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0, 0], f[:2, :2].mean())


def test_ke_budget_terms():
    from mom6_tpu.core.mom import dyn_accel_diag
    from mom6_tpu.diagnostics.diagnostics import ke_budget
    from mom6_tpu.drivers.experiments import double_gyre
    from mom6_tpu.core.mom import Forcing, MOMParams

    G, GV, state, dynp, forces = double_gyre(nx=16, ny=16, nz=2)
    params = MOMParams(dyn=dynp)
    forcing = Forcing(mech=forces)
    # spin up a few steps so the budget has signal
    from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
    for _ in range(5):
        state = step_dynamics_split_rk2(state, forces, G, GV, dynp)
    s2, accel = dyn_accel_diag(state, forcing, G, GV, params)
    terms = ke_budget(state, s2, accel, G, dynp.dt)
    for k, v in terms.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    tot = {k: float(np.sum(np.asarray(v) * np.asarray(G.areaT)))
           for k, v in terms.items()}
    # spin-up from wind: KE grows
    assert tot["dKE_dt"] > 0.0
    # and the named terms carry the signal (not all zero)
    assert any(abs(tot[k]) > 0.0
               for k in ("KE_CorAdv", "KE_PG", "KE_visc", "KE_BT"))


def test_solo_diag_table_outputs(tmp_path):
    """The solo driver honors a diag_table in the run dir."""
    import shutil
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rundir = tmp_path / "run"
    rundir.mkdir()
    shutil.copy(os.path.join(repo, "configs", "benchmark", "MOM_input"),
                rundir / "MOM_input")
    (rundir / "diag_table").write_text(
        '"bench"\n1 1 1 0 0 0\n'
        '"ocean_daily", 1, "days", 1, "days", "time"\n'
        '"ocean_model", "SSH", "ssh", "ocean_daily", "all", "mean", '
        '"none", 2\n'
        '"ocean_model", "T_z", "temp_z", "ocean_daily", "all", "mean", '
        '"none", 2\n'
        '"ocean_model", "KE_PG", "ke_pg", "ocean_daily", "all", "mean", '
        '"none", 2\n')
    from mom6_tpu.drivers import solo
    solo.main([str(rundir), "--days", "0.1"])
    from mom6_tpu.io.netcdf import read_nc
    out = read_nc(str(rundir / "ocean_daily.nc"))
    assert "ocean_model_ssh" in out
    assert "ocean_model_temp_z" in out
    assert "ocean_model_ke_pg" in out
    assert np.all(np.isfinite(out["ocean_model_ke_pg"]))
