"""Restart equivalence (the test.restart gate of SURVEY.md §4) and
diagnostics mediator tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
from mom6_tpu.framework.restart import RestartRegistry
from mom6_tpu.framework.diag_mediator import DiagMediator
from mom6_tpu.io.netcdf import NCWriter, read_nc


def make_registry():
    reg = RestartRegistry()
    reg.register_state_attrs(["h", "u", "v", "uh", "vh", "uhtr", "vhtr"])
    reg.lock()
    return reg


class TestRestart:
    def test_split_run_equivalence(self, tmp_path):
        """A run split by save/restore must reproduce the continuous run
        bitwise (restart fields capture the full prognostic state)."""
        G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2,
                                                   dt=1200.0)
        step = jax.jit(lambda s: step_dynamics_split_rk2(s, forces, G, GV,
                                                         params))
        reg = make_registry()

        s = state
        for _ in range(6):
            s = step(s)
        continuous = s

        s = state
        for _ in range(3):
            s = step(s)
        path = str(tmp_path / "restart.nc")
        reg.save_restart(path, s, time_seconds=3 * 1200.0, step=3)
        s2, t, n = reg.restore_state(path, state)
        assert t == 3 * 1200.0 and n == 3
        assert reg.query_initialized("h")
        for _ in range(3):
            s2 = step(s2)

        np.testing.assert_array_equal(np.asarray(continuous.h),
                                      np.asarray(s2.h))
        np.testing.assert_array_equal(np.asarray(continuous.u),
                                      np.asarray(s2.u))
        np.testing.assert_array_equal(np.asarray(continuous.uhtr),
                                      np.asarray(s2.uhtr))

    def test_missing_mandatory_raises(self, tmp_path):
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=2)
        reg = make_registry()
        w = NCWriter(str(tmp_path / "bad.nc"))
        w.write_static("h", np.asarray(state.h))
        w.close()
        try:
            reg.restore_state(str(tmp_path / "bad.nc"), state)
            assert False, "should have raised"
        except KeyError as e:
            assert "u" in str(e)

    def test_atomic_write(self, tmp_path):
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=2)
        reg = make_registry()
        p = str(tmp_path / "r.nc")
        reg.save_restart(p, state)
        import os
        assert os.path.exists(p) and not os.path.exists(p + ".tmp")


class TestNetCDF:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.nc")
        w = NCWriter(p, global_attrs={"title": "x"})
        a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
        w.write_static("temp", a, units="degC", long_name="Temperature")
        w.close()
        back = read_nc(p)
        np.testing.assert_array_equal(back["temp"], a)


class TestDiagMediator:
    def test_time_average_and_flush(self, tmp_path):
        dm = DiagMediator()
        hid = dm.register_diag_field("ocean", "ssh", units="m",
                                     time_avg=True)
        dm.post_data(hid, np.full((4, 4), 1.0))
        dm.post_data(hid, np.full((4, 4), 3.0))
        p = str(tmp_path / "diag.nc")
        written = dm.flush(p)
        assert written == ["ocean.ssh"]
        out = read_nc(p)["ocean_ssh"]
        np.testing.assert_allclose(out, 2.0)

    def test_z_remap_diag(self, tmp_path):
        dm = DiagMediator(z_targets=np.full(4, 250.0))
        hid = dm.register_diag_field("ocean", "temp", vertical_coord="z")
        h = np.full((5, 3, 3), 200.0)
        T = np.broadcast_to(np.linspace(20, 4, 5)[:, None, None], (5, 3, 3))
        dm.post_data(hid, T, h=h)
        out = read_nc(str(tmp_path / "d.nc")) if False else None
        p = str(tmp_path / "d.nc")
        dm.flush(p)
        from mom6_tpu.io.netcdf import read_nc as rd
        z = rd(p)["ocean_temp"]
        assert z.shape == (4, 3, 3)
        # conservative: column integrals match
        np.testing.assert_allclose((z * 250.0).sum(0), (T * 200.0).sum(0),
                                   rtol=1e-4)

    def test_duplicate_registration_raises(self):
        dm = DiagMediator()
        dm.register_diag_field("m", "x")
        try:
            dm.register_diag_field("m", "x")
            assert False
        except ValueError:
            pass


def test_distributed_restart_roundtrip(tmp_path):
    """IO_LAYOUT-style multi-file restart: tiles written per IO rank
    reassemble bitwise into the single-file state (the FMS distributed
    output + mppnccombine roles)."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.core.state import OceanState
    from mom6_tpu.framework.restart import RestartRegistry
    rng = np.random.default_rng(0)
    nz, ny, nx = 3, 10, 14

    def f():
        return jnp.asarray(rng.normal(0, 1, (nz, ny, nx)), jnp.float32)
    st = OceanState(h=f(), u=f(), v=f(), uh=f(), vh=f(), uhtr=f(),
                    vhtr=f())
    reg = RestartRegistry()
    reg.register_state_attrs(["h", "u", "v", "uh", "vh", "uhtr", "vhtr"])
    reg.lock()
    single = str(tmp_path / "single.nc")
    multi = str(tmp_path / "multi.nc")
    reg.save_restart(single, st, time_seconds=123.0, step=7)
    reg.save_restart(multi, st, time_seconds=123.0, step=7,
                     io_layout=(2, 3))
    import os
    assert not os.path.exists(multi)
    assert os.path.exists(multi + ".0000") and os.path.exists(
        multi + ".0005")
    st0 = OceanState(h=jnp.zeros((nz, ny, nx)), u=jnp.zeros((nz, ny, nx)),
                     v=jnp.zeros((nz, ny, nx)),
                     uh=jnp.zeros((nz, ny, nx)),
                     vh=jnp.zeros((nz, ny, nx)),
                     uhtr=jnp.zeros((nz, ny, nx)),
                     vhtr=jnp.zeros((nz, ny, nx)))
    s1, t1, k1 = reg.restore_state(single, st0)
    s2, t2, k2 = reg.restore_state(multi, st0)
    assert (t1, k1) == (t2, k2) == (123.0, 7)
    for f_ in ("h", "u", "v", "uhtr"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f_)),
                                      np.asarray(getattr(s2, f_)))
