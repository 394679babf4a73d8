"""Coupled-cap tests: IOB flux conversion, a slab-atmosphere coupled
loop, NUOPC named import/export, init/end lifecycle."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.drivers.coupled_cap import (IceOceanBoundary,
                                          convert_iob_to_forcing,
                                          export_state_nuopc,
                                          import_state_nuopc,
                                          ocean_model_end,
                                          ocean_model_init,
                                          update_ocean_model)

CFG = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 4
LENLON = 500.0
LENLAT = 400.0
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
DT = 900.0
DT_THERM = 1800.0
ENABLE_THERMODYNAMICS = True
T_REF = 12.0
T_RANGE = 4.0
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
"""


@pytest.fixture()
def model(tmp_path):
    (tmp_path / "MOM_input").write_text(CFG)
    return ocean_model_init(str(tmp_path))


def test_iob_conversion_signs(model):
    """Sensible + longwave + evaporation all cool; evaporation also
    makes the virtual salt flux positive (salinification)."""
    ny, nx = model.grid.ny, model.grid.nx
    one = jnp.ones((ny, nx), jnp.float32)
    iob = IceOceanBoundary(t_flux=100.0 * one, lw_flux=50.0 * one,
                           q_flux=2e-5 * one, sw_flux=200.0 * one)
    sss = 35.0 * one
    f = convert_iob_to_forcing(iob, sss, model.vgrid)
    q = np.asarray(f.buoy.heat_flux)
    # -100 - 50 - 2.5e6*2e-5 = -200 W/m2
    np.testing.assert_allclose(q, -200.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f.buoy.sw_flux), 200.0)
    # evap removes fresh water -> positive virtual salt flux
    s = np.asarray(f.buoy.salt_flux)
    np.testing.assert_allclose(s, 35.0 * 2e-5 / model.vgrid.rho0,
                               rtol=1e-5)


def test_slab_atmosphere_coupled_loop(model):
    """Two-way coupling with a slab atmosphere: a cold atmosphere
    extracts heat (SST falls, atm warms); heat leaving the ocean enters
    the slab — the exchange is consistent."""
    ny, nx = model.grid.ny, model.grid.nx
    mask = np.asarray(model.grid.mask2dT)
    t_atm = 5.0                      # cold slab [degC]
    c_slab = 2e7                     # slab heat capacity [J m-2 K-1]
    c_x = 20.0                       # exchange coeff [W m-2 K-1]
    sst0 = None
    for _ in range(6):
        sfc = export_state_nuopc(model)
        sst = np.asarray(sfc["sea_surface_temperature"])
        if sst0 is None:
            sst0 = sst.copy()
        sens = c_x * (sst - t_atm)   # + = ocean loses
        iob = import_state_nuopc(
            {"mean_sensi_heat_flx": jnp.asarray(sens, jnp.float32)})
        update_ocean_model(model, iob)
        t_atm = t_atm + float((sens * mask).sum() / max(mask.sum(), 1)) \
            * model.coupling_dt / c_slab
    sst1 = np.asarray(export_state_nuopc(model)["sea_surface_temperature"])
    wet = mask > 0.5
    assert sst1[wet].mean() < sst0[wet].mean()   # ocean cooled
    assert t_atm > 5.0                           # atmosphere warmed
    assert np.isfinite(sst1).all()


def test_nuopc_unknown_field_raises():
    with pytest.raises(KeyError):
        import_state_nuopc({"mean_made_up_flux": jnp.zeros((2, 2))})


def test_lifecycle_restart(model, tmp_path):
    ny, nx = model.grid.ny, model.grid.nx
    iob = IceOceanBoundary(u_flux=0.1 * jnp.ones((ny, nx), jnp.float32)
                           * model.grid.mask2dCu)
    update_ocean_model(model, iob, n_cycles=2)
    rp = str(tmp_path / "ocean.res.nc")
    ocean_model_end(model, restart_path=rp)
    from mom6_tpu.io.netcdf import read_nc
    data = read_nc(rp)
    assert "h" in data and "T" in data
    assert float(data["__time_seconds__"][0]) == model.time_seconds


def test_concurrent_component_stepping():
    """Both components' device work is dispatched before either result
    is awaited, and the results equal sequential stepping (the
    coupler-concurrency pattern on JAX's async dispatch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.drivers.coupled_cap import update_components_concurrent

    @jax.jit
    def ocean_work(x):
        return jnp.tanh(x) @ x.T

    @jax.jit
    def ice_work(y):
        return jnp.sin(y) * 2.0

    x = jnp.ones((64, 64))
    y = jnp.ones((32, 32))
    got = update_components_concurrent(lambda: ocean_work(x),
                                       [lambda: ice_work(y)])
    np.testing.assert_allclose(np.asarray(got[0]),
                               np.asarray(ocean_work(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]),
                               np.asarray(ice_work(y)), rtol=1e-6)
