"""File-driven surface forcing: data_override time interpolation +
bilinear regridding through the config driver and the solo run loop
(reference: MOM_surface_forcing.F90:418-1437 wind/buoyancy from file,
MOM_interpolate / data_override, MOM_horizontal_regridding.F90)."""

import os
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "configs", "seasonal_gyre"))


@pytest.fixture(scope="module")
def rundir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seasonal_gyre")
    shutil.copy(os.path.join(REPO, "configs", "seasonal_gyre", "MOM_input"),
                d / "MOM_input")
    from make_forcing import write_forcing
    write_forcing(str(d / "forcing_monthly.nc"))
    return str(d)


@pytest.fixture(scope="module")
def setup(rundir):
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    pf = ParamFile([os.path.join(rundir, "MOM_input")])
    return build_model_from_params(pf, doc_dir=rundir)


def test_provider_exists_and_initial_forcing(setup):
    assert setup.forcing_provider is not None
    f0 = setup.forcing
    assert f0.mech.taux is not None
    # winter wind (record 1 center, t=0 extrapolates to first record):
    # stronger than the annual-mean tau0 * cos profile somewhere
    assert float(jnp.max(jnp.abs(f0.mech.taux))) > 0.1
    assert np.all(np.isfinite(np.asarray(f0.buoy.heat_flux)))


def test_time_interpolation_between_records(setup):
    """Forcing halfway between two monthly records is the average of the
    fields at those records."""
    p = setup.forcing_provider
    day = 86400.0
    t1, t2 = 45.625 * day, 75.0416667 * day   # record centers 1 and 2
    fa = p(t1)
    fb = p(t2)
    fm = p(0.5 * (t1 + t2))
    mid = 0.5 * (np.asarray(fa.mech.taux) + np.asarray(fb.mech.taux))
    np.testing.assert_allclose(np.asarray(fm.mech.taux), mid,
                               rtol=0, atol=1e-5)


def test_seasonal_cycle_amplitude(setup):
    """Wind amplitude differs between winter and summer records."""
    p = setup.forcing_provider
    day = 86400.0
    w = np.abs(np.asarray(p(15.0 * day).mech.taux)).max()
    s = np.abs(np.asarray(p(197.0 * day).mech.taux)).max()
    assert w > 1.2 * s     # 0.4 seasonal modulation in the file


def test_periodic_wrap(setup):
    """Climatology mode: t and t + 365 days give the same forcing."""
    p = setup.forcing_provider
    day = 86400.0
    a = np.asarray(p(100.0 * day).mech.taux)
    b = np.asarray(p((100.0 + 365.0) * day).mech.taux)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_masked_faces(setup):
    f = setup.forcing_provider(0.0)
    G = setup.grid
    assert np.all(np.asarray(f.mech.taux)[np.asarray(G.mask2dCu) == 0]
                  == 0.0)


def test_solo_run_with_file_forcing(rundir):
    """The solo CLI steps stably under file forcing and writes the
    fingerprint files."""
    from mom6_tpu.drivers import solo
    state = solo.main([rundir, "--days", "0.5"])
    assert np.all(np.isfinite(np.asarray(state.h)))
    assert np.all(np.isfinite(np.asarray(state.T)))
    assert os.path.exists(os.path.join(rundir, "ocean.stats"))
    assert os.path.exists(os.path.join(rundir, "chksum_diag"))


def test_forcing_actually_varies_through_run(setup):
    """Two thermo cycles under January vs July forcing diverge."""
    from mom6_tpu.core.mom import step_mom
    G, GV, state, params = (setup.grid, setup.vgrid, setup.state,
                            setup.params)
    p = setup.forcing_provider
    day = 86400.0
    step = jax.jit(lambda s, f: step_mom(s, f, G, GV, params))
    a = step(state, p(15.0 * day))
    b = step(state, p(197.0 * day))
    assert float(jnp.max(jnp.abs(a.u - b.u))) > 0.0
