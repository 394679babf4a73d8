"""NUOPC cap lifecycle tests: advertise/realize/advance phases, CESM
field-name ingestion with mediator sign folding, Fioo_q freezing
potential, restart alarms, and coupler wave imports driving the
Langmuir closure (reference: mom_cap.F90, mom_cap_methods.F90,
mom_surface_forcing_nuopc.F90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.drivers.nuopc import NUOPCCap, FLDS_TO_OCN, FLDS_FR_OCN

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
FRAZIL = True
T_REF = 12.0
T_RANGE = 4.0
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
"""


@pytest.fixture()
def cap(tmp_path):
    (tmp_path / "MOM_input").write_text(CFG)
    c = NUOPCCap(str(tmp_path))
    c.advertise()
    c.realize(stop_days=1.0, restart_interval_sec=3600,
              calendar="NOLEAP", start_date=(2000, 3, 1))
    return c


def _imports(cap, **over):
    ny, nx = cap.model.grid.ny, cap.model.grid.nx
    one = jnp.ones((ny, nx), jnp.float32)
    base = {
        "Foxx_taux": 0.05 * one, "Foxx_tauy": 0.0 * one,
        "Foxx_sen": -15.0 * one,         # ocean loses 15 W/m2
        "Foxx_evap": -2e-5 * one,        # evaporating
        "Foxx_lwnet": -60.0 * one,
        "Foxx_swnet_vdr": 60.0 * one, "Foxx_swnet_vdf": 40.0 * one,
        "Foxx_swnet_idr": 50.0 * one, "Foxx_swnet_idf": 30.0 * one,
        "Faxa_rain": 3e-5 * one, "Faxa_snow": 1e-6 * one,
        "Foxx_rofl": 1e-6 * one, "Foxx_rofi": 1e-7 * one,
        "Fioi_salt": 1e-7 * one, "Fioi_meltw": 1e-6 * one,
        "Fioi_melth": -5.0 * one,
        "Foxx_hrain": 0.5 * one, "Foxx_hsnow": -0.1 * one,
        "Foxx_hevap": -0.4 * one, "Foxx_hcond": 0.1 * one,
        "Foxx_hrofl": 0.2 * one, "Foxx_hrofi": -0.05 * one,
        "Sa_pslv": 101325.0 * one, "Si_ifrac": 0.0 * one,
        "So_duu10n": 49.0 * one,
    }
    base.update(over)
    return base


def test_advertise_menu(cap):
    imports, exports = cap.advertise()
    assert set(imports) == set(FLDS_TO_OCN)
    assert exports == FLDS_FR_OCN
    assert "Foxx_taux" in imports and "Fioo_q" in exports


def test_advance_full_import_set(cap):
    exp = cap.advance(_imports(cap))
    assert set(exp) == set(FLDS_FR_OCN)
    for name, arr in exp.items():
        assert np.isfinite(np.asarray(arr)).all(), name
    # sea-surface slope consistent with the actual SSH gradient sign
    from mom6_tpu.diagnostics.diagnostics import extract_surface_state
    sfc = extract_surface_state(cap.model.state, cap.model.grid,
                                cap.model.vgrid)
    ssh = np.asarray(sfc.ssh)
    dhdx = np.asarray(exp["So_dhdx"])
    interior = np.s_[2:-2, 2:-2]
    grad = np.gradient(ssh, axis=-1)[interior]
    big = np.abs(grad) > np.abs(grad).max() * 0.3
    if big.any():
        agree = np.sign(dhdx[interior][big]) == np.sign(grad[big])
        assert agree.mean() > 0.9
    # clock advanced one coupling interval
    assert cap.clock.current.total_seconds() \
        - cap.clock.start.total_seconds() == cap.model.coupling_dt


def test_sign_folding_net_heat(cap):
    """The mediator's downward-positive fluxes must fold onto the FMS
    IOB signs: Foxx_sen = -15 (ocean loses) must cool, and the net heat
    assembled by convert must match the hand sum."""
    from mom6_tpu.drivers.coupled_cap import convert_iob_to_forcing
    iob = cap.ingest_import_state(_imports(cap))
    ny, nx = cap.model.grid.ny, cap.model.grid.nx
    sss = 35.0 * jnp.ones((ny, nx), jnp.float32)
    f = convert_iob_to_forcing(iob, sss, cap.model.vgrid)
    # hand sum: sen(-15) + lw(-60) + latent(-2.5e6*2e-5=-50)
    #  + fusion sink of snow+frozen runoff: -3.34e5*(1e-6+1e-7)
    #  + melth(-5) + heat contents (0.5-0.1-0.4+0.1+0.2-0.05=0.25)
    expect = (-15.0 - 60.0 - 50.0 - 3.34e5 * 1.1e-6 - 5.0 + 0.25)
    np.testing.assert_allclose(np.asarray(f.buoy.heat_flux), expect,
                               rtol=1e-4)
    # four SW bands sum
    np.testing.assert_allclose(np.asarray(f.buoy.sw_flux), 180.0,
                               rtol=1e-5)
    # ice pressure absent, atmosphere present
    np.testing.assert_allclose(np.asarray(f.mech.p_surf), 101325.0)
    np.testing.assert_allclose(np.asarray(f.mech.u10), 7.0, rtol=1e-5)


def test_fioo_q_freezing_and_melting(cap):
    """Strong cooling drives SST to the freezing point: frazil heat
    accumulates and exports as Fioo_q > 0; a warm ocean exports the
    (negative) melt potential instead."""
    exp = cap.advance(_imports(cap))
    q_warm = np.asarray(exp["Fioo_q"])
    mask = np.asarray(cap.model.grid.mask2dT) > 0.5
    assert (q_warm[mask] <= 0.0).all()     # warm ocean: melt potential
    assert (q_warm[mask] < 0.0).any()
    # restart from a near-freezing ocean and keep cooling: frazil forms
    st = cap.model.state
    cap.model.state = st.replace(T=jnp.full_like(st.T, -2.0))
    one = jnp.ones_like(exp["So_t"])
    freeze = _imports(cap, **{"Foxx_sen": -2000.0 * one,
                              "Foxx_swnet_vdr": 0.0 * one,
                              "Foxx_swnet_vdf": 0.0 * one,
                              "Foxx_swnet_idr": 0.0 * one,
                              "Foxx_swnet_idf": 0.0 * one})
    for _ in range(8):
        exp = cap.advance(freeze)
        if (np.asarray(exp["Fioo_q"])[mask] > 0.0).any():
            break
    assert (np.asarray(exp["Fioo_q"])[mask] > 0.0).any()
    sst = np.asarray(exp["So_t"])
    assert sst[mask].min() > -3.5          # held near freezing, finite


def test_restart_alarm_writes_dated_file(cap, tmp_path):
    import os
    hours = int(3600 / cap.model.coupling_dt)
    for _ in range(hours + 1):
        cap.advance(_imports(cap))
    files = os.listdir(cap.restart_dir)
    assert any(f.startswith("mom.r.2000-03-01-") and f.endswith(".nc")
               for f in files), files


def test_unadvertised_import_raises(cap):
    with pytest.raises(KeyError):
        cap.ingest_import_state({"Foxx_bogus": jnp.zeros((2, 2))})


def test_lamult_inversion_roundtrip():
    """la_from_efactor is the exact inverse of the ePBL enhancement."""
    from mom6_tpu.physics.waves import (WaveParams, la_from_efactor,
                                        mstar_lt_enhancement)
    p = WaveParams()
    lamult = jnp.asarray([1.1, 1.5, 2.0, 3.0])
    la = la_from_efactor(lamult, p)
    np.testing.assert_allclose(np.asarray(mstar_lt_enhancement(la, p)),
                               np.asarray(lamult), rtol=1e-5)


def test_pstokes_bands_drive_surfbands():
    """Coupler (nb, ny, nx) Stokes maps reach the SURFBANDS closure:
    stronger waves -> smaller Langmuir number."""
    from mom6_tpu.physics.waves import WaveParams, langmuir_number
    ny, nx, nz, nb = 4, 5, 6, 3
    h = jnp.full((nz, ny, nx), 10.0)
    p = WaveParams(method="SURFBANDS",
                   band_wavenumbers=(0.04, 0.11, 0.3305))
    ustar = jnp.full((ny, nx), 0.01)
    hbl = jnp.full((ny, nx), 40.0)
    weak = 0.02 * jnp.ones((nb, ny, nx))
    strong = 0.12 * jnp.ones((nb, ny, nx))
    la_w = langmuir_number(ustar, hbl, p, h=h, stk_x=weak,
                           stk_y=jnp.zeros_like(weak))
    la_s = langmuir_number(ustar, hbl, p, h=h, stk_x=strong,
                           stk_y=jnp.zeros_like(strong))
    assert np.all(np.asarray(la_s) < np.asarray(la_w))
    assert np.isfinite(np.asarray(la_w)).all()


def test_wave_imports_reach_step(cap):
    """Sw_lamult flows through MechForcing into the model step without
    breaking the jit; the run stays finite."""
    ny, nx = cap.model.grid.ny, cap.model.grid.nx
    one = jnp.ones((ny, nx), jnp.float32)
    exp = cap.advance(_imports(cap, Sw_lamult=1.8 * one))
    assert np.isfinite(np.asarray(exp["So_t"])).all()
