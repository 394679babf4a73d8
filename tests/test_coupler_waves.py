"""Coupler API + wave interface tests."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import thermo_gyre


def test_ocean_model_coupling_api():
    from mom6_tpu.drivers.ocean_model import OceanModel
    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=4,
                                                dt=1800.0)
    om = OceanModel(G, GV, state, params)
    sfc = om.update_ocean_model(taux=forcing.mech.taux,
                                heat_flux=forcing.buoy.heat_flux,
                                n_cycles=3)
    assert om.time_seconds == 3 * om.coupling_dt
    assert np.isfinite(np.asarray(sfc.sst)).all()
    assert float(sfc.speed.max()) > 0.0  # wind spun up a surface current
    # a second call continues from the evolved state
    sfc2 = om.update_ocean_model(taux=forcing.mech.taux, n_cycles=1)
    assert om.time_seconds == 4 * om.coupling_dt


def test_stokes_and_langmuir():
    from mom6_tpu.physics.waves import (langmuir_enhancement,
                                        langmuir_number,
                                        stokes_drift_profile)
    z = jnp.asarray([0.0, 5.0, 20.0, 80.0])
    us = np.asarray(stokes_drift_profile(10.0, z))
    assert abs(us[0] - 0.16) < 0.02       # ~1.6% of U10 at surface
    assert np.all(np.diff(us) < 0)        # decays with depth
    # typical ocean: u* ~ 0.01 m/s at U10=10 -> La_t ~ 0.25-0.4
    la = float(langmuir_number(0.012, 10.0))
    assert 0.2 < la < 0.5
    f = float(langmuir_enhancement(jnp.asarray(la)))
    assert 1.5 < f < 5.0                  # substantial enhancement
    # windless limit: no enhancement blowup
    f0 = float(langmuir_enhancement(jnp.asarray(3.0)))
    assert 1.0 <= f0 < 1.1
