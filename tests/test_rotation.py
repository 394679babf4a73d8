"""Rotational invariance: run a step in the original and quarter-rotated
frames; answers must agree (MOM6's ROTATE_INDEX gate, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_split_rk2 import (MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.framework.array_transform import (rotate_grid, rotate_scalar,
                                                rotate_state, rotate_uv,
                                                unrotate_scalar, unrotate_uv)


def test_roundtrip_identities():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 6, 8)))
    np.testing.assert_allclose(unrotate_scalar(rotate_scalar(a)), a)
    u = jnp.asarray(rng.standard_normal((3, 6, 8)))
    v = jnp.asarray(rng.standard_normal((3, 6, 8)))
    ur, vr = rotate_uv(u, v)
    ub, vb = unrotate_uv(ur, vr)
    np.testing.assert_allclose(np.asarray(ub), np.asarray(u))
    np.testing.assert_allclose(np.asarray(vb), np.asarray(v))


def test_step_rotational_invariance():
    # a non-symmetric domain: island + irregular wind
    nx, ny = 20, 14
    depth = np.full((ny, nx), 2000.0)
    depth[4:7, 5:8] = 0.0                      # island
    G, GV, state, params, _ = double_gyre(nx=nx, ny=ny, nz=2, dt=900.0)
    from mom6_tpu.grid.grid import build_cartesian_grid
    G = build_cartesian_grid(nx, ny, 1000.0, 700.0, depth=depth,
                             max_depth=2000.0, f0=1e-4, beta=0.0,
                             dtype=jnp.float32)
    rng = np.random.default_rng(1)
    h = 1000.0 + 5.0 * rng.standard_normal((2, ny, nx))
    state = state.replace(h=jnp.asarray(h, jnp.float32)
                          * G.mask2dT[None]
                          + (1 - G.mask2dT[None]) * 1e-10)
    taux = jnp.asarray(0.1 * rng.standard_normal((ny, nx)),
                       jnp.float32) * G.mask2dCu
    tauy = jnp.asarray(0.05 * rng.standard_normal((ny, nx)),
                       jnp.float32) * G.mask2dCv
    forces = MechForcing(taux=taux, tauy=tauy)

    G_r = rotate_grid(G)
    state_r = rotate_state(state)
    tx_r, ty_r = rotate_uv(taux, tauy)
    forces_r = MechForcing(taux=tx_r, tauy=ty_r)

    out = step_dynamics_split_rk2(state, forces, G, GV, params)
    # the rotated frame sweeps the same PHYSICAL direction first
    params_r = params._replace(x_first=False)
    out_r = step_dynamics_split_rk2(state_r, forces_r, G_r, GV, params_r)

    h_back = unrotate_scalar(out_r.h)
    u_back, v_back = unrotate_uv(out_r.u, out_r.v)
    np.testing.assert_allclose(np.asarray(h_back), np.asarray(out.h),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(out.u),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(out.v),
                               rtol=0, atol=1e-6)

def test_rotate_and_homogenize_forcing():
    """rotate_forcing completes the ROTATE_INDEX machinery for the full
    Forcing pytree (MOM_forcing_type.F90:3875), and HOMOGENIZE_FORCINGS
    replaces every field with its wet-area mean (:4076/:4153)."""
    from mom6_tpu.core.forcing_util import (homogenize_forcing,
                                            rotate_forcing)
    from mom6_tpu.core.mom import Forcing
    from mom6_tpu.physics.vertical.diabatic import BuoyancyForcing

    nx, ny = 20, 14
    depth = np.full((ny, nx), 2000.0)
    depth[4:7, 5:8] = 0.0
    from mom6_tpu.grid.grid import build_cartesian_grid
    _, GV, _, _, _ = double_gyre(nx=nx, ny=ny, nz=2, dt=900.0)
    G = build_cartesian_grid(nx, ny, 1000.0, 700.0, depth=depth,
                             max_depth=2000.0, f0=1e-4, beta=0.0,
                             dtype=jnp.float32)
    rng = np.random.default_rng(0)
    taux = jnp.asarray(rng.normal(size=(ny, nx)), jnp.float32)
    tauy = jnp.asarray(rng.normal(size=(ny, nx)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(ny, nx)), jnp.float32)
    f = Forcing(mech=MechForcing(taux=taux, tauy=tauy),
                buoy=BuoyancyForcing(heat_flux=q))

    fr = rotate_forcing(f)
    tx_r, ty_r = rotate_uv(taux, tauy)
    np.testing.assert_array_equal(np.asarray(fr.mech.taux),
                                  np.asarray(tx_r))
    np.testing.assert_array_equal(np.asarray(fr.buoy.heat_flux),
                                  np.asarray(rotate_scalar(q)))

    fh = homogenize_forcing(f, G)
    hq = np.asarray(fh.buoy.heat_flux)
    wet = np.asarray(G.mask2dT) > 0
    assert np.ptp(hq[wet]) == 0.0          # uniform over wet cells
    w = np.asarray(G.areaT) * np.asarray(G.mask2dT)
    expect = float((np.asarray(q, np.float64) * w).sum() / w.sum())
    np.testing.assert_allclose(hq[wet][0], expect, rtol=1e-6)


def test_extract_surface_state_breadth():
    """extract_surface_state fills the coupler fields of the reference
    (MOM.F90:3954-4354): HMIX-depth averages, melt potential <= 0 and
    colder water melting less, column mass/heat/salt contents."""
    from mom6_tpu.diagnostics.diagnostics import extract_surface_state

    G, GV, state = _setup_thermo()
    sfc = extract_surface_state(state, G, GV, hmix_sfc=20.0,
                                hmix_uv_sfc=20.0)
    for name in ("sst", "sss", "ssh", "u_sfc", "melt_potential",
                 "ocean_mass", "ocean_heat", "ocean_salt"):
        v = getattr(sfc, name)
        assert v is not None and np.isfinite(np.asarray(v)).all(), name
    assert float(jnp.max(sfc.melt_potential)) <= 0.0
    # column contents match direct sums
    np.testing.assert_allclose(
        np.asarray(sfc.ocean_mass),
        np.asarray(GV.rho0 * jnp.sum(state.h, 0) * G.mask2dT), rtol=1e-6)
    # warmer surface -> more negative melt potential
    warm = state.replace(T=state.T + 2.0)
    sfc_w = extract_surface_state(warm, G, GV, hmix_sfc=20.0)
    assert (float(jnp.sum(sfc_w.melt_potential))
            < float(jnp.sum(sfc.melt_potential)))
    # HMIX average differs from the raw top layer when stratified
    sfc0 = extract_surface_state(state, G, GV)
    assert not np.array_equal(np.asarray(sfc.sst), np.asarray(sfc0.sst))


def _setup_thermo():
    from mom6_tpu.drivers.experiments import thermo_gyre
    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=6,
                                                dt=1800.0)
    return G, GV, state
