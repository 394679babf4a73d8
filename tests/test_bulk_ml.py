"""Bulk mixed layer + entrain_diffusive (layered-mode diabatic) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.eos import get_eos
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.vertical.bulk_mixed_layer import (BulkMLParams,
                                                        bulkmixedlayer)
from mom6_tpu.physics.vertical.entrain_diffusive import (
    EntrainDiffusiveParams, entrainment_diffusive)

NZ, NY, NX = 10, 4, 4


@pytest.fixture(scope="module")
def setup():
    G = build_cartesian_grid(NX, NY, 40.0, 40.0, max_depth=1000.0)
    GV = build_layered_vgrid(NZ)
    h = jnp.full((NZ, NY, NX), 1000.0 / NZ, jnp.float32)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T = (18.0 - 10.0 * z / 1000.0).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    eos = get_eos("LINEAR")
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    return G, GV, h, T, S, u, v, eos


def _conservation(h0, T0, S0, h1, T1, S1):
    m0 = np.asarray(jnp.sum(h0, axis=0))
    m1 = np.asarray(jnp.sum(h1, axis=0))
    q0 = np.asarray(jnp.sum(h0 * T0, axis=0))
    q1 = np.asarray(jnp.sum(h1 * T1, axis=0))
    s0 = np.asarray(jnp.sum(h0 * S0, axis=0))
    s1 = np.asarray(jnp.sum(h1 * S1, axis=0))
    return (np.max(np.abs(m1 - m0) / m0), np.max(np.abs(q1 - q0) /
                                                 np.abs(q0)),
            np.max(np.abs(s1 - s0) / s0))


def test_bulkml_conserves(setup):
    G, GV, h, T, S, u, v, eos = setup
    p = BulkMLParams()
    ustar = jnp.full((NY, NX), 0.01, jnp.float32)
    b = jnp.zeros((NY, NX), jnp.float32)
    h1, T1, S1, hml = bulkmixedlayer(h, u, v, T, S, G, GV, eos, 3600.0,
                                     ustar, b, p)
    dm, dq, ds = _conservation(h, T, S, h1, T1, S1)
    assert dm < 1e-5 and dq < 1e-3 and ds < 1e-3, (dm, dq, ds)
    assert np.all(np.asarray(h1) > 0)
    assert np.all(np.isfinite(np.asarray(T1)))


def test_bulkml_wind_deepens(setup):
    """Stronger wind -> deeper mixed layer (Kraus-Turner m* u*^3)."""
    G, GV, h, T, S, u, v, eos = setup
    p = BulkMLParams()
    b = jnp.zeros((NY, NX), jnp.float32)
    hmls = []
    for us in (0.005, 0.01, 0.02):
        ustar = jnp.full((NY, NX), us, jnp.float32)
        _, _, _, hml = bulkmixedlayer(h, u, v, T, S, G, GV, eos, 3600.0,
                                      ustar, b, p)
        hmls.append(float(hml[1, 1]))
    assert hmls[0] < hmls[1] < hmls[2], hmls
    assert hmls[0] >= 100.0 - 1.0   # at least the top layer


def test_bulkml_convection_deepens(setup):
    """Surface buoyancy loss (cooling) deepens the ML beyond the
    wind-only depth; an unstable column mixes at least the unstable
    region."""
    G, GV, h, T, S, u, v, eos = setup
    p = BulkMLParams()
    ustar = jnp.full((NY, NX), 0.005, jnp.float32)
    # make the top 3 layers statically unstable (cold on top)
    T_unst = T.at[0].set(T[2] - 1.0).at[1].set(T[2] - 0.5)
    b = jnp.zeros((NY, NX), jnp.float32)
    _, _, _, hml_stable = bulkmixedlayer(h, u, v, T, S, G, GV, eos,
                                         3600.0, ustar, b, p)
    h1, T1, _, hml_conv = bulkmixedlayer(h, u, v, T_unst, S, G, GV, eos,
                                         3600.0, ustar, b, p)
    assert float(hml_conv[1, 1]) >= 300.0 - 1.0   # 3 unstable layers mixed
    assert float(hml_conv[1, 1]) > float(hml_stable[1, 1])
    # mixed region is homogeneous
    t = np.asarray(T1[:, 1, 1])
    assert abs(t[0] - t[1]) < 1e-4


def test_bulkml_ml_temperature_is_mean(setup):
    """ML temperature equals the mass-weighted mean of what it entrained."""
    G, GV, h, T, S, u, v, eos = setup
    p = BulkMLParams(nkml=2, nkbl=2)
    ustar = jnp.full((NY, NX), 0.02, jnp.float32)
    b = jnp.zeros((NY, NX), jnp.float32)
    h1, T1, _, hml = bulkmixedlayer(h, u, v, T, S, G, GV, eos, 3600.0,
                                    ustar, b, p)
    # reconstruct expected mean over the entrained depth
    depth = float(hml[1, 1])
    hcol = np.asarray(h[:, 1, 1]); tcol = np.asarray(T[:, 1, 1])
    zb = np.cumsum(hcol)
    acc, rem = 0.0, depth
    for k in range(NZ):
        take = min(hcol[k], rem)
        acc += take * tcol[k]; rem -= take
        if rem <= 0:
            break
    t_expect = acc / depth
    assert abs(float(T1[0, 1, 1]) - t_expect) < 0.05


def test_entrain_diffusive_conserves(setup):
    G, GV, h, T, S, u, v, eos = setup
    kd = jnp.full((NZ + 1, NY, NX), 1e-4, jnp.float32)
    h1, T1, S1, ea, eb = entrainment_diffusive(h, T, S, G, GV, kd, 3600.0)
    dm, dq, ds = _conservation(h, T, S, h1, T1, S1)
    assert dm < 1e-6 and dq < 1e-5 and ds < 1e-5, (dm, dq, ds)
    assert np.all(np.asarray(h1) > 0)
    assert float(jnp.max(ea)) > 0.0 and float(jnp.max(eb)) > 0.0


def test_entrain_diffusive_zero_kd_is_identity(setup):
    G, GV, h, T, S, u, v, eos = setup
    kd = jnp.zeros((NZ + 1, NY, NX), jnp.float32)
    h1, T1, S1, _, _ = entrainment_diffusive(h, T, S, G, GV, kd, 3600.0)
    assert np.allclose(np.asarray(h1), np.asarray(h))
    assert np.allclose(np.asarray(T1), np.asarray(T))


def test_entrain_positivity_under_huge_kd(setup):
    """Massive Kd: positivity clipping keeps all thicknesses positive."""
    G, GV, h, T, S, u, v, eos = setup
    h_thin = h.at[3].set(0.01)   # a nearly vanished layer
    kd = jnp.full((NZ + 1, NY, NX), 1.0, jnp.float32)
    h1, T1, S1, _, _ = entrainment_diffusive(h_thin, T, S, G, GV, kd,
                                             3600.0)
    assert np.all(np.asarray(h1) > 0), np.asarray(h1).min()
    dm, dq, ds = _conservation(h_thin, T, S, h1, T1, S1)
    assert dm < 1e-5 and dq < 1e-4


def test_diabatic_layered_end_to_end(setup):
    """Full layered diabatic sequence via step_mom (BULKML branch)."""
    from mom6_tpu.ale.ale import ALEParams, LAYER
    from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
    from mom6_tpu.core.mom import Forcing, MOMParams, step_mom
    from mom6_tpu.core.state import OceanState
    from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                    DiabaticParams)
    import jax

    G, GV, h, T, S, u, v, eos = setup
    st = OceanState(h=h, u=u, v=v, T=T, S=S,
                    uh=jnp.zeros_like(h), vh=jnp.zeros_like(h),
                    uhtr=jnp.zeros_like(h), vhtr=jnp.zeros_like(h))
    from mom6_tpu.core.barotropic import BTParams
    params = MOMParams(
        dyn=DynParams(dt=900.0, bt=BTParams(nstep=16, nfilter=2)),
        thermo_enabled=True, eos_name="LINEAR",
        diabatic=DiabaticParams(boundary_layer_scheme="BULKML"),
        ale=ALEParams(mode=LAYER), n_dyn_per_thermo=2)
    taux = jnp.full((NY, NX), 0.1, jnp.float32) * G.mask2dCu
    forcing = Forcing(mech=MechForcing(taux=taux,
                                       tauy=jnp.zeros((NY, NX))),
                      buoy=BuoyancyForcing(
                          heat_flux=jnp.full((NY, NX), -200.0)))
    step = jax.jit(lambda s: step_mom(s, forcing, G, GV, params))
    out = st
    for _ in range(3):
        out = step(out)
    assert np.all(np.isfinite(np.asarray(out.h)))
    assert np.all(np.isfinite(np.asarray(out.T)))
    assert np.all(np.asarray(out.h) > 0)
    # cooling: net column heat decreased
    q0 = float(jnp.sum(st.h * st.T))
    q1 = float(jnp.sum(out.h * out.T))
    assert q1 < q0
