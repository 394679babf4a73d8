"""Ensemble axis + spherical grid tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
from mom6_tpu.parallel.ensemble import (ensemble_mean, ensemble_step,
                                        member, stack_ensemble)


def test_ensemble_matches_individual_members():
    G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2)
    rng = np.random.default_rng(0)
    members = []
    for i in range(4):
        h = np.asarray(state.h) + rng.standard_normal(state.h.shape)
        members.append(state.replace(h=jnp.asarray(h, jnp.float32)))
    ens = stack_ensemble(members)
    step = lambda s: step_dynamics_split_rk2(s, forces, G, GV, params)
    ens_out = jax.jit(ensemble_step(step))(ens)
    # member 2 advanced inside the ensemble == advanced alone
    solo = jax.jit(step)(members[2])
    np.testing.assert_allclose(np.asarray(member(ens_out, 2).h),
                               np.asarray(solo.h), atol=1e-5)
    m = ensemble_mean(ens_out)
    assert m.h.shape == state.h.shape


def test_ensemble_sharded_over_devices(devices8):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=2)
    ens = stack_ensemble([state] * 8)
    mesh = Mesh(np.asarray(devices8).reshape(8), ("e",))
    sh = NamedSharding(mesh, P("e"))
    ens = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(*(("e",) + (None,) * (x.ndim - 1))))), ens)
    step = lambda s: step_dynamics_split_rk2(s, forces, G, GV, params)
    out = jax.jit(ensemble_step(step))(ens)
    jax.block_until_ready(out.h)
    assert out.h.shape[0] == 8
    assert np.isfinite(np.asarray(out.h)).all()


def test_spherical_grid_metrics():
    from mom6_tpu.grid.grid import build_spherical_grid
    G = build_spherical_grid(36, 20, -180.0, 20.0, 360.0, 40.0,
                             cyclic_x=True)
    dx = np.asarray(G.dxT)
    # dx shrinks poleward
    assert dx[-1, 0] < dx[0, 0]
    # dy uniform ~ 2 deg in meters
    np.testing.assert_allclose(np.asarray(G.dyT), 6.378e6 * np.deg2rad(2.0),
                               rtol=1e-5)
    f = np.asarray(G.CoriolisBu)
    assert f[-1, 0] > f[0, 0] > 0   # increases with latitude (NH)


def test_spherical_gyre_runs():
    from mom6_tpu.grid.grid import build_spherical_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.core.state import init_state_resting
    from mom6_tpu.core.barotropic import BTParams, set_dtbt
    from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
    G = build_spherical_grid(16, 16, -60.0, 15.0, 40.0, 30.0,
                             max_depth=2000.0)
    GV = build_layered_vgrid(2)
    state = init_state_resting(G, GV, [500.0, 1500.0])
    dt = 900.0
    nstep, _ = set_dtbt(G, GV, 2000.0, dt)
    params = DynParams(dt=dt, bt=BTParams(nstep=nstep, nfilter=2), kv=1e-4)
    lat = np.asarray(G.geoLatT)
    taux = jnp.asarray(-0.1 * np.cos(np.pi * (lat - 15) / 30.0),
                       jnp.float32) * G.mask2dCu
    step = jax.jit(lambda s: step_dynamics_split_rk2(
        s, MechForcing(taux=taux), G, GV, params))
    s = state
    for _ in range(24):
        s = step(s)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert 1e-6 < np.abs(u).max() < 1.0


def test_device_sharded_ensemble():
    """Members sharded over their own mesh axis: 4 members x (1,2)
    spatial submesh on the 8 virtual devices; the sharded step matches
    the plain vmapped step bitwise per member (the concurrent-ensemble
    layout of MOM_ensemble_manager)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.drivers.experiments import double_gyre
    from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
    from mom6_tpu.parallel.ensemble import (ensemble_mesh,
                                            ensemble_step_sharded,
                                            member, shard_ensemble,
                                            stack_ensemble)
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    G, GV, state, params, forces = double_gyre(nx=16, ny=16, nz=2,
                                               dt=1800.0)
    # distinct members via scaled winds
    members = []
    for i in range(4):
        f = forces._replace(taux=forces.taux * (1.0 + 0.1 * i))
        members.append((state, f))
    ens = stack_ensemble([m[0] for m in members])
    taux = jnp.stack([m[1].taux for m in members])

    def step(s, tx):
        return step_dynamics_split_rk2(s, forces._replace(taux=tx),
                                       G, GV, params)

    mesh = ensemble_mesh(4, (1, 2))
    ens_sh = shard_ensemble(ens, mesh)
    with mesh:
        vstep = jax.vmap(step)
        want = vstep(ens, taux)
        run = jax.jit(jax.vmap(step))
        got = run(ens_sh, jax.device_put(
            taux, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("e", None, None))))
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(member(got, i).h), np.asarray(member(want, i).h),
            rtol=2e-6)
    # members actually landed on distinct device subsets
    sharding = got.h.sharding
    assert sharding.num_devices == 8
