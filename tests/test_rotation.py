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