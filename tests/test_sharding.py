"""Layout invariance: the step must produce (near-)identical results on a
1-device vs an 8-device (y, x) mesh — the analogue of MOM6's test.layout
gate (SURVEY.md §4).  Float32 collective reassociation can introduce
roundoff-level differences; GSPMD shift/roll semantics should keep the
elementwise stencils bitwise, so we assert a tight tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
from mom6_tpu.parallel.mesh import (constrain_state, make_mesh, shard_over,
                                    state_sharding)


def _run_step(mesh, nx=16, ny=16):
    G, GV, state, params, forces = double_gyre(nx=nx, ny=ny, nz=2, dt=1200.0)
    # give it something to do
    key = jax.random.PRNGKey(0)
    h = state.h + 1.0 * jax.random.normal(key, state.h.shape, state.h.dtype)
    state = state.replace(h=h)
    with mesh:
        G = shard_over(mesh, G)
        state = shard_over(mesh, state)
        forces = shard_over(mesh, forces)

        def step(s):
            s = constrain_state(s)
            return step_dynamics_split_rk2(s, forces, G, GV, params)

        out = jax.jit(step, out_shardings=state_sharding(mesh, state))(state)
        jax.block_until_ready(out.h)
    return jax.device_get(out)


def test_layout_invariance(devices8):
    mesh1 = make_mesh(devices8[:1], shape=(1, 1))
    mesh8 = make_mesh(devices8, shape=(2, 4))
    out1 = _run_step(mesh1)
    out8 = _run_step(mesh8)
    # layout invariance to a few f32 ulps: with the unrolled barotropic
    # scan, XLA's fusion (and hence rounding) can differ between the
    # 1-device and 8-device programs by ~1 ulp in isolated elements
    np.testing.assert_allclose(np.asarray(out1.h), np.asarray(out8.h),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(out1.u), np.asarray(out8.u),
                               rtol=1e-6, atol=1e-7)


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
