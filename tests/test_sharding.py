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


def _full_physics_setup(nx=64, ny=64, nz=8):
    import jax.numpy as jnp

    from mom6_tpu.drivers.experiments import thermo_gyre
    from mom6_tpu.physics.lateral.meke import MEKEParams
    from mom6_tpu.physics.lateral.thickness_diffuse import GMParams

    G, GV, state, params, forcing = thermo_gyre(nx=nx, ny=ny, nz=nz,
                                                dt=1200.0,
                                                n_dyn_per_thermo=2)
    params = params._replace(
        gm=GMParams(khth=100.0), meke=MEKEParams(), khtr=50.0,
        neutral_diffusion=True,
        diabatic=params.diabatic._replace(
            boundary_layer_scheme="KPP", use_shear_mixing=True))
    state = state.replace(E_meke=jnp.zeros((ny, nx), jnp.float32))
    key = jax.random.PRNGKey(7)
    state = state.replace(
        h=state.h + jax.random.uniform(key, state.h.shape, state.h.dtype),
        u=state.u + 0.05 * jax.random.normal(key, state.u.shape,
                                             state.u.dtype))
    return G, GV, state, params, forcing


def test_stats_bitwise_across_meshes(devices8):
    """ocean.stats global sums are BITWISE layout-invariant: the same
    64x64x8 full-physics state summed on 1-, 2- and 8-device meshes gives
    identical bits (fixed_point_sum inside jit; the in-jit analogue of
    MOM6's reproducing-sum guarantee, MOM_coms.F90:30-70 /
    .testing/README.rst:218-244)."""
    from mom6_tpu.diagnostics.sum_output import compute_stats_jit

    G0, GV, state0, params, _ = _full_physics_setup()

    def stats_on(devs, shape):
        mesh = make_mesh(devs, shape=shape)
        with mesh:
            G = shard_over(mesh, G0)
            st = shard_over(mesh, state0)
            out = jax.jit(
                lambda s: compute_stats_jit(s, G, GV, 1200.0))(st)
        return {k: float(v) for k, v in out.items()}

    s1 = stats_on(devices8[:1], (1, 1))
    s2 = stats_on(devices8[:2], (1, 2))
    s8 = stats_on(devices8, (2, 4))
    for k in ("mass", "KE", "APE", "energy", "max_CFL"):
        assert s1[k] == s2[k] == s8[k], \
            f"{k}: {s1[k]!r} vs {s2[k]!r} vs {s8[k]!r}"


def test_full_physics_step_layout_invariance(devices8):
    """The full-physics step (KPP + GM + MEKE + neutral diffusion +
    shear mixing) at 64x64x8 agrees across 1- vs 8-device meshes.  Not
    bitwise: GSPMD compiles a different program per partitioning and
    XLA's fusion choices shift rounding by ~1 ulp in isolated elements
    (measured: ~0.2% of h elements differ at <=6e-7 rel after a step).
    The bitwise guarantee this stack can and does make is the stats-sum
    gate above; this gate pins the state itself to ulp-level."""
    from mom6_tpu.core.mom import step_mom

    G0, GV, state0, params, forcing0 = _full_physics_setup()

    def run(devs, shape):
        mesh = make_mesh(devs, shape=shape)
        with mesh:
            G = shard_over(mesh, G0)
            forcing = shard_over(mesh, forcing0)
            st = shard_over(mesh, state0)

            def step(s):
                return step_mom(constrain_state(s), forcing, G, GV,
                                params)

            out = jax.jit(step,
                          out_shardings=state_sharding(mesh, st))(st)
            jax.block_until_ready(out.h)
        return jax.device_get(out)

    out1 = run(devices8[:1], (1, 1))
    out8 = run(devices8, (2, 4))
    np.testing.assert_allclose(np.asarray(out1.h), np.asarray(out8.h),
                               rtol=1e-5, atol=0)
    np.testing.assert_allclose(np.asarray(out1.T), np.asarray(out8.T),
                               rtol=1e-5, atol=1e-6)
    # velocities: absolute frame — near-zero u amplifies the fusion ulp
    # seeds through 19 BT substeps; 2e-5 m/s on an O(0.1 m/s) field
    np.testing.assert_allclose(np.asarray(out1.u), np.asarray(out8.u),
                               rtol=1e-4, atol=2e-5)


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
