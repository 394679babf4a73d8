"""Tests: unsplit dynamics variants, sponges, tracer packages, CFL limiter."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre
from mom6_tpu.core.dynamics_unsplit import (UnsplitParams,
                                            step_dynamics_unsplit_rk2,
                                            step_dynamics_unsplit_rk3)
from mom6_tpu.physics.vertical.sponge import SpongeParams, apply_sponge
from mom6_tpu.physics.vertical.vert_friction import limit_velocity
from mom6_tpu.tracers.packages import (BoundaryImpulse, IdealAge,
                                       RegionalDye, TracerFlowControl)


class TestUnsplit:
    def _run(self, stepper_fn, n=48, dt=300.0):
        G, GV, state, params, forces = double_gyre(nx=16, ny=16, nz=2,
                                                   dt=dt)
        p = UnsplitParams(dt=dt, kv=1e-4, bottom_drag=1e-4)

        @jax.jit
        def step(s):
            return stepper_fn(s, forces, G, GV, p)

        area = np.asarray(G.areaT, np.float64)
        vol0 = (np.asarray(state.h, np.float64) * area).sum()
        for _ in range(n):
            state = step(state)
        h = np.asarray(state.h)
        u = np.asarray(state.u)
        assert np.isfinite(h).all() and np.isfinite(u).all()
        assert h.min() > 0
        vol1 = (np.asarray(state.h, np.float64) * area).sum()
        assert abs(vol1 - vol0) / vol0 < 1e-5
        assert np.abs(u).max() > 1e-6      # wind spun something up
        assert np.abs(u).max() < 1.0
        return state

    def test_rk3_stable_and_conserving(self):
        self._run(step_dynamics_unsplit_rk3)

    def test_rk2_stable_and_conserving(self):
        self._run(step_dynamics_unsplit_rk2)

    def test_rk3_rk2_agree_initially(self):
        """Both schemes approximate the same PDE: one small step should
        agree closely."""
        G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2,
                                                   dt=120.0)
        p = UnsplitParams(dt=120.0, kv=1e-4)
        s3 = step_dynamics_unsplit_rk3(state, forces, G, GV, p)
        s2 = step_dynamics_unsplit_rk2(state, forces, G, GV, p)
        np.testing.assert_allclose(np.asarray(s3.u), np.asarray(s2.u),
                                   atol=1e-7)


class TestSponge:
    def test_relaxation(self):
        G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2)
        T = jnp.full(state.h.shape, 10.0, jnp.float32)
        state = state.replace(T=T, S=jnp.full_like(T, 35.0))
        idamp = jnp.zeros((12, 12), jnp.float32).at[:, :3].set(1.0 / 3600.0)
        ref = jnp.full_like(T, 20.0)
        sp = SpongeParams(idamp=idamp, T_ref=ref)
        out = apply_sponge(state, 3600.0, sp, G)
        t = np.asarray(out.T)
        # sponged region relaxed halfway (w=1 => (10+20)/2)
        np.testing.assert_allclose(t[:, :, 0], 15.0, rtol=1e-5)
        # outside the sponge untouched
        np.testing.assert_allclose(t[:, :, 6], 10.0, rtol=1e-6)

    def test_infinite_damping_limit(self):
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=2)
        T = jnp.zeros(state.h.shape, jnp.float32)
        state = state.replace(T=T)
        sp = SpongeParams(idamp=jnp.full((8, 8), 1.0, jnp.float32),
                          T_ref=jnp.full_like(T, 5.0))
        out = apply_sponge(state, 1e6, sp, G)
        np.testing.assert_allclose(np.asarray(out.T), 5.0, rtol=1e-4)


class TestCFLTruncation:
    def test_clipping_and_count(self):
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=1)
        u = jnp.zeros_like(state.u).at[0, 4, 4].set(100.0)
        v = jnp.zeros_like(state.v)
        u2, v2, n = limit_velocity(u, v, 1200.0, G)
        assert int(n) == 1
        assert float(jnp.abs(u2).max()) < 100.0
        u3, _, n0 = limit_velocity(jnp.zeros_like(u), v, 1200.0, G)
        assert int(n0) == 0


class TestTracerPackages:
    def test_flow_control_roundtrip(self):
        tfc = TracerFlowControl([IdealAge(), RegionalDye()])
        assert tfc.registry.names == ["age", "dye"]
        fields = tfc.init_tracers((3, 8, 8), jnp.float32)
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=3)
        h = state.h
        fields = tfc.column_physics(fields, h, 365 * 86400.0, G, GV)
        age = np.asarray(fields["age"])
        assert age[0].max() == 0.0          # surface stays zero
        np.testing.assert_allclose(age[1][age[1] > 0], 1.0, rtol=1e-5)
        dye = np.asarray(fields["dye"])
        assert dye[0, 2, 2] == 1.0 and dye[0, 6, 6] == 0.0
        stacked = tfc.stack(fields)
        assert stacked.shape == (2, 3, 8, 8)

    def test_boundary_impulse_switches_off(self):
        pkg = BoundaryImpulse(source_seconds=100.0)
        tfc = TracerFlowControl([pkg])
        fields = tfc.init_tracers((2, 4, 4), jnp.float32)
        G, GV, state, params, forces = double_gyre(nx=4, ny=4, nz=2)
        fields = pkg.column_physics(fields, state.h, 50.0, G, GV)
        assert float(fields["impulse"][0].max()) == 1.0
        fields = pkg.column_physics(fields, state.h, 100.0, G, GV)  # t=150
        # after the source window, the surface is no longer forced to 1
        fields["impulse"] = fields["impulse"].at[0].set(0.5)
        fields = pkg.column_physics(fields, state.h, 100.0, G, GV)
        assert float(fields["impulse"][0].max()) == 0.5
