"""Tests: derived diagnostics/surface state, offline tracer mode,
stochastic patterns."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import double_gyre, thermo_gyre
from mom6_tpu.diagnostics.diagnostics import (column_speed,
                                              extract_surface_state,
                                              global_area_mean,
                                              kinetic_energy_3d, zonal_mean)


class TestDiagnostics:
    def test_surface_state(self):
        G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=4)
        sfc = extract_surface_state(state, G, GV)
        assert sfc.sst.shape == (12, 12)
        np.testing.assert_allclose(np.asarray(sfc.ssh), 0.0, atol=1e-3)
        assert float(sfc.speed.max()) == 0.0
        # top layer center is ~375 m deep at nz=4: T ~ 14 C
        assert 10.0 < float(sfc.sst.max()) < 21.0

    def test_ke_and_speed(self):
        G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2)
        u = jnp.ones_like(state.u) * 0.5
        st = state.replace(u=u * G.mask2dCu)
        ke = kinetic_energy_3d(st, G)
        # interior cells: KE = 0.5*u^2 = 0.125
        assert abs(float(ke[0, 6, 6]) - 0.125) < 1e-6
        sp = column_speed(st, G)
        assert abs(float(sp[6, 6]) - 0.5) < 1e-6

    def test_means(self):
        G, GV, state, params, forces = double_gyre(nx=12, ny=12, nz=2)
        f = jnp.full((12, 12), 3.0)
        assert abs(global_area_mean(f, G) - 3.0) < 1e-12
        zm = zonal_mean(f, G)
        np.testing.assert_allclose(zm, 3.0)


class TestOffline:
    def test_offline_matches_mass_and_uniformity(self):
        from mom6_tpu.tracers.offline import OfflineFields, step_offline
        G, GV, state, params, forces = double_gyre(nx=16, ny=16, nz=3)
        rng = np.random.default_rng(0)
        h0 = jnp.asarray(100.0 + 10 * rng.standard_normal((3, 16, 16)),
                         jnp.float32)
        uhtr = jnp.asarray(5e6 * rng.standard_normal((3, 16, 16)), jnp.float32)
        vhtr = jnp.asarray(5e6 * rng.standard_normal((3, 16, 16)), jnp.float32)
        # h_end consistent with the transports
        div = ((uhtr - jnp.roll(uhtr, 1, -1)) + (vhtr - jnp.roll(vhtr, 1, -2)))
        h_end = h0 - div * G.IareaT
        tr = jnp.full((1, 3, 16, 16), 2.0, jnp.float32)
        fields = OfflineFields(h_start=h0, h_end=h_end, uhtr=uhtr, vhtr=vhtr)
        tr2, h2 = step_offline(tr, fields, 3600.0, G)
        np.testing.assert_allclose(np.asarray(tr2), 2.0, rtol=1e-4)


class TestStochastic:
    def test_ar1_pattern_statistics(self):
        from mom6_tpu.physics.stochastic import SPPTParams, ar1_pattern
        p = SPPTParams(amplitude=0.5, tau=3600.0, smooth_passes=2)
        key = jax.random.PRNGKey(0)
        pat = jnp.zeros((32, 32))
        stds = []
        for _ in range(60):
            pat, key = ar1_pattern(pat, key, 600.0, (32, 32), p)
            stds.append(float(jnp.std(pat)))
        # equilibrium std ~ amplitude
        assert 0.2 < np.mean(stds[-20:]) < 0.9
        # temporal correlation: one step changes the pattern only slightly
        pat2, _ = ar1_pattern(pat, key, 600.0, (32, 32), p)
        corr = np.corrcoef(np.asarray(pat).ravel(),
                           np.asarray(pat2).ravel())[0, 1]
        assert corr > 0.8

    def test_sppt_perturbs_tendency(self):
        from mom6_tpu.physics.stochastic import SPPTParams, apply_sppt
        tend = jnp.ones((4, 8, 8))
        pat = jnp.full((8, 8), 0.5)
        out = apply_sppt(tend, pat, SPPTParams())
        np.testing.assert_allclose(np.asarray(out), 1.5)
        # clipping
        out2 = apply_sppt(tend, jnp.full((8, 8), 5.0), SPPTParams(clip=0.8))
        np.testing.assert_allclose(np.asarray(out2), 1.8)

    def test_skeb_divergence_free(self):
        from mom6_tpu.physics.stochastic import SPPTParams, apply_skeb
        rng = np.random.default_rng(1)
        pat = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
        u0 = jnp.zeros((2, 16, 16)); v0 = jnp.zeros((2, 16, 16))
        u, v = apply_skeb(u0, v0, pat, 1.0, SPPTParams())
        du = np.asarray(u - u0)[0]
        dv = np.asarray(v - v0)[0]
        div = (du - np.roll(du, 1, -1)) + (dv - np.roll(dv, 1, -2))
        assert np.abs(div).max() < 1e-5 * max(np.abs(du).max(), 1e-9)

class TestODAIncupd:
    def test_ramped_application_and_remap(self):
        from mom6_tpu.physics.oda_incupd import (IncrementalUpdate,
                                                 apply_oda_increments)
        G, GV, state, params, forcing = thermo_gyre(nx=8, ny=8, nz=4)
        # increments on a finer 8-level grid
        h_inc = jnp.full((8, 8, 8), 3000.0 / 8, jnp.float32)
        dT = jnp.full((8, 8, 8), 2.0, jnp.float32)
        inc = IncrementalUpdate(dT=dT, h_inc=h_inc, ramp_seconds=7200.0)
        s = state
        for _ in range(4):   # 4 x 1800 s = the full ramp
            s = apply_oda_increments(s, inc, 1800.0, G)
        dT_applied = np.asarray(s.T) - np.asarray(state.T)
        np.testing.assert_allclose(dT_applied, 2.0, rtol=1e-5)


class TestPointAccel:
    def test_worst_cfl_dossier(self):
        from mom6_tpu.diagnostics.point_accel import (format_dossier,
                                                      worst_cfl_dossier)
        G, GV, state, params, forces = double_gyre(nx=8, ny=8, nz=3)
        u = jnp.zeros_like(state.u).at[1, 3, 4].set(2.5)
        st = state.replace(u=u)
        d = worst_cfl_dossier(st, G, 1200.0)
        assert (d["component"], d["k"], d["j"], d["i"]) == ("u", 1, 3, 4)
        assert abs(d["vel"] - 2.5) < 1e-6
        txt = format_dossier(d)
        assert "worst CFL" in txt and "h:" in txt
