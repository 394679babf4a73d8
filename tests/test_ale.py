"""ALE remapping/regridding tests (conservation, exactness, monotonicity) +
EOS sanity checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.ale.remapping import PCM, PLM, PPM_H4, remap_column
from mom6_tpu.ale.regridding import build_sigma_grid, build_zstar_grid
from mom6_tpu.eos import get_eos


def rand_grids(rng, nz0, nz1, n=6):
    """Random source/target grids with identical column sums."""
    h0 = rng.uniform(0.5, 2.0, (nz0, n, n))
    col = h0.sum(axis=0)
    w = rng.uniform(0.5, 2.0, (nz1, n, n))
    h1 = w / w.sum(axis=0) * col
    return jnp.asarray(h0, jnp.float32), jnp.asarray(h1, jnp.float32)


class TestRemap:
    @pytest.mark.parametrize("scheme", [PCM, PLM, PPM_H4])
    def test_conservation(self, scheme):
        rng = np.random.default_rng(0)
        h0, h1 = rand_grids(rng, 10, 7)
        u0 = jnp.asarray(rng.standard_normal((10, 6, 6)), jnp.float32)
        u1 = remap_column(u0, h0, h1, scheme)
        tot0 = np.asarray(jnp.sum(u0 * h0, axis=0), np.float64)
        tot1 = np.asarray(jnp.sum(u1 * h1, axis=0), np.float64)
        np.testing.assert_allclose(tot1, tot0, rtol=1e-5, atol=1e-5)

    def test_identity_same_grid(self):
        rng = np.random.default_rng(1)
        h0, _ = rand_grids(rng, 8, 8)
        u0 = jnp.asarray(rng.standard_normal((8, 6, 6)), jnp.float32)
        u1 = remap_column(u0, h0, h0, PPM_H4)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("scheme", [PLM, PPM_H4])
    def test_exact_for_linear_profile(self, scheme):
        """PLM/PPM must reproduce a linear-in-depth profile exactly
        (interior cells; boundary cells are lower order)."""
        nz0, nz1 = 16, 11
        h0 = jnp.full((nz0, 2, 2), 10.0, jnp.float32)
        col = 160.0
        h1 = jnp.full((nz1, 2, 2), col / nz1, jnp.float32)
        z0c = np.cumsum(np.full(nz0, 10.0)) - 5.0
        u0 = jnp.asarray(np.broadcast_to((2.0 + 0.03 * z0c)[:, None, None],
                                         (nz0, 2, 2)), jnp.float32)
        u1 = remap_column(u0, h0, h1, scheme)
        z1c = np.cumsum(np.full(nz1, col / nz1)) - col / nz1 / 2
        want = 2.0 + 0.03 * z1c
        got = np.asarray(u1)[:, 0, 0]
        np.testing.assert_allclose(got[1:-1], want[1:-1], rtol=1e-4)

    def test_monotone_no_overshoot(self):
        rng = np.random.default_rng(2)
        nz0, nz1 = 12, 30
        h0 = jnp.full((nz0, 1, 1), 5.0, jnp.float32)
        h1 = jnp.full((nz1, 1, 1), 2.0, jnp.float32)
        u0 = jnp.asarray(np.sort(rng.standard_normal((nz0, 1, 1)), axis=0),
                         jnp.float32)
        u1 = np.asarray(remap_column(u0, h0, h1, PPM_H4))
        assert u1.max() <= float(u0.max()) + 1e-5
        assert u1.min() >= float(u0.min()) - 1e-5


class TestRegrid:
    def test_zstar_flat_bottom_uniform(self):
        h = jnp.full((5, 4, 4), 200.0, jnp.float32)
        bathy = jnp.full((4, 4), 1000.0, jnp.float32)
        dz = np.full(5, 200.0)
        h_new = build_zstar_grid(h, bathy, dz)
        np.testing.assert_allclose(np.asarray(h_new), 200.0, rtol=1e-5)

    def test_zstar_column_sum_preserved(self):
        rng = np.random.default_rng(3)
        h = jnp.asarray(rng.uniform(10.0, 300.0, (5, 4, 4)), jnp.float32)
        bathy = jnp.asarray(np.asarray(jnp.sum(h, 0)) +
                            rng.uniform(-5, 5, (4, 4)), jnp.float32)
        h_new = build_zstar_grid(h, bathy, np.full(5, 200.0))
        np.testing.assert_allclose(np.asarray(jnp.sum(h_new, 0)),
                                   np.asarray(jnp.sum(h, 0)), rtol=1e-5)

    def test_zstar_free_surface_in_top_layer(self):
        """eta perturbations are absorbed by stretching, dominated by the
        upper layers (z* property)."""
        h = jnp.full((4, 2, 2), 250.0, jnp.float32).at[0].add(1.0)  # eta=+1
        bathy = jnp.full((2, 2), 1000.0, jnp.float32)
        h_new = np.asarray(build_zstar_grid(h, bathy, np.full(4, 250.0)))
        # uniform stretch: each layer gains eta/4
        np.testing.assert_allclose(h_new, 250.25, rtol=1e-5)

    def test_sigma(self):
        rng = np.random.default_rng(4)
        h = jnp.asarray(rng.uniform(10.0, 100.0, (5, 3, 3)), jnp.float32)
        h_new = np.asarray(build_sigma_grid(h))
        want = np.broadcast_to(np.asarray(jnp.sum(h, 0)) / 5, h_new.shape)
        np.testing.assert_allclose(h_new, want, rtol=1e-5)


class TestEOS:
    def test_wright_surface_values(self):
        eos = get_eos("WRIGHT")
        rho = float(eos.density(jnp.float32(10.0), jnp.float32(35.0),
                                jnp.float32(0.0)))
        # seawater at 10C, 35 PSU, surface: ~1026.95 kg/m3 (Wright 1997 fit)
        assert 1026.0 < rho < 1028.0

    def test_wright_derivs_signs_and_fd(self):
        """The EOS is dtype-generic: drive the FD check in numpy float64
        (f32 FD through the ~1e8-magnitude Wright intermediates is all
        cancellation noise)."""
        eos = get_eos("WRIGHT")
        T, S, p = np.float64(10.0), np.float64(35.0), np.float64(2e7)
        dT, dS = eos.density_derivs(T, S, p)
        assert float(dT) < 0.0 and float(dS) > 0.0
        eps = 1e-4
        fd_T = (float(eos.density(T + eps, S, p)) -
                float(eos.density(T - eps, S, p))) / (2 * eps)
        np.testing.assert_allclose(float(dT), fd_T, rtol=1e-6)
        fd_S = (float(eos.density(T, S + eps, p)) -
                float(eos.density(T, S - eps, p))) / (2 * eps)
        np.testing.assert_allclose(float(dS), fd_S, rtol=1e-6)

    def test_wright_compressibility(self):
        from mom6_tpu.eos.wright import compressibility, density
        T, S = jnp.float32(2.0), jnp.float32(34.7)
        rho_surf = float(density(T, S, jnp.float32(0.0)))
        rho_4km = float(density(T, S, jnp.float32(4e7)))
        assert rho_4km > rho_surf + 15.0  # ~2% compression over 4km
        drdp = float(compressibility(T, S, jnp.float32(2e7)))
        assert 3e-7 < drdp < 6e-7  # 1/c^2, c ~ 1400-1800 m/s

    def test_linear(self):
        eos = get_eos("LINEAR")
        rho = float(eos.density(jnp.float32(10.0), jnp.float32(35.0),
                                jnp.float32(0.0)))
        assert rho == pytest.approx(1000.0 - 2.0 + 28.0)


class TestRoquet:
    def test_reference_value(self):
        """Roquet et al. (2015) check value: rho(CT=10, SA=30, p=1e7 Pa)
        should be near 1027.45 kg/m3 (paper's check: 1027.45140 for the
        rho anomaly form evaluated at these inputs)."""
        eos = get_eos("ROQUET_RHO")
        rho = float(eos.density(np.float64(10.0), np.float64(30.0),
                                np.float64(1.0e7)))
        assert abs(rho - 1027.45140) < 0.01

    def test_surface_values_sane(self):
        eos = get_eos("ROQUET_RHO")
        rho = float(eos.density(np.float64(10.0), np.float64(35.16504),
                                np.float64(0.0)))
        assert 1026.0 < rho < 1028.5

    def test_derivs_fd(self):
        eos = get_eos("ROQUET_RHO")
        T, S, p = np.float64(8.0), np.float64(35.0), np.float64(2e7)
        dT, dS = eos.density_derivs(T, S, p)
        eps = 1e-5
        fd_T = (float(eos.density(T+eps, S, p)) - float(eos.density(T-eps, S, p))) / (2*eps)
        fd_S = (float(eos.density(T, S+eps, p)) - float(eos.density(T, S-eps, p))) / (2*eps)
        np.testing.assert_allclose(float(dT), fd_T, rtol=1e-6)
        np.testing.assert_allclose(float(dS), fd_S, rtol=1e-6)
        assert dT < 0 and dS > 0

    def test_agrees_with_wright(self):
        """Two independent EOS fits should agree to ~0.1 kg/m3 over the
        oceanographic range (different T variables, so allow slack)."""
        w = get_eos("WRIGHT"); r = get_eos("ROQUET_RHO")
        for T, S, p in [(2.0, 34.7, 3e7), (15.0, 35.5, 0.0), (25.0, 36.0, 1e6)]:
            rw = float(w.density(np.float64(T), np.float64(S), np.float64(p)))
            rr = float(r.density(np.float64(T), np.float64(S), np.float64(p)))
            assert abs(rw - rr) < 0.5, (T, S, p, rw, rr)


class TestRhoRegrid:
    def test_isopycnal_targets(self):
        """After a rho regrid, layer densities should land near Rlay."""
        import jax.numpy as jnp
        from mom6_tpu.ale.regridding import build_rho_grid
        from mom6_tpu.ale.remapping import remap_column, PPM_H4
        from mom6_tpu.grid.vertical import build_layered_vgrid
        eos = get_eos("LINEAR")
        nz = 8
        GV = build_layered_vgrid(nz)
        h = jnp.full((nz, 4, 4), 250.0, jnp.float32)
        zc = np.cumsum(np.full(nz, 250.0)) - 125.0
        T = jnp.asarray(np.broadcast_to((18.0 - 0.006 * zc)[:, None, None],
                                        (nz, 4, 4)), jnp.float32)
        S = jnp.full((nz, 4, 4), 35.0, jnp.float32)
        # targets spanning the column's density range (linear EOS, sigma-0)
        rho_prof = 1000.0 - 0.2 * np.asarray(T)[:, 0, 0] + 0.8 * 35.0
        targets = np.linspace(rho_prof[0], rho_prof[-1], nz)
        h_new = build_rho_grid(h, T, S, GV, eos, targets, p_ref=0.0)
        # column sums preserved
        np.testing.assert_allclose(np.asarray(jnp.sum(h_new, 0)), 2000.0,
                                   rtol=1e-5)
        # remap T onto the new grid; layer densities near the targets
        T2 = remap_column(T, h, h_new, PPM_H4)
        rho2 = 1000.0 - 0.2 * np.asarray(T2)[:, 0, 0] + 0.8 * 35.0
        # interior layers close to target band centers
        want = 0.5 * (targets[:-1] + targets[1:])
        got = 0.5 * (rho2[:-1] + rho2[1:])
        np.testing.assert_allclose(got[2:-2], want[2:-2], atol=0.15)


class TestHarmonicAnalysis:
    def test_recovers_amplitude_phase(self):
        from mom6_tpu.diagnostics.harmonic_analysis import HarmonicAnalysis
        from mom6_tpu.physics.lateral.tidal_forcing import CONSTITUENTS
        ha = HarmonicAnalysis(("M2", "K1"), (3, 3))
        w_m2 = CONSTITUENTS["M2"].freq
        w_k1 = CONSTITUENTS["K1"].freq
        rng = np.random.default_rng(0)
        for i in range(400):
            t = i * 1800.0
            ssh = (0.5 + 1.2 * np.cos(w_m2 * t - 0.7)
                   + 0.4 * np.cos(w_k1 * t + 0.3)
                   + 0.01 * rng.standard_normal((3, 3)))
            ha.accumulate(t, ssh)
        out = ha.solve()
        np.testing.assert_allclose(out["mean"], 0.5, atol=0.02)
        amp, ph = out["M2"]
        np.testing.assert_allclose(amp, 1.2, atol=0.02)
        np.testing.assert_allclose(ph, 0.7, atol=0.05)  # cos(wt-p): b=+sin
        amp1, _ = out["K1"]
        np.testing.assert_allclose(amp1, 0.4, atol=0.02)


class TestUNESCO:
    def test_check_value(self):
        """Jackett & McDougall (1995) check: rho(3C, 35.5 PSU, 300 bar)
        = 1041.83267 kg/m3."""
        eos = get_eos("UNESCO")
        rho = float(eos.density(np.float64(3.0), np.float64(35.5),
                                np.float64(3.0e7)))
        assert abs(rho - 1041.83267) < 0.01

    def test_surface_check(self):
        eos = get_eos("UNESCO")
        # UNESCO surface check: rho(5, 0, 0) = 999.96675
        rho = float(eos.density(np.float64(5.0), np.float64(0.0),
                                np.float64(0.0)))
        assert abs(rho - 999.96675) < 0.01

    def test_agrees_with_wright_and_roquet(self):
        u = get_eos("UNESCO"); w = get_eos("WRIGHT")
        for T, S, p in [(2.0, 34.7, 3e7), (15.0, 35.5, 0.0)]:
            ru = float(u.density(np.float64(T), np.float64(S), np.float64(p)))
            rw = float(w.density(np.float64(T), np.float64(S), np.float64(p)))
            assert abs(ru - rw) < 0.5


class TestZInit:
    def test_profile_onto_layers(self):
        from mom6_tpu.grid.z_init import init_tracer_from_z
        # data: 10 z-levels of 100 m, linear T(z)
        z_edges = np.arange(11) * 100.0
        zc = z_edges[:-1] + 50.0
        T_data = 20.0 - 0.01 * zc
        h = jnp.full((5, 4, 4), 200.0, jnp.float32)   # model: 5 x 200 m
        bathy = jnp.full((4, 4), 1000.0, jnp.float32)
        T = np.asarray(init_tracer_from_z(z_edges, T_data, h, bathy))
        want = 20.0 - 0.01 * (np.arange(5) * 200.0 + 100.0)
        np.testing.assert_allclose(T[:, 2, 2], want, rtol=1e-4)

    def test_shallow_column_truncation(self):
        from mom6_tpu.grid.z_init import init_tracer_from_z
        z_edges = np.arange(11) * 100.0
        T_data = 20.0 - 0.01 * (z_edges[:-1] + 50.0)
        # a 300 m column: layers of 60 m
        h = jnp.full((5, 2, 2), 60.0, jnp.float32)
        bathy = jnp.full((2, 2), 300.0, jnp.float32)
        T = np.asarray(init_tracer_from_z(z_edges, T_data, h, bathy))
        # only the top 300 m of data used: T in [17, 20]
        assert T.min() > 16.9 and T.max() <= 20.0


class TestStochEOS:
    def test_stanley_correction_sign_and_scale(self):
        from mom6_tpu.eos.stoch_eos import (sgs_t_variance,
                                            stanley_density_correction)
        from mom6_tpu.grid.grid import build_cartesian_grid
        G = build_cartesian_grid(8, 8, 100.0, 100.0, max_depth=1000.0,
                                 cyclic_x=True, reentrant_y=True)
        x = np.arange(8)
        T = jnp.asarray(np.broadcast_to(
            10.0 + np.sin(2 * np.pi * x / 8)[None, None, :], (2, 8, 8)),
            jnp.float32)
        s2 = sgs_t_variance(T, G)
        assert float(s2.max()) > 0.0
        eos = get_eos("WRIGHT")
        corr = stanley_density_correction(
            jnp.full((2, 8, 8), 10.0), jnp.full((2, 8, 8), 35.0),
            jnp.zeros((2, 8, 8)), eos, s2)
        # d2rho/dT2 > 0 for seawater (rho(T) is concave-up in -drho/dT...
        # thermal expansion grows with T): correction is positive-definite
        # times variance with the sign of d2rho/dT2
        c = np.asarray(corr)
        assert np.isfinite(c).all()
        assert np.abs(c).max() < 0.1  # small correction, right magnitude
        # zero variance -> zero correction
        z = stanley_density_correction(
            jnp.full((2, 8, 8), 10.0), jnp.full((2, 8, 8), 35.0),
            jnp.zeros((2, 8, 8)), eos, jnp.zeros((2, 8, 8)))
        np.testing.assert_allclose(np.asarray(z), 0.0)


class TestJackett06:
    def test_check_value(self):
        """Jackett et al. (2006) check: rho(25C, 35 PSU, 2000 dbar)
        = 1031.65056 kg/m3."""
        eos = get_eos("JACKETT06")
        rho = float(eos.density(np.float64(25.0), np.float64(35.0),
                                np.float64(2.0e7)))
        assert abs(rho - 1031.65056) < 1e-3

    def test_derivs_match_fd(self):
        eos = get_eos("JACKETT06")
        T, S, p = np.float64(10.0), np.float64(35.0), np.float64(2e7)
        dT, dS = eos.density_derivs(T, S, p)
        e = 0.25                      # wide stencil: tests run in f32
        fd_T = (float(eos.density(T + e, S, p))
                - float(eos.density(T - e, S, p))) / (2 * e)
        fd_S = (float(eos.density(T, S + e, p))
                - float(eos.density(T, S - e, p))) / (2 * e)
        assert abs(float(dT) - fd_T) < 5e-3 * abs(fd_T)
        assert abs(float(dS) - fd_S) < 5e-3 * abs(fd_S)

    def test_agrees_with_unesco(self):
        """Independent fits of the same data agree to ~0.01 kg/m3."""
        j = get_eos("JACKETT06"); u = get_eos("UNESCO")
        for (T, S, p) in [(25.0, 35.0, 0.0), (10.0, 35.0, 0.0),
                          (2.0, 34.5, 5e7), (0.0, 35.0, 0.0)]:
            rj = float(j.density(np.float64(T), np.float64(S),
                                 np.float64(p)))
            ru = float(u.density(np.float64(T), np.float64(S),
                                 np.float64(p)))
            assert abs(rj - ru) < 0.02, (T, S, p, rj, ru)

    def test_rho_ref_anomaly_form(self):
        eos = get_eos("JACKETT06")
        full = float(eos.density(np.float64(10.0), np.float64(35.0),
                                 np.float64(0.0)))
        anom = float(eos.density(np.float64(10.0), np.float64(35.0),
                                 np.float64(0.0), rho_ref=1000.0))
        assert abs((full - 1000.0) - anom) < 1e-3   # f32


class TestPQM:
    def _grids(self, nz0=12, nz1=9):
        h0 = jnp.full((nz0, 1, 1), 1.0, jnp.float32) * (12.0 / nz0)
        h1 = jnp.full((nz1, 1, 1), 1.0, jnp.float32) * (12.0 / nz1)
        return h0, h1

    def test_conservative(self):
        from mom6_tpu.ale.remapping import remap_column
        h0, h1 = self._grids()
        rng = np.random.RandomState(3)
        u0 = jnp.asarray(rng.rand(12, 1, 1), jnp.float32)
        u1 = remap_column(u0, h0, h1, "PQM_IH4IH3")
        q0 = float(jnp.sum(u0 * h0)); q1 = float(jnp.sum(u1 * h1))
        assert abs(q1 - q0) / abs(q0) < 1e-5

    def test_exact_for_quadratic(self):
        """PQM (quartic with h4 edges) reproduces a smooth quadratic
        profile much more accurately than PLM."""
        from mom6_tpu.ale.remapping import remap_column
        nz0, nz1 = 16, 11
        h0 = jnp.full((nz0, 1, 1), 800.0 / nz0, jnp.float32)
        h1 = jnp.full((nz1, 1, 1), 800.0 / nz1, jnp.float32)
        z0 = np.cumsum(np.full(nz0, 800.0 / nz0)) - 800.0 / nz0 / 2
        z1 = np.cumsum(np.full(nz1, 800.0 / nz1)) - 800.0 / nz1 / 2
        # monotone quadratic (no interior extremum -> limiters inactive)
        zf0 = np.concatenate([[0.0], np.cumsum(np.full(nz0, 800.0 / nz0))])
        P = lambda z: 10.0 * z + 1.5e-3 * z**2 + (2e-6 / 3) * z**3
        u0 = (P(zf0[1:]) - P(zf0[:-1])) / np.diff(zf0)
        zf1 = np.concatenate([[0.0], np.cumsum(np.full(nz1, 800.0 / nz1))])
        want = (P(zf1[1:]) - P(zf1[:-1])) / np.diff(zf1)
        u0j = jnp.asarray(u0[:, None, None], jnp.float32)
        got_pqm = np.asarray(remap_column(u0j, h0, h1, "PQM_IH4IH3"))[:, 0, 0]
        got_plm = np.asarray(remap_column(u0j, h0, h1, "PLM"))[:, 0, 0]
        # exclude 2 cells at each end (boundary edge stencils are 2nd
        # order there by construction)
        err_pqm = np.abs(got_pqm - want)[2:-2].max()
        err_plm = np.abs(got_plm - want)[2:-2].max()
        assert err_pqm < 2e-5, err_pqm          # exact up to f32 roundoff
        assert err_plm > 3 * err_pqm, (err_plm, err_pqm)

    def test_monotone_on_step(self):
        """No new extrema remapping a step profile."""
        from mom6_tpu.ale.remapping import remap_column
        h0, h1 = self._grids()
        u0 = jnp.asarray(np.where(np.arange(12) < 6, 1.0, 0.0)
                         [:, None, None], jnp.float32)
        u1 = np.asarray(remap_column(u0, h0, h1, "PQM_IH4IH3"))
        assert u1.max() <= 1.0 + 1e-5
        assert u1.min() >= -1e-5


class TestRoquetSpV:
    def test_check_value(self):
        """Roquet et al. (2015) SpV polynomial at (CT=10, SA=30,
        p=2000 dbar); consistent with the rho-form fit to ~1e-7."""
        eos = get_eos("ROQUET_SPV")
        v = float(eos.specific_volume(np.float64(10.0), np.float64(30.0),
                                      np.float64(2e7)))
        assert abs(v - 9.691365410e-04) < 2e-9
        rho_spv = 1.0 / v
        rho = float(get_eos("ROQUET_RHO").density(
            np.float64(10.0), np.float64(30.0), np.float64(2e7)))
        assert abs(rho_spv - rho) < 1e-3

    def test_teos10_alias(self):
        a = get_eos("TEOS10"); b = get_eos("ROQUET_SPV")
        va = float(a.specific_volume(np.float64(4.0), np.float64(34.0),
                                     np.float64(1e7)))
        vb = float(b.specific_volume(np.float64(4.0), np.float64(34.0),
                                     np.float64(1e7)))
        assert va == vb

    def test_density_derivs_sign(self):
        eos = get_eos("ROQUET_SPV")
        dT, dS = eos.density_derivs(np.float64(10.0), np.float64(35.0),
                                    np.float64(0.0))
        assert float(dT) < 0.0 and float(dS) > 0.0


def test_all_eos_finite_in_f32_at_depth():
    """Regression: pre-scaled pressure coefficients underflowed f32 while
    p**6 overflowed, giving NaN for any p > 0 (ROQUET forms)."""
    import jax.numpy as jnp
    for name in ("LINEAR", "WRIGHT", "ROQUET_RHO", "ROQUET_SPV",
                 "TEOS10", "UNESCO", "JACKETT06"):
        eos = get_eos(name)
        T = jnp.asarray([25.0, 10.0, 2.0, -1.5], jnp.float32)
        S = jnp.asarray([30.0, 35.0, 34.5, 35.5], jnp.float32)
        p = jnp.asarray([0.0, 1e7, 4e7, 1e8], jnp.float32)
        rho = np.asarray(eos.density(T, S, p))
        dT, dS = eos.density_derivs(T, S, p)
        assert np.isfinite(rho).all(), name
        assert np.isfinite(np.asarray(dT)).all(), name
        assert np.isfinite(np.asarray(dS)).all(), name
        assert (rho > 990).all() and (rho < 1110).all(), (name, rho)


class TestStreamingFilter:
    def test_extracts_target_frequency(self):
        """A two-tone signal: the filter's narrow-band output converges to
        the target-frequency component and rejects the other tone."""
        import jax
        from mom6_tpu.diagnostics.streaming_filter import (filt_accum,
                                                           init_filter)
        w_m2 = 1.4052e-4
        w_k1 = 0.7292e-4
        dt = 600.0
        st = init_filter([w_m2], (1,), alpha=0.03)

        def step(st, n):
            t = n * dt
            sig = (1.5 * jnp.cos(w_m2 * t + 0.3)
                   + 0.8 * jnp.cos(w_k1 * t)) * jnp.ones((1,))
            st = filt_accum(st, sig, dt)
            return st, (st.u1[0, 0], 1.5 * jnp.cos(w_m2 * t + 0.3))

        n = jnp.arange(1, 40000)
        st, (got, want) = jax.lax.scan(step, st, n)
        # after spin-up the filter tracks the M2 component
        err = np.abs(np.asarray(got[-3000:]) - np.asarray(want[-3000:]))
        assert err.max() < 0.35, err.max()      # K1 amplitude is 0.8
        amp = np.abs(np.asarray(got[-3000:])).max()
        assert 1.2 < amp < 1.8, amp


def test_implicit_h4_edges_exact_for_cubic():
    """The compact h4 edge scheme reproduces the exact interface values
    of a cubic profile on a NON-UNIFORM grid in the interior (4th-order:
    exact through cubics; edge_values_implicit_h4 parity)."""
    from mom6_tpu.ale.remapping import (_edge_values_h4,
                                        _edge_values_implicit_h4)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.uniform(0.5, 2.0, 12), jnp.float64)[:, None]
    zi = np.concatenate([[0.0], np.cumsum(np.asarray(h[:, 0]))])

    def F(z):     # antiderivative of the cubic p(z) = 1 + z + z^2 + z^3
        return z + z**2 / 2 + z**3 / 3 + z**4 / 4
    u = jnp.asarray((F(zi[1:]) - F(zi[:-1])) / np.asarray(h[:, 0]),
                    jnp.float64)[:, None]
    e_t, _ = _edge_values_implicit_h4(u, h)
    zt = zi[:-1]                      # top interface of each cell
    exact = 1 + zt + zt**2 + zt**3
    got = np.asarray(e_t[:, 0])
    err_imp = np.abs(got[2:-1] - exact[2:-1])
    assert err_imp.max() < 5e-3 * np.abs(exact[2:-1]).max()
    # and it beats the explicit scheme's uniform-weight approximation on
    # this non-uniform grid
    e4_t, _ = _edge_values_h4(u, h)
    err_exp = np.abs(np.asarray(e4_t[:, 0])[2:-1] - exact[2:-1])
    assert err_imp.mean() <= err_exp.mean()


def test_h6_edges_beat_h4_on_smooth_profile():
    from mom6_tpu.ale.remapping import _edge_values_h4, _edge_values_h6
    nz = 24
    h = jnp.full((nz, 1), 1.0, jnp.float64)
    zi = np.arange(nz + 1, dtype=np.float64)
    k = 2 * np.pi / nz

    def F(z):
        return -np.cos(k * z) / k
    u = jnp.asarray((F(zi[1:]) - F(zi[:-1])), jnp.float64)[:, None]
    exact = np.sin(k * zi[:-1])
    e4, _ = _edge_values_h4(u, h)
    e6, _ = _edge_values_h6(u, h)
    err4 = np.abs(np.asarray(e4[:, 0])[4:-4] - exact[4:-4]).max()
    err6 = np.abs(np.asarray(e6[:, 0])[4:-4] - exact[4:-4]).max()
    assert err6 < err4


def test_p3m_monotone_interpolant():
    """P3M: continuous monotone cubic through monotone data; no new
    extrema anywhere in each cell (P3M_limiter role)."""
    from mom6_tpu.ale.remapping import P3M_H4, reconstruct
    u = jnp.asarray([0.0, 1.0, 1.5, 1.6, 4.0, 9.0],
                    jnp.float64)[:, None]
    h = jnp.ones((6, 1), jnp.float64)
    c0, c1, c2, c3, c4 = reconstruct(u, h, P3M_H4)
    xi = np.linspace(0, 1, 21)
    vals = (np.asarray(c0)[:, None] + xi[None, :, None] * (
        np.asarray(c1)[:, None] + xi[None, :, None] * (
            np.asarray(c2)[:, None] + xi[None, :, None]
            * np.asarray(c3)[:, None])))
    # within-cell monotone: values sorted along xi for every cell
    dif = np.diff(vals[:, :, 0], axis=1)
    assert (dif >= -1e-9).all()


def test_new_ppm_variants_remap_conservatively():
    from mom6_tpu.ale.remapping import (PPM_H6, PPM_IH4, PQM_IH4IH3,
                                        remap_column)
    rng = np.random.default_rng(11)
    nz = 10
    h0 = jnp.asarray(rng.uniform(5.0, 50.0, (nz, 3, 3)), jnp.float32)
    u0 = jnp.asarray(np.cumsum(rng.normal(0, 1, (nz, 3, 3)), 0),
                     jnp.float32)
    col = jnp.sum(h0, axis=0)
    h1 = jnp.broadcast_to(col / (nz + 2), (nz + 2,) + col.shape)
    for sch in (PPM_IH4, PPM_H6, PQM_IH4IH3):
        u1 = remap_column(u0, h0, h1, sch)
        m0 = np.asarray(jnp.sum(u0 * h0, axis=0), np.float64)
        m1 = np.asarray(jnp.sum(u1 * h1, axis=0), np.float64)
        np.testing.assert_allclose(m1, m0, rtol=2e-4), sch


def test_sigma_shelf_zstar_blend():
    """SIGMA_SHELF_ZSTAR: terrain-following over the shallow shelf,
    z*-like in the deep, column sums preserved everywhere."""
    from mom6_tpu.ale.regridding import (build_sigma_shelf_zstar_grid,
                                         build_zstar_grid)
    nz, ny, nx = 6, 1, 8
    depth = jnp.asarray(np.linspace(50.0, 3000.0, nx))[None, :]
    depth = jnp.broadcast_to(depth, (ny, nx))
    h = jnp.broadcast_to((depth / nz)[None], (nz, ny, nx))
    dz_nom = np.full(nz, 3000.0 / nz)
    h_new = build_sigma_shelf_zstar_grid(h, depth, dz_nom, 200.0)
    np.testing.assert_allclose(np.asarray(h_new.sum(0)),
                               np.asarray(depth), rtol=1e-5)
    # shallowest column (50 m < shelf depth): pure sigma = equal layers
    np.testing.assert_allclose(np.asarray(h_new[:, 0, 0]),
                               50.0 / nz, rtol=1e-4)
    # deepest column (3000 m >> 2*shelf): matches z*
    h_z = build_zstar_grid(h, depth, jnp.asarray(dz_nom, h.dtype))
    np.testing.assert_allclose(np.asarray(h_new[:, 0, -1]),
                               np.asarray(h_z[:, 0, -1]), rtol=1e-4)
