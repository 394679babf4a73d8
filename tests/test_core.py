"""Core dynamics unit tests: continuity conservation & positivity,
Coriolis energy conservation, pressure force at rest, vertical friction,
barotropic solver behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.core.continuity_ppm import continuity_ppm, zonal_mass_flux
from mom6_tpu.core.coriolis_adv import coriolis_adv, relative_vorticity
from mom6_tpu.core.pressure_force import pressure_force_montgomery, find_eta
from mom6_tpu.core.barotropic import BTParams, btstep, set_dtbt
from mom6_tpu.physics.vertical.vert_friction import (vertvisc, vertvisc_coef,
                                                     vertvisc_remnant)


def make_setup(nx=16, ny=16, nz=2, cyclic=True, depth=None, f0=1e-4):
    G = build_cartesian_grid(nx, ny, 100.0, 100.0, max_depth=1000.0,
                             f0=f0, beta=0.0, cyclic_x=cyclic,
                             reentrant_y=cyclic, depth=depth,
                             dtype=jnp.float32)
    GV = build_layered_vgrid(nz, gprime_int=0.02)
    return G, GV


class TestContinuity:
    def test_mass_conservation_periodic(self):
        G, GV = make_setup()
        rng = np.random.default_rng(0)
        h = jnp.asarray(100.0 + 10.0 * rng.standard_normal((2, 16, 16)),
                        jnp.float32)
        u = jnp.asarray(0.1 * rng.standard_normal((2, 16, 16)), jnp.float32)
        v = jnp.asarray(0.1 * rng.standard_normal((2, 16, 16)), jnp.float32)
        h_new, uh, vh, _, _ = continuity_ppm(u, v, h, 600.0, G, GV)
        area = np.asarray(G.areaT, np.float64)
        vol0 = float((np.asarray(h, np.float64) * area).sum())
        vol1 = float((np.asarray(h_new, np.float64) * area).sum())
        assert abs(vol1 - vol0) / vol0 < 1e-6

    def test_positivity_extreme(self):
        G, GV = make_setup()
        rng = np.random.default_rng(1)
        # thin layers + strong velocities: must stay positive
        h = jnp.asarray(np.abs(rng.standard_normal((2, 16, 16))) * 1.0 + 0.01,
                        jnp.float32)
        u = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
        h_new, _, _, _, _ = continuity_ppm(u, v, h, 1000.0, G, GV)
        assert float(jnp.min(h_new)) >= 0.0

    def test_uniform_flow_advects_uniform_h(self):
        G, GV = make_setup()
        h = jnp.full((1, 16, 16), 100.0, jnp.float32)
        u = jnp.full((1, 16, 16), 0.3, jnp.float32)
        v = jnp.zeros((1, 16, 16), jnp.float32)
        h_new, uh, _, _, _ = continuity_ppm(u, v, h, 600.0, G, GV)
        np.testing.assert_allclose(np.asarray(h_new), 100.0, rtol=1e-6)
        # flux = u * h * dy
        np.testing.assert_allclose(np.asarray(uh), 0.3 * 100.0 * 6250.0,
                                   rtol=1e-5)

    def test_bt_flux_matching(self):
        """Newton adjustment makes column-summed fluxes match uhbt."""
        G, GV = make_setup()
        rng = np.random.default_rng(2)
        h = jnp.asarray(100.0 + 10.0 * rng.standard_normal((3, 16, 16)),
                        jnp.float32)
        u = jnp.asarray(0.1 * rng.standard_normal((3, 16, 16)), jnp.float32)
        uhbt = jnp.asarray(1e4 * rng.standard_normal((16, 16)), jnp.float32)
        uh, _ = zonal_mass_flux(u, h, 600.0, G, uhbt=uhbt)
        got = np.asarray(jnp.sum(uh, axis=0))
        np.testing.assert_allclose(got, np.asarray(uhbt), atol=3e-1)

    def test_walls_block_flux(self):
        depth = np.full((16, 16), 1000.0)
        depth[:, 8] = 0.0  # a meridional wall of land
        G, GV = make_setup(cyclic=True, depth=depth)
        h = jnp.full((1, 16, 16), 100.0, jnp.float32)
        u = jnp.full((1, 16, 16), 0.5, jnp.float32)
        v = jnp.zeros_like(u)
        _, uh, _, _, _ = continuity_ppm(u, v, h, 600.0, G, GV)
        # faces adjacent to land must carry no flux
        assert float(jnp.max(jnp.abs(uh[:, :, 7:9]))) == 0.0


class TestCoriolis:
    def test_solid_rotation_vorticity(self):
        G, GV = make_setup()
        # u = -omega*y, v = omega*x => zeta = 2*omega (away from wrap seam)
        omega = 1e-5
        y = np.asarray(G.geoLatBu) * 1e3
        x = np.asarray(G.geoLonBu) * 1e3
        u = jnp.asarray(-omega * (y - y.mean()), jnp.float32)[None]
        v = jnp.asarray(omega * (x - x.mean()), jnp.float32)[None]
        zeta = np.asarray(relative_vorticity(u, v, G))[0]
        np.testing.assert_allclose(zeta[4:-4, 4:-4], 2 * omega, rtol=1e-2)

    def test_energy_conservation_sadourny(self):
        """Sadourny-energy PV flux does no net work: sum(u*CAu*h_u*A) ~ 0
        (vortex force orthogonality) when KE gradient is excluded."""
        G, GV = make_setup()
        rng = np.random.default_rng(3)
        shape = (2, 16, 16)
        h = jnp.asarray(100.0 + 5.0 * rng.standard_normal(shape), jnp.float32)
        u = jnp.asarray(0.1 * rng.standard_normal(shape), jnp.float32)
        v = jnp.asarray(0.1 * rng.standard_normal(shape), jnp.float32)
        uh = u * 0.5 * (h + jnp.roll(h, -1, -1)) * G.dyCu
        vh = v * 0.5 * (h + jnp.roll(h, -1, -2)) * G.dxCv
        cau, cav = coriolis_adv(u, v, h, uh, vh, G, GV)
        # remove the KE gradient part (it integrates to zero against
        # divergence-free transport only; test the PV part exactly)
        from mom6_tpu.core.coriolis_adv import kinetic_energy
        from mom6_tpu.framework.stencil import ip1, jp1
        ke = kinetic_energy(u, v, G)
        cau_pv = cau + (ip1(ke) - ke) * G.IdxCu
        cav_pv = cav + (jp1(ke) - ke) * G.IdyCv
        # energy tendency: sum over u,v points of transport * accel * dx
        work = (jnp.sum(uh * cau_pv * G.dxCu, dtype=jnp.float64)
                + jnp.sum(vh * cav_pv * G.dyCv, dtype=jnp.float64))
        scale = (jnp.sum(jnp.abs(uh * cau_pv * G.dxCu), dtype=jnp.float64)
                 + jnp.sum(jnp.abs(vh * cav_pv * G.dyCv), dtype=jnp.float64))
        assert abs(float(work)) < 1e-5 * float(scale)


class TestPressureForce:
    def test_resting_state_no_force(self):
        G, GV = make_setup(cyclic=False)
        from mom6_tpu.core.state import init_state_resting
        st = init_state_resting(G, GV, [500.0, 500.0])
        pf = pressure_force_montgomery(st.h, G, GV)
        assert float(jnp.max(jnp.abs(pf.PFu))) < 1e-8
        assert float(jnp.max(jnp.abs(pf.PFv))) < 1e-8

    def test_ssh_gradient_force(self):
        """A free-surface tilt gives PF = -g * d(eta)/dx in every layer."""
        G, GV = make_setup(cyclic=False)
        nz, ny, nx = 2, 16, 16
        h = np.full((nz, ny, nx), 500.0)
        tilt = 0.1 * np.arange(nx) / nx  # eta rises eastward
        h[0] += tilt[None, :]
        h = jnp.asarray(h, jnp.float32)
        pf = pressure_force_montgomery(h, G, GV)
        deta_dx = (0.1 / nx) / 6250.0
        want = -9.8 * deta_dx
        got = np.asarray(pf.PFu)[:, 8, 5]
        np.testing.assert_allclose(got, want, rtol=5e-3)  # f32 h rounding


class TestVertFriction:
    def test_momentum_conservation_no_drag(self):
        rng = np.random.default_rng(4)
        h = jnp.asarray(50.0 + 10 * np.abs(rng.standard_normal((4, 8, 8))),
                        jnp.float32)
        u = jnp.asarray(rng.standard_normal((4, 8, 8)), jnp.float32)
        c = vertvisc_coef(h, kv=1e-2, bottom_drag=0.0)
        u_new = vertvisc(u, h, c, dt=3600.0)
        mom0 = np.asarray(jnp.sum(h * u, axis=0), np.float64)
        mom1 = np.asarray(jnp.sum(h * u_new, axis=0), np.float64)
        np.testing.assert_allclose(mom1, mom0, rtol=1e-4, atol=1e-4)

    def test_diffusion_smooths(self):
        h = jnp.full((4, 4, 4), 100.0, jnp.float32)
        u = jnp.zeros((4, 4, 4), jnp.float32).at[0].set(1.0)
        c = vertvisc_coef(h, kv=1.0)
        u_new = vertvisc(u, h, c, dt=36000.0)
        assert float(u_new[0, 0, 0]) < 1.0
        assert float(u_new[1, 0, 0]) > 0.0

    def test_wind_accelerates_top(self):
        h = jnp.full((3, 4, 4), 100.0, jnp.float32)
        u = jnp.zeros((3, 4, 4), jnp.float32)
        c = vertvisc_coef(h, kv=1e-4)
        tau = jnp.full((4, 4), 0.1, jnp.float32)
        u_new = vertvisc(u, h, c, dt=3600.0, tau=tau, rho0=1000.0)
        # du = tau/(rho*h)*dt
        np.testing.assert_allclose(float(u_new[0, 0, 0]),
                                   0.1 / (1000 * 100) * 3600, rtol=1e-3)

    def test_visc_rem_bounds(self):
        h = jnp.full((4, 4, 4), 100.0, jnp.float32)
        c = vertvisc_coef(h, kv=1e-3, bottom_drag=1e-3)
        rem = vertvisc_remnant(h, c, dt=3600.0)
        r = np.asarray(rem)
        assert np.all(r >= 0.0) and np.all(r <= 1.0)
        assert r[-1, 0, 0] < r[0, 0, 0]  # bottom layer loses more


class TestBarotropic:
    def test_geostrophic_adjustment_conserves_volume(self):
        G, GV = make_setup(cyclic=True, f0=1e-4)
        nz, ny, nx = 2, 16, 16
        rng = np.random.default_rng(5)
        h = np.full((nz, ny, nx), 500.0)
        h[0] += 1.0 * rng.standard_normal((ny, nx))
        h = jnp.asarray(h, jnp.float32)
        u = jnp.zeros((nz, ny, nx), jnp.float32)
        zero3 = jnp.zeros_like(u)
        eta = find_eta(h, G)
        pf = pressure_force_montgomery(h, G, GV)
        nstep, _ = set_dtbt(G, GV, 1000.0, 600.0)
        params = BTParams(nstep=nstep, nfilter=2)
        # eta_PF = 0 (flat reference): the eta perturbation then drives an
        # anomalous barotropic pressure force and gravity waves radiate
        out = btstep(u, u, eta, zero3, zero3, h, zero3, zero3,
                     jnp.ones_like(u), jnp.ones_like(u), pf.pbce,
                     jnp.zeros_like(eta), 600.0, G, GV, params)
        # volume change implied by the mean transports must telescope to zero
        div = ((out.uhbt_av - jnp.roll(out.uhbt_av, 1, -1))
               + (out.vhbt_av - jnp.roll(out.vhbt_av, 1, -2)))
        total = float(np.asarray(div, np.float64).sum())
        scale = float(np.abs(np.asarray(out.uhbt_av, np.float64)).sum()
                      + np.abs(np.asarray(out.vhbt_av, np.float64)).sum())
        assert abs(total) < 1e-6 * max(scale, 1.0)  # f32-roundoff-level
        # eta evolves (waves radiate)
        assert float(jnp.max(jnp.abs(out.eta_out - eta))) > 0.0

    def test_flat_state_stays_at_rest(self):
        G, GV = make_setup(cyclic=False)
        from mom6_tpu.core.state import init_state_resting
        st = init_state_resting(G, GV, [500.0, 500.0])
        eta = find_eta(st.h, G)
        pf = pressure_force_montgomery(st.h, G, GV)
        zero3 = jnp.zeros_like(st.u)
        params = BTParams(nstep=20, nfilter=2)
        out = btstep(st.u, st.v, eta, zero3, zero3, st.h, zero3, zero3,
                     jnp.ones_like(st.u), jnp.ones_like(st.v),
                     pf.pbce, pf.eta_PF, 600.0, G, GV, params)
        assert float(jnp.max(jnp.abs(out.ubt_av))) < 1e-10
        assert float(jnp.max(jnp.abs(out.eta_out - eta))) < 1e-6
