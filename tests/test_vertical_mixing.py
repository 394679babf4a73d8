"""Vertical mixing suite tests: KPP boundary layer, shear mixing, ePBL."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.eos import get_eos
from mom6_tpu.physics.vertical.kpp import KPPParams, kpp_diffusivity
from mom6_tpu.physics.vertical.shear_mixing import (ShearMixingParams,
                                                    richardson_number,
                                                    shear_mixing_kd)
from mom6_tpu.physics.vertical.epbl import EPBLParams, epbl_diffusivity


def setup(nz=10, mixed_layer=False):
    G = build_cartesian_grid(8, 8, 100.0, 100.0, max_depth=1000.0,
                             cyclic_x=True, reentrant_y=True,
                             dtype=jnp.float32)
    GV = build_layered_vgrid(nz)
    eos = get_eos("WRIGHT")
    dz = 1000.0 / nz
    h = jnp.full((nz, 8, 8), dz, jnp.float32)
    zc = np.cumsum(np.full(nz, dz)) - dz / 2
    if mixed_layer:
        # near-neutral upper ocean over a thermocline: the boundary layer
        # then spans several model interfaces
        T0 = np.where(zc < 300.0, 16.0, 16.0 - 0.02 * (zc - 300.0))
    else:
        T0 = 4.0 + 16.0 * np.exp(-zc / 300.0)
    T = jnp.asarray(np.broadcast_to(T0[:, None, None], (nz, 8, 8)),
                    jnp.float32)
    S = jnp.full((nz, 8, 8), 35.0, jnp.float32)
    return G, GV, eos, h, T, S


class TestKPP:
    def test_stronger_wind_deeper_bld(self):
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        u = jnp.zeros_like(h)
        v = jnp.zeros_like(h)
        z = jnp.zeros((8, 8), jnp.float32)
        kd1, hbl1, _ = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                       z + 0.05, z, None)
        kd2, hbl2, _ = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                       z + 0.8, z, None)
        assert float(hbl2.mean()) > float(hbl1.mean())
        assert float(kd2.max()) > float(kd1.max())
        assert float(kd1.min()) >= 0.0

    def test_cooling_deepens_bld(self):
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        u = v = jnp.zeros_like(h)
        z = jnp.zeros((8, 8), jnp.float32)
        tau = z + 0.1
        _, hbl_neutral, _ = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                            tau, z, None)
        _, hbl_cool, _ = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                         tau, z, z - 500.0)  # strong cooling
        assert float(hbl_cool.mean()) > float(hbl_neutral.mean())

    def test_kd_shape_and_bounds(self):
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        u = v = jnp.zeros_like(h)
        z = jnp.zeros((8, 8), jnp.float32)
        kd, hbl, _ = kpp_diffusivity(h, u, v, T, S, G, GV, eos, z + 0.2, z,
                                     None)
        assert kd.shape == (26, 8, 8)
        k = np.asarray(kd)
        assert (k >= 0.0).all() and k.max() < 1.0
        assert np.allclose(k[0], 0.0) and np.allclose(k[-1], 0.0)


class TestShear:
    def test_richardson_number(self):
        G, GV, eos, h, T, S = setup(nz=5)
        # strong shear -> low Ri
        u = jnp.zeros_like(h).at[0].set(1.0)
        v = jnp.zeros_like(h)
        ri = richardson_number(h, u, v, T, S, GV, eos)
        assert ri.shape == (4, 8, 8)
        assert float(ri[0].mean()) < float(ri[-1].mean())

    def test_lmd94_cutoff(self):
        G, GV, eos, h, T, S = setup(nz=5)
        u_sheared = jnp.zeros_like(h).at[0].set(5.0)
        kd_shear = shear_mixing_kd(h, u_sheared, jnp.zeros_like(h), T, S,
                                   G, GV, eos)
        kd_calm = shear_mixing_kd(h, jnp.zeros_like(h), jnp.zeros_like(h),
                                  T, S, G, GV, eos)
        assert float(kd_shear.max()) > 1e-4
        assert float(kd_calm.max()) < 1e-6  # stratified, no shear

    def test_pp81(self):
        G, GV, eos, h, T, S = setup(nz=5)
        u = jnp.zeros_like(h).at[0].set(1.0)
        kd = shear_mixing_kd(h, u, jnp.zeros_like(h), T, S, G, GV, eos,
                             ShearMixingParams(scheme="PP81"))
        assert float(kd.max()) > 0.0


class TestEPBL:
    def test_wind_scaling(self):
        G, GV, eos, h, T, S = setup()
        z = jnp.zeros((8, 8), jnp.float32)
        kd1, mld1 = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.05, z, None)
        kd2, mld2 = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.8, z, None)
        assert float(mld2.mean()) > float(mld1.mean())

    def test_convection_deepens(self):
        G, GV, eos, h, T, S = setup()
        z = jnp.zeros((8, 8), jnp.float32)
        _, mld_n = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.1, z, None)
        _, mld_c = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.1, z,
                                    z - 800.0)
        assert float(mld_c.mean()) > float(mld_n.mean())

    def test_bounds(self):
        G, GV, eos, h, T, S = setup()
        z = jnp.zeros((8, 8), jnp.float32)
        kd, mld = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.3, z, z - 100.0)
        k = np.asarray(kd)
        assert (k >= 0).all() and k.max() <= 0.1 + 1e-6
        m = np.asarray(mld)
        assert (m >= 1.0).all() and (m <= 1000.0).all()


class TestKappaShear:
    def _sheared(self, u_top=1.0, nz=10):
        G, GV, eos, h, T, S = setup(nz=nz, mixed_layer=True)
        u = jnp.zeros_like(h).at[0:2].set(u_top)
        v = jnp.zeros_like(h)
        return G, GV, eos, h, T, S, u, v

    def test_mixing_only_when_supercritical(self):
        from mom6_tpu.physics.vertical.kappa_shear import kappa_shear
        G, GV, eos, h, T, S, u, v = self._sheared(u_top=2.0)
        kd, tke = kappa_shear(h, u, v, T, S, G, GV, eos)
        assert float(kd.max()) > 1e-5        # strong shear mixes
        kd0, _ = kappa_shear(h, jnp.zeros_like(u), v, T, S, G, GV, eos)
        assert float(kd0.max()) < 1e-8       # no shear, no mixing

    def test_self_limitation_saturates_with_dt(self):
        """The defining JHL property: kappa co-evolves with the profiles
        it mixes, so the total applied mixing kappa*dt grows
        SUBLINEARLY with dt (an instantaneous Ri closure gives exactly
        proportional growth: its kappa is dt-independent)."""
        from mom6_tpu.physics.vertical.kappa_shear import (KappaShearParams,
                                                           kappa_shear)
        G, GV, eos, h, T, S = setup(nz=10, mixed_layer=False)
        u = jnp.zeros_like(h).at[0:2].set(2.0)
        v = jnp.zeros_like(h)
        p = KappaShearParams(n_outer=8, kappa_max=10.0)
        kd_short, _ = kappa_shear(h, u, v, T, S, G, GV, eos, p, dt=1e3)
        kd_long, _ = kappa_shear(h, u, v, T, S, G, GV, eos, p, dt=1e4)
        tot_short = float(kd_short.max()) * 1e3
        tot_long = float(kd_long.max()) * 1e4
        assert float(kd_short.max()) > 0.1      # the shear does mix
        # ... but by the long step the driving shear has been consumed
        # and the scheme has shut itself off (measured r3: kappa -> 0)
        assert tot_long < 5.0 * tot_short, (tot_short, tot_long)
        assert float(kd_long.min()) >= 0.0

    def test_unstratified_shear_layer_quantitative(self):
        """Quantitative JHL: for an unstratified constant-shear column
        (N^2=0, f=0) the steady kappa equation reduces to
        kappa'' - kappa/L_bdry^2 + K_src = 0 with
        K_src = 2*SHEARMIX_RATE*|S| and 1/L_bdry = 1/z + 1/(H-z).
        Compare the model's mid-depth kappa against an independent
        scipy BVP solve of the same ODE (<10%), and the TKE against the
        interior decay balance Q ~ kappa |S| / C_S (<30%)."""
        import dataclasses
        from scipy.integrate import solve_bvp
        from mom6_tpu.physics.vertical.kappa_shear import (
            KappaShearParams, kappa_shear)
        G, GV, eos, h, T, S = setup(nz=40, mixed_layer=False)
        G = dataclasses.replace(
            G, CoriolisBu=jnp.zeros_like(G.CoriolisBu))
        nz = 40
        Hcol = float(np.asarray(h).sum(0)[4, 4])
        T = jnp.full_like(h, 10.0)          # unstratified
        S = jnp.full_like(h, 35.0)
        shear = 1.0e-2                      # du/dz [s-1]
        zc = np.cumsum(np.asarray(h)[:, 4, 4]) - np.asarray(h)[:, 4, 4] / 2
        u = jnp.asarray(np.broadcast_to(
            (shear * zc)[:, None, None], h.shape), jnp.float32)
        p = KappaShearParams(n_outer=1, kappa_max=1e9)
        kd, tke = kappa_shear(h, u, jnp.zeros_like(h), T, S, G, GV, eos,
                              p, dt=1e-3)
        k_src = 2.0 * p.shearmix_rate * shear

        def ode(z, y):
            il2 = (1.0 / np.maximum(z, 1e-3)
                   + 1.0 / np.maximum(Hcol - z, 1e-3)) ** 2
            return np.vstack([y[1], il2 * y[0] - k_src])

        zg = np.linspace(1e-3, Hcol - 1e-3, 200)
        sol = solve_bvp(ode, lambda a, b: np.array([a[0], b[0]]),
                        zg, np.zeros((2, zg.size)), max_nodes=20000)
        k_mid_ref = float(sol.sol(Hcol / 2)[0])
        k_mid = float(np.asarray(kd)[nz // 2, 4, 4])
        assert abs(k_mid / k_mid_ref - 1.0) < 0.1, (k_mid, k_mid_ref)
        q_mid = float(np.asarray(tke)[nz // 2, 4, 4])
        q_bal = k_mid * shear / p.c_s
        assert abs(q_mid / q_bal - 1.0) < 0.3, (q_mid, q_bal)

    def test_subcritical_silent(self):
        from mom6_tpu.physics.vertical.kappa_shear import kappa_shear
        G, GV, eos, h, T, S = setup(nz=10, mixed_layer=False)
        u = jnp.zeros_like(h).at[0].set(0.6)   # Ri ~ 1.7 > critical
        kd, _ = kappa_shear(h, u, jnp.zeros_like(h), T, S, G, GV, eos)
        assert float(kd.max()) == 0.0


class TestKPPNonlocal:
    def test_nonlocal_active_only_under_cooling(self):
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        u = v = jnp.zeros_like(h)
        z = jnp.zeros((8, 8), jnp.float32)
        _, _, nlt_warm = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                         z + 0.1, z, z + 200.0)
        _, _, nlt_cool = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                         z + 0.1, z, z - 200.0)
        assert float(jnp.abs(nlt_warm).max()) == 0.0
        assert float(nlt_cool.max()) > 0.1

    def test_nonlocal_redistribution_conserves(self):
        from mom6_tpu.physics.vertical.kpp import apply_nonlocal_transport
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        u = v = jnp.zeros_like(h)
        z = jnp.zeros((8, 8), jnp.float32)
        _, _, nlt = kpp_diffusivity(h, u, v, T, S, G, GV, eos,
                                    z + 0.1, z, z - 200.0)
        sfc = jnp.full((8, 8), -1e-5, jnp.float32)   # cooling flux
        T2 = apply_nonlocal_transport(T, h, nlt, sfc, 3600.0)
        # column heat content unchanged (pure redistribution)
        c0 = np.asarray(jnp.sum(T * h, axis=0))
        c1 = np.asarray(jnp.sum(T2 * h, axis=0))
        np.testing.assert_allclose(c1, c0, rtol=2e-6)
        # nonlocal moves part of the surface cooling DEEPER: the top layer
        # is warmed back relative to the purely local application while
        # subsurface layers take up the cooling
        assert float((T2[0] - T[0]).min()) > 0.0
        assert float((T2[1:] - T[1:]).min()) < 0.0

    def test_surface_layer_averaging_differs_from_top_layer(self):
        from mom6_tpu.physics.vertical.kpp import _surface_layer_means
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=False)
        z_c = jnp.cumsum(h, axis=0) - 0.5 * h
        b = -9.8 / 1035.0 * eos.density(T, S, jnp.zeros_like(T),
                                        rho_ref=1035.0)
        refs = _surface_layer_means(z_c, h, (b,), 0.1)
        b_ref = refs[0]
        # deep levels average over a thick surface layer: the reference
        # differs from the raw top-layer value
        assert not np.allclose(np.asarray(b_ref[-1]), np.asarray(b[0]))
        # but the shallowest level's reference IS the top layer
        np.testing.assert_allclose(np.asarray(b_ref[0]),
                                   np.asarray(b[0]), rtol=1e-5)


class TestEPBLRH18:
    def test_mstar_schemes(self):
        from mom6_tpu.physics.vertical.epbl import EPBLParams, find_mstar
        b = jnp.zeros((4, 4), jnp.float32)
        us = jnp.full((4, 4), 0.01, jnp.float32)
        f = jnp.full((4, 4), 1e-4, jnp.float32)
        bld = jnp.full((4, 4), 50.0, jnp.float32)
        m_fix = find_mstar(b, us, bld, f, EPBLParams(mstar_scheme="FIXED"))
        assert float(m_fix.mean()) == pytest.approx(1.2)
        m_rh = find_mstar(b, us, bld, f, EPBLParams(mstar_scheme="RH18"))
        # RH18 neutral limit: cn1 * M/(1+M) <= cn1 = 0.275
        assert 0.0 < float(m_rh.mean()) <= 0.275 + 1e-6
        # stabilizing buoyancy flux adds mstar_S
        m_stab = find_mstar(b + 1e-7, us, bld, f,
                            EPBLParams(mstar_scheme="RH18"))
        assert float(m_stab.mean()) > float(m_rh.mean())

    def test_rotation_shuts_down_mstar(self):
        from mom6_tpu.physics.vertical.epbl import EPBLParams, find_mstar
        b = jnp.zeros((4, 4), jnp.float32)
        us = jnp.full((4, 4), 0.01, jnp.float32)
        bld = jnp.full((4, 4), 100.0, jnp.float32)
        p = EPBLParams(mstar_scheme="RH18")
        m_slow = find_mstar(b, us, bld, jnp.full((4, 4), 1e-5, jnp.float32), p)
        m_fast = find_mstar(b, us, bld, jnp.full((4, 4), 2e-4, jnp.float32), p)
        assert float(m_fast.mean()) < float(m_slow.mean())

    def test_convection_deepens_mld_and_scales(self):
        G, GV, eos, h, T, S = setup(nz=25, mixed_layer=True)
        z = jnp.zeros((8, 8), jnp.float32)
        _, mld_n = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.1, z, None)
        _, mld_c = epbl_diffusivity(h, T, S, G, GV, eos, z + 0.1, z,
                                    z - 800.0)
        assert float(mld_c.mean()) > float(mld_n.mean())
