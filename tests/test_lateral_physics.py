"""Lateral parameterization suite tests: GM thickness diffusion, VarMix,
wave speed, MEKE, mixed-layer restratification, isopycnal slopes."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.eos import get_eos
from mom6_tpu.core.isopycnal_slopes import isopycnal_slopes
from mom6_tpu.diagnostics.wave_speed import wave_speed_wkb
from mom6_tpu.physics.lateral.lateral_mixing_coeffs import (
    VarMixParams, calc_resoln_function, calc_slope_functions)
from mom6_tpu.physics.lateral.thickness_diffuse import (GMParams,
                                                        thickness_diffuse)
from mom6_tpu.physics.lateral.meke import (MEKEParams, meke_diffusivity,
                                           step_meke)
from mom6_tpu.physics.lateral.mixed_layer_restrat import (MLRestratParams,
                                                          mixedlayer_restrat)


def setup(nx=16, ny=16, nz=4):
    G = build_cartesian_grid(nx, ny, 400.0, 400.0, max_depth=2000.0,
                             cyclic_x=True, reentrant_y=True, f0=1e-4,
                             dtype=jnp.float32)
    GV = build_layered_vgrid(nz)
    eos = get_eos("WRIGHT")
    return G, GV, eos


class TestGM:
    def test_flattens_interface_bump_conserving(self):
        G, GV, eos = setup()
        nz = 4
        h = np.full((nz, 16, 16), 500.0)
        # interior interface bump: layer 1 thin / layer 2 thick at center
        bump = 100.0 * np.exp(-((np.arange(16) - 8) ** 2)[None, :] / 8.0
                              - ((np.arange(16) - 8) ** 2)[:, None] / 8.0)
        h[1] -= bump
        h[2] += bump
        h = jnp.asarray(h, jnp.float32)
        var0 = float(jnp.var(h[1]))
        vol0 = float(np.asarray(jnp.sum(h, 0), np.float64).sum())
        h_new, uhd, vhd = thickness_diffuse(h, G, GV, 3600.0,
                                            GMParams(khth=1000.0))
        var1 = float(jnp.var(h_new[1]))
        vol1 = float(np.asarray(jnp.sum(h_new, 0), np.float64).sum())
        assert var1 < var0                       # interfaces flatten
        assert abs(vol1 - vol0) / vol0 < 1e-6    # column volume conserved
        # per-column volume conserved too (streamfunction form)
        col_diff = np.abs(np.asarray(jnp.sum(h_new - h, 0)))
        assert col_diff.max() < 1e-3

    def test_flat_interfaces_no_flux(self):
        G, GV, eos = setup()
        h = jnp.full((4, 16, 16), 500.0, jnp.float32)
        h_new, uhd, vhd = thickness_diffuse(h, G, GV, 3600.0, GMParams())
        assert float(jnp.max(jnp.abs(uhd))) < 1e-6
        np.testing.assert_allclose(np.asarray(h_new), 500.0, rtol=1e-6)


class TestWaveSpeedVarMix:
    def test_wave_speed_increases_with_stratification(self):
        G, GV, eos = setup()
        nz = 8
        h = jnp.full((nz, 16, 16), 250.0, jnp.float32)
        zc = np.cumsum(np.full(nz, 250.0)) - 125.0
        T_weak = jnp.asarray(np.broadcast_to(
            (10.0 - 0.001 * zc)[:, None, None], (nz, 16, 16)), jnp.float32)
        T_strong = jnp.asarray(np.broadcast_to(
            (20.0 - 0.008 * zc)[:, None, None], (nz, 16, 16)), jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        c_weak = wave_speed_wkb(h, T_weak, S, G, GV, eos)
        c_strong = wave_speed_wkb(h, T_strong, S, G, GV, eos)
        assert float(c_strong.mean()) > float(c_weak.mean()) > 0.0
        # typical ocean c1 is O(1-3 m/s)
        assert 0.1 < float(c_strong.mean()) < 10.0

    def test_resolution_function_limits(self):
        """Res_fn -> 1 where the deformation radius is unresolved
        (large f -> small Ld), -> 0 where resolved; matches the exact
        power-2 form dx_term/(dx_term + (coef*cg1)^2) on an f-plane
        (beta = 0 there, so dx_term = f^2 dx^2)."""
        import dataclasses
        G, GV, eos = setup()
        p = VarMixParams()
        c1 = jnp.full((16, 16), 2.0, jnp.float32)
        f_big = jnp.full_like(G.CoriolisBu, 1e-4)
        G_coarse = dataclasses.replace(G, CoriolisBu=f_big)
        res_coarse = calc_resoln_function(c1, G_coarse, p)
        G_fine = dataclasses.replace(G, CoriolisBu=f_big * 1e-2)
        res_fine = calc_resoln_function(c1, G_fine, p)
        assert float(res_fine.mean()) < float(res_coarse.mean())
        r = np.asarray(res_coarse)
        assert (r >= 0).all() and (r <= 1).all()
        dx2 = float(np.asarray(G.dxT)[0, 0]) ** 2
        expect = (1e-8 * dx2) / (1e-8 * dx2 + 4.0)
        np.testing.assert_allclose(r[4, 4], expect, rtol=1e-5)

    def test_slope_functions_tilted_interface(self):
        """SN_u matches the analytic vertical-mean S*N for a uniformly
        tilted internal interface in a 2-layer column."""
        from mom6_tpu.grid.vertical import build_layered_vgrid
        G, GV, eos = setup()
        GV2 = build_layered_vgrid(2, gprime_int=0.02)
        ny = nx = 16
        # interface tilted in x: e1 = -500 + slope * x
        slope = 1e-3
        dx = float(np.asarray(G.dxT)[0, 0])
        x = (np.arange(nx) + 0.5) * dx
        e1 = -500.0 + slope * (x - x.mean())
        h1 = np.broadcast_to(1000.0 + e1, (ny, nx))
        h = np.stack([h1, 2000.0 - h1])
        sn_u, sn_v = calc_slope_functions(
            jnp.asarray(h, jnp.float32), G, GV2, VarMixParams())
        # N^2 = g'/max(Hdn,Hup); Hdn=Hup=harmonic ~ arithmetic here
        hd = 2 * h[0] * h[1] / (h[0] + h[1])
        n2 = 0.02 / hd.max()
        expect = np.sqrt(hd.mean() * slope ** 2 * n2 / 2000.0)
        meas = float(np.asarray(sn_u)[8, 7])
        assert abs(meas / expect - 1.0) < 0.1, (meas, expect)
        # the v-face S2 carries the transverse (x) slope through the
        # 4-corner mean, so sn_v ~ sn_u for this isotropy-sampled tilt
        meas_v = float(np.asarray(sn_v)[8, 7])
        assert abs(meas_v / expect - 1.0) < 0.15, (meas_v, expect)


class TestIsoSlopes:
    def test_flat_isopycnals_zero_slope(self):
        G, GV, eos = setup()
        nz = 4
        h = jnp.full((nz, 16, 16), 500.0, jnp.float32)
        zc = np.cumsum(np.full(nz, 500.0)) - 250.0
        T = jnp.asarray(np.broadcast_to((15.0 - 0.005 * zc)[:, None, None],
                                        (nz, 16, 16)), jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        sx, sy = isopycnal_slopes(h, T, S, G, GV, eos)
        assert float(jnp.max(jnp.abs(sx))) < 1e-6

    def test_tilted_density_gives_slope(self):
        G, GV, eos = setup()
        nz = 4
        h = jnp.full((nz, 16, 16), 500.0, jnp.float32)
        zc = np.cumsum(np.full(nz, 500.0)) - 250.0
        x = np.arange(16)
        T0 = (15.0 - 0.005 * zc)[:, None, None] + 0.01 * x[None, None, :]
        T = jnp.asarray(np.broadcast_to(T0, (nz, 16, 16)), jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        sx, sy = isopycnal_slopes(h, T, S, G, GV, eos)
        s = np.asarray(sx)
        # slope = -(drho/dx)/(drho/dz); warmer east = lighter east =>
        # isopycnals deepen eastward: sign and reasonable magnitude
        assert np.abs(s[1:3, 4:12, 4:12]).min() > 1e-7
        assert np.abs(s).max() <= 0.01 + 1e-9


class TestMEKE:
    def test_energy_budget(self):
        G, GV, eos = setup()
        h = jnp.full((4, 16, 16), 500.0, jnp.float32)
        E0 = jnp.zeros((16, 16), jnp.float32)
        src = jnp.full((16, 16), 1e-7, jnp.float32)
        E1 = step_meke(E0, src, h, G, 3600.0)
        assert float(E1.mean()) > 0.0
        # without source, E decays
        E2 = step_meke(E1, jnp.zeros_like(src), h, G, 1e6,
                       MEKEParams(damping=1e-5))
        assert float(E2.mean()) < float(E1.mean())
        kh = meke_diffusivity(E1)
        assert float(kh.min()) >= 0.0 and float(kh.max()) <= 2000.0


class TestMLRestrat:
    def test_restratification_lowers_pe_and_conserves(self):
        G, GV, eos = setup()
        nz = 6
        h = jnp.full((nz, 16, 16), 50.0, jnp.float32)  # 300 m of ML-ish water
        x = np.arange(16)
        # a buoyancy front in the upper layers
        T0 = np.broadcast_to(16.0 + 0.2 * x[None, None, :], (nz, 16, 16)).copy()
        T = jnp.asarray(T0, jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        mld = jnp.full((16, 16), 150.0, jnp.float32)
        h_new, uh, vh = mixedlayer_restrat(h, T, S, mld, G, GV, eos, 3600.0)
        # volume conserved per column
        col_diff = np.abs(np.asarray(jnp.sum(h_new - h, 0)))
        assert col_diff.max() < 1e-3
        # transports confined to the mixed layer (top 3 of 6 layers)
        u = np.asarray(uh)
        assert np.abs(u[:3]).max() > 0.0
        assert np.abs(u[4:]).max() <= np.abs(u[:3]).max() * 0.2 + 1e-6

    def test_no_front_no_transport(self):
        G, GV, eos = setup()
        h = jnp.full((4, 16, 16), 100.0, jnp.float32)
        T = jnp.full((4, 16, 16), 15.0, jnp.float32)
        S = jnp.full((4, 16, 16), 35.0, jnp.float32)
        mld = jnp.full((16, 16), 200.0, jnp.float32)
        _, uh, vh = mixedlayer_restrat(h, T, S, mld, G, GV, eos, 3600.0)
        assert float(jnp.max(jnp.abs(uh))) < 1e-4


class TestWaveSpeedEigen:
    def test_uniform_stratification_analytic(self):
        """Uniform N over depth H: c1 = N H / pi exactly (continuum)."""
        from mom6_tpu.diagnostics.wave_speed import wave_speed
        G, GV, eos = setup()
        nz = 20
        H = 2000.0
        h = jnp.full((nz, 16, 16), H / nz, jnp.float32)
        # linear T profile => constant N^2 (linear EOS)
        eos_lin = get_eos("LINEAR")
        zc = np.cumsum(np.full(nz, H / nz)) - H / nz / 2
        dTdz = 0.005
        T = jnp.asarray(np.broadcast_to((15.0 - dTdz * zc)[:, None, None],
                                        (nz, 16, 16)), jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        c1 = wave_speed(h, T, S, G, GV, eos_lin)
        n = np.sqrt(9.8 / 1035.0 * 0.2 * dTdz)
        want = n * H / np.pi
        got = float(np.asarray(c1)[8, 8])
        np.testing.assert_allclose(got, want, rtol=0.02)

    def test_eigen_vs_wkb(self):
        from mom6_tpu.diagnostics.wave_speed import wave_speed, wave_speed_wkb
        G, GV, eos = setup()
        nz = 16
        h = jnp.full((nz, 16, 16), 2000.0 / nz, jnp.float32)
        zc = np.cumsum(np.full(nz, 125.0)) - 62.5
        T = jnp.asarray(np.broadcast_to(
            (4.0 + 16.0 * np.exp(-zc / 700.0))[:, None, None],
            (nz, 16, 16)), jnp.float32)
        S = jnp.full((nz, 16, 16), 35.0, jnp.float32)
        c_e = float(np.asarray(wave_speed(h, T, S, G, GV, eos))[8, 8])
        c_w = float(np.asarray(wave_speed_wkb(h, T, S, G, GV, eos))[8, 8])
        # same ballpark; WKB is the high bound for surface-intensified N
        assert 0.5 * c_w < c_e < 1.2 * c_w
        assert 0.5 < c_e < 6.0


class TestZannaBolton:
    def test_rest_state_zero(self):
        from mom6_tpu.physics.lateral.zanna_bolton import zanna_bolton_accel
        G, GV, eos = setup()
        z = jnp.zeros((2, 16, 16), jnp.float32)
        h = jnp.full((2, 16, 16), 500.0, jnp.float32)
        du, dv = zanna_bolton_accel(z, z, h, G)
        assert float(jnp.max(jnp.abs(du))) == 0.0

    def test_momentum_conserved_and_quadratic(self):
        from mom6_tpu.physics.lateral.zanna_bolton import zanna_bolton_accel
        G, GV, eos = setup()
        rng = np.random.default_rng(0)
        u = jnp.asarray(0.1 * rng.standard_normal((2, 16, 16)), jnp.float32)
        v = jnp.asarray(0.1 * rng.standard_normal((2, 16, 16)), jnp.float32)
        h = jnp.full((2, 16, 16), 500.0, jnp.float32)
        du1, dv1 = zanna_bolton_accel(u, v, h, G)
        du2, dv2 = zanna_bolton_accel(2.0 * u, 2.0 * v, h, G)
        # quadratic in velocity
        np.testing.assert_allclose(np.asarray(du2), 4.0 * np.asarray(du1),
                                   rtol=1e-4, atol=1e-12)
        # momentum conserved (flux form, flat h, periodic)
        tot = abs(float(np.asarray(du1, np.float64).sum()))
        scale = float(np.abs(np.asarray(du1, np.float64)).sum()) + 1e-30
        assert tot < 1e-4 * scale


def test_meke_length_scales_and_budget():
    """Full MEKE machinery: gamma_b/gamma_t in [min_gamma, ~1], harmonic
    mixing length below each component scale, implicit drag damps E, and
    the friction source grows it (MEKE_lengthScales_0d /
    step_forward_MEKE parity)."""
    import jax.numpy as jnp
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.physics.lateral.meke import (MEKEParams,
                                               meke_diffusivity,
                                               meke_length_scales,
                                               meke_viscosity, step_meke)
    ny = nx = 8
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=800.0,
                             len_lat_km=800.0, max_depth=4000.0, f0=1e-4,
                             beta=2e-11)
    h = jnp.full((4, ny, nx), 1000.0, jnp.float32)
    E = jnp.full((ny, nx), 1e-2, jnp.float32)
    p = MEKEParams(cd_scale=0.0, cb=25.0, ct=50.0, a_deform=0.0,
                   a_grid=1.0, a_rhines=1.0, a_frict=1.0)
    b2, t2, lmix = meke_length_scales(E, h, G, p, rd_dx=0.5)
    assert float(jnp.min(b2)) >= p.min_gamma
    assert float(jnp.max(t2)) <= 1.0 + 1e-6
    l_grid = float(jnp.sqrt(G.areaT)[0, 0])
    assert float(jnp.max(lmix)) <= l_grid  # harmonic mean < min component
    # drag damps, friction source grows
    e_damp = step_meke(E, jnp.zeros_like(E), h, G, 86400.0,
                       p._replace(cd_scale=1.0))
    assert float(jnp.max(e_damp)) < float(jnp.max(E))
    e_src = step_meke(E, jnp.zeros_like(E), h, G, 86400.0, p,
                      src_mom=jnp.full_like(E, 1e-7))
    assert float(jnp.mean(e_src)) > float(jnp.mean(e_damp))
    # feedbacks
    kh = meke_diffusivity(E, p, h=h, G=G, rd_dx=0.5)
    assert float(jnp.max(kh)) > 0.0
    ku = meke_viscosity(E, p._replace(ku_coeff=0.2), h=h, G=G)
    assert ku is not None and float(jnp.max(ku)) > 0.0


def test_meke_backscatter_injects_energy():
    """A negative-viscosity coefficient increases resolved KE through
    hor_visc (the MEKE_VISCOSITY_COEFF_KU backscatter path)."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.physics.lateral.hor_visc import (HorViscParams,
                                                   horizontal_viscosity)
    rng = np.random.default_rng(5)
    ny = nx = 16
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=800.0,
                             len_lat_km=800.0, max_depth=1000.0)
    h = jnp.full((2, ny, nx), 500.0, jnp.float32)
    u = jnp.asarray(rng.normal(0, 0.1, (2, ny, nx)),
                    jnp.float32) * G.mask2dCu
    v = jnp.asarray(rng.normal(0, 0.1, (2, ny, nx)),
                    jnp.float32) * G.mask2dCv
    p = HorViscParams(kh=100.0, dt=600.0)
    du0, dv0 = horizontal_viscosity(u, v, h, G, p)
    ku = jnp.full((ny, nx), 500.0, jnp.float32)
    du1, dv1 = horizontal_viscosity(u, v, h, G, p, ku_backscatter=ku)
    w0 = float(jnp.sum(u * du0) + jnp.sum(v * dv0))   # < 0 (dissipative)
    w1 = float(jnp.sum(u * du1) + jnp.sum(v * dv1))
    assert w0 < 0.0
    assert w1 > w0          # net coefficient is negative -> energy input


class TestVarMixWiring:
    def test_tc1_varmix_honored_and_scales_gm(self):
        """tc1's USE_VARIABLE_MIXING/RESOLN_SCALED_*/VISBECK flags are
        parsed into MOMParams.varmix AND demonstrably change the
        solution (the resolution function + Visbeck term rescale the GM
        and tracer diffusivities inside step_mom)."""
        import os
        import jax
        from mom6_tpu.core.mom import step_mom
        from mom6_tpu.drivers.config_driver import build_model_from_params
        from mom6_tpu.framework.config import ParamFile
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pf = ParamFile([os.path.join(repo, "configs", "tc1", "MOM_input")])
        ms = build_model_from_params(pf)
        vm = ms.params.varmix
        assert vm is not None and vm.resoln_scaled_khth \
            and vm.khth_slope_cff == 0.1
        step_on = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid,
                                             ms.vgrid, ms.params))
        p_off = ms.params._replace(varmix=None)
        step_off = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid,
                                              ms.vgrid, p_off))
        s_on = s_off = ms.state
        for _ in range(4):
            s_on = step_on(s_on)
            s_off = step_off(s_off)
        assert np.isfinite(np.asarray(s_on.h)).all()
        dh = float(np.abs(np.asarray(s_on.h) - np.asarray(s_off.h)).max())
        assert dh > 0.0, "VarMix scaling must alter the GM transport"
