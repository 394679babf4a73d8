"""Coupler API + wave interface tests."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.drivers.experiments import thermo_gyre


def test_ocean_model_coupling_api():
    from mom6_tpu.drivers.ocean_model import OceanModel
    G, GV, state, params, forcing = thermo_gyre(nx=12, ny=12, nz=4,
                                                dt=1800.0)
    om = OceanModel(G, GV, state, params)
    sfc = om.update_ocean_model(taux=forcing.mech.taux,
                                heat_flux=forcing.buoy.heat_flux,
                                n_cycles=3)
    assert om.time_seconds == 3 * om.coupling_dt
    assert np.isfinite(np.asarray(sfc.sst)).all()
    assert float(sfc.speed.max()) > 0.0  # wind spun up a surface current
    # a second call continues from the evolved state
    sfc2 = om.update_ocean_model(taux=forcing.mech.taux, n_cycles=1)
    assert om.time_seconds == 4 * om.coupling_dt


def test_stokes_and_langmuir():
    from mom6_tpu.physics.waves import (WaveParams, langmuir_enhancement,
                                        langmuir_number,
                                        stokes_drift_profile)
    z = jnp.asarray([0.0, 5.0, 20.0, 80.0])
    us = np.asarray(stokes_drift_profile(10.0, z))
    assert abs(us[0] - 0.16) < 0.02       # ~1.6% of U10 at surface
    assert np.all(np.diff(us) < 0)        # decays with depth
    # typical ocean: u* ~ 0.01 m/s at U10=10 -> La_t ~ 0.25-0.4
    la = float(langmuir_number(jnp.asarray(0.012), u10=jnp.asarray(10.0),
                               p=WaveParams(method="EFACTOR")))
    assert 0.2 < la < 0.5
    f = float(langmuir_enhancement(jnp.asarray(la)))
    assert 1.5 < f < 5.0                  # substantial enhancement
    # windless limit: no enhancement blowup
    f0 = float(langmuir_enhancement(jnp.asarray(3.0)))
    assert 1.0 <= f0 < 1.1


def test_coare35_u10_inversion():
    """COARE 3.5 u*->U10 (ust_2_u10_coare3p5): at U10 = 10 m/s the drag
    coefficient is ~1.2e-3 (Edson et al. 2013 fig. 6), so the waterside
    u* = sqrt(Cd rho_a/rho_o) U10 ~ 0.012 m/s must invert back to ~10."""
    from mom6_tpu.physics.waves import WaveParams, ust_to_u10_coare3p5
    p = WaveParams()
    for cd, u10_true in ((1.1e-3, 7.0), (1.2e-3, 10.0), (1.6e-3, 15.0)):
        ust_w = np.sqrt(cd * p.rho_air / p.rho_ocn) * u10_true
        u10 = float(ust_to_u10_coare3p5(jnp.asarray(ust_w), p))
        assert abs(u10 - u10_true) / u10_true < 0.12, (u10, u10_true)
    # monotone in ustar
    u = np.asarray(ust_to_u10_coare3p5(jnp.asarray([0.005, 0.01, 0.02])))
    assert np.all(np.diff(u) > 0)


def test_lf17_langmuir_fully_developed_sea():
    """Li & Fox-Kemper 2017 statistical waves: for fully developed seas
    the turbulent Langmuir number is ~0.3 nearly independent of wind
    (Li et al. 2016 regime diagram; LF17 appendix).  Checked across a
    factor-6 range of u* with an OSBL-scaled averaging depth."""
    from mom6_tpu.physics.waves import stokes_sl_lf17
    las = []
    for ust, hbl in ((0.005, 30.0), (0.012, 50.0), (0.03, 80.0)):
        us_sl, la = stokes_sl_lf17(jnp.asarray(ust),
                                   jnp.asarray(0.04 * hbl))
        # the SL-averaged La runs higher than the surface La_t ~ 0.3
        assert 0.3 < float(la) < 0.55, (ust, float(la))
        assert float(us_sl) > 0.0
        las.append(float(la))
    # near-constant across a 6x wind range (the LF17 regime property)
    assert max(las) / min(las) < 1.2, las
    # deeper averaging -> weaker mean Stokes drift -> larger La
    _, la_shallow = stokes_sl_lf17(jnp.asarray(0.012), jnp.asarray(1.0))
    _, la_deep = stokes_sl_lf17(jnp.asarray(0.012), jnp.asarray(30.0))
    assert float(la_deep) > float(la_shallow)


def test_dhh85_profile():
    """DHH85 spectral Stokes drift: surface magnitude ~1-2% of the wave
    wind, monotone decay, e-folding within tens of meters."""
    from mom6_tpu.physics.waves import WaveParams, dhh85_stokes_profile
    p = WaveParams(method="DHH85", wave_wind=10.0)
    z = jnp.asarray([0.1, 1.0, 5.0, 10.0, 30.0])
    us = np.asarray(dhh85_stokes_profile(z, p))
    assert 0.05 < us[0] < 0.3, us[0]
    assert np.all(np.diff(us) < 0)
    assert us[-1] < 0.2 * us[0]


def test_surfband_layer_average_analytic():
    """SURFBANDS layer averaging matches the analytic integral of
    exp(2kz) over each layer (Update_Stokes_Drift :826-860)."""
    from mom6_tpu.physics.waves import surfband_stokes_profile
    k, us0, H = 0.02, 0.1, 12.0
    h = jnp.full((5, 1, 1), H)
    prof = np.asarray(surfband_stokes_profile(
        h, (us0,), (k,)))[:, 0, 0]
    tops = np.arange(5) * H
    exact = us0 * (np.exp(-2 * k * tops) - np.exp(-2 * k * (tops + H))) \
        / (2 * k * H)
    np.testing.assert_allclose(prof, exact, rtol=1e-5)


def test_sl_average_partial_cell():
    from mom6_tpu.physics.waves import sl_average_profile
    h = jnp.asarray([10.0, 10.0, 10.0])[:, None, None]
    prof = jnp.asarray([1.0, 0.5, 0.0])[:, None, None]
    # averaging depth 15 m: full first layer + half the second
    avg = np.asarray(sl_average_profile(prof, h, jnp.asarray([[15.0]])))
    np.testing.assert_allclose(avg, (10 * 1.0 + 5 * 0.5) / 15.0,
                               rtol=1e-6)
    # deeper than the column: divide by column depth
    avg2 = np.asarray(sl_average_profile(prof, h,
                                         jnp.asarray([[100.0]])))
    np.testing.assert_allclose(avg2, (10 + 5) / 30.0, rtol=1e-6)


def test_misalignment_increases_la():
    """Crosswise waves vs shear raise La by 1/sqrt(cos) (LA_MISALIGNMENT,
    get_Langmuir_Number :1224-1295)."""
    from mom6_tpu.physics.waves import WaveParams, langmuir_number
    nz = 4
    h = jnp.full((nz, 2, 2), 10.0)
    shear_u = jnp.zeros((nz, 2, 2)).at[0].set(0.2)   # +x surface shear
    v0 = jnp.zeros((nz, 2, 2))
    ust = jnp.full((2, 2), 0.01)
    hbl = jnp.full((2, 2), 40.0)
    base = WaveParams(method="SURFBANDS", band_stokes_x=(0.1,),
                      band_stokes_y=(0.0,), band_wavenumbers=(0.05,))
    la_aligned = langmuir_number(
        ust, hbl, base._replace(misalignment=True), h=h, u=shear_u, v=v0)
    la_plain = langmuir_number(ust, hbl, base, h=h, u=shear_u, v=v0)
    np.testing.assert_allclose(np.asarray(la_aligned),
                               np.asarray(la_plain), rtol=1e-5)
    cross = base._replace(misalignment=True, band_stokes_x=(0.0,),
                          band_stokes_y=(0.1,))
    la_cross = langmuir_number(ust, hbl, cross, h=h, u=shear_u, v=v0)
    assert np.all(np.asarray(la_cross) > 3.0 * np.asarray(la_plain))


def test_epbl_langmuir_mstar_structure():
    """ePBL m* enhancement from the convectively-modified Langmuir
    number (mstar_Langmuir, MOM_energetic_PBL.F90:3616-3706): identity
    at f=0, B=0; ~3x at La=0.3 with the 0.447 La^-1.33 fit; capped."""
    from mom6_tpu.physics.waves import (WaveParams,
                                        convective_langmuir_number,
                                        mstar_lt_enhancement)
    p = WaveParams()
    la = jnp.asarray(0.3)
    zero = jnp.asarray(0.0)
    la_c = convective_langmuir_number(la, zero, jnp.asarray(0.01),
                                      jnp.asarray(50.0), zero, p)
    np.testing.assert_allclose(float(la_c), 0.3, rtol=1e-6)
    enh = float(mstar_lt_enhancement(la_c, p))
    assert abs(enh - (1.0 + 0.447 * 0.3 ** -1.33)) < 1e-3
    assert 2.5 < enh < 4.0
    # strong-wave limit hits the cap
    assert float(mstar_lt_enhancement(jnp.asarray(0.01), p)) == 5.0
    # rotation shrinks La (LaC_MLD_Ek = -0.87, floored at -0.5)
    la_rot = convective_langmuir_number(
        la, zero, jnp.asarray(0.01), jnp.asarray(50.0),
        jnp.asarray(1e-4), p)
    assert float(la_rot) < float(la_c)


def test_epbl_lf17_deepens_mld():
    """Langmuir turbulence deepens the ePBL boundary layer under wind
    (the Li et al. 2016 regime: at La~0.3 mixing energy triples)."""
    import jax

    from mom6_tpu.drivers.experiments import thermo_gyre
    from mom6_tpu.physics.vertical.epbl import (EPBLParams,
                                                epbl_diffusivity)
    from mom6_tpu.physics.waves import WaveParams, make_la_fn
    from mom6_tpu.eos import get_eos

    G, GV, state, params, forcing = thermo_gyre(nx=8, ny=8, nz=10,
                                                dt=1800.0)
    eos = get_eos("LINEAR")
    # 10 m layers + stable stratification so the TKE budget, not the
    # grid, limits the MLD
    h10 = jnp.full_like(state.h, 10.0)
    z_c = jnp.cumsum(h10, axis=0) - 0.5 * h10
    state = state.replace(h=h10, T=20.0 - 0.001 * z_c)
    taux = jnp.full_like(G.mask2dT, 0.15)
    tauy = jnp.zeros_like(G.mask2dT)
    hf = jnp.zeros_like(G.mask2dT)
    ustar = jnp.sqrt(taux / GV.rho0)
    la_fn = make_la_fn(WaveParams(method="LF17"), ustar, h=state.h)
    # gentle TKE decay so the budget (not exponential extinction at this
    # 10 m resolution) sets the MLD — probes the m* sensitivity regime
    ep = EPBLParams(tke_decay=1.0)
    kd0, mld0 = epbl_diffusivity(state.h, state.T, state.S, G, GV, eos,
                                 taux, tauy, hf, p=ep)
    kd1, mld1 = epbl_diffusivity(state.h, state.T, state.S, G, GV, eos,
                                 taux, tauy, hf, p=ep, la_fn=la_fn)
    assert float(jnp.mean(mld1)) > 1.05 * float(jnp.mean(mld0)), \
        (float(jnp.mean(mld0)), float(jnp.mean(mld1)))
    assert float(jnp.max(kd1)) > float(jnp.max(kd0))
    # and the whole thing jits
    f = jax.jit(lambda h, T, S: epbl_diffusivity(
        h, T, S, G, GV, eos, taux, tauy, hf, p=ep, la_fn=la_fn)[1])
    assert np.isfinite(np.asarray(f(state.h, state.T, state.S))).all()
