"""Round-2 EOS additions: WRIGHT_FULL, second-derivative API, TEOS-10
temperature conversions and freezing point (VERDICT.md item #7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.eos import get_eos


class TestWrightFull:
    def test_distinct_from_reduced(self):
        w = get_eos("WRIGHT")
        f = get_eos("WRIGHT_FULL")
        r = get_eos("WRIGHT_RED")
        rw = float(w.density(10.0, 35.0, 2e7))
        rf = float(f.density(10.0, 35.0, 2e7))
        rr = float(r.density(10.0, 35.0, 2e7))
        assert rw == rr                        # RED is the same fit
        assert abs(rf - rw) > 1e-4             # FULL is a different fit
        assert abs(rf - rw) < 0.1              # ... but close physically

    def test_surface_density_plausible(self):
        f = get_eos("WRIGHT_FULL")
        rho = float(f.density(10.0, 35.0, 0.0))
        assert 1026.0 < rho < 1028.0

    def test_derivs_match_autodiff(self):
        import jax
        f = get_eos("WRIGHT_FULL")
        T, S, p = 8.0, 34.0, 1e7
        dT, dS = f.density_derivs(T, S, p)
        gT = jax.grad(lambda t: f.density(t, S, p))(T)
        gS = jax.grad(lambda s: f.density(T, s, p))(S)
        assert float(abs(dT - gT)) < 1e-6
        assert float(abs(dS - gS)) < 1e-6


class TestSecondDerivs:
    @pytest.mark.parametrize("name", ["WRIGHT", "WRIGHT_FULL", "UNESCO",
                                      "ROQUET_RHO", "JACKETT06", "TEOS10"])
    def test_matches_finite_difference(self, name):
        # an f32 finite-difference reference is hopeless for second
        # derivatives of ~1e3-magnitude polynomial fits; evaluate both
        # sides in f64 for this comparison
        import jax
        with jax.enable_x64():
            e = get_eos(name)
            T = jnp.asarray(12.0, jnp.float64)
            S = jnp.asarray(34.5, jnp.float64)
            p = jnp.asarray(5e6, jnp.float64)
            d2_SS, d2_ST, d2_TT, d2_Sp, d2_Tp = \
                e.density_second_derivs(T, S, p)
            eps = 1e-3
            fd_TT = (e.density_derivs(T + eps, S, p)[0]
                     - e.density_derivs(T - eps, S, p)[0]) / (2 * eps)
            fd_SS = (e.density_derivs(T, S + eps, p)[1]
                     - e.density_derivs(T, S - eps, p)[1]) / (2 * eps)
            fd_ST = (e.density_derivs(T, S + eps, p)[0]
                     - e.density_derivs(T, S - eps, p)[0]) / (2 * eps)
            assert float(abs(d2_TT - fd_TT)) < 1e-4 * max(
                abs(float(fd_TT)), 1e-5)
            assert float(abs(d2_SS - fd_SS)) < 1e-3 * max(
                abs(float(fd_SS)), 1e-6)
            assert float(abs(d2_ST - fd_ST)) < 1e-3 * max(
                abs(float(fd_ST)), 1e-6)

    def test_linear_second_derivs_zero(self):
        e = get_eos("LINEAR")
        out = e.density_second_derivs(jnp.asarray(10.0), jnp.asarray(35.0),
                                      jnp.asarray(0.0))
        for v in out:
            assert float(abs(v)) < 1e-12


class TestTemperatureConvert:
    def test_roundtrip(self):
        from mom6_tpu.eos.temperature_convert import (constemp_to_potemp,
                                                      potemp_to_constemp)
        pt = jnp.asarray([-1.5, 0.0, 10.0, 25.0, 32.0])
        sa = jnp.asarray([34.0, 35.0, 35.0, 36.5, 30.0])
        ct = potemp_to_constemp(pt, sa)
        back = constemp_to_potemp(ct, sa)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pt),
                                   atol=5e-5)

    def test_known_offsets(self):
        # GSW check neighborhood: CT_from_pt(SA=34.7118, pt=28.7856) is
        # ~28.81 degC (the gsw toolbox check-value row); and CT ~ pt to
        # within a few hundredths at mid temperatures
        from mom6_tpu.eos.temperature_convert import potemp_to_constemp
        ct10 = float(potemp_to_constemp(jnp.asarray(10.0),
                                        jnp.asarray(35.0)))
        assert abs(ct10 - 10.0) < 0.05
        ct = float(potemp_to_constemp(jnp.asarray(28.7856),
                                      jnp.asarray(34.7118)))
        assert ct == pytest.approx(28.81, abs=0.02)

    def test_salinity_conversion_factor(self):
        from mom6_tpu.eos.temperature_convert import sp_from_sr, sr_from_sp
        sa = float(sr_from_sp(jnp.asarray(35.0)))
        assert sa == pytest.approx(35.16504, abs=1e-4)
        assert float(sp_from_sr(jnp.asarray(sa))) == pytest.approx(
            35.0, abs=1e-5)


class TestTFreeze:
    def test_teos_poly_check_value(self):
        # CT_freezing(SA=35 g/kg, p=0) ~ -1.907 degC (TEOS-10)
        from mom6_tpu.eos.tfreeze import tfreeze_teos_poly
        tf = float(tfreeze_teos_poly(jnp.asarray(35.0), jnp.asarray(0.0)))
        assert tf == pytest.approx(-1.907, abs=5e-3)

    def test_pressure_lowers_freezing(self):
        from mom6_tpu.eos.tfreeze import get_tfreeze
        for form in ("LINEAR", "MILLERO_78", "TEOS_POLY"):
            fn = get_tfreeze(form)
            t0 = float(fn(jnp.asarray(35.0), jnp.asarray(0.0)))
            t1 = float(fn(jnp.asarray(35.0), jnp.asarray(2e7)))
            assert t1 < t0

    def test_dispatch_unknown(self):
        from mom6_tpu.eos.tfreeze import get_tfreeze
        with pytest.raises(ValueError):
            get_tfreeze("NOPE")
