"""Tracer subsystem tests: advection conservation/monotonicity/uniformity,
horizontal and vertical diffusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.tracers.advect import advect_tracers
from mom6_tpu.tracers.hor_diff import tracer_hordiff
from mom6_tpu.tracers.vert_diff import tracer_vertdiff
from mom6_tpu.tracers.registry import TracerRegistry


def setup(nx=16, ny=16, cyclic=True):
    return build_cartesian_grid(nx, ny, 100.0, 100.0, max_depth=1000.0,
                                cyclic_x=cyclic, reentrant_y=cyclic,
                                dtype=jnp.float32)


class TestAdvect:
    def test_uniform_tracer_stays_uniform(self):
        G = setup()
        rng = np.random.default_rng(0)
        h = jnp.asarray(100.0 + 10 * rng.standard_normal((2, 16, 16)),
                        jnp.float32)
        uhtr = jnp.asarray(1e7 * rng.standard_normal((2, 16, 16)), jnp.float32)
        vhtr = jnp.asarray(1e7 * rng.standard_normal((2, 16, 16)), jnp.float32)
        T = jnp.full((1, 2, 16, 16), 3.5, jnp.float32)
        T_new, h_new = advect_tracers(T, h, uhtr, vhtr, G, n_sub=2)
        np.testing.assert_allclose(np.asarray(T_new), 3.5, rtol=1e-5)

    def test_total_tracer_conserved(self):
        G = setup()
        rng = np.random.default_rng(1)
        h = jnp.asarray(100.0 + 10 * rng.standard_normal((2, 16, 16)),
                        jnp.float32)
        uhtr = jnp.asarray(5e6 * rng.standard_normal((2, 16, 16)), jnp.float32)
        vhtr = jnp.asarray(5e6 * rng.standard_normal((2, 16, 16)), jnp.float32)
        T = jnp.asarray(10.0 + rng.standard_normal((2, 2, 16, 16)),
                        jnp.float32)
        T_new, h_new = advect_tracers(T, h, uhtr, vhtr, G, n_sub=2)
        area = np.asarray(G.areaT, np.float64)
        tot0 = (np.asarray(T, np.float64) *
                np.asarray(h, np.float64)[None] * area).sum(axis=(1, 2, 3))
        tot1 = (np.asarray(T_new, np.float64) *
                np.asarray(h_new, np.float64)[None] * area).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(tot1, tot0, rtol=2e-5)

    def test_monotone(self):
        G = setup()
        rng = np.random.default_rng(2)
        h = jnp.full((1, 16, 16), 100.0, jnp.float32)
        uhtr = jnp.asarray(1e7 * rng.standard_normal((1, 16, 16)), jnp.float32)
        vhtr = jnp.zeros_like(uhtr)
        T0 = np.zeros((1, 1, 16, 16), np.float32)
        T0[..., 6:10] = 1.0
        T_new, _ = advect_tracers(jnp.asarray(T0), h, uhtr, vhtr, G, n_sub=4)
        t = np.asarray(T_new)
        assert t.min() >= -1e-6 and t.max() <= 1.0 + 1e-6

    def test_translation(self):
        """Uniform flow translates a blob in the right direction."""
        G = setup()
        h = jnp.full((1, 16, 16), 100.0, jnp.float32)
        # transport = u*h*dy*dt, u=0.5 m/s eastward for dt such that
        # displacement = 1 cell = 6250 m -> u*dt = 6250
        uhtr = jnp.full((1, 16, 16), 6250.0 * 100.0 * 6250.0, jnp.float32)
        vhtr = jnp.zeros_like(uhtr)
        T0 = np.zeros((1, 1, 16, 16), np.float32)
        T0[..., 8] = 1.0
        T_new, _ = advect_tracers(jnp.asarray(T0), h, uhtr, vhtr, G, n_sub=4)
        t = np.asarray(T_new)[0, 0]
        # center of mass moved ~1 cell east
        com0 = (T0[0, 0].sum(0) * np.arange(16)).sum() / T0.sum()
        com1 = (t.sum(0) * np.arange(16)).sum() / t.sum()
        assert 0.7 < com1 - com0 < 1.3


class TestHorDiff:
    def test_conserves_and_smooths(self):
        G = setup()
        rng = np.random.default_rng(3)
        h = jnp.full((2, 16, 16), 100.0, jnp.float32)
        T = jnp.asarray(rng.standard_normal((1, 2, 16, 16)), jnp.float32)
        T_new = tracer_hordiff(T, h, 1e3, 3600.0, G, n_sub=2)
        area = np.asarray(G.areaT, np.float64)
        tot0 = (np.asarray(T, np.float64) * 100.0 * area).sum()
        tot1 = (np.asarray(T_new, np.float64) * 100.0 * area).sum()
        np.testing.assert_allclose(tot1, tot0, rtol=1e-5, atol=1e-2)
        assert float(jnp.var(T_new)) < float(jnp.var(T))


class TestVertDiff:
    def test_conserves_column(self):
        rng = np.random.default_rng(4)
        h = jnp.asarray(50.0 + 10 * np.abs(rng.standard_normal((6, 4, 4))),
                        jnp.float32)
        T = jnp.asarray(rng.standard_normal((2, 6, 4, 4)), jnp.float32)
        kd = jnp.full((7, 4, 4), 1e-3, jnp.float32)
        T_new = tracer_vertdiff(T, h, kd, 3600.0)
        col0 = np.asarray((T * h[None]).sum(axis=1), np.float64)
        col1 = np.asarray((T_new * h[None]).sum(axis=1), np.float64)
        np.testing.assert_allclose(col1, col0, rtol=1e-4, atol=1e-3)

    def test_surface_flux_heats_top(self):
        h = jnp.full((4, 4, 4), 100.0, jnp.float32)
        T = jnp.zeros((1, 4, 4, 4), jnp.float32)
        kd = jnp.zeros((5, 4, 4), jnp.float32)
        flux = jnp.full((1, 4, 4), 0.01, jnp.float32)  # conc m/s
        T_new = tracer_vertdiff(T, h, kd, 3600.0, sfc_flux=flux)
        np.testing.assert_allclose(float(T_new[0, 0, 0, 0]),
                                   0.01 * 3600 / 100, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(T_new[0, 1:]), 0.0, atol=1e-8)

    def test_strong_mixing_homogenizes(self):
        h = jnp.full((4, 2, 2), 100.0, jnp.float32)
        T = jnp.zeros((1, 4, 2, 2), jnp.float32).at[:, 0].set(4.0)
        kd = jnp.full((5, 2, 2), 10.0, jnp.float32)
        T_new = tracer_vertdiff(T, h, kd, 1e6)
        np.testing.assert_allclose(np.asarray(T_new), 1.0, rtol=0.05)


class TestRegistry:
    def test_register_stack_roundtrip(self):
        reg = TracerRegistry()
        reg.register("T", "degC", "Potential Temperature")
        reg.register("S", "ppt", "Salinity")
        with pytest.raises(ValueError):
            reg.register("T")
        d = {"T": jnp.ones((2, 3, 3)), "S": 2.0 * jnp.ones((2, 3, 3))}
        arr = reg.stack(d)
        assert arr.shape == (2, 2, 3, 3)
        back = reg.unstack(arr)
        assert float(back["S"][0, 0, 0]) == 2.0
        reg.lock()
        with pytest.raises(RuntimeError):
            reg.register("age")


class TestPPMH3:
    def test_monotone_and_sharper_than_plm(self):
        from mom6_tpu.tracers.advect import advect_tracers, PLM, PPM_H3
        G = setup()
        h = jnp.full((1, 16, 16), 100.0, jnp.float32)
        # advect a square wave one full revolution around the periodic domain
        uhtr_1cell = 6250.0 * 100.0 * 6250.0
        T0 = np.zeros((1, 1, 16, 16), np.float32)
        T0[..., 5:9] = 1.0
        res = {}
        for scheme in (PLM, PPM_H3):
            T = jnp.asarray(T0)
            for _ in range(16):  # 16 one-cell displacements = full loop
                T, _ = advect_tracers(T, h, jnp.full((1,16,16), uhtr_1cell,
                                                     jnp.float32),
                                      jnp.zeros((1,16,16), jnp.float32),
                                      G, n_sub=2, scheme=scheme)
            t = np.asarray(T)[0, 0]
            assert t.min() >= -1e-5 and t.max() <= 1.0 + 1e-5  # monotone
            # error vs the initial square wave
            res[scheme] = np.abs(t - T0[0, 0]).sum()
        assert res[PPM_H3] < res[PLM]  # higher order = less smearing


class TestTracerBatch:
    """Production-width batch: 24 tracers (age + CFC-11/12 + pseudo-salt
    + 20 regional dyes) through the registry, flow control and solo-step
    machinery via the shipped configs/tracer_batch run directory
    (reference: MOM_tracer_flow_control.F90:955, MOM_OCMIP2_CFC.F90,
    dye_example.F90:108-160)."""

    def _build(self):
        import os
        import jax
        from mom6_tpu.drivers.config_driver import build_model_from_params
        from mom6_tpu.framework.config import ParamFile
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pf = ParamFile([os.path.join(repo, "configs", "tracer_batch",
                                     "MOM_input")])
        return build_model_from_params(pf)

    def test_batch_runs_and_behaves(self):
        import jax
        from mom6_tpu.core.mom import step_mom
        from mom6_tpu.diagnostics.sum_output import tracer_stocks
        ms = self._build()
        names = ms.params.tfc.registry.names
        assert len(names) == 24
        assert sum(n.startswith("dye") for n in names) == 20
        step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid,
                                          ms.vgrid, ms.params))
        s = ms.state
        for _ in range(4):
            s = step(s)
        tr = jax.device_get(s.tr)
        for n in names:
            assert np.isfinite(np.asarray(tr[n])).all(), n
        # dyes are held at 1 in their boxes and advected: bounded [0, 1]
        for m in range(20):
            d = np.asarray(tr[f"dye{m + 1:03d}"])
            assert d.min() >= -1e-5 and d.max() <= 1.0 + 1e-5
            assert d.max() > 0.99          # source box painted
        # CFC surface uptake: stocks strictly increase from zero
        stocks = tracer_stocks(tr, jax.device_get(s.h), ms.grid,
                               names=names)
        assert stocks["cfc11"] > 0.0 and stocks["cfc12"] > 0.0
        # ideal age grows below the surface layer
        assert stocks["age"] > 0.0

    def test_cfc_schmidt_and_solubility_check_values(self):
        """OCMIP2 check values: Sc(20C) near the Zheng et al. (1998)
        nominal values and K0 in the Warner & Weiss (1985) range."""
        from mom6_tpu.tracers.packages import CFCPackage
        p = CFCPackage()
        sc11 = float(p._schmidt(jnp.float32(20.0), p._sc11))
        sc12 = float(p._schmidt(jnp.float32(20.0), p._sc12))
        assert abs(sc11 - 1179.0) < 25.0      # CFC-11 at 20 C
        assert abs(sc12 - 1188.0) < 25.0      # CFC-12 at 20 C
        k11 = float(p._solubility(jnp.float32(10.0), jnp.float32(35.0),
                                  (-229.9261, 319.6552, 119.4471,
                                   -1.39165),
                                  (-0.142382, 0.091459, -0.0157274)))
        # W&W85 table: ~0.0125 mol L-1 atm-1 at 10C/35psu -> mol m-3
        assert 8.0 < k11 < 18.0
