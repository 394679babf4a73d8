"""Tendency/budget diagnostic tier (round-5 verdict item 2).

The reference registers per-process content tendencies for every
tracer (register_tracer_diagnostics,
src/tracer/MOM_tracer_registry.F90:283-651) and the diabatic driver's
boundary-forcing/frazil decomposition
(src/parameterizations/vertical/MOM_diabatic_driver.F90 register
section).  Our capture (step_mom(collect_tend=True)) must satisfy the
same closures the reference's budget tooling relies on:

* the per-process decomposition sums EXACTLY (to f32 rounding) to the
  total content change of the thermo cycle;
* vertically-integrated boundary_forcing_heat_tendency equals the
  applied surface heat flux pointwise;
* the global heat budget closes: integral of opottemptend = net heat
  input + frazil heating (BudgetAudit's drift identity);
* advective + epineutral + remap tendencies integrate to ~zero
  globally (they only move content around);
* frazil tendency reproduces the state.frazil accumulation exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _setup(frazil=False, cold=False):
    from mom6_tpu.core.barotropic import BTParams
    from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
    from mom6_tpu.core.mom import Forcing, MOMParams
    from mom6_tpu.core.state import init_state_resting
    from mom6_tpu.ale.ale import ALEParams, ZSTAR
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.physics.lateral.thickness_diffuse import GMParams
    from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                    DiabaticParams)

    nx, ny, nz, depth = 12, 10, 6, 500.0
    G = build_cartesian_grid(nx, ny, 400.0, 320.0, max_depth=depth,
                             f0=8e-5)
    GV = build_layered_vgrid(nz)
    state = init_state_resting(G, GV, [depth / nz] * nz)
    z = jnp.cumsum(state.h, axis=0) - 0.5 * state.h
    y = (G.geoLatT - G.geoLatT.min()) / max(
        float(G.geoLatT.max() - G.geoLatT.min()), 1e-9)
    sst = -1.5 if cold else 14.0
    T = (sst + 6.0 * (1.0 - y)[None] - 8.0 * z / depth).astype(jnp.float32)
    if cold:
        # start slightly below the linear freezing point (~-1.89 degC at
        # 35 ppt) so the cycle must form frazil
        T = jnp.full_like(T, -1.93) + 0.02 * (z / depth).astype(
            jnp.float32)
    S = jnp.full_like(T, 35.0) + 0.5 * (z / depth).astype(jnp.float32)
    state = state.replace(T=T, S=S)
    if frazil:
        state = state.replace(frazil=jnp.zeros((ny, nx), jnp.float32))
    params = MOMParams(
        dyn=DynParams(dt=600.0, bt=BTParams(nstep=8, nfilter=2)),
        thermo_enabled=True, eos_name="WRIGHT",
        diabatic=DiabaticParams(boundary_layer_scheme="KPP",
                                frazil=frazil),
        ale=ALEParams(mode=ZSTAR,
                      dz_nominal=np.full(nz, depth / nz)),
        gm=GMParams(khth=50.0), khtr=30.0, n_dyn_per_thermo=2)
    q0 = -400.0 if cold else 150.0
    forcing = Forcing(
        mech=MechForcing(taux=0.08 * jnp.ones((ny, nx), jnp.float32),
                         tauy=jnp.zeros((ny, nx), jnp.float32)),
        buoy=BuoyancyForcing(
            heat_flux=jnp.full((ny, nx), q0, jnp.float32),
            # deliberately large (~10 m/yr) so the virtual-salt-flux
            # signal sits well above the f32 content-cancellation noise
            fw_flux=jnp.full((ny, nx), 3.0e-7, jnp.float32)))
    return G, GV, state, params, forcing


COMPONENTS_T = ["T_advection_xy", "opottemppmdiff", "opottempdiff",
                "boundary_forcing_heat_tendency", "frazil_heat_tendency",
                "Th_tendency_vert_remap"]
COMPONENTS_S = ["S_advection_xy", "osaltpmdiff", "osaltdiff",
                "boundary_forcing_salt_tendency",
                "Sh_tendency_vert_remap"]


def _run(frazil=False, cold=False):
    from mom6_tpu.core.mom import step_mom
    G, GV, state, params, forcing = _setup(frazil=frazil, cold=cold)
    fn = jax.jit(lambda s, f: step_mom(s, f, G, GV, params,
                                       collect_tend=True))
    out, tend = fn(state, forcing)
    tend = {k: np.asarray(v, np.float64) for k, v in tend.items()}
    return G, GV, state, params, forcing, out, tend


class TestHeatSaltClosure:
    def test_components_sum_to_total(self):
        G, GV, state, params, forcing, out, tend = _run()
        dt = params.dyn.dt * params.n_dyn_per_thermo
        # f32 content-cancellation noise scale per capture point
        tol = 6.0 * np.float32(1e-7) * float(
            np.max(np.abs(np.asarray(state.T)))
            * np.max(np.asarray(state.h))) / dt * 4.0
        comp = sum(tend.get(k, 0.0) for k in COMPONENTS_T)
        err = np.abs(comp - tend["opottemptend"])
        assert err.max() <= tol, (err.max(), tol)
        comp_s = sum(tend.get(k, 0.0) for k in COMPONENTS_S)
        tol_s = 6.0 * np.float32(1e-7) * 35.0 \
            * float(np.max(np.asarray(state.h))) / dt * 4.0
        err_s = np.abs(comp_s - tend["osalttend"])
        assert err_s.max() <= tol_s, (err_s.max(), tol_s)

    def test_boundary_heat_is_surface_flux(self):
        G, GV, state, params, forcing, out, tend = _run()
        cp = params.diabatic.cp
        bt2d = tend["boundary_forcing_heat_tendency"].sum(0) \
            * GV.rho0 * cp
        hf = np.asarray(forcing.buoy.heat_flux, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        wet = np.asarray(G.mask2dT) > 0.5
        assert np.allclose(bt2d[wet], hf[wet], rtol=1e-5), \
            (bt2d[wet][:3], hf[wet][:3])

    def test_global_heat_budget_closes(self):
        G, GV, state, params, forcing, out, tend = _run()
        cp = params.diabatic.cp
        area = np.asarray(G.areaT, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        total = (tend["opottemptend"].sum(0) * area).sum() \
            * GV.rho0 * cp
        heat_in = (np.asarray(forcing.buoy.heat_flux, np.float64)
                   * area).sum()
        # the budget identity: total tendency = surface input (+ frazil,
        # zero here).  Tolerance = f32 cancellation on the content field.
        gross = GV.rho0 * cp * float(
            np.max(np.abs(np.asarray(state.T))) * 500.0) \
            * area.sum() * 1e-7 / (params.dyn.dt * params.n_dyn_per_thermo)
        assert abs(total - heat_in) <= max(6.0 * gross, 1e-3 * abs(heat_in))

    def test_movers_integrate_to_zero(self):
        G, GV, state, params, forcing, out, tend = _run()
        area = np.asarray(G.areaT, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        heat_in_units = (np.asarray(forcing.buoy.heat_flux, np.float64)
                         * area).sum() / (GV.rho0 * params.diabatic.cp)
        for k in ("T_advection_xy", "opottemppmdiff",
                  "Th_tendency_vert_remap"):
            net = (tend[k].sum(0) * area).sum()
            assert abs(net) <= 0.05 * abs(heat_in_units) + 1e-8, (k, net)

    def test_salt_budget_virtual_flux(self):
        G, GV, state, params, forcing, out, tend = _run()
        area = np.asarray(G.areaT, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        total = (tend["osalttend"].sum(0) * area).sum()
        # virtual salt flux from fresh water: -S_sfc * fw
        vsf = (-np.asarray(state.S[0], np.float64)
               * float(forcing.buoy.fw_flux[0, 0]) * area).sum()
        assert abs(total - vsf) <= 0.05 * abs(vsf) + 1e-6, (total, vsf)


class TestFrazil:
    def test_frazil_tendency_matches_accumulation(self):
        G, GV, state, params, forcing, out, tend = _run(frazil=True,
                                                        cold=True)
        dt = params.dyn.dt * params.n_dyn_per_thermo
        cp = params.diabatic.cp
        fz2d = tend["frazil_heat_tendency"].sum(0) * GV.rho0 * cp * dt
        acc = np.asarray(out.frazil, np.float64) \
            - np.asarray(state.frazil, np.float64)
        wet = np.asarray(G.mask2dT) > 0.5
        assert fz2d[wet].max() > 0.0, "cold case must form frazil"
        assert np.allclose(fz2d[wet], acc[wet], rtol=1e-5, atol=1e-2)

    def test_budget_closes_with_frazil(self):
        G, GV, state, params, forcing, out, tend = _run(frazil=True,
                                                        cold=True)
        cp = params.diabatic.cp
        area = np.asarray(G.areaT, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        total = (tend["opottemptend"].sum(0) * area).sum() * GV.rho0 * cp
        heat_in = (np.asarray(forcing.buoy.heat_flux, np.float64)
                   * area).sum()
        frz = (tend["frazil_heat_tendency"].sum(0) * area).sum() \
            * GV.rho0 * cp
        # total change = surface cooling + frazil heat the ice model owes
        resid = total - (heat_in + frz)
        assert abs(resid) <= 0.02 * (abs(heat_in) + frz), \
            (total, heat_in, frz)


class TestCatalogTendencies:
    def test_catalog_serves_tendency_fields(self):
        from mom6_tpu.core.mom import step_mom
        from mom6_tpu.diagnostics.catalog import DiagContext, serve
        from mom6_tpu.eos import get_eos
        G, GV, state, params, forcing = _setup()
        tend_fn = jax.jit(lambda s, f: step_mom(
            s, f, G, GV, params, collect_tend=True)[1])
        ctx = DiagContext(state, G, GV, params, forcing=forcing,
                          eos=get_eos("WRIGHT"), tend_fn=tend_fn)
        for nm in ("opottemptend", "osalttend", "T_advection_xy",
                   "opottempdiff", "opottemppmdiff",
                   "boundary_forcing_heat_tendency",
                   "Th_tendency_vert_remap", "opottemptend_2d",
                   "boundary_forcing_heat_tendency_2d"):
            arr = serve(nm, ctx)
            assert arr is not None and np.isfinite(arr).all(), nm
        # per-mechanism Kd: KPP configured => Kd_BL serves; background
        # always; shear not configured => None + explicit reason
        assert serve("Kd_BL", ctx) is not None
        assert serve("Kd_bkgnd", ctx) is not None
        assert serve("Kd_shear", ctx) is None
        from mom6_tpu.diagnostics.catalog import rejection_reason
        assert "shear" in rejection_reason("Kd_shear", state, params,
                                           forcing).lower()
        # GM configured => GMwork serves and is non-negative
        gmw = serve("GMwork", ctx)
        assert gmw is not None and (gmw >= -1e-9).all()

    def test_units_scaling(self):
        """opottemptend [W m-2] = rho0 cp * native capture."""
        from mom6_tpu.core.mom import step_mom
        from mom6_tpu.diagnostics.catalog import DiagContext, serve
        from mom6_tpu.eos import get_eos
        G, GV, state, params, forcing = _setup()
        fn = jax.jit(lambda s, f: step_mom(s, f, G, GV, params,
                                           collect_tend=True))
        _, tend = fn(state, forcing)
        ctx = DiagContext(state, G, GV, params, forcing=forcing,
                          eos=get_eos("WRIGHT"),
                          tend_fn=lambda s, f: tend)
        got = serve("opottemptend", ctx)
        want = GV.rho0 * params.diabatic.cp * np.asarray(
            tend["opottemptend"])
        assert np.allclose(got, want, rtol=1e-6)
