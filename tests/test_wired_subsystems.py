"""Step-level tests that the round-2 wiring actually reaches each
subsystem from step_mom / the config driver (VERDICT.md round-1 item #2:
"a module the model can't reach is not a capability").

Each test builds a small config with one flag on, steps the full model,
and asserts the subsystem's physical signature — not just shape survival.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.core.mom import step_mom
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.framework.config import param_file_from_text

BASE = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 4
DT = 900.0
DT_THERM = 900.0
TOPO_CONFIG = "bowl"
WIND_CONFIG = "gyres"
"""


def build(extra: str = "", base: str = BASE):
    pf = param_file_from_text(base + extra)
    return build_model_from_params(pf)


def run(ms, n=2):
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid, ms.vgrid,
                                      ms.params))
    s = ms.state
    for _ in range(n):
        s = step(s)
    return jax.block_until_ready(s)


class TestDiabaticSequence:
    def test_geothermal_warms_bottom(self):
        ms = build('GEOTHERMAL_SCALE = 50.0\nWIND_CONFIG = "zero"\n')
        out = run(ms, n=4)
        dT = np.asarray(out.T - ms.state.T)
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        assert dT[-1][mask].max() > 1e-6          # bottom layer warmed
        assert abs(dT[0][mask]).max() < dT[-1][mask].max()

    def test_penetrating_sw_heats_subsurface(self):
        ms = build('PEN_SW_NBANDS = 2\nBUOY_CONFIG = "const"\n'
                   'WIND_CONFIG = "zero"\n')
        # feed shortwave through the forcing
        ms = ms._replace(forcing=ms.forcing._replace(
            buoy=ms.forcing.buoy._replace(
                sw_flux=jnp.full((12, 12), 200.0, jnp.float32))))
        out = run(ms, n=2)
        dT = np.asarray(out.T - ms.state.T)
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        # heating reaches below the top layer (two-band absorption)
        assert dT[1][mask].max() > 1e-7

    def test_frazil_floors_temperature(self):
        ms = build('FRAZIL = True\nWIND_CONFIG = "zero"\n')
        cold = ms.state.replace(T=jnp.full_like(ms.state.T, -5.0))
        ms = ms._replace(state=cold)
        out = run(ms, n=1)
        from mom6_tpu.eos.tfreeze import tfreeze_linear
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        tf = np.asarray(tfreeze_linear(out.S[0], jnp.zeros_like(out.S[0])))
        # top layer raised to (pressure-corrected) freezing point
        assert (np.asarray(out.T[0])[mask] >= tf[mask] - 0.5).all()

    def test_double_diffusion_wired(self):
        # salt-fingering favorable: warm salty over cold fresh
        ms = build('DOUBLE_DIFFUSION = True\nWIND_CONFIG = "zero"\n')
        assert ms.params.diabatic.ddiff is not None
        nz = ms.state.T.shape[0]
        tprof = jnp.linspace(20.0, 5.0, nz)[:, None, None]
        sprof = jnp.linspace(37.0, 34.0, nz)[:, None, None]
        st = ms.state.replace(T=jnp.broadcast_to(tprof, ms.state.T.shape),
                              S=jnp.broadcast_to(sprof, ms.state.S.shape))
        ms = ms._replace(state=st)
        # the wired DDiffParams produce active salt-finger diffusivities
        # on this state (kd_S > kd_T at the fingering interfaces)
        from mom6_tpu.eos import get_eos
        from mom6_tpu.physics.vertical.convection import double_diffusion_kd
        kd_t, kd_s = double_diffusion_kd(
            st.h, st.T, st.S, ms.grid, ms.vgrid, get_eos("WRIGHT"),
            ms.params.diabatic.ddiff)
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        assert np.asarray(kd_s[1:-1]).max() > 0.0
        assert np.asarray(kd_s).max() > np.asarray(kd_t).max()
        out = run(ms, n=2)          # and the full step consumes them
        assert bool(jnp.all(jnp.isfinite(out.S)))

    def test_sponge_relaxes_to_reference(self):
        # uniform surface heating everywhere; the sponge bands (N/S edges)
        # must stay pinned to the reference while the interior warms
        ms = build('SPONGE = True\nSPONGE_IDAMP = 1e-2\n'
                   'WIND_CONFIG = "zero"\nBUOY_CONFIG = "const"\n'
                   'SENSIBLE_HEAT_FLUX = 500.0\n')
        assert ms.params.sponge is not None
        out = run(ms, n=4)
        dT = np.abs(np.asarray(out.T[0] - ms.state.T[0]))
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        edge = dT[0][mask[0]].mean()
        interior = dT[6][mask[6]].mean()
        assert edge < 0.5 * interior

    def test_bbl_drag_diffusivity(self):
        ms = build('BOTTOMDRAGLAW = True\nBBL_EFFIC = 0.2\n')
        # strong near-bottom flow
        st = ms.state.replace(u=jnp.full_like(ms.state.u, 0.3)
                              * ms.grid.mask2dCu)
        from mom6_tpu.physics.vertical.set_diffusivity import bbl_lotw_kd
        kd = bbl_lotw_kd(st.h, st.u, st.v, st.T, st.S, ms.grid, ms.vgrid,
                         __import__("mom6_tpu.eos", fromlist=["get_eos"])
                         .get_eos("WRIGHT"), ms.params.diabatic.diff)
        kd = np.asarray(kd)
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        assert kd[-2][mask].max() > 1e-5      # near-bottom mixing active
        assert kd[1][mask].max() <= kd[-2][mask].max() + 1e-12
        out = run(ms, n=1)                    # and the full step runs
        assert bool(jnp.all(jnp.isfinite(out.T)))


class TestDynamicsExtras:
    def test_porous_barrier_blocks_deep_flow(self):
        ms = build('POROUS_BARRIER = True\n')
        out_p = run(ms, n=2)
        ms2 = build()
        out_o = run(ms2, n=2)
        # deep transports differ where sills bite; surface nearly unchanged
        assert not np.allclose(np.asarray(out_p.uh[-1]),
                               np.asarray(out_o.uh[-1]))

    def test_zanna_bolton_changes_momentum(self):
        # ZB2020 is quadratic in the strain/vorticity: seed an eddying
        # velocity field so the closure has something to act on
        rng = np.random.default_rng(3)
        def seeded(ms):
            u = jnp.asarray(0.3 * rng.standard_normal(ms.state.u.shape),
                            jnp.float32) * ms.grid.mask2dCu
            rng2 = np.random.default_rng(4)
            v = jnp.asarray(0.3 * rng2.standard_normal(ms.state.v.shape),
                            jnp.float32) * ms.grid.mask2dCv
            return ms._replace(state=ms.state.replace(u=u, v=v))
        ms = seeded(build('USE_ZB2020 = True\nZB_SCALING = 1.0\n'))
        out_z = run(ms, n=1)
        out_o = run(seeded(build()), n=1)
        rel = (np.abs(np.asarray(out_z.u - out_o.u)).max()
               / max(np.abs(np.asarray(out_o.u)).max(), 1e-12))
        assert rel > 1e-4
        assert bool(jnp.all(jnp.isfinite(out_z.u)))

    def test_interface_filter_conserves_and_smooths(self):
        ms = build('APPLY_INTERFACE_FILTER = True\n'
                   'INTERFACE_FILTER_TIME_SCALE = 1800.0\n')
        # checkerboard interface noise
        ny, nx = 12, 12
        noise = 20.0 * (-1.0) ** (np.add.outer(np.arange(ny),
                                               np.arange(nx)))
        h = np.asarray(ms.state.h).copy()
        h[0] += noise; h[1] -= noise
        h = jnp.asarray(np.maximum(h, 1e-3))
        ms = ms._replace(state=ms.state.replace(h=h))
        out = run(ms, n=2)
        v0 = float(jnp.sum(h * ms.grid.areaT))
        v1 = float(jnp.sum(out.h * ms.grid.areaT))
        assert abs(v1 - v0) / v0 < 1e-5
        # the top-interface checkerboard amplitude decays vs no-filter
        ms_o = build()
        ms_o = ms_o._replace(state=ms_o.state.replace(h=h))
        out_o = run(ms_o, n=2)
        def cb_amp(hh):
            # interior only: the bowl's shoreline dominates |diff| at the
            # edges and would mask the checkerboard signal
            e = np.asarray(hh[0])[4:-4, 4:-4]
            return np.abs(np.diff(e, axis=-1)).mean()
        assert cb_amp(out.h) < cb_amp(out_o.h)

    def test_stanley_pgf_changes_solution(self):
        ms = build('USE_STANLEY_PGF = True\nSTANLEY_COEFF = 20.0\n'
                   'BUOY_CONFIG = "NS_heating"\n')
        # need a T gradient for variance
        out_s = run(ms, n=3)
        ms_o = build('BUOY_CONFIG = "NS_heating"\n')
        out_o = run(ms_o, n=3)
        assert not np.allclose(np.asarray(out_s.u), np.asarray(out_o.u))


class TestTidesSAL:
    SPH = """
NIGLOBAL = 16
NJGLOBAL = 12
NK = 3
DT = 900.0
GRID_CONFIG = "spherical"
SOUTHLAT = -30.0
LENLAT = 60.0
LENLON = 90.0
WIND_CONFIG = "zero"
"""

    def test_equilibrium_tide_drives_flow(self):
        ms = build("TIDES = True\n", base=self.SPH)
        out = run(ms, n=3)
        assert float(out.time) == pytest.approx(3 * 900.0)
        ke = float(jnp.sum(out.u ** 2) + jnp.sum(out.v ** 2))
        assert ke > 0.0                        # tide accelerated the basin
        assert bool(jnp.all(jnp.isfinite(out.u)))

    def test_scalar_sal_weakens_surface_gravity(self):
        ms = build("TIDES = True\nSAL_SCALAR_VALUE = 0.3\n", base=self.SPH)
        assert ms.params.dyn.bt.sal_scalar == pytest.approx(0.3)
        out = run(ms, n=2)
        assert bool(jnp.all(jnp.isfinite(out.h)))

    def test_harmonic_sal_runs(self):
        ms = build("TIDES = True\nSAL_HARMONICS = True\n", base=self.SPH)
        assert ms.params.sal_harmonics is not None
        out = run(ms, n=1)
        assert bool(jnp.all(jnp.isfinite(out.u)))


class TestStochastics:
    def test_sppt_pattern_evolves_and_perturbs(self):
        ms = build('DO_SPPT = True\nBUOY_CONFIG = "NS_heating"\n'
                   'HEATING_MAGNITUDE = 200.0\n')
        # seed a nonzero pattern so the first cycle already perturbs
        ms = ms._replace(state=ms.state.replace(
            sppt_pattern=0.5 * jnp.ones((12, 12), jnp.float32)))
        out = run(ms, n=2)
        assert not np.allclose(np.asarray(out.sppt_pattern),
                               0.5 * np.ones((12, 12)))
        ms_o = build('BUOY_CONFIG = "NS_heating"\n'
                     'HEATING_MAGNITUDE = 200.0\n')
        out_o = run(ms_o, n=2)
        assert not np.allclose(np.asarray(out.T), np.asarray(out_o.T))

    def test_skeb_is_nondivergent_kick(self):
        ms = build('DO_SKEB = True\nSKEB_SCALE = 10.0\nWIND_CONFIG = "zero"\n')
        ms = ms._replace(state=ms.state.replace(
            skeb_pattern=jnp.asarray(
                np.random.default_rng(0).standard_normal((12, 12)),
                jnp.float32)))
        out = run(ms, n=1)
        ke = float(jnp.sum(out.u ** 2 + out.v ** 2))
        assert ke > 0.0
        assert bool(jnp.all(jnp.isfinite(out.u)))


class TestRegistryTracers:
    CFG = ('USE_IDEAL_AGE_TRACER = True\nUSE_REGIONAL_DYES = True\n'
           'USE_PSEUDO_SALT_TRACER = True\nUSE_OCMIP2_CFC = True\n')

    def test_tracers_flow_through_model(self):
        ms = build(self.CFG)
        out = run(ms, n=3)
        assert set(ms.params.tfc.registry.names) == \
            {"age", "dye", "pseudo_salt", "cfc11", "cfc12"}
        # age grows below the surface, reset at surface
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        assert np.asarray(out.tr["age"][-1])[mask].max() > 0.0
        assert np.asarray(out.tr["age"][0])[mask].max() == 0.0
        # dye bounded [0, 1] after advection (monotone schemes)
        assert float(out.tr["dye"].min()) >= -1e-3
        assert float(out.tr["dye"].max()) <= 1.0 + 1e-3
        # CFC enters through the surface only
        assert np.asarray(out.tr["cfc11"][0])[mask].max() >= 0.0

    def test_pseudo_salt_tracks_salinity(self):
        ms = build(self.CFG + 'BUOY_CONFIG = "NS_heating"\n')
        out = run(ms, n=3)
        # pseudo-salt initialized equal to S and carried by the same
        # advection/diffusion: drift stays tiny over a few cycles
        mask = np.asarray(ms.grid.mask2dT) > 0.5
        drift = np.abs(np.asarray(out.tr["pseudo_salt"] - out.S))
        assert drift[:, mask].max() < 0.1

    def test_passive_tracer_mass_conserved(self):
        ms = build('USE_PSEUDO_SALT_TRACER = True\n')
        out = run(ms, n=3)
        m0 = float(jnp.sum(ms.state.tr["pseudo_salt"] * ms.state.h
                           * ms.grid.areaT))
        m1 = float(jnp.sum(out.tr["pseudo_salt"] * out.h * ms.grid.areaT))
        assert abs(m1 - m0) / m0 < 1e-4


class TestLangmuir:
    def test_waves_enhance_boundary_mixing(self):
        cfg = ('USE_KPP = True\nBUOY_CONFIG = "const"\n'
               'SENSIBLE_HEAT_FLUX = -200.0\n')
        ms_w = build(cfg + "USE_WAVES = True\n")
        ms_o = build(cfg)
        assert ms_w.forcing.mech.u10 is not None
        out_w = run(ms_w, n=2)
        out_o = run(ms_o, n=2)
        # Langmuir enhancement deepens mixing -> T fields differ (a weak
        # but real signal at this resolution/forcing: the enhancement
        # multiplies kd inside a thin boundary layer)
        diff = np.abs(np.asarray(out_w.T) - np.asarray(out_o.T)).max()
        assert diff > 1e-7, diff
