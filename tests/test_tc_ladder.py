"""The tc0-tc4 regression ladder (VERDICT.md item #4): ports of the
reference's .testing configurations (/root/reference/.testing/tc*/
MOM_input) as runnable config directories.  Deviations from the reference
formulations are documented in PARITY.md.

Each case must build from its MOM_input, step stably for a few cycles,
conserve mass, and show the configuration's signature behavior."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.mom import step_mom
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.framework.config import ParamFile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(tc):
    pf = ParamFile([os.path.join(REPO, "configs", tc, "MOM_input")])
    return build_model_from_params(pf)


def run(ms, n):
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid, ms.vgrid,
                                      ms.params))
    s = ms.state
    for _ in range(n):
        s = step(s)
    return jax.block_until_ready(s)


def vol(ms, s):
    return float(jnp.sum(s.h * ms.grid.areaT))


class TestTC0:
    def test_unsplit_adiabatic(self):
        ms = build("tc0")
        assert ms.params.unsplit is not None          # SPLIT = False
        assert not ms.params.thermo_enabled
        out = run(ms, 2)
        assert abs(vol(ms, out) - vol(ms, ms.state)) / vol(ms, ms.state) \
            < 1e-7
        # resting flat basin with no forcing stays at rest
        assert float(jnp.abs(out.u).max()) < 1e-10


class TestTC1:
    def test_benchmark_layered(self):
        ms = build("tc1")
        assert ms.params.diabatic.boundary_layer_scheme == "BULKML"
        assert ms.params.gm is not None
        assert ms.params.tfc is not None              # ideal age rides along
        assert ms.forcing.buoy.restore_rate > 0.0     # RESTOREBUOY
        out = run(ms, 4)
        assert bool(jnp.all(jnp.isfinite(out.T)))
        assert bool(jnp.all(jnp.isfinite(out.u)))
        assert abs(vol(ms, out) - vol(ms, ms.state)) / vol(ms, ms.state) \
            < 1e-4
        # the gyre wind spins the basin up
        assert float(jnp.abs(out.u).max()) > 1e-6
        # benchmark topography: a southern reentrant channel (shallow in
        # the north, deep channel toward the south)
        bat = np.asarray(ms.grid.bathyT)
        assert bat[1].mean() > bat[-2].mean()


class TestTC2:
    def test_ale_full_physics(self):
        ms = build("tc2")
        assert ms.params.ale.mode == "ZSTAR"
        assert ms.params.diabatic.boundary_layer_scheme == "EPBL"
        assert ms.params.meke is not None
        assert ms.params.diabatic.geothermal is not None
        assert ms.params.neutral_diffusion
        out = run(ms, 3)
        assert bool(jnp.all(jnp.isfinite(out.T)))
        assert abs(vol(ms, out) - vol(ms, ms.state)) / vol(ms, ms.state) \
            < 1e-4
        # halfpipe topography: shallow at both walls, deep mid-channel
        bat = np.asarray(ms.grid.bathyT)
        assert bat[4].mean() > bat[0].mean()
        assert bat[4].mean() > bat[-1].mean()


class TestTC3:
    def test_circle_obcs_radiation(self):
        """Gravity waves RADIATE through the open boundaries: after the
        disk collapses, the open-boundary run must hold well under half
        the energy of a closed-wall twin, which can only reflect and
        ring (the quantitative ladder-level assert of round-5 verdict
        item 7; the unit-level gate is test_obc.py)."""
        ms = build("tc3")
        assert ms.params.obc is not None
        out0 = ms.state
        # the disk displaces interior interfaces (nonuniform h)
        assert float(out0.h[0].max() - out0.h[0].min()) > 1.0
        out = run(ms, 30)
        assert bool(jnp.all(jnp.isfinite(out.u)))

        def energy(ms_, s):
            """KE + APE of the free surface [kg m2 s-2-ish, consistent
            units between the twins]."""
            G = ms_.grid
            ke = float(jnp.sum((s.u ** 2 + s.v ** 2) * s.h
                               * G.areaT[None]))
            eta = jnp.sum(s.h, axis=0) - G.bathyT
            eta = eta - jnp.mean(eta)
            ape = float(9.8 * jnp.sum(eta ** 2 * G.areaT))
            return ke + ape

        # closed-wall twin: same config, open boundaries removed
        ms_c = build("tc3")
        ms_c = ms_c._replace(params=ms_c.params._replace(obc=None))
        out_c = run(ms_c, 30)
        e_open = energy(ms, out)
        e_closed = energy(ms_c, out_c)
        assert e_closed > 0.0
        assert e_open < 0.5 * e_closed, (e_open, e_closed)
        # volume: the raised disk drains out through the boundary; the
        # closed twin conserves volume to roundoff, the open one changes
        # by at most the disk's displaced volume
        dv_closed = abs(vol(ms_c, out_c) - vol(ms_c, ms_c.state)) \
            / vol(ms_c, ms_c.state)
        assert dv_closed < 1e-5          # f32 continuity roundoff only
        h0 = np.asarray(out0.h[0])
        disk_vol = float(((h0 - h0.min())
                          * np.asarray(ms.grid.areaT)).sum())
        dv_open = abs(vol(ms, out) - vol(ms, out0))
        assert dv_open <= 2.0 * disk_vol + 1e-6 * vol(ms, out0), \
            (dv_open, disk_vol)


class TestTC4:
    def test_sponge_ale(self):
        ms = build("tc4")
        assert ms.params.sponge is not None
        assert ms.params.eos_name == "LINEAR"
        assert ms.params.ale.mode == "ZSTAR"
        assert ms.params.bbl_visc is not None         # BOTTOMDRAGLAW
        out = run(ms, 3)
        assert bool(jnp.all(jnp.isfinite(out.T)))
        assert abs(vol(ms, out) - vol(ms, ms.state)) / vol(ms, ms.state) \
            < 1e-5
