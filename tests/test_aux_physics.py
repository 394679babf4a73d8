"""Tests: interface filter, porous barriers, tidal forcing/SAL,
convection/double diffusion, opacity/geothermal."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.eos import get_eos


def setup(nx=16, ny=16, nz=4):
    G = build_cartesian_grid(nx, ny, 400.0, 400.0, max_depth=2000.0,
                             cyclic_x=True, reentrant_y=True,
                             dtype=jnp.float32)
    return G, build_layered_vgrid(nz), get_eos("WRIGHT")


class TestInterfaceFilter:
    def test_smooths_and_conserves(self):
        from mom6_tpu.physics.lateral.interface_filter import (
            InterfaceFilterParams, interface_filter)
        G, GV, eos = setup()
        h = np.full((4, 16, 16), 500.0)
        bump = 100.0 * np.exp(-((np.arange(16) - 8) ** 2)[None, :] / 6.0
                              - ((np.arange(16) - 8) ** 2)[:, None] / 6.0)
        h[1] -= bump; h[2] += bump
        h = jnp.asarray(h, jnp.float32)
        h2, uh, vh = interface_filter(h, G, GV, 600.0,
                                      InterfaceFilterParams(time_scale=3600.0))
        assert float(jnp.var(h2[1])) < float(jnp.var(h[1]))
        col = np.abs(np.asarray(jnp.sum(h2 - h, 0)))
        assert col.max() < 1e-3


class TestPorous:
    def test_fractions(self):
        from mom6_tpu.core.porous_barriers import (PorousBarrier,
                                                   porous_face_areas)
        G, GV, eos = setup()
        deep = jnp.full((16, 16), 1e6, jnp.float32)
        # a sill at 1000-1500 m on u faces of column i=8
        dmin = deep.at[:, 8].set(1000.0)
        dmax = deep.at[:, 8].set(1500.0)
        pb = PorousBarrier(d_min_u=dmin, d_max_u=dmax,
                           d_min_v=deep, d_max_v=deep)
        h = jnp.full((4, 16, 16), 500.0, jnp.float32)
        por_u, por_v = porous_face_areas(h, G, pb)
        p = np.asarray(por_u)[:, 4, 8]
        assert p[0] > 0.99          # 0-500 m fully open
        assert p[1] > 0.99          # 500-1000 m fully open
        assert 0.1 < p[2] < 0.9     # 1000-1500 m partially blocked
        assert p[3] < 0.01          # below the sill closed
        assert np.allclose(np.asarray(por_v)[:, :, 4], 1.0)


class TestTides:
    def test_equilibrium_tide_oscillates(self):
        from mom6_tpu.physics.lateral.tidal_forcing import (
            TidalForcingParams, equilibrium_tide, scalar_sal, CONSTITUENTS)
        lat = jnp.asarray(np.deg2rad(30.0)); lon = jnp.asarray(0.0)
        p = TidalForcingParams(names=("M2",))
        e0 = float(equilibrium_tide(0.0, lat, lon, p))
        # half an M2 period later the sign flips
        half_t = np.pi / CONSTITUENTS["M2"].freq
        e1 = float(equilibrium_tide(half_t, lat, lon, p))
        np.testing.assert_allclose(e1, -e0, atol=1e-6)
        assert 0.05 < abs(e0) < 0.2
        # SAL proportionality
        np.testing.assert_allclose(float(scalar_sal(jnp.asarray(1.0))), 0.094, rtol=1e-6)


class TestConvection:
    def _unstable_profile(self):
        G, GV, eos = setup(nx=8, ny=8)
        h = jnp.full((4, 8, 8), 500.0, jnp.float32)
        # cold over warm -> statically unstable
        T = jnp.asarray(np.broadcast_to(
            np.array([4.0, 6.0, 10.0, 12.0])[:, None, None], (4, 8, 8)),
            jnp.float32)
        S = jnp.full((4, 8, 8), 35.0, jnp.float32)
        return G, GV, eos, h, T, S

    def test_convective_kd_targets_unstable(self):
        from mom6_tpu.physics.vertical.convection import convective_kd
        G, GV, eos, h, T, S = self._unstable_profile()
        kd = convective_kd(h, T, S, G, GV, eos)
        # entire profile is unstable (T increases downward)
        assert float(kd[1:4].min()) > 0.5

    def test_full_convection_stabilizes(self):
        from mom6_tpu.physics.vertical.convection import full_convection
        G, GV, eos, h, T, S = self._unstable_profile()
        T2, S2 = full_convection(h, T, S, GV, eos)
        t = np.asarray(T2)[:, 0, 0]
        # near-uniform (fully mixed column mean is 8.0)
        assert np.all(np.abs(t - 8.0) < 0.1)
        # heat conserved
        np.testing.assert_allclose(
            (np.asarray(T2) * np.asarray(h)).sum(0),
            (np.asarray(T) * np.asarray(h)).sum(0), rtol=1e-5)

    def test_double_diffusion_regimes(self):
        from mom6_tpu.physics.vertical.convection import double_diffusion_kd
        G, GV, eos = setup(nx=8, ny=8)
        h = jnp.full((3, 8, 8), 100.0, jnp.float32)
        # warm salty over cold fresh (stable in T, unstable in S): fingers
        T = jnp.asarray(np.broadcast_to(np.array([20.0, 15.0, 10.0])
                                        [:, None, None], (3, 8, 8)),
                        jnp.float32)
        S = jnp.asarray(np.broadcast_to(np.array([36.5, 35.5, 34.5])
                                        [:, None, None], (3, 8, 8)),
                        jnp.float32)
        kd_t, kd_s = double_diffusion_kd(h, T, S, G, GV, eos)
        assert float(kd_s[1:3].max()) > 0.0
        assert float(kd_s[1:3].max()) >= float(kd_t[1:3].max())


class TestOpacityGeothermal:
    def test_sw_absorption_profile(self):
        from mom6_tpu.physics.vertical.opacity import sw_heating
        G, GV, eos = setup(nx=8, ny=8)
        h = jnp.full((6, 8, 8), 10.0, jnp.float32)
        sw = jnp.full((8, 8), 200.0, jnp.float32)
        dT = np.asarray(sw_heating(h, sw, GV))
        assert (dT >= 0).all()
        assert dT[0, 0, 0] > dT[1, 0, 0] > dT[2, 0, 0]  # decays with depth
        # total heating equals the incident flux
        total = (dT * 10.0).sum(0) * GV.rho0 * 3991.87
        np.testing.assert_allclose(total, 200.0, rtol=1e-3)

    def test_geothermal_bottom_only(self):
        from mom6_tpu.physics.vertical.opacity import geothermal_heating
        G, GV, eos = setup(nx=8, ny=8)
        h = jnp.asarray(np.stack([np.full((8, 8), 500.0),
                                  np.full((8, 8), 500.0),
                                  np.full((8, 8), 1e-9)]), jnp.float32)
        dT = np.asarray(geothermal_heating(h, GV))
        assert dT[1].max() > 0          # deepest massive layer heated
        assert dT[0].max() == 0 and dT[2].max() == 0

class TestBrinePlume:
    """DO_BRINE_PLUME (MOM_diabatic_aux.F90:990-1040, Nguyen et al.
    2009): rejected brine is mixed over the boundary layer with a z^n
    profile instead of salting the top layer."""

    def _run(self, do_plume):
        from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                        DiabaticParams,
                                                        diabatic_ale)
        nz, ny, nx = 10, 4, 4
        G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=100.0,
                                 len_lat_km=100.0, max_depth=500.0)
        GV = build_layered_vgrid(nz)
        h = jnp.full((nz, ny, nx), 50.0, jnp.float32)
        T = jnp.full((nz, ny, nx), -1.0, jnp.float32)
        S = jnp.full((nz, ny, nx), 34.0, jnp.float32)
        brine = jnp.full((ny, nx), 2e-4, jnp.float32)   # ppt m s-1
        f = BuoyancyForcing(salt_flux=brine, salt_left_behind=brine)
        p = DiabaticParams(do_brine_plume=do_plume, brine_plume_n=5)
        mld = jnp.full((ny, nx), 200.0, jnp.float32)    # 4 layers
        dt = 1800.0
        T2, S2, _, _, _ = diabatic_ale(T, S, h, f, dt, G, GV, p,
                                       mld=mld)
        return np.asarray(h), np.asarray(S), np.asarray(S2), dt

    def test_salt_conserved_and_redistributed(self):
        h, S0, S_top, dt = self._run(False)
        _, _, S_plume, _ = self._run(True)
        tot0 = (S0 * h).sum(axis=0)
        d_top = (S_top * h).sum(axis=0) - tot0
        d_plume = (S_plume * h).sum(axis=0) - tot0
        # both conserve: column salt gain = brine flux * dt
        np.testing.assert_allclose(d_top, 2e-4 * dt, rtol=5e-3)
        np.testing.assert_allclose(d_plume, d_top, rtol=5e-3)
        # without the plume all salt lands near the surface; with it,
        # the top layer gets less and the lower mixed layer more
        assert S_plume[0, 2, 2] < S_top[0, 2, 2]
        assert S_plume[3, 2, 2] > S_top[3, 2, 2]

    def test_profile_increases_with_depth_in_ml(self):
        _, S0, S_plume, _ = self._run(True)
        dS = (S_plume - S0)[:, 2, 2]
        # z^5 weighting: gain grows with depth through the mixed layer
        # (layers 0-3 span the 200 m MLD; diffusion smooths only a bit)
        assert dS[3] > dS[2] > dS[1]
        # essentially nothing reaches far below the mixed layer
        assert dS[3] > 30 * abs(dS[7])
