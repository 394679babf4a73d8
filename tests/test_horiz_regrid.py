"""Horizontal climatology regridding tests: mask-aware bilinear interp,
seeded-relaxation fill of unobserved wet cells, downward continuation,
and the full TS_CONFIG=from_Z path reading an off-grid climatology
(reference: MOM_horizontal_regridding.F90 fill_miss_2d +
horiz_interp_and_extrap_tracer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.horiz_regrid import (fill_missing,
                                        horiz_interp_bilinear,
                                        horiz_interp_and_extrap_tracer)


class TestBilinear:
    def test_exact_for_linear_field(self):
        lon = np.linspace(0.0, 90.0, 10)
        lat = np.linspace(-30.0, 30.0, 8)
        LON, LAT = np.meshgrid(lon, lat)
        src = 2.0 * LON + 3.0 * LAT
        dlon = np.linspace(5.0, 85.0, 13)
        dlat = np.linspace(-25.0, 25.0, 11)
        DLON, DLAT = np.meshgrid(dlon, dlat)
        out, ok = horiz_interp_bilinear(lon, lat, src, DLON, DLAT,
                                        periodic_lon=0.0)
        assert ok.all()
        np.testing.assert_allclose(out, 2.0 * DLON + 3.0 * DLAT,
                                   rtol=1e-12)

    def test_periodic_longitude_seam(self):
        """A smooth zonal wave interpolates cleanly across 360 -> 0."""
        lon = np.arange(0.0, 360.0, 10.0)      # cell centers
        lat = np.linspace(-10.0, 10.0, 5)
        LON, _ = np.meshgrid(lon, lat)
        src = np.cos(np.deg2rad(LON))
        DLON = np.full((3, 4), 355.0) + np.arange(4) * 2.5  # 355..362.5
        DLAT = np.zeros((3, 4))
        out, ok = horiz_interp_bilinear(lon, lat, src, DLON, DLAT,
                                        periodic_lon=360.0)
        assert ok.all()
        np.testing.assert_allclose(out, np.cos(np.deg2rad(DLON)),
                                   atol=5e-3)

    def test_masked_source_downweights(self):
        """Missing source points get zero weight; a target surrounded by
        only-good points is unaffected, one next to a hole still gets a
        value from the good side."""
        lon = np.arange(10.0)
        lat = np.arange(8.0)
        src = np.full((8, 10), 5.0)
        good = np.ones((8, 10), bool)
        good[4, 5] = False
        src[4, 5] = 999.0                      # poison the masked point
        DLON, DLAT = np.meshgrid(np.array([5.2, 2.0]), np.array([4.3]))
        out, ok = horiz_interp_bilinear(lon, lat, src, DLON, DLAT,
                                        good=good, periodic_lon=0.0)
        np.testing.assert_allclose(out, 5.0, rtol=1e-12)


class TestFillMissing:
    def test_observed_cells_pinned_and_holes_harmonic(self):
        """A linear field with a hole: fill reproduces the (harmonic)
        linear interior; observed values never change."""
        ny, nx = 12, 14
        Y, X = np.mgrid[0:ny, 0:nx].astype(float)
        truth = 1.0 + 0.5 * X + 0.25 * Y
        good = np.ones((ny, nx), bool)
        good[4:8, 5:9] = False                  # a 4x4 hole
        wet = np.ones((ny, nx), bool)
        data = np.where(good, truth, np.nan)
        out = fill_missing(np.where(good, data, 0.0), good, wet,
                           acrit=1e-10)
        np.testing.assert_allclose(out[good], truth[good], rtol=0)
        # a linear function is harmonic: the fill must recover it
        # (up to the zonal-wrap edge effect, excluded by the hole's
        # interior position)
        np.testing.assert_allclose(out[~good], truth[~good], atol=1e-2)

    def test_prev_level_seeds_deep_holes(self):
        """With no data at all on a level, the fill reproduces the level
        above (downward continuation)."""
        ny, nx = 6, 6
        wet = np.ones((ny, nx), bool)
        prev = np.full((ny, nx), 3.7)
        out = fill_missing(np.zeros((ny, nx)), np.zeros((ny, nx), bool),
                           wet, prev=prev)
        np.testing.assert_allclose(out, 3.7, atol=1e-12)

    def test_isolated_basin_gets_global_mean(self):
        """A wet cell disconnected from any data (walled by land) falls
        back to the mean of observed values."""
        ny, nx = 8, 8
        wet = np.zeros((ny, nx), bool)
        wet[1:4, 1:4] = True                   # basin A (has data)
        wet[6, 6] = True                       # isolated basin B
        good = np.zeros((ny, nx), bool)
        good[1:4, 1:4] = True
        data = np.where(good, 2.0, 0.0)
        out = fill_missing(data, good, wet)
        assert out[6, 6] == pytest.approx(2.0)

    def test_full_pipeline_levels_continue_downward(self):
        lon = np.linspace(0, 100, 20)
        lat = np.linspace(0, 80, 16)
        LON, LAT = np.meshgrid(lon, lat)
        lvl0 = 15.0 + 0.01 * LON
        lvl1 = np.full_like(lvl0, np.nan)       # deep level: unobserved
        data = np.stack([lvl0, lvl1])
        DLON, DLAT = np.meshgrid(np.linspace(10, 90, 9),
                                 np.linspace(10, 70, 7))
        wet = np.ones(DLON.shape, bool)
        out = horiz_interp_and_extrap_tracer(lon, lat, data, wet,
                                             DLON, DLAT,
                                             periodic_lon=0.0)
        np.testing.assert_allclose(out[0], 15.0 + 0.01 * DLON, rtol=1e-6)
        np.testing.assert_allclose(out[1], out[0], atol=1e-10)


class TestFromZOffGrid:
    def test_config_from_z_with_off_grid_climatology(self, tmp_path):
        """TS_CONFIG=from_Z with a coarse climatology on its own lon/lat
        grid and NaN land: every wet model cell initializes inside the
        data range, warm-at-top."""
        from mom6_tpu.io.netcdf import NCWriter
        from mom6_tpu.framework.config import ParamFile
        from mom6_tpu.drivers.config_driver import build_model_from_params

        # climatology: 6x5 coarse grid over a 500x400 km cartesian
        # domain (model geoLon/geoLat are in km), 3 z-levels
        lon = np.linspace(0.0, 500.0, 6)
        lat = np.linspace(0.0, 400.0, 5)
        LON, LAT = np.meshgrid(lon, lat)
        z_edges = np.array([0.0, 200.0, 600.0, 1000.0])
        T = np.stack([14.0 + 0.004 * LON, 8.0 + 0.002 * LAT,
                      np.full_like(LON, 4.0)])
        S = np.stack([np.full_like(LON, 34.0), np.full_like(LON, 34.6),
                      np.full_like(LON, 35.0)])
        T[:, 2, 3] = np.nan                     # a land hole in the data
        S[:, 2, 3] = np.nan
        w = NCWriter(str(tmp_path / "clim.nc"))
        w.write_static("lon", lon)
        w.write_static("lat", lat)
        w.write_static("z_edges", z_edges)
        w.write_static("ptemp", T)
        w.write_static("salt", S)
        w.close()

        (tmp_path / "MOM_input").write_text(f"""
NIGLOBAL = 12
NJGLOBAL = 10
NK = 4
LENLON = 500.0
LENLAT = 400.0
MAXIMUM_DEPTH = 1000.0
DT = 900.0
ENABLE_THERMODYNAMICS = True
TS_CONFIG = from_Z
TEMP_SALT_Z_INIT_FILE = clim.nc
INPUTDIR = {tmp_path}
""")
        ms = build_model_from_params(
            ParamFile([str(tmp_path / "MOM_input")]))
        Tm = np.asarray(ms.state.T)
        Sm = np.asarray(ms.state.S)
        wet = np.asarray(ms.grid.mask2dT) > 0.5
        assert np.isfinite(Tm[:, wet]).all() and np.isfinite(Sm[:, wet]).all()
        assert Tm[:, wet].min() >= 3.9 and Tm[:, wet].max() <= 16.1
        assert Sm[:, wet].min() >= 33.9 and Sm[:, wet].max() <= 35.1
        # warm at top, cold at depth; salty at depth
        assert Tm[0, wet].mean() > Tm[-1, wet].mean()
        assert Sm[0, wet].mean() < Sm[-1, wet].mean()
