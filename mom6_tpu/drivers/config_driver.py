"""Config-driven model construction: MOM_input -> runnable model.

The glue between the runtime parameter system (framework/config.py) and
the model builders — the role of MOM6's initialize_MOM parameter reads
(reference: src/core/MOM.F90:2204 with get_param call sites throughout,
and src/initialization/*).  Parameter names follow the reference
(NIGLOBAL, DT, EQN_OF_STATE, THICKNESSDIFFUSE, ...) so a MOM6 user's
MOM_input carries over; everything is logged to MOM_parameter_doc.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import os

import jax.numpy as jnp
import numpy as np

from mom6_tpu.ale.ale import ALEParams, LAYER, RHO, SIGMA, ZSTAR
from mom6_tpu.core.barotropic import BTParams, set_dtbt
from mom6_tpu.core.dynamics_split_rk2 import DynParams, MechForcing
from mom6_tpu.core.mom import Forcing, MOMParams
from mom6_tpu.core.state import OceanState, init_state_resting
from mom6_tpu.framework.config import ParamFile
from mom6_tpu.grid.grid import Grid, build_cartesian_grid
from mom6_tpu.grid.vertical import VerticalGrid, build_layered_vgrid
from mom6_tpu.physics.lateral.hor_visc import HorViscParams
from mom6_tpu.physics.lateral.thickness_diffuse import GMParams
from mom6_tpu.physics.vertical.diabatic import (BuoyancyForcing,
                                                DiabaticParams)
from mom6_tpu.physics.vertical.set_diffusivity import DiffusivityParams

__all__ = ["build_model_from_params", "ModelSetup"]


def _inputdir(pf: ParamFile, doc_dir) -> str:
    """Resolve INPUTDIR (reference: Get_MOM_Input / MOM_get_input.F90)
    against the run directory."""
    d = pf.get("INPUTDIR", str, default=".", module="MOM_get_input",
               desc="Directory for input data files")
    if not os.path.isabs(d):
        d = os.path.join(doc_dir or getattr(pf, "dir", "."), d)
    return d


class ModelSetup(NamedTuple):
    grid: Grid
    vgrid: VerticalGrid
    state: OceanState
    params: MOMParams
    forcing: Forcing
    param_file: ParamFile
    # time-dependent forcing: f(model_time_seconds) -> Forcing, present
    # when any surface field comes from a file (the solo driver's
    # set_forcing-per-segment role, MOM_driver.F90:457-481)
    forcing_provider: Optional[object] = None


def _build_grid(pf: ParamFile, dtype, doc_dir=None) -> Tuple[Grid, float]:
    m = "MOM_grid_init"
    nx = pf.get("NIGLOBAL", int, module=m,
                desc="Number of points in the x-direction")
    ny = pf.get("NJGLOBAL", int, module=m)
    grid_config = pf.get("GRID_CONFIG", str, default="cartesian", module=m)
    if grid_config not in ("cartesian", "spherical", "mercator", "mosaic"):
        raise NotImplementedError(f"GRID_CONFIG={grid_config}")
    lenlon = pf.get("LENLON", float, default=1000.0, units="km", module=m)
    lenlat = pf.get("LENLAT", float, default=1000.0, units="km", module=m)
    max_depth = pf.get("MAXIMUM_DEPTH", float, default=4000.0, units="m",
                       module=m)
    min_depth = pf.get("MINIMUM_DEPTH", float, default=0.0, units="m",
                       module=m)
    f0 = pf.get("F_0", float, default=0.0, units="s-1", module=m)
    beta = pf.get("BETA", float, default=0.0, units="m-1 s-1", module=m)
    topo_config = pf.get("TOPO_CONFIG", str, default="flat", module=m)
    depth = None
    if topo_config == "file":
        # netCDF bathymetry (initialize_topography_from_file,
        # MOM_fixed_initialization.F90:181): depth > 0 wet, clipped to
        # MAXIMUM_DEPTH
        from mom6_tpu.io.netcdf import read_nc
        idir = _inputdir(pf, doc_dir)
        tfile = pf.get("TOPO_FILE", str, default="ocean_topog.nc",
                       module=m, desc="netCDF file with the bathymetry")
        tvar = pf.get("TOPO_VARNAME", str, default="depth", module=m)
        data = read_nc(os.path.join(idir, tfile))
        if tvar not in data:
            raise ValueError(f"{tfile} has no variable {tvar!r}")
        depth = np.asarray(data[tvar], np.float64)
        if depth.shape != (ny, nx):
            raise ValueError(f"topography shape {depth.shape} != "
                             f"({ny}, {nx})")
        depth = np.minimum(depth, max_depth)
    elif topo_config == "flat":
        depth = None
    elif topo_config == "bowl":
        x = (np.arange(nx) + 0.5) / nx - 0.5
        y = (np.arange(ny) + 0.5) / ny - 0.5
        r2 = (2 * x[None, :]) ** 2 + (2 * y[:, None]) ** 2
        depth = max_depth * (1.0 - 0.8 * r2)
    elif topo_config == "spoon":
        x = (np.arange(nx) + 0.5) / nx
        y = (np.arange(ny) + 0.5) / ny - 0.5
        depth = max_depth * (1.0 - 0.8 * (2 * y[:, None]) ** 2) * \
            np.ones((ny, nx))
    elif topo_config == "benchmark":
        # reentrant channel to the south with ridges (the benchmark
        # topography, src/user/benchmark_initialization.F90:60-73)
        x = ((np.arange(nx) + 0.5) / nx)[None, :]
        y = ((np.arange(ny) + 0.5) / ny)[:, None]
        d0 = max_depth / 0.5
        depth = -d0 * (y * (1.0 + 0.6 * np.cos(4.0 * np.pi * x))
                       + 0.75 * np.exp(-6.0 * y)
                       + 0.05 * np.cos(10.0 * np.pi * x) - 0.7)
        depth = np.clip(depth, 0.0, max_depth)
    elif topo_config == "halfpipe":
        # zonally uniform channel with a half-sine profile
        # (initialize_topography_named, MOM_shared_initialization.F90:358)
        y = ((np.arange(ny) + 0.5) / ny)[:, None]
        dedge = min_depth
        depth = (dedge + (max_depth - dedge)
                 * np.abs(np.sin(np.pi * y))) * np.ones((ny, nx))
    elif topo_config == "seamount":
        # Gaussian seamount on a flat bottom
        # (seamount_initialization.F90 seamount_initialize_topography)
        delta = pf.get("SEAMOUNT_DELTA", float, default=0.5, module=m,
                       desc="Fractional height of the seamount")
        Lsm = pf.get("SEAMOUNT_LENGTH_SCALE", float, default=20.0,
                     units="km", module=m)
        x = ((np.arange(nx) + 0.5) / nx - 0.5) * lenlon
        y = ((np.arange(ny) + 0.5) / ny - 0.5) * lenlat
        r2 = (x[None, :] ** 2 + y[:, None] ** 2) / max(Lsm, 1e-3) ** 2
        depth = max_depth * (1.0 - delta * np.exp(-r2))
    elif topo_config == "dome2d":
        # shelf + linear slope to the deep basin
        # (DOME2d_initialization.F90 DOME2d_initialize_topography)
        shelf_frac = pf.get("DOME2D_SHELF_DEPTH", float, default=0.2,
                            module=m, desc="Shelf depth / max depth")
        ls = pf.get("DOME2D_SHELF_FRAC", float, default=0.25, module=m)
        lb = pf.get("DOME2D_BASIN_FRAC", float, default=0.45, module=m)
        xf = ((np.arange(nx) + 0.5) / nx)[None, :]
        d = np.where(xf < ls, shelf_frac,
                     np.where(xf < 1.0 - lb,
                              shelf_frac + (1.0 - shelf_frac)
                              * (xf - ls) / max(1.0 - lb - ls, 1e-6),
                              1.0))
        depth = max_depth * d * np.ones((ny, nx))
    elif topo_config == "dumbbell":
        # two deep basins joined by a shallow narrow strait
        # (dumbbell_initialization.F90 dumbbell_initialize_topography)
        sill = pf.get("DUMBBELL_SILL_DEPTH", float,
                      default=0.1 * max_depth, units="m", module=m)
        lenf = pf.get("DUMBBELL_LEN_FRAC", float, default=0.2, module=m,
                      desc="Strait length fraction of the domain")
        widf = pf.get("DUMBBELL_WIDTH_FRAC", float, default=0.25,
                      module=m)
        xf = np.abs((np.arange(nx) + 0.5) / nx - 0.5)[None, :]
        yf = np.abs((np.arange(ny) + 0.5) / ny - 0.5)[:, None]
        in_strait = (xf < 0.5 * lenf)
        strait_open = (yf < 0.5 * widf)
        depth = np.where(in_strait & ~strait_open, 0.0,
                         np.where(in_strait, sill, max_depth)
                         ) * np.ones((ny, nx))
    elif topo_config == "slope":
        # linear cross-shore slope from the shelf to the deep ocean
        # (shelfwave/RGC-style coastal shelf)
        shelf_d = pf.get("SHELF_DEPTH", float, default=100.0, units="m",
                         module=m)
        yf = ((np.arange(ny) + 0.5) / ny)[:, None]
        depth = (shelf_d + (max_depth - shelf_d) * yf) * np.ones((ny, nx))
    elif topo_config == "Kelvin":
        # angled-coast channel (Kelvin_initialize_topography)
        from mom6_tpu.drivers.user_cases import kelvin_depth
        depth = kelvin_depth(
            nx, ny, lenlon, lenlat, max_depth, max(min_depth, 1e-3),
            coast_offset1=pf.get("ROTATED_COAST_OFFSET_1", float,
                                 default=100.0, units="km", module=m),
            coast_offset2=pf.get("ROTATED_COAST_OFFSET_2", float,
                                 default=10.0, units="km", module=m),
            coast_angle_deg=pf.get("ROTATED_COAST_ANGLE", float,
                                   default=11.3, units="degrees",
                                   module=m))
    elif topo_config == "shelfwave":
        # exponential cross-shore shelf (shelfwave_initialize_topography)
        from mom6_tpu.drivers.user_cases import shelfwave_depth
        depth = shelfwave_depth(
            nx, ny, lenlat, max_depth, max(min_depth, 1e-3),
            ly=pf.get("SHELFWAVE_Y_LENGTH_SCALE", float, default=50.0,
                      units="km", module=m))
    elif topo_config == "DOME":
        # slope basin + shelf embayment (DOME_initialize_topography)
        from mom6_tpu.drivers.user_cases import dome_depth
        depth = dome_depth(
            nx, ny, lenlon, lenlat, max_depth, max(min_depth, 1e-3),
            shelf_depth=pf.get("DOME_SHELF_DEPTH", float, default=600.0,
                               units="m", module=m),
            shelf_edge_lat=pf.get("DOME_SHELF_EDGE_LAT", float,
                                  default=600.0, units="km", module=m),
            inflow_lon=pf.get("DOME_INFLOW_LON", float, default=1000.0,
                              units="km", module=m),
            inflow_width=pf.get("DOME_INFLOW_WIDTH", float, default=100.0,
                                units="km", module=m),
            slope=pf.get("DOME_TOPOG_SLOPE", float, default=0.01,
                         module=m))
    elif topo_config == "Neverworld":
        # idealized two-basin world with a reentrant southern channel
        # (Neverworld_initialize_topography)
        from mom6_tpu.drivers.user_cases import neverworld_depth
        depth = neverworld_depth(
            nx, ny, max_depth,
            roughness_amp=pf.get("NL_ROUGHNESS_AMP", float, default=0.05,
                                 module=m),
            continent_amp=pf.get("NL_CONTINENT_AMP", float, default=1.0,
                                 module=m))
    else:
        raise NotImplementedError(f"TOPO_CONFIG={topo_config}")
    if depth is not None:
        # limit_topography (MOM_shared_initialization.F90): no wet point
        # deeper than MAXIMUM_DEPTH.  THICKNESS_CONFIG=uniform places the
        # deepest initial interface at MAXIMUM_DEPTH, so unclamped
        # analytic topographies (e.g. Neverworld's roughness pushing D
        # past max) would start with a multi-hundred-meter free-surface
        # depression and a violent spurious adjustment.
        depth = np.minimum(depth, max_depth)
    cyclic_x = pf.get("REENTRANT_X", bool, default=False, module=m)
    reentrant_y = pf.get("REENTRANT_Y", bool, default=False, module=m)
    if grid_config == "mosaic":
        # FMS supergrid pair (set_grid_metrics_from_mosaic,
        # MOM_grid_initialize.F90:150-430)
        from mom6_tpu.grid.mosaic import (build_grid_from_supergrid,
                                          read_supergrid)
        idir = _inputdir(pf, doc_dir)
        gfile = pf.get("GRID_FILE", str, default="ocean_hgrid.nc",
                       module=m, desc="FMS supergrid file")
        sg = read_supergrid(os.path.join(idir, gfile))
        if depth is None:
            raise ValueError("GRID_CONFIG=mosaic requires TOPO_CONFIG="
                             "file (the mosaic pair ships a topography)")
        fold = pf.get("TRIPOLAR_N", bool, default=False, module=m,
                      desc="Northern tripolar fold (FOLD_NORTH_EDGE)")
        G = build_grid_from_supergrid(
            sg, depth, min_depth=max(min_depth, 1e-3),
            cyclic_x=cyclic_x, reentrant_y=reentrant_y,
            fold_north=fold, dtype=dtype)
        if (G.nx, G.ny) != (nx, ny):
            raise ValueError(f"supergrid implies {G.nx}x{G.ny}, "
                             f"MOM_input says {nx}x{ny}")
        return G, max_depth
    if grid_config in ("spherical", "mercator"):
        from mom6_tpu.grid.grid import build_spherical_grid
        west = pf.get("WESTLON", float, default=0.0, units="degrees",
                      module=m)
        south = pf.get("SOUTHLAT", float, default=-40.0, units="degrees",
                       module=m)
        iso = grid_config == "mercator" or pf.get(
            "ISOTROPIC", bool, default=False, module=m,
            desc="Mercator (locally square) meridional spacing")
        G = build_spherical_grid(nx, ny, west, south, lenlon, lenlat,
                                 depth=depth, max_depth=max_depth,
                                 min_depth=min_depth, cyclic_x=cyclic_x,
                                 isotropic=iso, dtype=dtype)
    else:
        south_km = pf.get("SOUTHLAT", float, default=0.0, units="km",
                          module=m,
                          desc="y of the southern edge (cartesian km); "
                          "negative puts the f=F_0 line in the domain")
        west_km = pf.get("WESTLON", float, default=0.0, units="km",
                         module=m)
        G = build_cartesian_grid(nx, ny, lenlon, lenlat, depth=depth,
                                 max_depth=max_depth, min_depth=min_depth,
                                 f0=f0, beta=beta, cyclic_x=cyclic_x,
                                 reentrant_y=reentrant_y,
                                 south_lat_km=south_km,
                                 west_lon_km=west_km, dtype=dtype)
    return G, max_depth


def _benchmark_t_profile(pf, gv, eos_name, nz, G, m):
    """Layer target temperatures + SST field of the benchmark case
    (src/user/benchmark_initialization.F90:254-300): T0(k) Newton-solved
    so the EOS density at (T0, S_REF, P_REF) equals Rlay(k); the
    ML/buffer layers (below k1) take the latitude-cosine SST.  Returns
    (T0 (nz,), k1, SST (ny, nx))."""
    from mom6_tpu.eos import get_eos
    eos = get_eos(eos_name)
    s_ref = pf.get("S_REF", float, default=35.0, units="ppt", module=m)
    t_light = pf.get("BENCHMARK_T_LIGHT", float, default=29.0,
                     units="degC", module=m)
    p_ref = pf.get("P_REF", float, default=2e7, units="Pa", module=m)
    k1 = 0
    if pf.get("BULKMIXEDLAYER", bool, default=False, module=m):
        k1 = (pf.get("NKML", int, default=2, module=m)
              + pf.get("NKBL", int, default=2, module=m))
    k1 = min(k1, nz - 1)
    rlay = np.asarray(gv.Rlay, np.float64)
    rho0 = float(gv.rho0)
    S = jnp.full(nz, s_ref)
    P = jnp.full(nz, p_ref)

    def rho_of(T):
        return rho0 + np.asarray(eos.density(jnp.asarray(T), S, P,
                                             rho_ref=rho0), np.float64)

    dT1, _ = eos.density_derivs(jnp.full((), t_light), jnp.full((), s_ref),
                                jnp.full((), p_ref))
    T0 = t_light + (rlay - rho_of(np.full(nz, t_light))[k1]) / float(dT1)
    for _ in range(6):
        dT, _ = eos.density_derivs(jnp.asarray(T0), S, P)
        T0 = T0 + (rlay - rho_of(T0)) / np.asarray(dT, np.float64)
    lat = np.asarray(G.geoLatT, np.float64)
    yfrac = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
    sst = (0.5 * (T0[k1] + T0[-1])
           - 0.45 * (T0[k1] - T0[-1]) * np.cos(np.pi * yfrac))
    return T0, k1, sst


def build_model_from_params(pf: ParamFile, *, dtype=jnp.float32,
                            doc_dir: Optional[str] = None) -> ModelSetup:
    G, max_depth = _build_grid(pf, dtype, doc_dir)

    m = "MOM_verticalGrid"
    nz = pf.get("NK", int, module=m, desc="Number of model layers")
    gv = build_layered_vgrid(
        nz,
        g_earth=pf.get("G_EARTH", float, default=9.8, units="m s-2", module=m),
        rho0=pf.get("RHO_0", float, default=1035.0, units="kg m-3", module=m),
        gprime_int=pf.get("GINT", float, default=9.8e-3, units="m s-2",
                          module=m),
        dtype=dtype,
        boussinesq=pf.get(
            "BOUSSINESQ", bool, default=True, module=m,
            desc="False => mass-conserving non-Boussinesq mode: h is "
            "mass/RHO_0, the PF uses specific-volume integrals, SSH is "
            "steric (MOM_verticalGrid.F90:24-96)"))

    m = "MOM"
    dt = pf.get("DT", float, module=m, units="s", desc="Baroclinic timestep")
    dt_therm = pf.get("DT_THERM", float, default=dt, units="s", module=m)
    n_dyn_per_thermo = max(1, int(round(dt_therm / dt)))
    split = pf.get("SPLIT", bool, default=True, module=m)
    use_thermo = pf.get("ENABLE_THERMODYNAMICS", bool, default=True,
                        module=m)
    eos_name = pf.get("EQN_OF_STATE", str, default="WRIGHT", module=m)

    # layered coordinate targets (MOM_coord_initialization.F90:333-430
    # set_coord_from_TS_range): layer densities from an EOS evaluation of
    # a T/S range at P_REF, with optional denser-end refinement and
    # extrapolated targets for the variable-density ML/buffer layers
    mc = "MOM_coord_initialization"
    coord_cfg = pf.get("COORD_CONFIG", str, default="gprime", module=mc,
                       desc="gprime | ts_range | ALE/none/layer_ref "
                       "(GINT-spaced)")
    if coord_cfg == "ts_range" and use_thermo:
        from mom6_tpu.eos import get_eos
        eos_c = get_eos(eos_name)
        t_ref = pf.get("T_REF", float, default=10.0, units="degC",
                       module=mc)
        t_light = pf.get("TS_RANGE_T_LIGHT", float, default=t_ref,
                         units="degC", module=mc)
        t_dense = pf.get("TS_RANGE_T_DENSE", float, default=t_ref,
                         units="degC", module=mc)
        s_ref = pf.get("S_REF", float, default=35.0, units="ppt",
                       module=mc)
        s_light = pf.get("TS_RANGE_S_LIGHT", float, default=s_ref,
                         units="ppt", module=mc)
        s_dense = pf.get("TS_RANGE_S_DENSE", float, default=s_ref,
                         units="ppt", module=mc)
        res_rat = pf.get("TS_RANGE_RESOLN_RATIO", float, default=1.0,
                         module=mc)
        gfs = pf.get("GFS", float, default=gv.g_earth, units="m s-2",
                     module=mc)
        p_ref = pf.get("P_REF", float, default=2e7, units="Pa", module=mc)
        kl0 = 0
        if pf.get("BULKMIXEDLAYER", bool, default=False, module=mc):
            kl0 = (pf.get("NKML", int, default=2, module=mc)
                   + pf.get("NKBL", int, default=2, module=mc))
        if nz < kl0 + 2:
            raise ValueError("COORD_CONFIG=ts_range needs "
                             "NK >= NKML+NKBL+2")
        T0 = np.full(nz, float(t_light))
        S0 = np.full(nz, float(s_light))
        a1 = 2.0 * res_rat / (1.0 + res_rat)
        for k in range(kl0 + 1, nz):
            kf = (k - kl0) / (nz - 1 - kl0)
            fd = a1 * kf + (1.0 - a1) * kf * kf
            T0[k] = t_light + fd * (t_dense - t_light)
            S0[k] = s_light + fd * (s_dense - s_light)
        rho0 = float(gv.rho0)
        rlay = rho0 + np.asarray(eos_c.density(
            jnp.asarray(T0), jnp.asarray(S0),
            jnp.full(nz, p_ref), rho_ref=rho0), np.float64)
        for k in range(kl0 - 1, -1, -1):    # extrapolate ML/buffer
            rlay[k] = 2.0 * rlay[k + 1] - rlay[k + 2]
        gp = np.empty(nz, np.float64)
        gp[0] = gfs
        gp[1:] = gv.g_earth * np.diff(rlay) / rho0
        from mom6_tpu.grid.vertical import VerticalGrid
        gv = VerticalGrid(nz=nz, g_earth=gv.g_earth, rho0=rho0,
                          angstrom=gv.angstrom,
                          h_subroundoff=gv.h_subroundoff,
                          g_prime=jnp.asarray(gp, dtype),
                          Rlay=jnp.asarray(rlay, dtype),
                          boussinesq=gv.boussinesq)

    m = "MOM_barotropic"
    if split:
        nstep_auto, _ = set_dtbt(G, gv, max_depth, dt)
        dtbt_frac = pf.get("DTBT", float, default=-0.98, module=m,
                           desc="Barotropic step; <0 => fraction of stable")
        nstep = nstep_auto if dtbt_frac < 0 else max(
            1, int(np.ceil(dt / dtbt_frac)))
        # DT_BT_FILTER (reference default -0.25): <0 is a fraction of dt,
        # >=0 a time in s; the filter window half-width in substeps
        dt_filt = pf.get("DT_BT_FILTER", float, default=-0.25, module=m,
                         desc="Barotropic filter window; <0 => fraction "
                         "of DT, >=0 => seconds")
        nfilter = int(np.ceil(abs(dt_filt) * nstep)) if dt_filt < 0 \
            else int(np.ceil(dt_filt / (dt / nstep)))
        bt = BTParams(nstep=nstep, nfilter=max(1, nfilter),
                      bebt=pf.get("BEBT", float, default=0.2, module=m),
                      use_bt_cont=pf.get("USE_BT_CONT_TYPE", bool,
                                         default=False, module=m),
                      lin_drag=pf.get("BT_LIN_DRAG", float, default=0.0,
                                      units="m s-1", module=m),
                      cdrag=pf.get("BT_CDRAG", float, default=0.0,
                                   module=m),
                      dynamic_psurf=pf.get(
                          "DYNAMIC_SURFACE_PRESSURE", bool, default=False,
                          module=m, desc="Viscous surface pressure under "
                          "rigid ice from the coupler's rigidity"),
                      const_dyn_psurf=pf.get(
                          "CONST_DYN_PSURF", float, default=0.9, module=m),
                      ice_strength_length=pf.get(
                          "ICE_LENGTH_DYN_PSURF", float, default=1.0e4,
                          units="m", module=m),
                      wide_halo=pf.get(
                          "BT_WIDE_HALO", int, default=0, module=m,
                          desc="March-inward barotropic halo width "
                          "(BT_HALO_SIZE analogue): each shard carries "
                          "an N-cell rim and exchanges once per N/2 "
                          "substeps instead of per substep. 0 keeps the "
                          "GSPMD dense path; -1 = AUTO (width from the "
                          "mesh/shard shape, off on 1 device); takes "
                          "effect when a mesh is bound "
                          "(parallel.mesh.bind_mesh)."))
    else:
        bt = BTParams(nstep=1, nfilter=0)
    unsplit = None
    unsplit_scheme = "RK3"
    if not split:
        from mom6_tpu.core.dynamics_unsplit import UnsplitParams
        unsplit = UnsplitParams(
            dt=dt,
            kv=pf.get("KV", float, default=1e-4, units="m2 s-1",
                      module="MOM_vert_friction"),
            bottom_drag=pf.get("DRAG_BG_VEL", float, default=0.0,
                               units="m s-1", module="MOM_vert_friction")
            * pf.get("CDRAG", float, default=0.003,
                     module="MOM_vert_friction"))
        unsplit_scheme = pf.get("UNSPLIT_SCHEME", str, default="RK3",
                                module="MOM",
                                desc="RK3 (MOM_dynamics_unsplit) or RK2 "
                                     "(MOM_dynamics_unsplit_RK2)").upper()

    m = "MOM_vert_friction"
    dyn = DynParams(
        dt=dt, bt=bt,
        scheme=("RK2B" if pf.get("SPLIT_RK2B", bool, default=False,
                                 module="MOM") else "RK2"),
        be=pf.get("BE", float, default=0.6, module=m),
        kv=pf.get("KV", float, default=1e-4, units="m2 s-1", module=m),
        bottom_drag=pf.get("DRAG_BG_VEL", float, default=0.0, units="m s-1",
                           module=m) * pf.get("CDRAG", float, default=0.003,
                                              module=m),
        cdrag=pf.get("CDRAG", float, default=0.003, module=m),
        coriolis_scheme=pf.get(
            "CORIOLIS_SCHEME", str, default="SADOURNY75_ENERGY",
            module="MOM_CoriolisAdv",
            desc="SADOURNY75_ENERGY|SADOURNY75_ENSTRO|ARAKAWA_HSU90|"
            "ARAKAWA_LAMB81|ARAKAWA_LAMB_BLEND").upper())
    if pf.get("USE_GL90_IN_SSW", bool, default=False, module=m,
              desc="GL90 interfacial viscosity (TWA form of GM)"):
        dyn = dyn._replace(
            kappa_gl90=pf.get("KD_GL90", float, default=0.0,
                              units="m2 s-1", module=m),
            alpha_gl90=pf.get("ALPHA_GL90", float, default=0.0,
                              units="m2", module=m)
            if pf.get("USE_GL90_N2", bool, default=False, module=m)
            else 0.0,
            hbbl_gl90=pf.get("HBBL_GL90", float, default=5.0, units="m",
                             module=m))

    m = "MOM_hor_visc"
    hv = None
    kh = pf.get("KH", float, default=0.0, units="m2 s-1", module=m)
    ah = pf.get("AH", float, default=0.0, units="m4 s-1", module=m)
    smag_lap = pf.get("SMAGORINSKY_KH", bool, default=False, module=m)
    smag_bi = pf.get("SMAGORINSKY_AH", bool, default=False, module=m)
    smag_lap_c = pf.get("SMAG_LAP_CONST", float, default=0.15, module=m) \
        if smag_lap else 0.0
    smag_bi_c = pf.get("SMAG_BI_CONST", float, default=0.06, module=m) \
        if smag_bi else 0.0
    leith = pf.get("LEITH_KH", bool, default=False, module=m)
    leith_c = pf.get("LEITH_LAP_CONST", float, default=1.0, module=m) \
        if leith else 0.0
    qg_leith = pf.get("USE_QG_LEITH_VISC", bool, default=False, module=m,
                      desc="Use the QG (absolute) vorticity in Leith")
    kh_aniso = 0.0
    aniso_mode = 0
    aniso_n = (1.0, 0.0)
    if pf.get("ANISOTROPIC_VISCOSITY", bool, default=False, module=m):
        kh_aniso = pf.get("KH_ANISO", float, default=0.0, units="m2 s-1",
                          module=m)
        aniso_mode = pf.get("ANISOTROPIC_MODE", int, default=0, module=m,
                            desc="0 fixed direction; 2 along the flow")
        aniso_n = (pf.get("ANISO_GRID_DIR_X", float, default=1.0,
                          module=m),
                   pf.get("ANISO_GRID_DIR_Y", float, default=0.0,
                          module=m))
    if kh or ah or smag_lap_c or smag_bi_c or leith_c or kh_aniso:
        hv = HorViscParams(kh=kh, ah=ah, smag_lap_const=smag_lap_c,
                           smag_bi_const=smag_bi_c,
                           leith_lap_const=leith_c,
                           use_qg_leith=qg_leith, kh_aniso=kh_aniso,
                           aniso_mode=aniso_mode, aniso_n=aniso_n, dt=dt)

    m = "MOM_thickness_diffuse"
    gm = None
    if pf.get("THICKNESSDIFFUSE", bool, default=False, module=m):
        gm = GMParams(khth=pf.get("KHTH", float, default=10.0,
                                  units="m2 s-1", module=m))

    m = "MOM_MEKE"
    meke = None
    if pf.get("USE_MEKE", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.meke import MEKEParams
        meke = MEKEParams(
            damping=pf.get("MEKE_DAMPING", float, default=1e-6, module=m),
            ke_coeff=pf.get("MEKE_KHCOEFF", float, default=0.2, module=m),
            gm_src_frac=pf.get("MEKE_GMCOEFF", float, default=1.0,
                               module=m),
            fr_coeff=pf.get("MEKE_FRCOEFF", float, default=0.0, module=m,
                            desc="Fraction of lateral friction work fed "
                            "back as MEKE"),
            bgsrc=pf.get("MEKE_BGSRC", float, default=0.0,
                         units="m2 s-3", module=m),
            cd_scale=pf.get("MEKE_CD_SCALE", float, default=0.0, module=m),
            cb=pf.get("MEKE_CB", float, default=25.0, module=m),
            ct=pf.get("MEKE_CT", float, default=50.0, module=m),
            uscale=pf.get("MEKE_USCALE", float, default=0.0,
                          units="m s-1", module=m),
            kh_meke=pf.get("MEKE_KH", float, default=100.0,
                           units="m2 s-1", module=m),
            cdrag=pf.get("CDRAG", float, default=0.003, module=m),
            a_deform=pf.get("MEKE_ALPHA_DEFORM", float, default=0.0,
                            module=m),
            a_frict=pf.get("MEKE_ALPHA_FRICT", float, default=0.0,
                           module=m),
            a_rhines=pf.get("MEKE_ALPHA_RHINES", float, default=0.0,
                            module=m),
            a_eady=pf.get("MEKE_ALPHA_EADY", float, default=0.0, module=m),
            a_grid=pf.get("MEKE_ALPHA_GRID", float, default=0.0, module=m),
            l_fixed=pf.get("MEKE_FIXED_MIXING_LENGTH", float, default=0.0,
                           units="m", module=m),
            topo_beta=pf.get("MEKE_TOPOGRAPHIC_BETA", float, default=0.0,
                             module=m),
            ku_coeff=pf.get("MEKE_VISCOSITY_COEFF_KU", float, default=0.0,
                            module=m, desc="Backscatter (negative "
                            "viscosity) amplitude from MEKE"))

    m = "MOM_mixed_layer_restrat"
    mlr = None
    if pf.get("MIXEDLAYER_RESTRAT", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.mixed_layer_restrat import \
            MLRestratParams
        mlr = MLRestratParams(
            fox_kemper_coef=pf.get("FOX_KEMPER_ML_RESTRAT_COEF", float,
                                   default=0.0625, module=m))

    m = "MOM_tracer_hor_diff"
    khtr = pf.get("KHTR", float, default=0.0, units="m2 s-1", module=m)
    khtr_pass = pf.get("KHTR_PASSIVITY_COEFF", float, default=0.0,
                       module=m, desc="Scale KhTr by max(min, coeff * "
                       "Rd/dx): equatorial enhancement")
    khtr_pass_min = pf.get("KHTR_PASSIVITY_MIN", float, default=0.5,
                           module=m)
    khtr_max = pf.get("KHTR_MAX", float, default=0.0, units="m2 s-1",
                      module=m)
    max_tr_cfl = pf.get("MAX_TR_DIFFUSION_CFL", float, default=-1.0,
                        module=m, desc="If positive, subcycle the tracer"
                        " diffusion so each pass stays under this CFL "
                        "(static count from the grid-scale bound)")
    use_ndiff = pf.get("USE_NEUTRAL_DIFFUSION", bool, default=False,
                       module=m)
    khtr_bl = (pf.get("LBD_KHTR", float, default=khtr, units="m2 s-1",
                      module=m)
               if pf.get("USE_HORIZONTAL_BOUNDARY_DIFFUSION", bool,
                         default=False, module=m) else 0.0)

    m = "MOM_tidal_mixing"
    tidal = None
    if pf.get("INT_TIDE_DISSIPATION", bool, default=False, module=m):
        from mom6_tpu.physics.vertical.tidal_mixing import TidalMixingParams
        tidal = TidalMixingParams(
            profile=pf.get("INT_TIDE_PROFILE", str, default="STLAURENT_02",
                           module=m).upper(),
            int_tide_decay_scale=pf.get("INT_TIDE_DECAY_SCALE", float,
                                        default=500.0, units="m", module=m),
            mu_itides=pf.get("MU_ITIDES", float, default=0.2, module=m),
            gamma_itides=pf.get("GAMMA_ITIDES", float, default=0.3333,
                                module=m),
            kappa_h2_factor=pf.get("KAPPA_H2_FACTOR", float, default=0.85,
                                   module=m),
            utide=pf.get("UTIDE", float, default=0.0, units="m s-1",
                         module=m),
            h2=pf.get("TIDAL_ROUGHNESS_H2", float, default=100.0,
                      units="m2", module=m),
            kd_max=pf.get("KD_MAX_ITIDES", float, default=50e-4,
                          units="m2 s-1", module=m))

    m = "MOM_bulk_mixed_layer"
    bulkml = None
    use_bml = pf.get("BULKMIXEDLAYER", bool, default=False, module=m)
    if use_bml:
        from mom6_tpu.physics.vertical.bulk_mixed_layer import BulkMLParams
        bulkml = BulkMLParams(
            nkml=pf.get("NKML", int, default=2, module=m),
            nkbl=pf.get("NKBL", int, default=2, module=m),
            mstar=pf.get("MSTAR", float, default=1.2, module=m),
            bulk_ri_ml=pf.get("BULK_RI_ML", float, default=0.8, module=m),
            tke_decay=pf.get("TKE_DECAY", float, default=2.5, module=m),
            hmix_min=pf.get("HMIX_MIN", float, default=2.0, units="m",
                            module=m))

    m = "MOM_diabatic_driver"
    diab = DiabaticParams(
        diff=DiffusivityParams(
            kd=pf.get("KD", float, default=1e-5, units="m2 s-1", module=m),
            kd_min=pf.get("KD_MIN", float, default=0.0, module=m),
            tidal=tidal),
        bulkml=bulkml,
        boundary_layer_scheme=("BULKML" if use_bml
                               else "KPP" if pf.get("USE_KPP", bool,
                                                    default=False, module=m)
                               else ("EPBL" if pf.get("ENERGETICS_SFC_PBL",
                                                      bool, default=False,
                                                      module=m) else "NONE")),
        use_shear_mixing=(pf.get("USE_CVMIX_SHEAR", bool, default=False,
                                 module=m)
                          or pf.get("USE_JACKSON_PARAM", bool, default=False,
                                    module=m)),
        shear_scheme=("JHL" if pf.get("USE_JACKSON_PARAM", bool,
                                      default=False, module=m)
                      else "LMD94"))

    m = "MOM_ALE"
    ale = ALEParams(mode=LAYER)
    remap_scheme = pf.get("REMAPPING_SCHEME", str, default="PPM_H4",
                          module=m).upper()
    if pf.get("USE_REGRIDDING", bool, default=False, module=m):
        mode = pf.get("REGRIDDING_COORDINATE_MODE", str, default="Z*",
                      module=m).upper()
        dz = pf.get_list("ALE_RESOLUTION",
                         default=[max_depth / nz] * nz, module=m)
        if mode in ("Z*", "ZSTAR"):
            ale = ALEParams(mode=ZSTAR, dz_nominal=tuple(dz))
        elif mode == "SIGMA":
            ale = ALEParams(mode=SIGMA)
        elif mode == "SIGMA_SHELF_ZSTAR":
            from mom6_tpu.ale.ale import SIGMA_SHELF_ZSTAR
            ale = ALEParams(
                mode=SIGMA_SHELF_ZSTAR, dz_nominal=tuple(dz),
                shelf_depth=pf.get("SIGMA_SHELF_ZSTAR_DEPTH", float,
                                   default=200.0, units="m", module=m,
                                   desc="Sigma below this column depth, "
                                   "z* beyond twice it"))
        elif mode == "RHO":
            rlay = pf.get_list("ALE_RHO_TARGETS",
                               default=list(np.asarray(gv.Rlay)), module=m)
            ale = ALEParams(mode=RHO, rho_targets=tuple(rlay),
                            eos_name=eos_name)
        elif mode == "HYCOM1":
            from mom6_tpu.ale.ale import HYCOM1
            rlay = pf.get_list("ALE_RHO_TARGETS",
                               default=list(np.asarray(gv.Rlay)), module=m)
            ale = ALEParams(mode=HYCOM1, rho_targets=tuple(rlay),
                            dz_nominal=tuple(dz), eos_name=eos_name)
        elif mode == "HYBGEN":
            from mom6_tpu.ale.ale import HYBGEN
            rlay = pf.get_list("ALE_RHO_TARGETS",
                               default=list(np.asarray(gv.Rlay)), module=m)
            rlx = pf.get("HYBGEN_RELAX_PERIOD", float, default=4.0,
                         module=m)
            ale = ALEParams(mode=HYBGEN, rho_targets=tuple(rlay),
                            dz_nominal=tuple(dz), eos_name=eos_name,
                            hybgen_qrlx=1.0 / max(rlx, 1.0))
        elif mode == "ADAPTIVE":
            from mom6_tpu.ale.ale import ADAPTIVE
            ale = ALEParams(
                mode=ADAPTIVE, dz_nominal=tuple(dz), eos_name=eos_name,
                adapt_time_ratio=pf.get("ADAPT_TIME_RATIO", float,
                                        default=0.1, module=m),
                adapt_zoom_depth=pf.get("ADAPT_ZOOM_DEPTH", float,
                                        default=200.0, units="m", module=m),
                adapt_zoom_coeff=pf.get("ADAPT_ZOOM_COEFF", float,
                                        default=0.2, module=m),
                adapt_buoy_coeff=pf.get("ADAPT_BUOY_COEFF", float,
                                        default=0.8, module=m),
                adapt_alpha=pf.get("ADAPT_ALPHA", float, default=1.0,
                                   module=m),
                adapt_drho0=pf.get("ADAPT_DRHO0", float, default=0.5,
                                   units="kg m-3", module=m),
                adapt_do_min=pf.get("ADAPT_DO_MIN_DEPTH", bool,
                                    default=False, module=m))
        else:
            raise NotImplementedError(f"REGRIDDING_COORDINATE_MODE={mode}")
        ale = ale._replace(scheme=remap_scheme)

    # -- open boundary segments (MOM_open_boundary role) -------------------
    # OBC_SEGMENT_00n = "EDGE=E,SCHEME=ORLANSKI[,ETA=..][,VEL=..]
    #                    [,TEMP=..][,SALT=..][,TAU=..]"
    m = "MOM_open_boundary"
    obc = None
    obc_ts = []        # (field, slice, TimeSeriesField) for file data
    n_seg = pf.get("OBC_NUMBER_OF_SEGMENTS", int, default=0, module=m)
    if n_seg > 0:
        from mom6_tpu.core.open_boundary import (OBCSegment, build_obc,
                                                 segment_slices)

        def _extent(tok, size):
            """Parse one end of the reference's I=a:b extent (a, b in
            {number, N}; reversed order marks orientation, the extent is
            the same)."""
            tok = tok.strip().upper()
            return size if tok == "N" else int(tok)

        def _parse_data(n, edge, lo, hi):
            """Per-segment DATA string: constants ("U=value:0.1") or
            file series ('SSH=file:bay.nc(ssh)'), the reference's
            update_OBC_segment_data forms."""
            from mom6_tpu.framework.data_override import TimeSeriesField
            from mom6_tpu.io.netcdf import read_nc
            data = pf.get(f"OBC_SEGMENT_{n:03d}_DATA", str,
                          default="", module=m)
            dvals = {}
            fsl, csl = segment_slices(edge, lo, hi, G.ny, G.nx)
            for item in data.split(","):
                if "=" not in item:
                    continue
                key, val = item.split("=", 1)
                key = key.strip().upper()
                val = val.strip()
                if val.lower().startswith("file:"):
                    spec2 = val[5:]
                    fname, var = spec2.split("(")
                    var = var.rstrip(")")
                    path = fname if os.path.isabs(fname) else \
                        os.path.join(_inputdir(pf, doc_dir), fname)
                    raw = read_nc(path)
                    tax = raw.get("time",
                                  np.arange(raw[var].shape[0], dtype=float))
                    ts = TimeSeriesField(np.asarray(tax, np.float64),
                                         np.asarray(raw[var], np.float64),
                                         periodic=True)
                    sl = fsl if key in ("U", "V") else csl
                    obc_ts.append((key, sl, ts))
                elif ":" in val:
                    dvals[key] = float(val.split(":", 1)[1])
                else:
                    dvals[key] = float(val)
            return dvals

        segs = []
        for n in range(1, n_seg + 1):
            spec = pf.get(f"OBC_SEGMENT_{n:03d}", str, module=m)
            items = [it.strip() for it in spec.split(",")]
            if items and items[0].split("=", 1)[0].strip().upper() \
                    in ("I", "J"):
                # the reference's segment syntax, e.g.
                # "J=N,I=N:0,FLATHER,ORLANSKI" (.testing/tc3/MOM_input:
                # OBC_SEGMENT_001): first item names the fixed edge, an
                # optional second I=a:b / J=a:b item gives the extent
                # (honest partial edges), remaining items the schemes
                axis, pos = items[0].split("=", 1)
                pos = pos.strip().upper()
                if axis.strip().upper() == "J":
                    edge = "N" if pos == "N" else "S"
                    size = G.nx
                else:
                    edge = "E" if pos == "N" else "W"
                    size = G.ny
                lo, hi = 0, -1
                rest = items[1:]
                if rest and ":" in rest[0] and "=" in rest[0]:
                    _, ext = rest[0].split("=", 1)
                    a, b = (_extent(t, size) for t in ext.split(":"))
                    lo, hi = min(a, b), max(a, b)
                    rest = rest[1:]
                schemes = [it.upper() for it in rest if "=" not in it]
                # multi-scheme lists combine (FLATHER on the barotropic
                # normal flow + ORLANSKI/OBLIQUE on the baroclinic part);
                # tokens outside the normal-velocity scheme set (NUDGED,
                # ORLANSKI_TAN, SPECIFIED, SIMPLE...) modify behaviors
                # this implementation handles elsewhere or not at all —
                # drop them with a warning rather than refusing the
                # reference config outright
                known = {"FLATHER", "ORLANSKI", "OBLIQUE", "GRADIENT",
                         "SPECIFIED"}
                extra = [s for s in schemes if s not in known]
                if extra:
                    print(f"WARNING: OBC segment {n}: ignoring "
                          f"unsupported scheme tokens {extra}")
                schemes = [s for s in schemes if s in known]
                scheme = "+".join(schemes) if schemes else "FLATHER"
                dvals = _parse_data(n, edge, lo, hi)
                segs.append(OBCSegment(
                    edge=edge, lo=lo, hi=hi, scheme=scheme,
                    eta_ext=dvals.get("SSH", 0.0),
                    vel_ext=dvals.get("U" if edge in ("E", "W") else "V",
                                      0.0),
                    T_ext=dvals.get("TEMP"), S_ext=dvals.get("SALT")))
                continue
            kv = dict(item.split("=", 1) for item in spec.split(","))
            lo = int(kv.get("LO", 0))
            hi = int(kv.get("HI", -1))
            edge = kv["EDGE"].strip().upper()
            dvals = _parse_data(n, edge, lo, hi)
            segs.append(OBCSegment(
                edge=edge, lo=lo, hi=hi,
                scheme=kv.get("SCHEME", "FLATHER").strip().upper(),
                eta_ext=float(kv.get("ETA", dvals.get("SSH", 0.0))),
                vel_ext=float(kv.get("VEL", dvals.get(
                    "U" if edge in ("E", "W") else "V", 0.0))),
                T_ext=float(kv["TEMP"]) if "TEMP" in kv
                else dvals.get("TEMP"),
                S_ext=float(kv["SALT"]) if "SALT" in kv
                else dvals.get("SALT"),
                nudge_timescale=float(kv.get("TAU", 3600.0))))
        # analytic user-case segment data (the reference's
        # OBC_USER_CONFIG registry, src/core/MOM_boundary_update.F90:203)
        user_cfg = pf.get("OBC_USER_CONFIG", str, default="", module=m,
                          desc="Analytic segment data: Kelvin, shelfwave "
                          "(time series) or DOME (steady per-layer "
                          "inflow)")
        if user_cfg:
            from mom6_tpu.drivers import user_cases
            f0 = pf.get("F_0", float, default=0.0, units="s-1",
                        module="MOM_grid_init")
            if user_cfg == "Kelvin":
                obc_ts.extend(user_cases.kelvin_obc_series(
                    segs, G, gv.g_earth, f0,
                    ssh_amp=pf.get("KELVIN_WAVE_SSH_AMP", float,
                                   default=1.0, units="m", module=m),
                    wave_period=pf.get("KELVIN_WAVE_PERIOD", float,
                                       default=12.42 * 3600.0,
                                       units="s", module=m)))
            elif user_cfg == "shelfwave":
                obc_ts.extend(user_cases.shelfwave_obc_series(
                    segs, G, f0,
                    amp=pf.get("SHELFWAVE_AMPLITUDE", float, default=0.1,
                               units="m s-1", module=m),
                    lx=pf.get("SHELFWAVE_X_WAVELENGTH", float,
                              default=100.0, units="km", module=m),
                    ly=pf.get("SHELFWAVE_Y_LENGTH_SCALE", float,
                              default=50.0, units="km", module=m),
                    y_mode=pf.get("SHELFWAVE_Y_MODE", float, default=1.0,
                                  module=m),
                    lenlat=pf.get("LENLAT", float, default=1000.0,
                                  units="km", module="MOM_grid_init")))
            elif user_cfg == "DOME":
                # steady constant-Ri geostrophic embayment inflow with
                # layer temperatures matched to the coordinate densities
                # (DOME_set_OBC_data); fills the SPECIFIED segments
                inflow_lon = pf.get("DOME_INFLOW_LON", float,
                                    default=1000.0, units="km",
                                    module="MOM_grid_init")
                rlay = np.asarray(gv.Rlay, np.float64)
                drho_dt = pf.get("DRHO_DT", float, default=-0.2,
                                 units="kg m-3 degC-1", module="MOM_EOS")
                t_top = pf.get("DOME_T_LIGHT", float, default=25.0,
                               units="degC", module=m)
                t_prof = t_top + (rlay - rlay[0]) / drho_dt
                lonT = np.asarray(G.geoLonT, np.float64)
                new_segs = []
                for seg in segs:
                    if "SPECIFIED" not in seg.scheme.upper():
                        new_segs.append(seg)
                        continue
                    from mom6_tpu.core.open_boundary import segment_slices
                    fsl, csl = segment_slices(seg.edge, seg.lo, seg.hi,
                                              G.ny, G.nx)
                    x_face = lonT[fsl]
                    rho_range = pf.get("DENSITY_RANGE", float, default=2.0,
                                       units="kg m-3",
                                       module="MOM_coord_init")
                    d_edge = pf.get("DOME_INFLOW_THICKNESS", float,
                                    default=300.0, units="m", module=m)
                    ri_tr = pf.get("DOME_INFLOW_RI_TRANS", float,
                                   default=1.0 / 3.0, module=m)
                    f_in = pf.get("DOME_INFLOW_F", float, default=f0,
                                  units="s-1", module=m)
                    if ale.mode != LAYER:
                        # ALE mode: sample the inflow in DEPTH on the
                        # local boundary column (the reference remaps
                        # segment data onto the local grid,
                        # update_OBC_segment_data); a global-layer
                        # profile would land in the shelf column's
                        # massless layers
                        d_face = np.asarray(G.bathyT, np.float64)[csl]
                        v_prof, rc, _ = user_cases.dome_inflow_z(
                            nz, x_face, d_face, max_depth, gv.g_earth,
                            gv.rho0, density_range=rho_range,
                            d_edge=d_edge, ri_trans=ri_tr,
                            f_inflow=f_in, inflow_lon=inflow_lon)
                        t_seg = t_top + rho_range * (1.0 + rc) / drho_dt
                    else:
                        v_prof, _ = user_cases.dome_inflow(
                            nz, x_face, gv.g_earth, gv.rho0,
                            density_range=rho_range, d_edge=d_edge,
                            ri_trans=ri_tr, f_inflow=f_in,
                            inflow_lon=inflow_lon)
                        t_seg = t_prof
                    new_segs.append(seg._replace(
                        vel_profile=v_prof, T_profile=t_seg,
                        S_profile=np.full(nz, pf.get(
                            "S_REF", float, default=35.0, units="ppt",
                            module="MOM_state_initialization"))))
                segs = new_segs
            else:
                raise NotImplementedError(f"OBC_USER_CONFIG={user_cfg}")
        res_in = pf.get("OBC_TRACER_RESERVOIR_LENGTH_SCALE_IN", float,
                        default=0.0, units="m", module=m,
                        desc="Reservoir memory length for inflow")
        res_out = pf.get("OBC_TRACER_RESERVOIR_LENGTH_SCALE_OUT", float,
                         default=0.0, units="m", module=m)
        obc = build_obc(segs, G.ny, G.nx, dtype=dtype,
                        res_len_in=res_in, res_len_out=res_out, nz=nz)

    # -- low-mode internal tide propagation ---------------------------------
    m = "MOM_internal_tides"
    int_tides = None
    if pf.get("INTERNAL_TIDES", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.internal_tides import \
            InternalTidesParams
        # M2 / S2 / K1 / O1 frequencies selectable by count
        # (ENERGIZED_ANGULAR_FREQS role); conversion split equally
        freq_table = (1.4052e-4, 1.4544e-4, 7.2921e-5, 6.7598e-5)
        nfreq = pf.get("INTERNAL_TIDE_FREQS", int, default=1, module=m,
                       desc="Number of tidal frequencies (M2,S2,K1,O1)")
        int_tides = InternalTidesParams(
            n_angle=pf.get("INTERNAL_TIDE_ANGLES", int, default=8,
                           module=m),
            freqs=freq_table[:max(1, min(nfreq, 4))],
            freq_frac=(1.0,) * max(1, min(nfreq, 4)),
            n_mode=pf.get("INTERNAL_TIDE_MODES", int, default=1, module=m,
                          desc="Number of vertical modes propagated"),
            decay_rate=pf.get("INT_TIDE_BACKGROUND_DECAY", float,
                              default=0.0, units="s-1", module=m),
            drag_coef=pf.get("INT_TIDE_DRAG_COEF", float, default=1e-4,
                             module=m))

    # -- column-physics extras (MOM_diabatic_driver sequence flags) --------
    m = "MOM_diabatic_driver"
    geo_scale = pf.get("GEOTHERMAL_SCALE", float, default=0.0,
                       units="W m-2", module="MOM_geothermal",
                       desc="Geothermal heat flux (0 disables)")
    if geo_scale > 0.0:
        from mom6_tpu.physics.vertical.opacity import GeothermalParams
        diab = diab._replace(geothermal=GeothermalParams(
            heat_flux=geo_scale))
    if pf.get("PEN_SW_NBANDS", int, default=0, module="MOM_opacity") > 0:
        from mom6_tpu.physics.vertical.opacity import OpacityParams
        diab = diab._replace(opacity=OpacityParams(
            r_frac=pf.get("PEN_SW_FRAC_R", float, default=0.58,
                          module="MOM_opacity"),
            zeta1=pf.get("PEN_SW_ZETA1", float, default=0.35, units="m",
                         module="MOM_opacity"),
            zeta2=pf.get("PEN_SW_ZETA2", float, default=23.0, units="m",
                         module="MOM_opacity")))
    if pf.get("USE_CVMIX_CONVECTION", bool, default=False, module=m):
        from mom6_tpu.physics.vertical.convection import ConvectionParams
        diab = diab._replace(convection=ConvectionParams(
            kd_conv=pf.get("KD_CONV", float, default=1.0, units="m2 s-1",
                           module=m)))
    if pf.get("DOUBLE_DIFFUSION", bool, default=False, module=m) or \
            pf.get("USE_CVMIX_DDIFF", bool, default=False, module=m):
        from mom6_tpu.physics.vertical.convection import DDiffParams
        diab = diab._replace(ddiff=DDiffParams())
    diab = diab._replace(frazil=pf.get("FRAZIL", bool, default=False,
                                       module=m),
                         tfreeze_form=pf.get("TFREEZE_FORM", str,
                                             default="LINEAR", module=m))
    if pf.get("DO_BRINE_PLUME", bool, default=False,
              module="MOM_diabatic_aux",
              desc="Mix rejected brine over the mixed layer with the "
              "Nguyen et al. 2009 z^n profile"):
        diab = diab._replace(
            do_brine_plume=True,
            brine_plume_n=pf.get("BRINE_PLUME_EXPONENT", int, default=5,
                                 module="MOM_diabatic_aux"),
            brine_plume_frac=pf.get("BRINE_PLUME_FRACTION", float,
                                    default=1.0,
                                    module="MOM_diabatic_aux"))
    diab = diab._replace(cp=pf.get("C_P", float, default=3991.87,
                                   units="J kg-1 K-1", module=m))

    # -- bottom boundary layer (set_viscous_BBL + BBL drag mixing) ---------
    m = "MOM_set_viscosity"
    bbl_visc = None
    if pf.get("BOTTOMDRAGLAW", bool, default=False, module=m,
              desc="BBL viscosity/thickness from a drag law (the "
                   "reference defaults True; off here unless requested)"):
        from mom6_tpu.physics.vertical.set_viscosity import SetViscParams
        bbl_visc = SetViscParams(
            cdrag=pf.get("CDRAG", float, default=0.003, module=m),
            hbbl=pf.get("HBBL", float, default=10.0, units="m", module=m),
            bbl_thick_min=pf.get("BBL_THICK_MIN", float, default=0.1,
                                 units="m", module=m),
            kv_bbl_min=pf.get("KV_BBL_MIN", float, default=1e-4,
                              units="m2 s-1", module=m),
            drag_bg_vel=pf.get("DRAG_BG_VEL", float, default=0.0,
                               units="m s-1", module=m))
        diab = diab._replace(diff=diab.diff._replace(
            bbl_effic=pf.get("BBL_EFFIC", float, default=0.2,
                             module="MOM_set_diffusivity")))

    # -- lateral extras ------------------------------------------------------
    m = "MOM_interface_filter"
    iface_filter = None
    if pf.get("APPLY_INTERFACE_FILTER", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.interface_filter import \
            InterfaceFilterParams
        iface_filter = InterfaceFilterParams(
            time_scale=pf.get("INTERFACE_FILTER_TIME_SCALE", float,
                              default=3600.0, units="s", module=m),
            order=pf.get("INTERFACE_FILTER_ORDER", int, default=2,
                         module=m))

    m = "MOM_porous_barriers"
    porous = None
    if pf.get("POROUS_BARRIER", bool, default=False, module=m,
              desc="Sub-grid sill openness from adjacent-cell depths"):
        from mom6_tpu.core.porous_barriers import PorousBarrier
        bat = np.asarray(G.bathyT)
        d_min_u = np.minimum(bat, np.roll(bat, -1, -1))
        d_max_u = np.maximum(bat, np.roll(bat, -1, -1))
        d_min_v = np.minimum(bat, np.roll(bat, -1, -2))
        d_max_v = np.maximum(bat, np.roll(bat, -1, -2))
        porous = PorousBarrier(
            d_min_u=jnp.asarray(d_min_u, dtype),
            d_max_u=jnp.asarray(d_max_u, dtype),
            d_min_v=jnp.asarray(d_min_v, dtype),
            d_max_v=jnp.asarray(d_max_v, dtype))

    m = "MOM_Zanna_Bolton"
    zb = None
    if pf.get("USE_ZB2020", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.zanna_bolton import ZBParams
        zb = ZBParams(amplitude=pf.get("ZB_SCALING", float, default=0.3,
                                       module=m))

    m = "MOM_stoch_eos"
    stanley = -1.0
    if pf.get("USE_STANLEY_PGF", bool, default=False, module=m):
        stanley = pf.get("STANLEY_COEFF", float, default=0.5, module=m)

    # -- astronomical tides + self-attraction/loading -----------------------
    m = "MOM_tidal_forcing"
    tides = None
    if pf.get("TIDES", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.tidal_forcing import \
            TidalForcingParams
        names = tuple(pf.get("TIDE_CONSTITUENTS", str, default="M2",
                             module=m).replace(" ", "").split(","))
        tides = TidalForcingParams(names=names)
        if pf.get("GRID_CONFIG", str, default="cartesian",
                  module="MOM_grid_init") != "spherical":
            raise ValueError("TIDES requires GRID_CONFIG=spherical "
                             "(astronomical potential needs lat/lon)")
    m = "MOM_self_attr_load"
    sal_h = None
    sal_scalar = pf.get("SAL_SCALAR_VALUE", float, default=0.0, module=m,
                        desc="Scalar SAL coefficient applied inside the "
                             "barotropic subcycle")
    if sal_scalar != 0.0:
        dyn = dyn._replace(bt=dyn.bt._replace(sal_scalar=sal_scalar))
    if pf.get("SAL_HARMONICS", bool, default=False, module=m):
        from mom6_tpu.physics.lateral.self_attr_load import \
            build_sal_harmonics
        sal_h = build_sal_harmonics(
            G, nmax=pf.get("SAL_HARMONICS_DEGREE", int, default=12,
                           module=m))

    # -- stochastic physics (SPPT/SKEB) -------------------------------------
    m = "MOM_stochastics"
    sppt = None
    skeb_scale = 0.0
    do_sppt = pf.get("DO_SPPT", bool, default=False, module=m)
    do_skeb = pf.get("DO_SKEB", bool, default=False, module=m)
    if do_sppt or do_skeb:
        from mom6_tpu.physics.stochastic import SPPTParams
        sppt = SPPTParams(
            amplitude=pf.get("SPPT_AMPLITUDE", float, default=0.5,
                             module=m),
            tau=pf.get("SPPT_TAU", float, default=6.0 * 3600.0, units="s",
                       module=m))
        if do_skeb:
            skeb_scale = pf.get("SKEB_SCALE", float, default=1.0,
                                units="m2 s-1", module=m)

    # -- surface waves -> Langmuir mixing ------------------------------------
    m = "MOM_wave_interface"
    waves = None
    use_waves = pf.get("USE_WAVES", bool, default=False, module=m)
    # USE_LA_LI2016 enables statistical (LF17) waves even without a
    # prognostic wave field (MOM_wave_interface.F90:353-359)
    la_li2016 = pf.get("USE_LA_LI2016", bool, default=False, module=m)
    if (use_waves or la_li2016) and \
            pf.get("LANGMUIR_MIXING", bool, default=True, module=m):
        from mom6_tpu.physics.waves import WaveParams
        method = "LF17" if (la_li2016 and not use_waves) else \
            pf.get("WAVE_METHOD", str, default="LF17", module=m).upper()
        waves = WaveParams(
            method=method,
            la_frac_hbl=pf.get("LA_DEPTH_RATIO", float, default=0.04,
                               module=m),
            la_hbl_min=pf.get("LA_DEPTH_MIN", float, default=0.1,
                              units="m", module=m),
            misalignment=pf.get("LA_MISALIGNMENT", bool, default=False,
                                module=m),
            wave_age=pf.get("WAVE_AGE", float, default=1.2, module=m),
            wave_wind=pf.get("WAVE_WIND", float, default=10.0,
                             units="m s-1", module=m),
            band_stokes_x=tuple(pf.get_list("SURFBAND_STOKES_X",
                                            default=(), module=m)),
            band_stokes_y=tuple(pf.get_list("SURFBAND_STOKES_Y",
                                            default=(), module=m)),
            band_wavenumbers=tuple(pf.get_list("SURFBAND_WAVENUMBERS",
                                               default=(), module=m)))

    # -- tracer packages (MOM_tracer_flow_control flags) --------------------
    m = "MOM_tracer_flow_control"
    pkgs = []
    if pf.get("USE_IDEAL_AGE_TRACER", bool, default=False, module=m):
        from mom6_tpu.tracers.packages import IdealAge
        pkgs.append(IdealAge())
    if pf.get("USE_REGIONAL_DYES", bool, default=False, module=m):
        n_dyes = pf.get("NUM_DYE_TRACERS", int, default=0, module=m,
                        desc="Number of lon/lat-box dye tracers")
        if n_dyes > 0:
            # reference-style per-dye lon/lat(/depth) source boxes
            # (dye_example.F90:108-160)
            from mom6_tpu.tracers.packages import RegionalDyes
            def _dl(name):
                v = pf.get_list(name, default=(), module=m)
                if len(v) not in (0, n_dyes):
                    raise ValueError(
                        f"{name}: expected {n_dyes} values, got {len(v)}")
                return tuple(v)
            pkgs.append(RegionalDyes(
                minlon=_dl("DYE_SOURCE_MINLON"),
                maxlon=_dl("DYE_SOURCE_MAXLON"),
                minlat=_dl("DYE_SOURCE_MINLAT"),
                maxlat=_dl("DYE_SOURCE_MAXLAT"),
                mindepth=_dl("DYE_SOURCE_MINDEPTH"),
                maxdepth=_dl("DYE_SOURCE_MAXDEPTH")))
        else:
            from mom6_tpu.tracers.packages import RegionalDye
            pkgs.append(RegionalDye(
                i_min=pf.get("DYE_SOURCE_MINI", int, default=0, module=m),
                i_max=pf.get("DYE_SOURCE_MAXI", int, default=4, module=m),
                j_min=pf.get("DYE_SOURCE_MINJ", int, default=0, module=m),
                j_max=pf.get("DYE_SOURCE_MAXJ", int, default=4,
                             module=m)))
    if pf.get("USE_BOUNDARY_IMPULSE_TRACER", bool, default=False, module=m):
        from mom6_tpu.tracers.packages import BoundaryImpulse
        pkgs.append(BoundaryImpulse())
    if pf.get("USE_PSEUDO_SALT_TRACER", bool, default=False, module=m):
        from mom6_tpu.tracers.packages import PseudoSalt
        pkgs.append(PseudoSalt())
    if pf.get("USE_OCMIP2_CFC", bool, default=False, module=m):
        from mom6_tpu.tracers.packages import CFCPackage
        pkgs.append(CFCPackage())
    if pf.get("USE_generic_tracer", bool, default=False, module=m,
              desc="Enable the generic-tracer BGC package (NPZD "
              "ecosystem; the MOM_generic_tracer coupling slot)"):
        from mom6_tpu.tracers.bgc import NPZD
        pkgs.append(NPZD())
    tfc = None
    if pkgs:
        from mom6_tpu.tracers.packages import TracerFlowControl
        tfc = TracerFlowControl(pkgs)

    # -- variable lateral mixing coefficients (MOM_lateral_mixing_coeffs)
    m = "MOM_lateral_mixing_coeffs"
    varmix = None
    if pf.get("USE_VARIABLE_MIXING", bool, default=False, module=m,
              desc="Resolution function + Eady slope functions scaling "
              "the lateral mixing coefficients"):
        from mom6_tpu.physics.lateral.lateral_mixing_coeffs import \
            VarMixParams
        varmix = VarMixParams(
            resoln_scaled_kh=pf.get("RESOLN_SCALED_KH", bool,
                                    default=False, module=m),
            resoln_scaled_khth=pf.get("RESOLN_SCALED_KHTH", bool,
                                      default=False, module=m),
            resoln_scaled_khtr=pf.get("RESOLN_SCALED_KHTR", bool,
                                      default=False, module=m),
            use_visbeck=pf.get("USE_VISBECK", bool, default=False,
                               module=m),
            res_coef=pf.get("KH_RES_SCALE_COEF", float, default=1.0,
                            module=m),
            res_fn_power=pf.get("KH_RES_FN_POWER", int, default=2,
                                module=m),
            khth_slope_cff=pf.get("KHTH_SLOPE_CFF", float, default=0.0,
                                  module="MOM_thickness_diffuse"),
            khtr_slope_cff=pf.get("KHTR_SLOPE_CFF", float, default=0.0,
                                  module="MOM_tracer_hor_diff"),
            visbeck_l_scale=pf.get("VISBECK_L_SCALE", float, default=0.0,
                                   units="m", module=m))

    # static tracer-diffusion subcycle count from the grid-scale CFL
    # bound (MAX_TR_DIFFUSION_CFL, MOM_tracer_hor_diff.F90:322): the
    # per-pass CFL of the constant part of KhTr is
    # 8 KhTr dt / min(dx,dy)^2 (4 faces, factor-2 margin)
    n_sub_tr = 1
    if max_tr_cfl > 0.0 and khtr > 0.0:
        wetm = np.asarray(G.mask2dT) > 0.5
        dmin = float(min(np.where(wetm, np.asarray(G.dxT), np.inf).min(),
                         np.where(wetm, np.asarray(G.dyT), np.inf).min()))
        dt_tr = dt * n_dyn_per_thermo
        kh_bound = khtr_max if khtr_max > 0.0 else khtr
        n_sub_tr = max(1, int(np.ceil(8.0 * kh_bound * dt_tr
                                      / (dmin * dmin * max_tr_cfl))))

    params = MOMParams(dyn=dyn, thermo_enabled=use_thermo,
                       eos_name=eos_name, diabatic=diab, ale=ale,
                       hor_visc=hv, gm=gm, meke=meke, mlrestrat=mlr,
                       obc=obc, int_tides=int_tides,
                       khtr=khtr, neutral_diffusion=use_ndiff,
                       khtr_passivity_coeff=khtr_pass,
                       khtr_passivity_min=khtr_pass_min,
                       khtr_max=khtr_max,
                       khtr_n_sub=n_sub_tr,
                       ndiff_scheme=pf.get(
                           "NDIFF_SCHEME", str, default="redi",
                           module="MOM_neutral_diffusion",
                           desc="redi (rotated tensor) or surfaces "
                           "(matched neutral positions)").lower(),
                       khtr_bl=khtr_bl,
                       n_dyn_per_thermo=n_dyn_per_thermo,
                       # static stand-in for the reference's dynamic
                       # "domore" sub-sweep iteration
                       # (MOM_tracer_advect.F90: splits until each
                       # sweep's CFL < 1): one sub-sweep per dyn step
                       # keeps the per-sweep CFL at the dyn-step CFL no
                       # matter how large DT_THERM/DT is
                       tracer_advect_sub=pf.get(
                           "TRACER_ADVECT_SUB", int,
                           default=max(2, n_dyn_per_thermo),
                           module="MOM_tracer_advect",
                           desc="Static x/y sub-sweep count for tracer "
                           "advection over the accumulated DT_THERM "
                           "transports (per-sweep CFL ~ DT_THERM/DT/"
                           "n_sub of the dyn CFL)"),
                       diabatic_first=pf.get(
                           "DIABATIC_FIRST", bool, default=False,
                           module="MOM",
                           desc="Apply diabatic and thermodynamic "
                           "processes before the dynamics"),
                       homogenize_forcings=pf.get(
                           "HOMOGENIZE_FORCINGS", bool, default=False,
                           module="MOM",
                           desc="Replace the forces and fluxes with "
                           "their global means"),
                       interface_filter=iface_filter, porous=porous,
                       zb=zb, bbl_visc=bbl_visc, stanley_coeff=stanley,
                       pf_recon=pf.get(
                           "RECONSTRUCT_FOR_PRESSURE", bool,
                           # reference default is use_ALE
                           # (MOM_PressureForce_FV.F90): under ALE the
                           # PLM reconstruction is what keeps adjacent
                           # columns' density profiles consistent at
                           # topography steps — without it the
                           # layer-mean mismatch drives O(1e-4 m s-2)
                           # rest-state PGF at shelf breaks (r5 probes)
                           default=ale.mode != LAYER,
                           module="MOM_PressureForce",
                           desc="PLM T/S reconstruction in the pressure-"
                           "force density integrals"),
                       tides=tides, sal_harmonics=sal_h, sppt=sppt,
                       skeb_scale=skeb_scale, waves=waves, tfc=tfc,
                       varmix=varmix,
                       unsplit=unsplit, unsplit_scheme=unsplit_scheme)

    # -- initial state ----------------------------------------------------
    m = "MOM_state_initialization"
    thick_cfg = pf.get("THICKNESS_CONFIG", str, default="uniform", module=m)
    if thick_cfg not in ("uniform", "circle_obcs", "benchmark",
                         "sloshing", "internal_wave", "phillips",
                         "gwave", "soliton"):
        raise NotImplementedError(f"THICKNESS_CONFIG={thick_cfg}")
    state = init_state_resting(G, gv, np.full(nz, max_depth / nz),
                               dtype=dtype, with_thermo=use_thermo)
    if thick_cfg == "circle_obcs":
        # raised-disk interface displacement (circle_obcs_initialize_
        # thickness, src/user/circle_obcs_initialization.F90:100-117)
        diskrad = pf.get("DISK_RADIUS", float, module=m,
                         desc="Radius of the elevated disk (grid units)")
        ic_amp = pf.get("DISK_IC_AMPLITUDE", float, default=5.0,
                        units="m", module=m)
        lon = np.asarray(G.geoLonT)
        lat = np.asarray(G.geoLatT)
        lon_c = 0.5 * (lon.min() + lon.max())
        lat_c = 0.5 * (lat.min() + lat.max())
        rad = np.sqrt((lon - lon_c) ** 2 + (lat - lat_c) ** 2) / diskrad
        rad = np.minimum(rad, 1.0) * np.pi
        bell = 0.5 * (1.0 + np.cos(rad))
        h_np = np.asarray(state.h).copy()
        if nz == 1:
            h_np[0] += ic_amp * bell
        else:
            for k in range(nz):
                h_np[k] -= bell * ic_amp * (2 * (k + 1) - nz)
        state = state.replace(h=jnp.asarray(np.maximum(h_np, 1e-10),
                                            dtype))
    elif thick_cfg == "benchmark" and use_thermo:
        # benchmark_initialize_thickness
        # (src/user/benchmark_initialization.F90:81-210): place the
        # interfaces where the latitude-dependent temperature profile
        # (a_exp exponential thermocline over (1-a_exp) linear
        # stratification) crosses the layers' target temperatures,
        # Newton-solved per interface; clamped to the mixed-layer depth
        # above and the bathymetry below
        T0_bm, k1_bm, sst_bm = _benchmark_t_profile(pf, gv, eos_name, nz,
                                                    G, m)
        ml_depth = pf.get("BENCHMARK_ML_DEPTH_IC", float, default=50.0,
                          units="m", module=m)
        ts_scale = pf.get("BENCHMARK_THERMOCLINE_SCALE", float,
                          default=500.0, units="m", module=m)
        a_exp = 0.9
        depth = np.asarray(G.bathyT, np.float64)
        eta = np.zeros((nz + 1, G.ny, G.nx))
        eta[nz] = -depth
        t_bot = T0_bm[nz - 1]
        for K in range(nz - 1, 0, -1):      # interior interfaces, bottom-up
            t_int = 0.5 * (T0_bm[K] + T0_bm[K - 1])
            t_frac = (t_int - t_bot) / np.maximum(sst_bm - t_bot, 1e-10)
            z = np.zeros_like(depth)
            for _ in range(6):
                ez = np.exp(z / ts_scale)
                err = (a_exp * ez
                       + (1.0 - a_exp) * (z / max_depth + 1.0) - t_frac)
                derr = a_exp * ez / ts_scale + (1.0 - a_exp) / max_depth
                z = z - err / derr
            e = np.minimum(np.maximum(z, -depth), -ml_depth)
            eta[K] = np.maximum(e, eta[K + 1] + float(gv.angstrom))
        h_bm = np.maximum(eta[:-1] - eta[1:], float(gv.angstrom))
        state = state.replace(h=jnp.asarray(h_bm, dtype))
    elif thick_cfg in ("sloshing", "internal_wave"):
        # interface displacements of a resting stratified column:
        # "sloshing" tilts every interior interface with the first-mode
        # vertical structure (sloshing_initialization.F90
        # sloshing_initialize_thickness); "internal_wave" displaces ONE
        # interior interface sinusoidally
        amp = pf.get("IC_AMPLITUDE", float, default=20.0, units="m",
                     module=m, desc="Interface displacement amplitude")
        lon = np.asarray(G.geoLonT)
        xfrac = (lon - lon.min()) / max(lon.max() - lon.min(), 1e-30)
        h0 = np.asarray(state.h)
        e = np.concatenate([np.zeros((1, G.ny, G.nx)),
                            np.cumsum(h0, axis=0)], axis=0)
        col = e[-1]
        if thick_cfg == "sloshing":
            # half-wave across the basin, sine mode in the vertical
            for k in range(1, nz):
                mode = np.sin(np.pi * e[k] / np.maximum(col, 1e-3))
                e[k] = e[k] + amp * np.sin(np.pi * xfrac) * mode
        else:
            k0 = pf.get("IC_INTERFACE", int, default=nz // 2, module=m)
            wl = pf.get("IC_WAVELENGTH_FRAC", float, default=0.5,
                        module=m)
            e[k0] = e[k0] + amp * np.sin(2.0 * np.pi * xfrac / wl)
        e = np.minimum(np.maximum.accumulate(e, axis=0), col[None])
        h_new = np.maximum(e[1:] - e[:-1], float(gv.angstrom))
        state = state.replace(h=jnp.asarray(h_new, dtype))
    elif thick_cfg == "gwave":
        # free-surface gravity wave: the whole column scaled by
        # (D + eta)/D with eta = a sin(2 pi x / L)
        # (external_gwave_initialization.F90)
        amp = pf.get("SSH_ANOMALY_HEIGHT", float, default=1.0, units="m",
                     module=m)
        wl = pf.get("SSH_ANOMALY_WAVELENGTH_FRAC", float, default=0.5,
                    module=m)
        lon = np.asarray(G.geoLonT)
        xfrac = (lon - lon.min()) / max(lon.max() - lon.min(), 1e-30)
        eta0 = amp * np.sin(2.0 * np.pi * xfrac / wl)
        col = np.asarray(state.h).sum(0)
        scale = (col + eta0) / np.maximum(col, 1e-6)
        state = state.replace(h=jnp.asarray(
            np.asarray(state.h) * scale[None], dtype))
    elif thick_cfg == "soliton":
        # equatorial Rossby soliton (Boyd 1980; the reference's
        # soliton_initialization.F90): eta and (u, v) from the
        # asymptotic sech^2 solution on the equatorial beta plane,
        # nondimensionalized by the equatorial deformation scales
        amp = pf.get("SOLITON_AMPLITUDE", float, default=0.395, module=m,
                     desc="Nondimensional soliton amplitude parameter B")
        ssh_scale = pf.get("SOLITON_SSH_SCALE", float, default=-1.0,
                           units="m", module=m,
                           desc="SSH amplitude scale; <0 uses Boyd's "
                           "0.771*B^2*H (the genuine soliton regime)")
        c0 = np.sqrt(9.8 * max_depth)
        if ssh_scale < 0.0:
            ssh_scale = 0.771 * amp * amp * max_depth
        beta_eq = pf.get("BETA", float, default=2.3e-11, module=m)
        L_eq = np.sqrt(c0 / max(beta_eq, 1e-13))     # equatorial radius
        # geoLonT/geoLatT are in km for cartesian grids; the equator is
        # the absolute y=0 line (put it in the domain with SOUTHLAT<0)
        lon = np.asarray(G.geoLonT)
        lat = np.asarray(G.geoLatT)
        x_m = (lon - 0.5 * (lon.min() + lon.max())) * 1e3
        y_m = lat * 1e3
        x_nd = x_m / L_eq
        y_nd = y_m / L_eq
        B = amp
        sech2 = 1.0 / np.cosh(B * x_nd) ** 2
        phi = 0.25 * (6.0 * y_nd ** 2 + 3.0) * np.exp(-0.5 * y_nd ** 2)
        eta0 = ssh_scale * sech2 * phi
        u0 = ssh_scale * (9.8 / c0) * sech2 * 0.25             * (6.0 * y_nd ** 2 - 9.0) * np.exp(-0.5 * y_nd ** 2)
        col = np.asarray(state.h).sum(0)
        scale = (col + eta0) / np.maximum(col, 1e-6)
        h_new = np.asarray(state.h) * scale[None]
        u_init = np.broadcast_to(u0[None], h_new.shape)
        state = state.replace(
            h=jnp.asarray(h_new, dtype),
            u=jnp.asarray(u_init, dtype) * G.mask2dCu)
    elif thick_cfg == "phillips":
        # Phillips 2-layer instability: interior interfaces tilted by a
        # tanh jet in y, with the geostrophically balanced zonal flow
        # (Phillips_initialization.F90 Phillips_initialize_thickness /
        # _velocity): u_k - u_{k+1} = -(g'_{k+1}/f) d(eta_{k+1})/dy
        jet_h = pf.get("JET_HEIGHT", float, default=200.0, units="m",
                       module=m)
        jet_w = pf.get("JET_WIDTH", float, default=0.1, module=m,
                       desc="Jet width as a fraction of the domain")
        lat = np.asarray(G.geoLatT)
        yfrac = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
        arg = (yfrac - 0.5) / max(jet_w, 1e-6)
        h0 = np.asarray(state.h)
        e = np.concatenate([np.zeros((1, G.ny, G.nx)),
                            np.cumsum(h0, axis=0)], axis=0)
        col = e[-1]
        for k in range(1, nz):
            zfac = np.sin(np.pi * k / nz)        # interior-mode shape
            e[k] = e[k] + jet_h * np.tanh(arg) * zfac
        e = np.minimum(np.maximum.accumulate(e, axis=0), col[None])
        h_new = np.maximum(e[1:] - e[:-1], float(gv.angstrom))
        # geostrophic shear from the interface slopes, bottom at rest
        f_h = np.asarray(G.CoriolisBu)
        f_h = 0.25 * (f_h + np.roll(f_h, 1, 0) + np.roll(f_h, 1, 1)
                      + np.roll(np.roll(f_h, 1, 0), 1, 1))
        f_h = np.where(np.abs(f_h) < 1e-12, 1e-12, f_h)
        dy = np.asarray(G.dyT)
        gp = np.asarray(gv.g_prime)
        u = np.zeros_like(h0)
        for k in range(nz - 2, -1, -1):
            # thermal wind: f (u_k - u_{k+1}) = +g' d(e_{k+1})/dy with e
            # positive DOWN (interface height eta = -e); centered in y,
            # averaged to the u faces
            de = (np.roll(e[k + 1], -1, axis=0)
                  - np.roll(e[k + 1], 1, axis=0)) / (2.0 * dy)
            de_u = 0.5 * (de + np.roll(de, -1, axis=1))
            u[k] = u[k + 1] + gp[k + 1] / f_h * de_u
        state = state.replace(h=jnp.asarray(h_new, dtype),
                              u=jnp.asarray(u, dtype) * G.mask2dCu)
    if meke is not None:
        state = state.replace(E_meke=jnp.zeros((G.ny, G.nx), dtype))
    if int_tides is not None:
        from mom6_tpu.physics.lateral.internal_tides import \
            init_int_tide_energy
        state = state.replace(
            En_itide=init_int_tide_energy(int_tides, G.ny, G.nx, dtype))
    if use_thermo:
        ts_cfg = pf.get("TS_CONFIG", str, default="fit", module=m)
        t_ref = pf.get("T_REF", float, default=10.0, units="degC", module=m)
        s_ref = pf.get("S_REF", float, default=35.0, units="ppt", module=m)
        if ts_cfg == "benchmark":
            # benchmark_init_temperature_salinity
            # (src/user/benchmark_initialization.F90:223-300): layer
            # temperatures are the Rlay-matched targets (Newton via the
            # EOS), the variable-density ML/buffer layers carry the
            # latitude-dependent SST
            T0_bm, k1_bm, sst_bm = _benchmark_t_profile(pf, gv, eos_name,
                                                        nz, G, m)
            tprof = np.broadcast_to(T0_bm[:, None, None],
                                    (nz, G.ny, G.nx)).copy()
            tprof[:k1_bm] = sst_bm[None]
            state = state.replace(
                T=jnp.asarray(tprof, dtype),
                S=jnp.full(state.h.shape, s_ref, dtype))
        elif ts_cfg == "from_Z":
            # T/S from a z-space climatology file conservatively remapped
            # onto the layer grid (MOM_temp_salt_initialize_from_Z,
            # MOM_state_initialization.F90:2523, via grid/z_init.py's
            # Z_INIT_ALE_REMAPPING path)
            from mom6_tpu.grid.z_init import init_tracer_from_z
            from mom6_tpu.io.netcdf import read_nc
            zfile = pf.get("TEMP_SALT_Z_INIT_FILE", str, module=m,
                           desc="NetCDF with z_edges + ptemp + salt")
            tvar = pf.get("Z_INIT_FILE_PTEMP_VAR", str, default="ptemp",
                          module=m)
            svar = pf.get("Z_INIT_FILE_SALT_VAR", str, default="salt",
                          module=m)
            path = zfile if os.path.isabs(zfile) else \
                os.path.join(_inputdir(pf, doc_dir), zfile)
            raw = read_nc(path)
            z_edges = np.asarray(raw["z_edges"], np.float64)
            t_raw = np.asarray(raw[tvar], np.float64)
            s_raw = np.asarray(raw[svar], np.float64)
            if "lon" in raw and "lat" in raw and t_raw.ndim == 3 \
                    and t_raw.shape[1:] != (G.ny, G.nx):
                # climatology on its own rectilinear grid: bilinear
                # interp onto the model grid + seeded-relaxation fill of
                # every wet cell (horiz_interp_and_extrap_tracer,
                # MOM_horizontal_regridding.F90:276-625)
                from mom6_tpu.grid.horiz_regrid import \
                    horiz_interp_and_extrap_tracer
                missv = pf.get("Z_INIT_DATA_MISSING", float,
                               default=np.nan, module=m,
                               desc="Missing value in the climatology "
                               "(NaN always treated as missing)")
                per = 360.0 if pf.get(
                    "GRID_CONFIG", str, default="cartesian",
                    module="MOM_grid_init") in ("spherical", "mercator",
                                                "mosaic") else 0.0
                wet = np.asarray(G.mask2dT) > 0.5
                lonT = np.asarray(G.geoLonT)
                latT = np.asarray(G.geoLatT)
                mv = None if np.isnan(missv) else missv
                cyc = bool(getattr(G, "cyclic_x", False))
                t_raw = horiz_interp_and_extrap_tracer(
                    raw["lon"], raw["lat"], t_raw, wet, lonT, latT,
                    missing_value=mv, periodic_lon=per, cyclic_x=cyc)
                s_raw = horiz_interp_and_extrap_tracer(
                    raw["lon"], raw["lat"], s_raw, wet, lonT, latT,
                    missing_value=mv, periodic_lon=per, cyclic_x=cyc)
            T0 = init_tracer_from_z(z_edges, t_raw, state.h, G.bathyT)
            S0 = init_tracer_from_z(z_edges, s_raw, state.h, G.bathyT)
            state = state.replace(T=jnp.asarray(T0, dtype),
                                  S=jnp.asarray(S0, dtype))
        elif ts_cfg == "front":
            # lock-exchange / adjustment front: T jumps by T_RANGE across
            # a (possibly perturbed) front at mid-domain
            # (lock_exchange_initialization.F90 /
            # adjustment_initialization.F90)
            trange = pf.get("T_RANGE", float, default=2.0, units="degC",
                            module=m)
            axis = pf.get("FRONT_AXIS", str, default="x", module=m)
            lf = pf.get("FRONT_WIDTH_FRAC", float, default=0.02, module=m)
            wavelen = pf.get("FRONT_WAVE_FRAC", float, default=0.0,
                             module=m, desc="Along-front perturbation "
                             "wavelength fraction (0 = straight front)")
            wamp = pf.get("FRONT_WAVE_AMP", float, default=0.05, module=m)
            lon = np.asarray(G.geoLonT)
            lat = np.asarray(G.geoLatT)
            xfr = (lon - lon.min()) / max(lon.max() - lon.min(), 1e-30)
            yfr = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
            across, along = (xfr, yfr) if axis == "x" else (yfr, xfr)
            x0 = 0.5 * np.ones_like(across)
            if wavelen > 0.0:
                x0 = x0 + wamp * np.sin(2.0 * np.pi * along / wavelen)
            tfield = t_ref + 0.5 * trange * np.tanh(
                (across - x0) / max(lf, 1e-6))
            state = state.replace(
                T=jnp.asarray(np.broadcast_to(tfield[None], state.h.shape),
                              dtype),
                S=jnp.full(state.h.shape, s_ref, dtype))
        elif ts_cfg == "rossby_front":
            # 2-D Rossby adjustment front: a mixed layer whose depth
            # varies linearly with y over stratification
            # (Rossby_front_2d_initialization.F90)
            trange = pf.get("T_RANGE", float, default=2.0, units="degC",
                            module=m)
            hml_max = pf.get("ML_DEPTH_MAX", float,
                             default=0.5 * max_depth, units="m", module=m)
            lat = np.asarray(G.geoLatT)
            yfr = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
            hml = hml_max * yfr                           # (ny, nx)
            zc = (np.cumsum(np.full(nz, max_depth / nz))
                  - max_depth / nz / 2)[:, None, None]
            in_ml = zc < hml[None]
            t_deep = t_ref - 0.5 * trange \
                - trange * (zc - hml[None]) / max_depth
            tfield = np.where(in_ml, t_ref + 0.5 * trange, t_deep)
            state = state.replace(
                T=jnp.asarray(np.broadcast_to(tfield, state.h.shape),
                              dtype),
                S=jnp.full(state.h.shape, s_ref, dtype))
        else:
            trange = pf.get("T_RANGE", float, default=0.0, units="degC",
                            module=m)
            zc = np.cumsum(np.full(nz, max_depth / nz)) - \
                max_depth / nz / 2
            tprof = t_ref + trange * (0.5 - zc / max_depth)
            state = state.replace(
                T=jnp.asarray(np.broadcast_to(tprof[:, None, None],
                                              state.h.shape), dtype),
                S=jnp.full(state.h.shape, s_ref, dtype))

    # -- surface forcing (solo-driver analytic configs,
    #    config_src/drivers/solo_driver/MOM_surface_forcing.F90) -----------
    m = "MOM_surface_forcing"
    wind_cfg = pf.get("WIND_CONFIG", str, default="zero", module=m)
    taux = tauy = None
    if wind_cfg == "gyres":
        # reference formula (wind_forcing_gyres,
        # MOM_surface_forcing.F90:562): taux = const
        #   + sin_amp sin(n pi y) + cos_amp cos(n pi y), y normalized.
        # With no amplitudes given, fall back to the historical
        # -TAUX_MAGNITUDE cos(2 pi y) double gyre of this repo's configs.
        sin_amp = pf.get("TAUX_SIN_AMP", float, default=0.0, units="Pa",
                         module=m)
        cos_amp = pf.get("TAUX_COS_AMP", float, default=0.0, units="Pa",
                         module=m)
        n_pis = pf.get("TAUX_N_PIS", float, default=1.0, module=m)
        lat = np.asarray(G.geoLatT)
        yfrac = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
        if sin_amp or cos_amp:
            taux_np = (sin_amp * np.sin(n_pis * np.pi * yfrac)
                       + cos_amp * np.cos(n_pis * np.pi * yfrac))
        else:
            tau0 = pf.get("TAUX_MAGNITUDE", float, default=0.1, units="Pa",
                          module=m)
            taux_np = -tau0 * np.cos(2 * np.pi * yfrac)
        taux = jnp.asarray(taux_np, dtype) * G.mask2dCu
        tauy = jnp.zeros_like(G.mask2dCv)
    elif wind_cfg == "global":
        # idealized zonal-mean climatological wind stress on geographic
        # latitude: easterly trades, mid-latitude westerlies (stronger
        # in the Southern Ocean), weak polar easterlies, tapered beyond
        # 65 degrees
        tau0 = pf.get("TAUX_MAGNITUDE", float, default=0.1, units="Pa",
                      module=m)
        lat = np.asarray(G.geoLatT)
        prof = -np.cos(np.pi * lat / 35.0) \
            * np.exp(-(lat / 65.0) ** 4)
        prof = prof * np.where(lat < -30.0, 1.4, 1.0)   # SO westerlies
        taux = jnp.asarray(tau0 * prof, dtype) * G.mask2dCu
        tauy = jnp.zeros_like(G.mask2dCv)
    elif wind_cfg == "constant":
        taux = jnp.full((G.ny, G.nx),
                        pf.get("CONST_WIND_TAUX", float, default=0.0,
                               module=m), dtype) * G.mask2dCu
        tauy = jnp.full((G.ny, G.nx),
                        pf.get("CONST_WIND_TAUY", float, default=0.0,
                               module=m), dtype) * G.mask2dCv
    wind_fn = None          # analytic t -> (taux, tauy) [ideal_hurr]
    if wind_cfg in ("ideal_hurr", "SCM_ideal_hurr"):
        # translating Holland-profile cyclone
        # (idealized_hurricane_wind_forcing,
        # src/user/Idealized_Hurricane.F90:336-456)
        from mom6_tpu.drivers.user_cases import hurricane_wind_fn
        ov = dict(
            rad_max=pf.get("IDL_HURR_RAD_MAX_WIND", float, default=50.0e3,
                           units="m", module=m),
            vmax=pf.get("IDL_HURR_MAX_WIND", float, default=65.0,
                        units="m s-1", module=m),
            trans_spd=pf.get("IDL_HURR_TRAN_SPEED", float, default=5.0,
                             units="m s-1", module=m),
            trans_dir_deg=pf.get("IDL_HURR_TRAN_DIR", float,
                                 default=180.0, units="degrees",
                                 module=m),
            x0=pf.get("IDL_HURR_X0", float, default=0.0, units="m",
                      module=m),
            y0=pf.get("IDL_HURR_Y0", float, default=0.0, units="m",
                      module=m),
            p_ambient=pf.get("IDL_HURR_AMBIENT_PRESSURE", float,
                             default=101200.0, units="Pa", module=m),
            p_central=pf.get("IDL_HURR_CENTRAL_PRESSURE", float,
                             default=96800.0, units="Pa", module=m))
        wind_fn = hurricane_wind_fn(G, ov)
        tx0, ty0 = wind_fn(0.0)
        taux = jnp.asarray(tx0, dtype)
        tauy = jnp.asarray(ty0, dtype)
    wind_ts = None          # (TimeSeriesField x, TimeSeriesField y, bmap)
    if wind_cfg == "file":
        # wind_forcing_from_file (MOM_surface_forcing.F90:418-560) with
        # A-grid stagger: stress at T points, time-interpolated from the
        # file records, then averaged to the C-grid faces.
        from mom6_tpu.framework.data_override import (TimeSeriesField,
                                                      build_bilinear_map)
        from mom6_tpu.io.netcdf import read_nc
        wfile = pf.get("WIND_FILE", str, module=m,
                       desc="NetCDF file with wind stress time series")
        xvar = pf.get("WINDSTRESS_X_VAR", str, default="STRESS_X", module=m)
        yvar = pf.get("WINDSTRESS_Y_VAR", str, default="STRESS_Y", module=m)
        wscale = pf.get("WIND_STRESS_MULTIPLIER", float, default=1.0,
                        module=m)
        periodic = pf.get("WIND_PERIODIC", bool, default=True, module=m,
                          desc="Treat the wind records as a climatology")
        path = wfile if os.path.isabs(wfile) else \
            os.path.join(_inputdir(pf, doc_dir), wfile)
        raw = read_nc(path)
        tax = raw.get("time", np.arange(raw[xvar].shape[0], dtype=float))
        fx = TimeSeriesField(tax, raw[xvar] * wscale, periodic=periodic)
        fy = TimeSeriesField(tax, raw[yvar] * wscale, periodic=periodic)
        bmap = None
        if "lon" in raw and "lat" in raw:
            bmap = build_bilinear_map(raw["lon"], raw["lat"],
                                      np.asarray(G.geoLonT),
                                      np.asarray(G.geoLatT))
        wind_ts = (fx, fy, bmap)
        taux = jnp.zeros((G.ny, G.nx), dtype)   # filled by the provider
        tauy = jnp.zeros((G.ny, G.nx), dtype)
    elif wind_cfg not in ("zero", "gyres", "constant", "global",
                          "ideal_hurr", "SCM_ideal_hurr"):
        raise NotImplementedError(f"WIND_CONFIG={wind_cfg}")

    buoy_cfg = pf.get("BUOY_CONFIG", str, default="zero", module=m)
    heat = None
    if buoy_cfg == "NS_heating":
        q0 = pf.get("HEATING_MAGNITUDE", float, default=50.0, units="W m-2",
                    module=m)
        y = np.asarray(G.geoLatT) * 1e3
        ly = pf.get("LENLAT", float, default=1000.0) * 1e3
        heat = jnp.asarray(q0 * np.cos(np.pi * y / ly), dtype) * G.mask2dT
    elif buoy_cfg == "const":
        q0 = pf.get("SENSIBLE_HEAT_FLUX", float, default=0.0,
                    units="W m-2", module=m)
        heat = jnp.full((G.ny, G.nx), q0, dtype) * G.mask2dT
    elif buoy_cfg == "linear" and use_thermo:
        # buoyancy_forcing_linear + RESTOREBUOY
        # (MOM_surface_forcing.F90): restore SST toward a linear
        # north-south profile with piston velocity FLUXCONST [m day-1]
        heat = None
    buoy_ts = None          # (heat_ts, sw_ts, fw_ts, bmap)
    if buoy_cfg == "file" and use_thermo:
        # Condensed analogue of buoyancy_forcing_from_files
        # (MOM_surface_forcing.F90:760-1100): the reference reads
        # LW/SW/latent/sensible/evap/precip from separate files and sums
        # them; here one file supplies the net surface heat flux
        # (HEAT_VAR, +down), optionally a penetrating-shortwave part
        # (SW_VAR) and a net freshwater flux (FW_VAR), each a
        # (time, lat, lon) record.
        from mom6_tpu.framework.data_override import (TimeSeriesField,
                                                      build_bilinear_map)
        from mom6_tpu.io.netcdf import read_nc
        bfile = pf.get("BUOY_FILE", str, module=m,
                       desc="NetCDF file with surface buoyancy fluxes")
        hvar = pf.get("HEAT_VAR", str, default="heat", module=m)
        swvar = pf.get("SW_VAR", str, default="", module=m)
        fwvar = pf.get("FW_VAR", str, default="", module=m)
        periodic = pf.get("BUOY_PERIODIC", bool, default=True, module=m)
        path = bfile if os.path.isabs(bfile) else \
            os.path.join(_inputdir(pf, doc_dir), bfile)
        raw = read_nc(path)
        tax = raw.get("time", np.arange(raw[hvar].shape[0], dtype=float))
        h_ts = TimeSeriesField(tax, raw[hvar], periodic=periodic)
        sw_ts = TimeSeriesField(tax, raw[swvar], periodic=periodic) \
            if swvar else None
        fw_ts = TimeSeriesField(tax, raw[fwvar], periodic=periodic) \
            if fwvar else None
        bmap = None
        if "lon" in raw and "lat" in raw:
            bmap = build_bilinear_map(raw["lon"], raw["lat"],
                                      np.asarray(G.geoLonT),
                                      np.asarray(G.geoLatT))
        buoy_ts = (h_ts, sw_ts, fw_ts, bmap)
        heat = jnp.zeros((G.ny, G.nx), dtype)   # filled by the provider
    elif buoy_cfg not in ("zero", "NS_heating", "const") and \
            not (buoy_cfg in ("linear", "global", "file") and use_thermo):
        raise NotImplementedError(f"BUOY_CONFIG={buoy_cfg}")

    t_restore = s_restore = None
    restore_rate = 0.0
    if buoy_cfg == "global" and use_thermo:
        # restore SST toward an idealized zonal-mean climatology
        # T*(lat) = T_POLE + (T_EQ - T_POLE) cos^2(lat * pi/180 * 90/80)
        # with piston velocity FLUXCONST [m day-1]
        fluxconst = pf.get("FLUXCONST", float, default=0.5,
                           units="m day-1", module=m)
        restore_rate = fluxconst / 86400.0
        t_eq = pf.get("SST_EQUATOR", float, default=27.0, units="degC",
                      module=m)
        t_po = pf.get("SST_POLE", float, default=-1.0, units="degC",
                      module=m)
        lat = np.asarray(G.geoLatT)
        t_star = t_po + (t_eq - t_po) * np.cos(np.deg2rad(lat)) ** 2
        t_restore = jnp.asarray(t_star, dtype)
    elif buoy_cfg == "linear" and use_thermo and \
            pf.get("RESTOREBUOY", bool, default=False, module=m):
        fluxconst = pf.get("FLUXCONST", float, default=0.0,
                           units="m day-1", module=m)
        restore_rate = fluxconst / 86400.0
        sst_n = pf.get("SST_NORTH", float, default=25.0, units="degC",
                       module=m)
        sst_s = pf.get("SST_SOUTH", float, default=10.0, units="degC",
                       module=m)
        lat = np.asarray(G.geoLatT)
        yfrac = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-30)
        t_restore = jnp.asarray(sst_s + (sst_n - sst_s) * yfrac, dtype)

    forcing = Forcing(mech=MechForcing(taux=taux, tauy=tauy),
                      buoy=BuoyancyForcing(heat_flux=heat,
                                           t_restore=t_restore,
                                           s_restore=s_restore,
                                           restore_rate=restore_rate))

    forcing_provider = None
    if wind_ts is not None or buoy_ts is not None or obc_ts \
            or wind_fn is not None:
        from mom6_tpu.framework.data_override import data_override
        from mom6_tpu.framework.stencil import ip1, jp1

        # base numpy copies of the OBC dense arrays for scattering the
        # per-segment file series (update_OBC_segment_data role)
        _obc_base = None
        if obc_ts:
            _obc_base = {
                "SSH": np.asarray(obc.eta_ext, np.float64).copy(),
                "U": np.asarray(obc.uvel_ext, np.float64).copy(),
                "V": np.asarray(obc.vvel_ext, np.float64).copy(),
                "TEMP": np.asarray(obc.T_ext, np.float64).copy()
                if obc.T_ext is not None else np.zeros((G.ny, G.nx)),
                "SALT": np.asarray(obc.S_ext, np.float64).copy()
                if obc.S_ext is not None else np.zeros((G.ny, G.nx)),
            }

        def _obc_at(t_days):
            from mom6_tpu.core.open_boundary import OBCData
            arrs = {k: v.copy() for k, v in _obc_base.items()}
            used = set()
            for key, sl, ts in obc_ts:
                val = ts.at_time(t_days)
                arrs[key][sl] = val      # scalar or along-segment array
                used.add(key)
            names = {"SSH": "eta_ext", "U": "uvel_ext", "V": "vvel_ext",
                     "TEMP": "T_ext", "SALT": "S_ext"}
            return OBCData(**{names[k]: jnp.asarray(arrs[k], dtype)
                              for k in used})

        def forcing_provider(t_seconds, _base=forcing):
            """Forcing at model time [s] (file times are in days)."""
            f = _base
            t_days = float(t_seconds) / 86400.0
            if obc_ts:
                f = f._replace(obc_data=_obc_at(t_days))
            if wind_ts is not None:
                fx, fy, bmap = wind_ts
                tx_t = data_override(fx, t_days, bmap, dtype=dtype)
                ty_t = data_override(fy, t_days, bmap, dtype=dtype)
                # A-grid stress -> C-grid faces
                tx = 0.5 * (tx_t + ip1(tx_t)) * G.mask2dCu
                ty = 0.5 * (ty_t + jp1(ty_t)) * G.mask2dCv
                f = f._replace(mech=f.mech._replace(taux=tx, tauy=ty))
            if wind_fn is not None:
                tx_h, ty_h = wind_fn(float(t_seconds))
                f = f._replace(mech=f.mech._replace(
                    taux=jnp.asarray(tx_h, dtype),
                    tauy=jnp.asarray(ty_h, dtype)))
            if buoy_ts is not None:
                h_ts, sw_ts, fw_ts, bmap = buoy_ts
                b = f.buoy._replace(heat_flux=data_override(
                    h_ts, t_days, bmap, G.mask2dT, dtype))
                if sw_ts is not None:
                    b = b._replace(sw_flux=data_override(
                        sw_ts, t_days, bmap, G.mask2dT, dtype))
                if fw_ts is not None:
                    b = b._replace(fw_flux=data_override(
                        fw_ts, t_days, bmap, G.mask2dT, dtype))
                f = f._replace(buoy=b)
            return f

        forcing = forcing_provider(0.0)

    # -- per-subsystem state fields ----------------------------------------
    if waves is not None:
        # 10-m wind speed for the Stokes drift / Langmuir number, from the
        # wind stress via the bulk formula tau = rho_air cd U10^2
        # (the wave interface's wind-derived Stokes option,
        # src/user/MOM_wave_interface.F90)
        tx = taux if taux is not None else jnp.zeros((G.ny, G.nx), dtype)
        ty = tauy if tauy is not None else jnp.zeros((G.ny, G.nx), dtype)
        u10 = jnp.sqrt(jnp.sqrt(tx * tx + ty * ty) / (1.225 * 1.3e-3))
        forcing = forcing._replace(mech=forcing.mech._replace(u10=u10))
    if tfc is not None:
        state = state.replace(tr=tfc.init_tracers(state.h.shape, dtype))
    if obc is not None and obc.res_len_in > 0.0 and use_thermo:
        # seed the segment tracer reservoirs with the initial state
        # (distinct buffers: donation rejects aliased fields)
        state = state.replace(obc_res_T=state.T + 0.0,
                              obc_res_S=state.S + 0.0)
    if tides is not None:
        state = state.replace(time=jnp.zeros((), dtype))
    if dyn.scheme.upper() == "RK2B":
        # RK2b restart pair: 2-D corrections relating the prognostic
        # time-filtered velocities to the instantaneous ones
        state = state.replace(
            du_av_inst=jnp.zeros((G.ny, G.nx), dtype),
            dv_av_inst=jnp.zeros((G.ny, G.nx), dtype))
    if use_thermo and ale.mode != LAYER and (
            diab.boundary_layer_scheme in ("KPP", "EPBL")
            or diab.use_shear_mixing):
        # BL/shear momentum viscosity carried across thermo cycles
        # (visc%Kv_shear role) — allocated up front so the scan carry
        # keeps a fixed pytree structure
        state = state.replace(
            kv_shear=jnp.zeros((nz + 1, G.ny, G.nx), dtype))
    if sppt is not None:
        import jax as _jax
        seed = pf.get("STOCH_SEED", int, default=0,
                      module="MOM_stochastics")
        state = state.replace(rng_key=_jax.random.PRNGKey(seed))
        if do_sppt:
            state = state.replace(
                sppt_pattern=jnp.zeros((G.ny, G.nx), dtype))
        if do_skeb:
            state = state.replace(
                skeb_pattern=jnp.zeros((G.ny, G.nx), dtype))

    # -- sponges (analytic damping-band configs; MOM_ALE_sponge role;
    # reference reads SPONGE_DAMPING_FILE, here built analytically) --------
    m = "MOM_sponge"
    if pf.get("SPONGE", bool, default=False, module=m) and use_thermo:
        from mom6_tpu.physics.vertical.sponge import SpongeParams
        idamp_max = pf.get("SPONGE_IDAMP", float, default=1.0 / 86400.0,
                           units="s-1", module=m)
        sp_cfg = pf.get("SPONGE_CONFIG", str, default="NS_bands", module=m)
        width = pf.get("SPONGE_WIDTH_FRAC", float, default=0.1, module=m,
                       desc="Sponge band width as a domain fraction")
        yfrac = (np.arange(G.ny) + 0.5) / G.ny
        if sp_cfg == "NS_bands":
            band = np.maximum(1.0 - yfrac / width,
                              1.0 - (1.0 - yfrac) / width)
            prof = np.maximum(band, 0.0)
        elif sp_cfg == "uniform":
            prof = np.ones(G.ny)
        else:
            raise NotImplementedError(f"SPONGE_CONFIG={sp_cfg}")
        idamp = jnp.asarray(
            np.broadcast_to((idamp_max * prof)[:, None], (G.ny, G.nx)),
            dtype) * G.mask2dT
        params = params._replace(sponge=SpongeParams(
            idamp=idamp, T_ref=state.T, S_ref=state.S))

    # -- ice shelf: prescribed mass, 3-equation melt into the forcing,
    # shelf pressure into the PF, IC trimmed to the hydrostatic draft
    # (MOM_ice_shelf.F90 coupling + trim_for_ice,
    # MOM_state_initialization.F90:1250) -----------------------------------
    m = "MOM_ice_shelf"
    if pf.get("ICE_SHELF", bool, default=False, module=m):
        from mom6_tpu.eos import get_eos
        from mom6_tpu.physics.ice_shelf import IceShelfParams
        from mom6_tpu.physics.shelf_coupling import (
            ShelfCoupling, trim_columns_for_p_surf)
        rho_ice = pf.get("DENSITY_ICE", float, default=918.0,
                         units="kg m-3", module=m)
        prof = pf.get("ICE_PROFILE_CONFIG", str, default="linear",
                      module=m, desc="Shelf draft shape: linear (ISOMIP-"
                      "style taper from the western edge) or file")
        if prof == "linear":
            draft_max = pf.get("SHELF_MAX_DRAFT", float, default=700.0,
                               units="m", module=m)
            edge = pf.get("SHELF_EDGE_FRAC", float, default=0.5,
                          module=m, desc="x-fraction of the domain where"
                          " the shelf front sits")
            xf = (np.arange(G.nx) + 0.5) / G.nx
            draft = draft_max * np.maximum(
                0.0, 1.0 - xf / max(edge, 1e-6))
            draft = np.broadcast_to(draft[None, :], (G.ny, G.nx)).copy()
        elif prof == "file":
            from mom6_tpu.io.netcdf import read_nc
            sfile = pf.get("SHELF_FILE", str, module=m,
                           desc="netCDF with the shelf draft [m]")
            svar = pf.get("SHELF_DRAFT_VAR", str, default="draft",
                          module=m)
            draft = np.asarray(
                read_nc(os.path.join(_inputdir(pf, doc_dir), sfile))
                [svar], np.float64)
        else:
            raise NotImplementedError(f"ICE_PROFILE_CONFIG={prof}")
        # floating shelf: mass per area = rho_sw * draft (hydrostatic);
        # keep a wet gap under the shelf of at least MIN_OCEAN_GAP
        gap = pf.get("SHELF_MIN_OCEAN_GAP", float, default=10.0,
                     units="m", module=m, desc="Minimum water column "
                     "left under the shelf when trimming")
        draft = np.minimum(draft, np.asarray(G.bathyT) - gap)
        draft = np.maximum(draft, 0.0) * np.asarray(G.mask2dT)
        mass_shelf = jnp.asarray(gv.rho0 * draft, dtype)
        frac = jnp.asarray((draft > 1.0).astype(np.float64), dtype)
        melt_p = IceShelfParams(
            gamma_t=pf.get("SHELF_GAMMA_T", float, default=1e-4,
                           units="m s-1", module=m),
            gamma_s=pf.get("SHELF_GAMMA_S", float, default=2.86e-6,
                           units="m s-1", module=m),
            rho_i=rho_ice, rho_w=gv.rho0)
        params = params._replace(shelf=ShelfCoupling(
            mass_shelf=mass_shelf, frac_shelf_h=frac, melt=melt_p,
            flux_factor=pf.get("SHELF_FLUX_FACTOR", float, default=1.0,
                               module=m),
            ustar_dependent=pf.get("SHELF_USTAR_GAMMA", bool,
                                   default=False, module=m),
            utide=pf.get("SHELF_UTIDE", float, default=0.0,
                         units="m s-1", module=m)))
        if pf.get("TRIM_IC_FOR_P_SURF", bool, default=True, module=m) \
                and use_thermo:
            press = gv.g_earth * mass_shelf * frac
            rho = gv.rho0 + get_eos(eos_name).density(
                state.T, state.S, gv.rho0 * gv.g_earth
                * (jnp.cumsum(state.h, 0) - 0.5 * state.h),
                rho_ref=gv.rho0)
            h_t, T_t, S_t = trim_columns_for_p_surf(
                state.h, state.T, state.S, rho, press, gv.g_earth,
                min_thickness=float(gv.angstrom))
            state = state.replace(h=jnp.asarray(h_t, dtype))

    # -- non-Boussinesq: the analytic/file ICs above are GEOMETRIC
    # thicknesses; the prognostic h of BOUSSINESQ=False is mass/RHO_0,
    # so convert with the hydrostatic in-situ density (convert_thickness,
    # MOM_state_initialization.F90) or the IC starts ~2%-of-column out of
    # hydrostatic balance ------------------------------------------------
    if not gv.boussinesq and use_thermo and state.T is not None:
        from mom6_tpu.core.pressure_force import geometric_to_mass_h
        from mom6_tpu.eos import get_eos as _ge
        state = state.replace(h=geometric_to_mass_h(
            state.h, state.T, state.S, gv, _ge(eos_name)).astype(dtype))

    if doc_dir:
        pf.write_doc(doc_dir)

    # -- tidal wave drag on the external mode (MOM_wave_drag role) --------
    m = "MOM_wave_drag"
    if pf.get("TIDAL_WAVE_DRAG", bool, default=False, module=m) \
            and use_thermo:
        from mom6_tpu.eos import get_eos
        from mom6_tpu.physics.lateral.wave_drag import wave_drag_piston
        piston = wave_drag_piston(
            state.h, state.T, state.S, G, gv, get_eos(eos_name),
            gamma=pf.get("WAVE_DRAG_SCALE", float, default=1.0, module=m),
            h2=pf.get("TIDAL_ROUGHNESS_H2", float, default=100.0,
                      units="m2", module=m))
        params = params._replace(
            dyn=params.dyn._replace(
                bt=params.dyn.bt._replace(lin_drag=piston)))

    return ModelSetup(G, gv, state, params, forcing, pf,
                      forcing_provider=forcing_provider)
