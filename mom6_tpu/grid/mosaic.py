"""Grid construction from FMS mosaic supergrid files.

Analogue of the reference's mosaic-file grid path (reference:
src/initialization/MOM_grid_initialize.F90: set_grid_metrics_from_mosaic
:150-430): MOM6 production grids ship as an ``ocean_hgrid.nc`` supergrid
at twice the model resolution — x/y node coordinates (2ny+1, 2nx+1),
edge lengths dx (2ny+1, 2nx), dy (2ny, 2nx+1) and cell areas
(2ny, 2nx) — plus an ``ocean_topog.nc`` depth field.

Extraction follows the reference's index rules (0-based here):

  T  centre (j, i)  -> supergrid node (2j+1, 2i+1)
  q  corner (j, i)  -> supergrid node (2j+2, 2i+2)   (NE staggering)
  dxT  = dx[2j+1, 2i] + dx[2j+1, 2i+1]
  dyT  = dy[2j, 2i+1] + dy[2j+1, 2i+1]
  dxCu = dx[2j+1, 2i+1] + dx[2j+1, 2i+2 (mod)]       (east face)
  dyCv = dy[2j+1, 2i+1] + dy[2j+2 (mod), 2i+1]       (north face)
  areaT = sum of the 4 supergrid cells of the model cell.

The Coriolis parameter is 2 Omega sin(lat) at corners.  Depth < min_depth
marks land.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mom6_tpu.framework import constants
from mom6_tpu.grid.grid import Grid, _face_masks

__all__ = ["build_grid_from_supergrid", "read_supergrid"]


def read_supergrid(hgrid_path: str):
    """Read an ocean_hgrid.nc supergrid; returns a dict of numpy arrays."""
    from mom6_tpu.io.netcdf import read_nc
    data = read_nc(hgrid_path)
    need = ("x", "y", "dx", "dy", "area")
    missing = [k for k in need if k not in data]
    if missing:
        raise ValueError(f"supergrid {hgrid_path} missing {missing}")
    return {k: np.asarray(data[k], np.float64) for k in need}


def build_grid_from_supergrid(sg, depth, *, min_depth: float = 0.5,
                              cyclic_x: bool = False,
                              reentrant_y: bool = False,
                              fold_north: bool = False,
                              omega: float = constants.OMEGA,
                              dtype=jnp.float32) -> Grid:
    """Build a Grid from supergrid arrays ``sg`` (see read_supergrid) and
    an (ny, nx) depth array [m] (positive down; <= min_depth is land)."""
    x, y = sg["x"], sg["y"]
    dx, dy, area = sg["dx"], sg["dy"], sg["area"]
    nyp, nxp = x.shape
    ny, nx = (nyp - 1) // 2, (nxp - 1) // 2
    if x.shape != (2 * ny + 1, 2 * nx + 1) or dx.shape[1] != 2 * nx:
        raise ValueError("inconsistent supergrid shapes")
    depth = np.asarray(depth, np.float64)
    if depth.shape != (ny, nx):
        raise ValueError(f"depth shape {depth.shape} != {(ny, nx)}")

    j = np.arange(ny)
    i = np.arange(nx)
    jj, ii = 2 * j + 1, 2 * i + 1

    geo_lon_t = x[np.ix_(jj, ii)]
    geo_lat_t = y[np.ix_(jj, ii)]
    geo_lon_q = x[np.ix_(2 * j + 2, 2 * i + 2)]
    geo_lat_q = y[np.ix_(2 * j + 2, 2 * i + 2)]

    dxT = dx[np.ix_(jj, 2 * i)] + dx[np.ix_(jj, ii)]
    dyT = dy[np.ix_(2 * j, ii)] + dy[np.ix_(jj, ii)]
    # east-face / north-face metrics.  x wraps periodically (the last
    # face is the seam; masked when the axis is closed); in y the face
    # row 2j+2 is always a valid node row (dx has 2ny+1 rows), and for
    # j = ny-1 it is the FOLD line itself, whose mirror symmetry the
    # fold-aware stencils rely on.  dy face distances above the top row
    # clamp to the last interval (only the fold/wall row uses them).
    ip2 = (2 * i + 2) % (2 * nx)
    jp2 = 2 * j + 2                                  # <= 2*ny, valid for dx
    jp2d = np.minimum(2 * j + 2, 2 * ny - 1)         # for dy (2ny rows)
    dxCu = dx[np.ix_(jj, ii)] + dx[np.ix_(jj, ip2)]
    dyCu = dy[np.ix_(2 * j, ip2)] + dy[np.ix_(jj, ip2)]
    dxCv = dx[np.ix_(jp2, 2 * i)] + dx[np.ix_(jp2, ii)]
    dyCv = dy[np.ix_(jj, ii)] + dy[np.ix_(jp2d, ii)]
    dxBu = dx[np.ix_(jp2, ii)] + dx[np.ix_(jp2, ip2)]
    dyBu = dy[np.ix_(jj, ip2)] + dy[np.ix_(jp2d, ip2)]

    areaT = (area[np.ix_(2 * j, 2 * i)] + area[np.ix_(2 * j, ii)]
             + area[np.ix_(jj, 2 * i)] + area[np.ix_(jj, ii)])
    # true corner area: the 4 supergrid quarter-cells around the NE
    # corner of cell (j,i).  The quarter-row above the top corner row is
    # the fold image of the top row (tripolar) or a clamped copy (wall,
    # masked anyway); columns wrap in x.  An areaT proxy here is NOT
    # mirror-symmetric under the fold (off by one column), which broke
    # the Zanna-Bolton fold-exactness gate.
    ghost = area[-1, ::-1] if fold_north else area[-1, :]
    area_e = np.concatenate([area, ghost[None]], axis=0)
    jq1, jq2 = jj, 2 * j + 2                          # rows around corner
    iq1, iq2 = ii, ip2                                # cols around corner
    areaBu = (area_e[np.ix_(jq1, iq1)] + area_e[np.ix_(jq1, iq2)]
              + area_e[np.ix_(jq2, iq1)] + area_e[np.ix_(jq2, iq2)])

    mask_t = (depth > min_depth).astype(np.float64)
    depth = np.where(mask_t > 0.5, depth, 0.0)   # land: zero depth, as
    #                                              the analytic grids do
    mu, mv, mq = _face_masks(mask_t, cyclic_x, reentrant_y,
                             fold_north=fold_north)
    f_q = 2.0 * omega * np.sin(np.deg2rad(geo_lat_q))

    def J(a):
        return jnp.asarray(a, dtype)

    return Grid(
        nx=nx, ny=ny, cyclic_x=cyclic_x, reentrant_y=reentrant_y,
        fold_north=fold_north,
        dxT=J(dxT), dyT=J(dyT), areaT=J(areaT), IareaT=J(1.0 / areaT),
        IdxT=J(1.0 / dxT), IdyT=J(1.0 / dyT),
        dxCu=J(dxCu), dyCu=J(dyCu), IdxCu=J(1.0 / dxCu),
        IdyCu=J(1.0 / dyCu),
        dxCv=J(dxCv), dyCv=J(dyCv), IdxCv=J(1.0 / dxCv),
        IdyCv=J(1.0 / dyCv),
        dxBu=J(dxBu), dyBu=J(dyBu), areaBu=J(areaBu),
        IareaBu=J(1.0 / areaBu),
        mask2dT=J(mask_t), mask2dCu=J(mu), mask2dCv=J(mv), mask2dBu=J(mq),
        CoriolisBu=J(f_q), bathyT=J(depth),
        geoLonT=J(geo_lon_t), geoLatT=J(geo_lat_t),
        geoLonBu=J(geo_lon_q), geoLatBu=J(geo_lat_q))
