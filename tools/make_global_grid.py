"""Generate a coarse global tripolar grid + Earth-like topography.

Writes the FMS-mosaic pair the model's GRID_CONFIG=mosaic path reads
(reference: MOM6 production grids, src/initialization/
MOM_grid_initialize.F90:150-430 set_grid_metrics_from_mosaic):

  ocean_hgrid.nc  — supergrid (2ny+1, 2nx+1) node lon/lat, edge lengths
                    dx/dy and cell areas at supergrid resolution;
  ocean_topog.nc  — (ny, nx) depth field, hand-coded coarse continents.

Grid construction (Murray 1996 tripolar topology):
  * south of ``lat_join`` (65N): regular lat-lon rows;
  * north of it: an ORTHOGONAL bipolar cap built from the conformal map
    chain  sphere --stereographic--> disk |z| <= a = tan(theta_J/2)
    --Mobius w=(z-a)/(z+a)--> left half-plane --log--> strip, in which
    the grid is the rectangle  u = log tan(lambda/2)  (pseudo-longitude,
    shared with the joint circle) x v in [pi/2, pi] (pseudo-latitude,
    v = pi is the FOLD line running pole - north pole - pole).
    Coordinate lines of a conformal map are orthogonal on the sphere.
    The two new poles (u = -+inf) land on the joint circle at
    ``lon_bp`` (Siberia) and ``lon_bp``+180 (arctic Canada) — on land,
    where the mask removes the convergent cells.

The fold identifies top-row cells (j=ny-1, i) with (j=ny-1, nx-1-i);
the model's fold-aware stencils (framework/stencil.py) consume this via
Grid.fold_north.

Topography: hand-digitized coarse continent polygons (recognizable
Americas / Eurasia+Africa / Australia / Greenland / Antarctica at 2-4
degree fidelity; marginal seas like the Mediterranean and Red Sea are
closed at this resolution), abyssal plain 4000 m with 2-cell
continental slopes (150 m shelf -> 4000 m) to keep pressure-force
errors controlled on steep topography.
"""

from __future__ import annotations

import os

import numpy as np
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R_EARTH = 6.378e6
D2R = np.pi / 180.0


# ----------------------------------------------------------------------
# tripolar supergrid
# ----------------------------------------------------------------------

def _bipolar_lonlat(lam, v, lat_join):
    """Map cap coordinates (lam = grid longitude in [0, 2pi], v in
    [pi/2, pi]) to geographic (lon_rel, lat) with the bipolar conformal
    chain; lon_rel is relative to the bipolar axis.  v = pi/2 is the
    joint circle, v = pi the fold."""
    a = np.tan(0.5 * (90.0 - lat_join) * D2R)      # disk radius
    lam = np.asarray(lam, np.float64)
    v = np.asarray(v, np.float64)
    # mirror side B (lam > pi) onto side A, flip longitude at the end
    side_b = lam > np.pi
    lam_a = np.where(side_b, 2.0 * np.pi - lam, lam)
    lam_a = np.clip(lam_a, 1e-12, np.pi - 1e-12)
    u = np.log(np.tan(0.5 * lam_a))
    w = np.exp(u + 1j * v)
    z = a * (1.0 + w) / (1.0 - w)
    theta = 2.0 * np.arctan(np.abs(z))             # colatitude
    lon = np.angle(z)
    lon = np.where(side_b, -lon, lon)
    return lon / D2R, 90.0 - theta / D2R


def make_tripolar_supergrid(nx, ny_reg, ny_cap, lat_s=-80.0,
                            lat_join=65.0, lon_bp=100.0, lon_w=None):
    """Supergrid dict (x, y, dx, dy, area) for an nx x (ny_reg+ny_cap)
    model grid: ny_reg regular lat-lon rows from lat_s to lat_join, then
    an ny_cap-row bipolar cap to the fold.

    The grid's x origin is pinned to the bipolar axis (lon_w = lon_bp):
    the model's fold identification i <-> nx-1-i (FOLD_NORTH_EDGE)
    mirrors about the x-wrap seam, so the two poles MUST sit at the seam
    and at the halfway column."""
    if lon_w is None:
        lon_w = lon_bp
    nxs, nys = 2 * nx, 2 * (ny_reg + ny_cap)
    lam = np.linspace(0.0, 2.0 * np.pi, nxs + 1)   # grid longitude
    x = np.empty((nys + 1, nxs + 1))
    y = np.empty((nys + 1, nxs + 1))
    # regular rows (supergrid rows 0 .. 2*ny_reg)
    lat_reg = np.linspace(lat_s, lat_join, 2 * ny_reg + 1)
    x[:2 * ny_reg + 1] = lon_w + lam[None, :] / D2R
    y[:2 * ny_reg + 1] = lat_reg[:, None]
    # cap rows — row 2*ny_reg IS the joint.  Uniform v gives wildly
    # nonuniform physical spacing (the conformal factor varies by
    # orders of magnitude over the cap); choose v_j so the u=0 meridian
    # (the widest one, through lon_bp±90) is uniformly spaced in
    # colatitude: along u=0, |z| = a cot(v/2), so
    # v(theta) = 2 atan(a / tan(theta/2)).
    a = np.tan(0.5 * (90.0 - lat_join) * D2R)
    theta_j = (90.0 - lat_join) * D2R \
        * (1.0 - np.arange(1, 2 * ny_cap + 1) / (2.0 * ny_cap))
    vs = 2.0 * np.arctan2(a, np.tan(0.5 * theta_j))
    # align cap columns with the regular rows: column i carries
    # geographic longitude lon_w + lam_i at the joint, so the cap's
    # grid-longitude (measured from the bipolar axis) is lam - lon_bp
    lam_c = np.mod(lam - (lon_bp - lon_w) * D2R, 2.0 * np.pi)
    for r, v in enumerate(vs):
        lon_rel, lat = _bipolar_lonlat(lam_c, v, lat_join)
        x[2 * ny_reg + 1 + r] = lon_bp + lon_rel
        y[2 * ny_reg + 1 + r] = lat
    # wrap x into [lon_w, lon_w+360)
    x = lon_w + np.mod(x - lon_w, 360.0)
    # the right edge duplicates the left (periodic seam)
    x[:, -1] = x[:, 0] + 360.0

    def gcdist(lo1, la1, lo2, la2):
        lo1, la1, lo2, la2 = [np.asarray(q) * D2R for q in
                              (lo1, la1, lo2, la2)]
        s = (np.sin(0.5 * (la2 - la1)) ** 2
             + np.cos(la1) * np.cos(la2) * np.sin(0.5 * (lo2 - lo1)) ** 2)
        return 2.0 * R_EARTH * np.arcsin(np.minimum(1.0, np.sqrt(s)))

    dx = gcdist(x[:, :-1], y[:, :-1], x[:, 1:], y[:, 1:])
    dy = gcdist(x[:-1, :], y[:-1, :], x[1:, :], y[1:, :])
    # supergrid cell areas: mean-edge product (adequate at this scale)
    area = (0.5 * (dx[:-1, :] + dx[1:, :])
            * 0.5 * (dy[:, :-1] + dy[:, 1:]))
    # pole columns degenerate (dx -> 0); floor the metrics so inverse
    # metrics stay finite — those cells are land-masked
    dx = np.maximum(dx, 1.0)
    dy = np.maximum(dy, 1.0)
    area = np.maximum(area, 1.0)
    return {"x": x, "y": y, "dx": dx, "dy": dy, "area": area}


# ----------------------------------------------------------------------
# coarse Earth topography
# ----------------------------------------------------------------------

# Hand-digitized continent outlines (lon [degE, may exceed 0..360 for
# seam-crossing polygons], lat).  Coarse on purpose: target fidelity is
# a 2-4 degree global model.
AMERICAS = [
    # arctic coast west -> east
    (192, 66), (196, 71), (230, 71), (252, 70), (262, 68), (275, 68),
    # atlantic coast southward to Florida
    (282, 66), (285, 62), (296, 59), (300, 54), (296, 45), (286, 41),
    (284, 35), (279, 31), (278, 26),
    # gulf of Mexico, Yucatan, Caribbean coast to Panama
    (262, 30), (256, 23), (262, 19), (271, 21), (277, 16), (283, 10),
    # South America north coast, east tip, down to Cape Horn
    (290, 12), (298, 11), (310, 0), (325, -7), (312, -23), (302, -33),
    (296, -39), (293, -55),
    # pacific coast northward
    (288, -50), (287, -30), (281, -10), (283, 1), (280, 8), (270, 15),
    (255, 19), (247, 25), (243, 32), (240, 37), (236, 47), (230, 58),
    (218, 60), (200, 58), (192, 58),
]
GREENLAND = [
    (304, 66), (310, 76), (330, 82), (342, 78), (338, 70), (316, 60),
]
EURAFRICA = [
    # start Morocco, counterclockwise around Africa then Eurasia
    (-8, 33), (-10, 25), (-17, 15), (-8, 5), (9, 4), (12, -18),
    (18, -35), (27, -33), (35, -20), (40, -5), (51, 11), (44, 12),
    (43, 15), (55, 24), (60, 24), (67, 24), (70, 20), (76, 8),
    (80, 6), (87, 22), (92, 16), (98, 8), (102, 2), (104, 10),
    (108, 12), (110, 21), (122, 30), (122, 40), (135, 43), (142, 54),
    (158, 52), (162, 56), (160, 62), (178, 66), (190, 66), (178, 70),
    (140, 72), (113, 77), (100, 78), (90, 73), (76, 68), (60, 69),
    (44, 67), (40, 65), (28, 70), (14, 68), (5, 62), (5, 58),
    (-2, 58), (-4, 50), (-2, 48), (-5, 44), (-9, 43), (-9, 37),
]
AUSTRALIA = [
    (114, -22), (113, -35), (130, -32), (137, -36), (147, -43),
    (153, -28), (153, -16), (143, -11), (135, -12), (129, -15),
    (122, -14), (114, -22),
]
ANT_PENINSULA = [
    (290, -63), (300, -68), (290, -74), (280, -70),
]


def _in_poly(lon, lat, poly):
    """Vectorized ray casting; poly longitudes may be signed."""
    inside = np.zeros(lon.shape, bool)
    px = np.array([p[0] for p in poly], np.float64)
    py = np.array([p[1] for p in poly], np.float64)
    n = len(px)
    for shift in (0.0, 360.0, -360.0):
        lx = lon + shift
        ins = np.zeros(lon.shape, bool)
        j = n - 1
        for i in range(n):
            cond = ((py[i] > lat) != (py[j] > lat)) & (
                lx < (px[j] - px[i]) * (lat - py[i])
                / (py[j] - py[i] + 1e-30) + px[i])
            ins ^= cond
            j = i
        inside |= ins
    return inside


def make_earth_topography(lon_t, lat_t, max_depth=4000.0,
                          shelf_depth=150.0):
    """Depth [m] (0 = land) on the given T-point lon/lat arrays."""
    land = np.zeros(lon_t.shape, bool)
    for poly in (AMERICAS, GREENLAND, EURAFRICA, AUSTRALIA,
                 ANT_PENINSULA):
        land |= _in_poly(lon_t, lat_t, poly)
    land |= lat_t < -70.0                       # Antarctica
    # the tripolar poles sit on real land (Taymyr, arctic Canada); stamp
    # explicit land caps so the degenerate pole cells can never be wet
    for plon in (100.0, 280.0):
        dlon = np.abs(np.mod(lon_t - plon + 180.0, 360.0) - 180.0)
        near = (np.abs(lat_t - 65.0) < 4.0) & (dlon * np.cos(
            np.deg2rad(lat_t)) < 5.0)
        land |= near
    # distance-to-land (in cells, chebyshev, x-periodic) -> slope profile
    dist = np.full(lon_t.shape, 99, np.int32)
    dist[land] = 0
    for _ in range(4):
        d = dist
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
            d = np.minimum(d, np.roll(dist, sh, axis=ax) + 1)
        # non-periodic in y: undo the wrap rows
        d[0] = np.minimum(dist[0], dist[1] + 1)
        d[-1] = np.minimum(dist[-1], dist[-2] + 1)
        dist = d
    depth = np.where(dist >= 4, max_depth,
                     shelf_depth + (max_depth - shelf_depth)
                     * np.maximum(dist - 1, 0) / 3.0)
    depth = np.where(land, 0.0, depth)
    return depth


def write_mosaic(outdir, nx=180, ny_reg=84, ny_cap=16, lat_s=-80.0,
                 lat_join=65.0, lon_bp=100.0, max_depth=4000.0):
    from mom6_tpu.io.netcdf import NCWriter
    sg = make_tripolar_supergrid(nx, ny_reg, ny_cap, lat_s, lat_join,
                                 lon_bp)
    os.makedirs(outdir, exist_ok=True)
    w = NCWriter(os.path.join(outdir, "ocean_hgrid.nc"))
    ny = ny_reg + ny_cap
    for name in ("x", "y", "dx", "dy", "area"):
        w.write_static(name, sg[name], units="degrees"
                       if name in ("x", "y") else "m")
    w.close()
    lon_t = sg["x"][1::2, 1::2]
    lat_t = sg["y"][1::2, 1::2]
    depth = make_earth_topography(lon_t, lat_t, max_depth)
    # land out the degenerate pole columns and the joint poles' vicinity
    # (should already be land — assert rather than silently fix)
    w = NCWriter(os.path.join(outdir, "ocean_topog.nc"))
    w.write_static("depth", depth, units="m")
    w.close()
    wet = depth > 0
    frac = wet.mean()
    print(f"wrote {outdir}: {nx}x{ny} model grid, ocean fraction "
          f"{frac:.2f}")
    return sg, depth


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "configs/global_2deg"
    write_mosaic(out)
