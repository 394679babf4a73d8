"""Time-interpolated external forcing fields with horizontal regridding.

Roles of the reference's MOM_interpolate / data_override (FMS
data_override: serve a named field from a file at any model time) and
MOM_horizontal_regridding.F90 (horiz_interp_and_extrap_tracer: bilinear
interpolation of a lat-lon source onto the model grid with land
extrapolation).

Design: files are read once at init (host-side numpy); each field
becomes a ``TimeSeriesField`` holding a (nt, ny_src, nx_src) array and
its time axis.  ``at_time`` returns the linearly-time-interpolated
field (periodic in the record axis if requested — climatology mode),
regridded to the model grid with precomputed bilinear weights.  The
returned arrays are jnp constants suitable for closure capture or
feeding per-segment forcing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["BilinearMap", "build_bilinear_map", "TimeSeriesField",
           "data_override"]


class BilinearMap(NamedTuple):
    """Precomputed source->model bilinear interpolation (host arrays)."""
    j0: np.ndarray; i0: np.ndarray       # SW source cell per model point
    wj: np.ndarray; wi: np.ndarray       # fractional weights


def build_bilinear_map(src_lon, src_lat, dst_lon, dst_lat) -> BilinearMap:
    """Weights mapping a rectilinear source grid (1-D lon/lat axes) onto
    model-point coordinates (2-D arrays)."""
    src_lon = np.asarray(src_lon, np.float64)
    src_lat = np.asarray(src_lat, np.float64)
    dst_lon = np.asarray(dst_lon, np.float64)
    dst_lat = np.asarray(dst_lat, np.float64)
    i0 = np.clip(np.searchsorted(src_lon, dst_lon) - 1, 0,
                 src_lon.size - 2)
    j0 = np.clip(np.searchsorted(src_lat, dst_lat) - 1, 0,
                 src_lat.size - 2)
    wi = np.clip((dst_lon - src_lon[i0])
                 / np.maximum(src_lon[i0 + 1] - src_lon[i0], 1e-30), 0, 1)
    wj = np.clip((dst_lat - src_lat[j0])
                 / np.maximum(src_lat[j0 + 1] - src_lat[j0], 1e-30), 0, 1)
    return BilinearMap(j0=j0, i0=i0, wj=wj, wi=wi)


def _apply_map(field2d, m: BilinearMap) -> np.ndarray:
    f = np.asarray(field2d, np.float64)
    f00 = f[m.j0, m.i0]
    f01 = f[m.j0, m.i0 + 1]
    f10 = f[m.j0 + 1, m.i0]
    f11 = f[m.j0 + 1, m.i0 + 1]
    return ((1 - m.wj) * ((1 - m.wi) * f00 + m.wi * f01)
            + m.wj * ((1 - m.wi) * f10 + m.wi * f11))


class TimeSeriesField:
    """A (time, lat, lon) forcing record with linear time interpolation
    and optional periodic (climatology) wrapping."""

    def __init__(self, times, data, *, periodic: bool = False,
                 period: Optional[float] = None):
        self.times = np.asarray(times, np.float64)
        self.data = np.asarray(data, np.float64)
        if self.data.shape[0] != self.times.size:
            raise ValueError("time axis mismatch")
        self.periodic = periodic
        self.period = period if period is not None else (
            self.times[-1] - self.times[0] + np.median(
                np.diff(self.times)) if self.times.size > 1 else 1.0)

    def at_time(self, t: float) -> np.ndarray:
        ts = self.times
        if self.periodic:
            t = ts[0] + (t - ts[0]) % self.period
        if t <= ts[0]:
            pair, w = (0, 0), 0.0
        elif t >= ts[-1]:
            if self.periodic:
                # between the last record and the (wrapped) first
                dt_wrap = self.period - (ts[-1] - ts[0])
                w = (t - ts[-1]) / max(dt_wrap, 1e-30)
                pair = (ts.size - 1, 0)
            else:
                pair, w = (ts.size - 1, ts.size - 1), 0.0
        else:
            k = int(np.searchsorted(ts, t)) - 1
            pair = (k, k + 1)
            w = (t - ts[k]) / max(ts[k + 1] - ts[k], 1e-30)
        return (1.0 - w) * self.data[pair[0]] + w * self.data[pair[1]]


def data_override(field: TimeSeriesField, t: float,
                  bmap: Optional[BilinearMap] = None,
                  mask=None, dtype=jnp.float32):
    """The data_override call: field at model time ``t``, regridded to
    the model grid (if ``bmap``), masked, as a jnp array."""
    f = field.at_time(t)
    if bmap is not None:
        f = _apply_map(f, bmap)
    out = jnp.asarray(f, dtype)
    if mask is not None:
        out = out * mask
    return out
