"""NetCDF file I/O.

Role of MOM6's MOM_io / MOM_netcdf (reference: src/framework/MOM_io.F90,
MOM_netcdf.F90): a thin, dependency-light file layer for restarts,
diagnostics and grid files.  Backend: NetCDF-3 classic via
``scipy.io.netcdf_file`` (no libnetcdf in the image); the variable
metadata conventions (units, long_name, time axis) follow the reference's
``vardesc`` usage so downstream tooling can read the output.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = ["NCWriter", "read_nc"]


class NCWriter:
    """Write a dict of arrays (+ optional unlimited time axis) to NetCDF."""

    def __init__(self, path: str, global_attrs: Optional[Dict] = None):
        from scipy.io import netcdf_file
        self._f = netcdf_file(path, "w", version=2)  # 64-bit offset
        self._dims: Dict[str, int] = {}
        self._vars: Dict[str, object] = {}
        self._nrec = 0
        for k, v in (global_attrs or {}).items():
            setattr(self._f, k, v)

    def _ensure_dim(self, name: str, size: Optional[int]) -> None:
        if name not in self._dims:
            self._f.createDimension(name, size)
            self._dims[name] = size

    def define_var(self, name: str, dims: Sequence[Tuple[str, Optional[int]]],
                   dtype=np.float64, units: str = "", long_name: str = "",
                   attrs: Optional[Dict] = None):
        for dname, dsize in dims:
            self._ensure_dim(dname, dsize)
        v = self._f.createVariable(name, dtype, [d for d, _ in dims])
        if units:
            v.units = units
        if long_name:
            v.long_name = long_name
        for k, val in (attrs or {}).items():
            setattr(v, k, val)
        self._vars[name] = v
        return v

    def write_static(self, name: str, data, *, dim_prefix: str = "",
                     units: str = "", long_name: str = "",
                     dims: Optional[Sequence[Tuple[str, int]]] = None,
                     attrs: Optional[Dict] = None) -> None:
        data = np.asarray(data)
        # NetCDF-3 classic has no 64-bit ints / 16-bit floats
        if data.dtype in (np.int64, np.uint32, np.uint64):
            data = data.astype(np.int32)
        elif data.dtype == np.float16:
            data = data.astype(np.float32)
        if dims is None:
            dims = [(f"{dim_prefix}{name}_d{i}", s)
                    for i, s in enumerate(data.shape)]
        v = self.define_var(name, dims, data.dtype, units, long_name,
                            attrs=attrs)
        v[:] = data

    def close(self) -> None:
        self._f.close()


def read_nc(path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a NetCDF-3 file into a dict (copies)."""
    from scipy.io import netcdf_file
    out: Dict[str, np.ndarray] = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for name, var in f.variables.items():
            out[name] = np.array(var[:])
    return out
