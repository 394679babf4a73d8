"""Diagnostics mediator.

Re-implements the core behavior of MOM6's diag_mediator (reference:
src/framework/MOM_diag_mediator.F90:45-66) and diag_remap
(MOM_diag_remap.F90:1-27):

* ``register_diag_field(module, name, ...)`` declares a diagnostic with
  metadata; registration returns a handle used by ``post_data``;
* ``post_data(handle, array)`` accumulates; time-averaged fields divide by
  the number of posts at flush;
* fields registered with ``vertical_coord='z'`` are conservatively
  remapped from the native (layer) grid to a fixed z grid at post time,
  using the ALE remapping core — the diag-remap design of the reference;
* ``flush(path)`` writes one NetCDF file per call (the diag_table's file
  grouping can layer on top).

Host-side orchestration; the accumulation itself is cheap jnp adds that
fuse into the caller when used under jit via the functional
``DiagAccumulator`` below (planned); round 1 posts from host between
jitted segments — the cadence MOM6 itself uses (per diag interval).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from mom6_tpu.io.netcdf import NCWriter

__all__ = ["DiagMediator"]


@dataclass
class _Diag:
    module: str
    name: str
    units: str = ""
    longname: str = ""
    time_avg: bool = True
    vertical_coord: str = "native"   # 'native' | 'z'
    acc: Optional[np.ndarray] = None
    n_posts: int = 0


class DiagMediator:
    def __init__(self, z_targets: Optional[np.ndarray] = None):
        self._diags: Dict[int, _Diag] = {}
        self._by_name: Dict[str, int] = {}
        self._next = 1
        self._z_targets = z_targets  # (nz_diag,) target z-layer thicknesses

    def register_diag_field(self, module: str, name: str, *, units: str = "",
                            longname: str = "", time_avg: bool = True,
                            vertical_coord: str = "native") -> int:
        key = f"{module}.{name}"
        if key in self._by_name:
            raise ValueError(f"diagnostic {key} already registered")
        hid = self._next
        self._next += 1
        self._diags[hid] = _Diag(module, name, units, longname, time_avg,
                                 vertical_coord)
        self._by_name[key] = hid
        return hid

    def post_data(self, handle: int, data, h=None, bathy=None) -> None:
        """Accumulate one sample.  ``h``/``bathy`` are required for
        z-remapped diagnostics (native thicknesses at post time)."""
        d = self._diags[handle]
        arr = np.asarray(data, np.float64)
        if d.vertical_coord == "z":
            if self._z_targets is None or h is None:
                raise ValueError("z-coordinate diagnostic needs z_targets & h")
            arr = self._remap_to_z(arr, np.asarray(h, np.float64))
        if d.acc is None or not d.time_avg:
            d.acc = arr.copy()
            d.n_posts = 1
        else:
            d.acc += arr
            d.n_posts += 1

    def _remap_to_z(self, arr, h):
        import jax.numpy as jnp
        from mom6_tpu.ale.remapping import remap_column, PLM
        col = h.sum(axis=0)
        dz = np.asarray(self._z_targets, np.float64)
        # clip the z grid into the local column, keep sums equal
        z_int = np.minimum(np.cumsum(dz)[:, None, None], col[None])
        z_int = np.concatenate([np.zeros((1,) + col.shape), z_int], axis=0)
        h_t = np.maximum(z_int[1:] - z_int[:-1], 1e-10)
        scale = col / np.maximum(h_t.sum(axis=0), 1e-30)
        h_t = h_t * scale[None]
        out = remap_column(jnp.asarray(arr, jnp.float32),
                           jnp.asarray(h, jnp.float32),
                           jnp.asarray(h_t, jnp.float32), PLM)
        return np.asarray(out, np.float64)

    def flush(self, path: str, *, time_seconds: float = 0.0) -> List[str]:
        """Write accumulated diagnostics; returns the list written."""
        w = NCWriter(path, global_attrs={"time_seconds": float(time_seconds)})
        written = []
        for d in self._diags.values():
            if d.acc is None:
                continue
            out = d.acc / d.n_posts if d.time_avg else d.acc
            w.write_static(f"{d.module}_{d.name}", out, units=d.units,
                           long_name=d.longname or d.name)
            written.append(f"{d.module}.{d.name}")
            d.acc = None
            d.n_posts = 0
        w.close()
        return written
