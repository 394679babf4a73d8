"""Restart (checkpoint/resume) system.

Re-implements the user-visible behavior of MOM6's restart registry
(reference: src/framework/MOM_restart.F90:27-33: register_restart_field,
register_restart_pair, save_restart, restore_state, query_initialized):

* fields are registered once at init with a name and an obtained pytree
  path (here: a getter/setter pair on the state);
* ``save_restart`` writes every registered field plus run metadata to one
  NetCDF file (multi-file sharded restarts are a planned follow-on for
  pod-scale grids — with GSPMD the natural format is one file per host);
* ``restore_state`` reads the file back and rebuilds the state pytree;
  ``query_initialized`` reports which fields were present so missing
  fields can be re-derived (partial restarts).

Restart equivalence (split run == continuous run) is gated by
tests/test_restart_diag.py, the analogue of .testing's test.restart.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from mom6_tpu.io.netcdf import NCWriter, read_nc

__all__ = ["RestartRegistry"]


@dataclass
class _Field:
    name: str
    getter: Callable[[Any], Any]
    setter: Callable[[Any, Any], Any]   # (state, value) -> new state
    units: str = ""
    longname: str = ""
    mandatory: bool = True


class RestartRegistry:
    def __init__(self):
        self._fields: Dict[str, _Field] = {}
        self._locked = False
        self._restored: Optional[set] = None

    def register(self, name: str, getter, setter, *, units: str = "",
                 longname: str = "", mandatory: bool = True) -> None:
        if self._locked:
            raise RuntimeError("restart registry locked")
        if name in self._fields:
            raise ValueError(f"restart field {name} already registered")
        self._fields[name] = _Field(name, getter, setter, units, longname,
                                    mandatory)

    def register_state_attrs(self, names: List[str], **kw) -> None:
        """Register plain attributes of the OceanState pytree."""
        for n in names:
            self.register(
                n,
                getter=lambda s, n=n: getattr(s, n),
                setter=lambda s, v, n=n: s.replace(**{n: v}), **kw)

    def lock(self) -> None:
        self._locked = True

    # -- save / restore -------------------------------------------------------

    def save_restart(self, path: str, state, *, time_seconds: float = 0.0,
                     step: int = 0,
                     io_layout: "tuple[int, int] | None" = None) -> None:
        """Write the restart; ``io_layout=(jy, ix)`` splits every field's
        trailing (ny, nx) plane into jy*ix tiles written as parallel
        files ``path.NNNN`` (the IO_LAYOUT distributed-file output of
        FMS — one file per IO rank, recombined on read), each tagged
        with its tile origin for reassembly."""
        if io_layout is not None and tuple(io_layout) != (1, 1):
            self._save_distributed(path, state, time_seconds, step,
                                   io_layout)
            return
        tmp = path + ".tmp"
        w = NCWriter(tmp, global_attrs={
            "title": "mom6_tpu restart", "time_seconds": float(time_seconds),
            "step": int(step)})
        for f in self._fields.values():
            val = f.getter(state)
            if val is None:
                continue
            w.write_static(f.name, np.asarray(val), units=f.units,
                           long_name=f.longname)
        w.write_static("__time_seconds__", np.array([time_seconds]))
        w.write_static("__step__", np.array([step], dtype=np.int32))
        w.close()
        os.replace(tmp, path)  # atomic publish (crash-safe checkpointing)

    def _save_distributed(self, path, state, time_seconds, step,
                          io_layout):
        jy, ix = io_layout
        arrays = {f.name: np.asarray(f.getter(state))
                  for f in self._fields.values()
                  if f.getter(state) is not None}
        ny, nx = next(iter(arrays.values())).shape[-2:]
        ys = [slice(r * ny // jy, (r + 1) * ny // jy) for r in range(jy)]
        xs = [slice(c * nx // ix, (c + 1) * nx // ix) for c in range(ix)]
        for r in range(jy):
            for c in range(ix):
                tile = path + f".{r * ix + c:04d}"
                tmp = tile + ".tmp"
                w = NCWriter(tmp, global_attrs={
                    "title": "mom6_tpu restart tile",
                    "time_seconds": float(time_seconds),
                    "step": int(step),
                    "tile_j0": int(ys[r].start), "tile_i0": int(xs[c].start),
                    "global_ny": int(ny), "global_nx": int(nx),
                    "n_tiles": int(jy * ix)})
                for name, a in arrays.items():
                    w.write_static(name, a[..., ys[r], xs[c]])
                w.write_static("__time_seconds__",
                               np.array([time_seconds]))
                w.write_static("__step__", np.array([step], np.int32))
                w.close()
                os.replace(tmp, tile)

    def restore_state(self, path: str, state, dtype=jnp.float32):
        if not os.path.exists(path) and os.path.exists(path + ".0000"):
            data = self._read_distributed(path)
        else:
            data = read_nc(path)
        self._restored = set()
        for f in self._fields.values():
            if f.name in data:
                state = f.setter(state, jnp.asarray(data[f.name], dtype))
                self._restored.add(f.name)
            elif f.mandatory:
                raise KeyError(f"mandatory restart field {f.name} missing "
                               f"from {path}")
        time_s = float(data.get("__time_seconds__", np.zeros(1))[0])
        step = int(data.get("__step__", np.zeros(1, np.int32))[0])
        return state, time_s, step

    def _read_distributed(self, path):
        """Reassemble ``path.NNNN`` tiles into global arrays (the
        mppnccombine role, done lazily at restore time)."""
        from scipy.io import netcdf_file
        tiles = []
        n = 0
        while os.path.exists(path + f".{n:04d}"):
            tiles.append(path + f".{n:04d}")
            n += 1
        with netcdf_file(tiles[0], "r", mmap=False) as f0:
            ny, nx = int(f0.global_ny), int(f0.global_nx)
        data = {}
        meta = {}
        for t in tiles:
            with netcdf_file(t, "r", mmap=False) as f:
                j0, i0 = int(f.tile_j0), int(f.tile_i0)
                for name, var in f.variables.items():
                    a = np.array(var[:])
                    if name.startswith("__"):
                        meta[name] = a
                        continue
                    if name not in data:
                        data[name] = np.zeros(a.shape[:-2] + (ny, nx),
                                              a.dtype)
                    sj = slice(j0, j0 + a.shape[-2])
                    si = slice(i0, i0 + a.shape[-1])
                    data[name][..., sj, si] = a
        data.update(meta)
        return data

    def query_initialized(self, name: str) -> bool:
        return self._restored is not None and name in self._restored
