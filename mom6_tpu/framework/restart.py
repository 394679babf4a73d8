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
                     step: int = 0) -> None:
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

    def restore_state(self, path: str, state, dtype=jnp.float32):
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

    def query_initialized(self, name: str) -> bool:
        return self._restored is not None and name in self._restored
