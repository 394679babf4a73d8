"""Passive tracer packages.

Analogues of MOM6's tracer packages (reference: src/tracer/*.F90:
ideal_age_example, dye_example/regional_dyes, boundary_impulse_tracer,
pseudo_salt_tracer, advection_test_tracer):

Each package provides (init, column_physics) hooks operating on a stacked
tracer array; registration goes through the TracerRegistry and the stack
is advected/diffused by the shared machinery (tracer_flow_control role,
src/tracer/MOM_tracer_flow_control.F90)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax.numpy as jnp

from mom6_tpu.tracers.registry import TracerRegistry

__all__ = ["TracerPackage", "IdealAge", "RegionalDye", "BoundaryImpulse",
           "PseudoSalt", "TracerFlowControl"]


@dataclass
class TracerPackage:
    name: str

    def register(self, reg: TracerRegistry) -> None:
        raise NotImplementedError

    def init_fields(self, shape, dtype) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def column_physics(self, fields, h, dt, G, GV):
        """Vertical/source-sink physics per thermo step."""
        return fields


@dataclass
class IdealAge(TracerPackage):
    """Ideal age: zero in the surface layer, ages at 1 yr/yr below
    (ideal_age_example.F90)."""
    name: str = "ideal_age"
    surface_layers: int = 1

    def register(self, reg):
        reg.register("age", units="yr", longname="Ideal Age Tracer")

    def init_fields(self, shape, dtype):
        return {"age": jnp.zeros(shape, dtype)}

    def column_physics(self, fields, h, dt, G, GV):
        age = fields["age"] + dt / (365.0 * 86400.0)
        age = age.at[: self.surface_layers].set(0.0)
        return {**fields, "age": age * G.mask2dT[None]}


@dataclass
class RegionalDye(TracerPackage):
    """Dye released continuously in a rectangular region
    (regional_dyes / dye_example)."""
    name: str = "dye"
    i_min: int = 0
    i_max: int = 4
    j_min: int = 0
    j_max: int = 4
    k_max: int = 1

    def register(self, reg):
        reg.register("dye", units="conc", longname="Regional Dye")

    def init_fields(self, shape, dtype):
        return {"dye": jnp.zeros(shape, dtype)}

    def column_physics(self, fields, h, dt, G, GV):
        dye = fields["dye"]
        dye = dye.at[: self.k_max, self.j_min:self.j_max,
                     self.i_min:self.i_max].set(1.0)
        return {**fields, "dye": dye}


@dataclass
class BoundaryImpulse(TracerPackage):
    """Surface impulse released for ``remaining_source`` seconds, then
    freely advected (boundary_impulse_tracer.F90)."""
    name: str = "boundary_impulse"
    source_seconds: float = 86400.0

    def register(self, reg):
        reg.register("impulse", units="conc", longname="Boundary Impulse")

    def init_fields(self, shape, dtype):
        return {"impulse": jnp.zeros(shape, dtype),
                "_impulse_clock": jnp.zeros((), dtype)}

    def column_physics(self, fields, h, dt, G, GV):
        t = fields["_impulse_clock"]
        active = (t < self.source_seconds).astype(h.dtype)
        imp = fields["impulse"].at[0].set(
            active * 1.0 + (1 - active) * fields["impulse"][0])
        return {**fields, "impulse": imp, "_impulse_clock": t + dt}


@dataclass
class PseudoSalt(TracerPackage):
    """Passive copy of salinity — drift diagnoses spurious mixing
    (pseudo_salt_tracer.F90)."""
    name: str = "pseudo_salt"

    def register(self, reg):
        reg.register("pseudo_salt", units="ppt", longname="Pseudo Salt")

    def init_fields(self, shape, dtype, S0: float = 35.0):
        return {"pseudo_salt": jnp.full(shape, S0, dtype)}


class TracerFlowControl:
    """Owns the package list + registry; builds and steps the stacked
    passive-tracer array (MOM_tracer_flow_control.F90 role)."""

    def __init__(self, packages: List[TracerPackage]):
        self.packages = packages
        self.registry = TracerRegistry()
        for pkg in packages:
            pkg.register(self.registry)
        self.registry.lock()

    def init_tracers(self, shape, dtype) -> Dict[str, jnp.ndarray]:
        fields: Dict[str, jnp.ndarray] = {}
        for pkg in self.packages:
            fields.update(pkg.init_fields(shape, dtype))
        return fields

    def column_physics(self, fields, h, dt, G, GV):
        for pkg in self.packages:
            fields = pkg.column_physics(fields, h, dt, G, GV)
        return fields

    def stack(self, fields):
        return self.registry.stack(fields)

    def unstack(self, arr, fields):
        out = dict(fields)
        out.update(self.registry.unstack(arr))
        return out
