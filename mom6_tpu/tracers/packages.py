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
           "PseudoSalt", "CFCPackage", "TracerFlowControl"]


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


@dataclass
class CFCPackage(TracerPackage):
    """CFC-11 + CFC-12 with OCMIP2 air-sea exchange (MOM_OCMIP2_CFC.F90):
    surface saturation follows the Warner & Weiss (1985) solubility
    function of the top-layer T/S and a piecewise-linear atmospheric
    mixing-ratio history; the top layer relaxes toward saturation with a
    prescribed piston velocity.  Time is carried in a package scalar."""
    name: str = "cfc"
    piston_velocity: float = 5.0 / 86400.0   # air-sea exchange [m s-1]
    year0: float = 1950.0                    # model year at t = 0

    # atmospheric mole fractions [ppt by volume], northern-hemisphere
    # means at decadal knots (Walker et al. 2000 history, coarse knots)
    _years = (1950.0, 1960.0, 1970.0, 1980.0, 1990.0, 1995.0, 2000.0,
              2010.0)
    _cfc11_atm = (0.0, 9.0, 60.0, 160.0, 255.0, 264.0, 260.0, 240.0)
    _cfc12_atm = (0.0, 25.0, 110.0, 285.0, 465.0, 500.0, 535.0, 530.0)

    def register(self, reg):
        reg.register("cfc11", units="mol m-3", longname="CFC-11")
        reg.register("cfc12", units="mol m-3", longname="CFC-12")

    def init_fields(self, shape, dtype):
        return {"cfc11": jnp.zeros(shape, dtype),
                "cfc12": jnp.zeros(shape, dtype),
                "_cfc_clock": jnp.zeros((), dtype)}

    @staticmethod
    def _solubility(T, S, a, b):
        """Warner & Weiss (1985) solubility [mol m-3 patm-1]: coefficients
        ``a`` (a1..a4) with ln/100 temperature terms and ``b`` (b1..b3)
        salinity terms; T in degC, returns K0 in mol L-1 atm-1 * 1000."""
        t100 = (T + 273.15) / 100.0
        lnk = (a[0] + a[1] / t100 + a[2] * jnp.log(t100)
               + a[3] * t100 * t100
               + S * (b[0] + b[1] * t100 + b[2] * t100 * t100))
        return 1000.0 * jnp.exp(lnk)       # mol m-3 atm-1

    def column_physics(self, fields, h, dt, G, GV):
        t_sec = fields["_cfc_clock"]
        year = self.year0 + t_sec / (365.0 * 86400.0)
        yrs = jnp.asarray(self._years)
        atm11 = jnp.interp(year, yrs, jnp.asarray(self._cfc11_atm)) * 1e-12
        atm12 = jnp.interp(year, yrs, jnp.asarray(self._cfc12_atm)) * 1e-12
        T = fields.get("_sfc_T", None)
        S = fields.get("_sfc_S", None)
        if T is None:
            T = jnp.full_like(h[0], 10.0)
            S = jnp.full_like(h[0], 35.0)
        # Warner & Weiss table 5 coefficients
        k11 = self._solubility(T, S, (-229.9261, 319.6552, 119.4471,
                                      -1.39165), (0.142382, -0.091459,
                                                  0.0157274))
        k12 = self._solubility(T, S, (-218.0971, 298.9702, 113.8049,
                                      -1.39165), (0.143566, -0.091015,
                                                  0.0153924))
        out = dict(fields)
        for name, atm, k0 in (("cfc11", atm11, k11), ("cfc12", atm12, k12)):
            sat = k0 * atm                   # saturation conc [mol m-3]
            c = fields[name]
            w = dt * self.piston_velocity / jnp.maximum(h[0], 1e-3)
            out[name] = c.at[0].set(((c[0] + w * sat) / (1.0 + w))
                                    * G.mask2dT)
        out["_cfc_clock"] = t_sec + dt
        return out


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
