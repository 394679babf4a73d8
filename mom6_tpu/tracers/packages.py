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

__all__ = ["TracerPackage", "IdealAge", "RegionalDye", "RegionalDyes",
           "BoundaryImpulse", "PseudoSalt", "CFCPackage",
           "TracerFlowControl"]


@dataclass
class TracerPackage:
    name: str

    def register(self, reg: TracerRegistry) -> None:
        raise NotImplementedError

    def init_fields(self, shape, dtype) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def column_physics(self, fields, h, dt, G, GV, **kw):
        """Vertical/source-sink physics per thermo step.  ``kw`` may
        carry the model surface state: T, S (3-D) and forcing."""
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

    def column_physics(self, fields, h, dt, G, GV, **kw):
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

    def column_physics(self, fields, h, dt, G, GV, **kw):
        dye = fields["dye"]
        dye = dye.at[: self.k_max, self.j_min:self.j_max,
                     self.i_min:self.i_max].set(1.0)
        return {**fields, "dye": dye}


@dataclass
class RegionalDyes(TracerPackage):
    """N dye tracers, each held at 1 inside its own lon/lat/depth source
    box (regional_dyes, reference: src/tracer/dye_example.F90:108-160 —
    NUM_DYE_TRACERS with per-dye DYE_SOURCE_{MIN,MAX}{LON,LAT} and
    MINDEPTH/MAXDEPTH).  The dyes are one batch dimension through the
    shared advection/diffusion machinery."""
    name: str = "regional_dyes"
    minlon: tuple = ()
    maxlon: tuple = ()
    minlat: tuple = ()
    maxlat: tuple = ()
    mindepth: tuple = ()        # [m]; empty -> surface layer only
    maxdepth: tuple = ()

    @property
    def n_dyes(self) -> int:
        return len(self.minlon)

    def _dye_name(self, m: int) -> str:
        return f"dye{m + 1:03d}"

    def register(self, reg):
        for m in range(self.n_dyes):
            reg.register(self._dye_name(m), units="conc",
                         longname=f"Regional dye {m + 1}")

    def init_fields(self, shape, dtype):
        return {self._dye_name(m): jnp.zeros(shape, dtype)
                for m in range(self.n_dyes)}

    def column_physics(self, fields, h, dt, G, GV, **kw):
        z_top = jnp.cumsum(h, axis=0) - h
        z_bot = jnp.cumsum(h, axis=0)
        out = dict(fields)
        for m in range(self.n_dyes):
            box = ((G.geoLonT >= self.minlon[m])
                   & (G.geoLonT <= self.maxlon[m])
                   & (G.geoLatT >= self.minlat[m])
                   & (G.geoLatT <= self.maxlat[m]))
            if self.mindepth:
                zsel = (z_bot > self.mindepth[m]) & \
                    (z_top < self.maxdepth[m])
            else:
                zsel = jnp.concatenate(
                    [jnp.ones_like(h[:1], bool),
                     jnp.zeros_like(h[1:], bool)], axis=0)
            src = zsel & box[None]
            name = self._dye_name(m)
            out[name] = jnp.where(src, 1.0, fields[name]) * G.mask2dT[None]
        return out


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

    def column_physics(self, fields, h, dt, G, GV, **kw):
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
    """CFC-11 + CFC-12 with the full OCMIP2 air-sea gas-exchange protocol
    (MOM_OCMIP2_CFC.F90):

    * solubility K0(T,S) from Warner & Weiss (1985) table 5
      (:216-236 d/e coefficient defaults);
    * Schmidt numbers Sc(T) from Zheng et al. (1998)
      (:184-214 a coefficient defaults);
    * piston velocity Kw = a_xkw (1-f_ice) u10^2 sqrt(660/Sc), the
      OCMIP2 Wanninkhof-protocol exchange the reference receives from
      the FMS coupler (the sc_no_term of :571-584 combined with the
      coupler's wind-speed kw), with a_xkw = 0.337 cm hr-1 (m s-1)-2;
    * a piecewise-linear atmospheric mixing-ratio history.

    Surface T/S and the 10 m wind arrive via the column-physics kwargs;
    time is carried in a package scalar."""
    name: str = "cfc"
    a_xkw: float = 0.337e-2 / 3600.0         # [m s-1 per (m s-1)^2]
    u10_default: float = 8.0                 # [m s-1] if no wind given
    year0: float = 1950.0                    # model year at t = 0

    # atmospheric mole fractions [ppt by volume], northern-hemisphere
    # hemisphere-split decadal knots (Walker et al. 2000 history,
    # coarse digitization: sources are northern-hemisphere, so the
    # south lags by ~1.5 years during the growth phase and converges
    # after the production phase-out).  The reference interpolates
    # annual N/S tables from the cfc_atm file (MOM_OCMIP2_CFC.F90); the
    # latitude blend below matches its 10S-10N linear transition.
    _years = (1950.0, 1960.0, 1970.0, 1980.0, 1990.0, 1995.0, 2000.0,
              2010.0)
    _cfc11_n = (0.0, 10.0, 65.0, 168.0, 262.0, 268.0, 261.0, 240.0)
    _cfc11_s = (0.0, 7.0, 52.0, 150.0, 247.0, 260.0, 258.0, 239.0)
    _cfc12_n = (0.0, 27.0, 118.0, 297.0, 478.0, 508.0, 540.0, 531.0)
    _cfc12_s = (0.0, 21.0, 100.0, 270.0, 450.0, 492.0, 530.0, 529.0)

    # Schmidt-number polynomials Sc = a1 + T(a2 + T(a3 + T a4))
    # (Zheng et al. 1998; MOM_OCMIP2_CFC.F90:187-188)
    _sc11 = (3501.8, -210.31, 6.1851, -0.07513)
    _sc12 = (3845.4, -228.95, 6.1908, -0.06743)

    def register(self, reg):
        reg.register("cfc11", units="mol m-3", longname="CFC-11")
        reg.register("cfc12", units="mol m-3", longname="CFC-12")

    def init_fields(self, shape, dtype):
        return {"cfc11": jnp.zeros(shape, dtype),
                "cfc12": jnp.zeros(shape, dtype),
                "_cfc_clock": jnp.zeros((), dtype)}

    @staticmethod
    def _solubility(T, S, a, b):
        """Warner & Weiss (1985) solubility: coefficients ``a`` (d1..d4)
        with 100/T and ln(T/100) terms and ``b`` (e1..e3) salinity
        terms; T in degC; returns K0 in mol m-3 atm-1."""
        t100 = (T + 273.15) / 100.0
        lnk = (a[0] + a[1] / t100 + a[2] * jnp.log(t100)
               + a[3] * t100 * t100
               + S * (b[0] + b[1] * t100 + b[2] * t100 * t100))
        return 1000.0 * jnp.exp(lnk)       # mol L-1 atm-1 -> mol m-3

    @staticmethod
    def _schmidt(T, a):
        return a[0] + T * (a[1] + T * (a[2] + T * a[3]))

    def column_physics(self, fields, h, dt, G, GV, T=None, S=None,
                       forcing=None, **kw):
        t_sec = fields["_cfc_clock"]
        year = self.year0 + t_sec / (365.0 * 86400.0)
        yrs = jnp.asarray(self._years)
        # hemispheric mixing ratios blended across 10S..10N by latitude
        lat = G.geoLatT if G is not None and G.geoLatT is not None \
            else jnp.zeros_like(h[0])
        w_n = jnp.clip((lat + 10.0) / 20.0, 0.0, 1.0)

        def _atm(tab_n, tab_s):
            xn = jnp.interp(year, yrs, jnp.asarray(tab_n))
            xs = jnp.interp(year, yrs, jnp.asarray(tab_s))
            return (w_n * xn + (1.0 - w_n) * xs) * 1e-12

        atm11 = _atm(self._cfc11_n, self._cfc11_s)
        atm12 = _atm(self._cfc12_n, self._cfc12_s)
        sst = T[0] if T is not None else jnp.full_like(h[0], 10.0)
        sss = S[0] if S is not None else jnp.full_like(h[0], 35.0)
        u10 = None
        if forcing is not None and forcing.mech.u10 is not None:
            u10 = forcing.mech.u10
        if u10 is None:
            u10 = jnp.full_like(h[0], self.u10_default)
        # Warner & Weiss table 5 (MOM_OCMIP2_CFC.F90:216-219 defaults)
        k11 = self._solubility(sst, sss,
                               (-229.9261, 319.6552, 119.4471, -1.39165),
                               (-0.142382, 0.091459, -0.0157274))
        k12 = self._solubility(sst, sss,
                               (-218.0971, 298.9702, 113.8049, -1.39165),
                               (-0.143566, 0.091015, -0.0153924))
        kw_wind = self.a_xkw * u10 * u10     # [m s-1] before Sc term
        out = dict(fields)
        for name, atm, k0, sc_c in (("cfc11", atm11, k11, self._sc11),
                                    ("cfc12", atm12, k12, self._sc12)):
            sc = self._schmidt(sst, sc_c)
            kw_g = kw_wind * jnp.sqrt(660.0 / jnp.maximum(
                jnp.abs(sc), 1e-30))         # sc_no_term (:578)
            sat = k0 * atm                   # saturation conc [mol m-3]
            c = fields[name]
            w = dt * kw_g / jnp.maximum(h[0], 1e-3)
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

    def column_physics(self, fields, h, dt, G, GV, **kw):
        for pkg in self.packages:
            fields = pkg.column_physics(fields, h, dt, G, GV, **kw)
        return fields

    def stack(self, fields):
        return self.registry.stack(fields)

    def unstack(self, arr, fields):
        out = dict(fields)
        out.update(self.registry.unstack(arr))
        return out
