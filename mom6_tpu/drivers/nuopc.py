"""NUOPC cap: a lifecycle-faithful coupled-component shell.

Analogue of the reference's NUOPC/CMEPS cap
(config_src/drivers/nuopc_cap/mom_cap.F90): an ESMF gridded component
with phased initialization — Advertise (declare the import/export field
menu, :805-895), Realize (build the model and allocate the exchange
state on its grid, :1000-1400), ModelAdvance (ingest imports, step the
ocean one coupling interval, fill exports, ring restart/stop alarms,
:1688-1982) — plus ModelFinalize.

ESMF itself is not on this stack; the cap reproduces its contract with
plain Python: a ``CapClock`` with ring-once ``CapAlarm``s on the model
calendar (framework.time_manager), dict-of-arrays import/export states
keyed by the CESM mediator's standard field names, and date-stamped
restart files (``mom.r.YYYY-MM-DD-SSSSS.nc``, the CESM restart naming
the cap writes at :1935-1960).

Sign conventions: the mediator hands every flux down
positive-into-the-ocean; ``ingest_import_state`` folds them onto the
FMS-sign ``IceOceanBoundary`` (sensible/latent/longwave positive =
ocean loses heat), mirroring what mom_cap_methods.F90 +
mom_surface_forcing_nuopc.F90 convert_IOB_to_fluxes do together.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from mom6_tpu.drivers.coupled_cap import (IceOceanBoundary,
                                          convert_iob_to_forcing,
                                          ocean_model_init)
from mom6_tpu.framework import time_manager as tm
from mom6_tpu.framework.stencil import im1, jm1

__all__ = ["CapAlarm", "CapClock", "NUOPCCap",
           "FLDS_TO_OCN", "FLDS_FR_OCN"]

# -- advertised fields ---------------------------------------------------------
# import menu (fldsToOcn, mom_cap.F90:810-877): CESM standard name ->
# (IceOceanBoundary field, sign folding the mediator's downward-positive
# convention onto the IOB's FMS signs)
FLDS_TO_OCN: Dict[str, Tuple[str, float]] = {
    "Foxx_taux": ("u_flux", 1.0),
    "Foxx_tauy": ("v_flux", 1.0),
    "Foxx_sen": ("t_flux", -1.0),        # +down -> FMS "+removes heat"
    "Foxx_evap": ("q_flux", -1.0),       # +down water -> FMS "+evaporates"
    "Foxx_lwnet": ("lw_flux", -1.0),
    "Foxx_swnet_vdr": ("sw_vis_dir", 1.0),
    "Foxx_swnet_vdf": ("sw_vis_dif", 1.0),
    "Foxx_swnet_idr": ("sw_nir_dir", 1.0),
    "Foxx_swnet_idf": ("sw_nir_dif", 1.0),
    "Faxa_rain": ("lprec", 1.0),
    "Faxa_snow": ("fprec", 1.0),
    "Foxx_rofl": ("runoff", 1.0),
    "Foxx_rofi": ("frunoff", 1.0),
    "Fioi_salt": ("salt_flux", 1.0),
    "Fioi_meltw": ("seaice_melt", 1.0),
    "Fioi_melth": ("seaice_melt_heat", -1.0),
    "Foxx_hrain": ("hrain", 1.0),
    "Foxx_hsnow": ("hsnow", 1.0),
    "Foxx_hevap": ("hevap", 1.0),
    "Foxx_hcond": ("hcond", 1.0),
    "Foxx_hrofl": ("hrofl", 1.0),
    "Foxx_hrofi": ("hrofi", 1.0),
    "Sa_pslv": ("p", 1.0),
    "Si_ifrac": ("ice_fraction", 1.0),
    "So_duu10n": ("u10_sqr", 1.0),
    "Sw_lamult": ("lamult", 1.0),
    "Sw_pstokes_x": ("ustkb", 1.0),
    "Sw_pstokes_y": ("vstkb", 1.0),
    # BGC coupling fields (mom_cap.F90:856-868)
    "Faxa_ndep": ("ndep", 1.0),
    "Sa_co2prog": ("atm_co2", 1.0),
}

# export menu (fldsFrOcn, mom_cap.F90:885-893)
FLDS_FR_OCN: List[str] = [
    "So_omask", "So_t", "So_s", "So_u", "So_v",
    "So_dhdx", "So_dhdy", "Fioo_q", "So_bldepth",
]


class CapAlarm:
    """Ring-once-per-interval alarm (the ESMF_Alarm role).  Rings when
    model time reaches the next multiple of ``interval`` seconds past
    ``start``; ``ring_off`` arms the next occurrence."""

    def __init__(self, start: tm.ModelTime, interval_sec: Optional[int]):
        self.interval = interval_sec
        self._next = (start.add_seconds(interval_sec)
                      if interval_sec else None)

    def is_ringing(self, now: tm.ModelTime) -> bool:
        return self._next is not None and self._next <= now

    def ring_off(self, now: tm.ModelTime) -> None:
        if self._next is None:
            return
        while self._next <= now:
            self._next = self._next.add_seconds(self.interval)


class CapClock:
    """Coupling clock (the ESMF_Clock role): calendar, current time,
    stop time, the coupling timestep, and named alarms."""

    def __init__(self, calendar: int, start: tm.ModelTime,
                 stop: tm.ModelTime, coupling_sec: float):
        self.calendar = calendar
        self.current = start
        self.start = start
        self.stop = stop
        self.coupling_sec = coupling_sec
        self.alarms: Dict[str, CapAlarm] = {}

    def add_alarm(self, name: str, interval_sec: Optional[int]) -> None:
        self.alarms[name] = CapAlarm(self.current, interval_sec)

    def advance(self) -> None:
        self.current = self.current.add_seconds(self.coupling_sec)

    def is_stop_time(self) -> bool:
        return self.stop <= self.current

    def date_stamp(self) -> str:
        """CESM-style ``YYYY-MM-DD-SSSSS`` restart date tag."""
        y, mo, d, h, mi, s = tm.get_date(self.calendar, self.current)
        return f"{y:04d}-{mo:02d}-{d:02d}-{h * 3600 + mi * 60 + s:05d}"


class NUOPCCap:
    """The gridded component.  Use as::

        cap = NUOPCCap(rundir)
        imports, exports = cap.advertise()
        cap.realize(stop_days=1.0, restart_interval_sec=43200)
        while not cap.clock.is_stop_time():
            export_state = cap.advance(import_state)
        cap.finalize()
    """

    def __init__(self, rundir: str, restart_dir: Optional[str] = None):
        self.rundir = rundir
        self.restart_dir = restart_dir or os.path.join(rundir, "RESTART")
        self.model = None
        self.clock: Optional[CapClock] = None
        self._advertised = False

    # -- phase 1: InitializeAdvertise (mom_cap.F90:780-900) ------------
    def advertise(self) -> Tuple[List[str], List[str]]:
        self._advertised = True
        return sorted(FLDS_TO_OCN), list(FLDS_FR_OCN)

    # -- phase 2: InitializeRealize (mom_cap.F90:1000-1400) ------------
    def realize(self, stop_days: float = 1.0,
                restart_interval_sec: Optional[int] = None,
                calendar: str = "NOLEAP",
                start_date=(1, 1, 1, 0, 0, 0)) -> None:
        if not self._advertised:
            raise RuntimeError("advertise() must run before realize()")
        self.model = ocean_model_init(self.rundir)
        # track frazil for the Fioo_q export
        st = self.model.state
        if st.frazil is None and st.T is not None:
            self.model.state = st.replace(
                frazil=jnp.zeros_like(st.h[0]))
        cal = tm.calendar_from_name(calendar)
        start = tm.set_date(cal, *start_date)
        stop = start.add_seconds(stop_days * 86400.0)
        self.clock = CapClock(cal, start, stop,
                              self.model.coupling_dt)
        self.clock.add_alarm("restart_alarm", restart_interval_sec)
        self.clock.add_alarm("stop_alarm",
                             stop.total_seconds() - start.total_seconds())

    # -- import-state ingestion (mom_cap_methods.F90 state_getimport) --
    @staticmethod
    def ingest_import_state(fields: Dict[str, jnp.ndarray]
                            ) -> IceOceanBoundary:
        kwargs = {}
        for name, arr in fields.items():
            if name not in FLDS_TO_OCN:
                raise KeyError(
                    f"unadvertised NUOPC import field {name!r}; "
                    f"known: {sorted(FLDS_TO_OCN)}")
            fld, sign = FLDS_TO_OCN[name]
            kwargs[fld] = sign * arr if sign != 1.0 else arr
        return IceOceanBoundary(**kwargs)

    # -- ModelAdvance (mom_cap.F90:1688-1982) --------------------------
    def advance(self, import_state: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
        from mom6_tpu.diagnostics.diagnostics import extract_surface_state
        if self.clock is None:
            raise RuntimeError("realize() must run before advance()")
        model = self.model
        iob = self.ingest_import_state(import_state)
        sfc0 = extract_surface_state(model.state, model.grid, model.vgrid)
        forcing = convert_iob_to_forcing(iob, sfc0.sss, model.vgrid)
        model.state = model._step(model.state, forcing)
        model.time_seconds += model.coupling_dt
        self.clock.advance()

        # restart alarm (restart_mode='alarms', mom_cap.F90:1882-1911)
        ra = self.clock.alarms.get("restart_alarm")
        if ra is not None and ra.is_ringing(self.clock.current):
            ra.ring_off(self.clock.current)
            self.write_restart()

        return self.fill_export_state(dt_int=self.clock.coupling_sec)

    # -- export-state fill (mom_cap_methods.F90:560-815) ---------------
    def fill_export_state(self, dt_int: float) -> Dict[str, jnp.ndarray]:
        from mom6_tpu.diagnostics.diagnostics import extract_surface_state
        from mom6_tpu.eos.tfreeze import get_tfreeze
        model = self.model
        G, GV = model.grid, model.vgrid
        tfreeze_fn = get_tfreeze(model.params.diabatic.tfreeze_form)
        sfc = extract_surface_state(model.state, G, GV,
                                    tfreeze_fn=tfreeze_fn,
                                    cp=model.params.diabatic.cp,
                                    frazil=model.state.frazil)
        # sea-surface slope at h points from masked face slopes
        # (mom_cap_methods.F90:705-815: ssh gradient for ice dynamics)
        su = (jnp.roll(sfc.ssh, -1, axis=-1) - sfc.ssh) \
            * G.IdxCu * G.mask2dCu
        sv = (jnp.roll(sfc.ssh, -1, axis=-2) - sfc.ssh) \
            * G.IdyCv * G.mask2dCv
        wu = G.mask2dCu + im1(G.mask2dCu)
        wv = G.mask2dCv + jm1(G.mask2dCv)
        dhdx = (su + im1(su)) / jnp.maximum(wu, 1.0) * G.mask2dT
        dhdy = (sv + jm1(sv)) / jnp.maximum(wv, 1.0) * G.mask2dT
        # freezing potential Fioo_q [W m-2]: accrued frazil heat if any,
        # else the (negative) melt potential, both per coupling interval
        # (mom_cap_methods.F90:683-699)
        q = jnp.zeros_like(sfc.sst)
        if sfc.frazil is not None:
            q = sfc.frazil / dt_int
        if sfc.melt_potential is not None:
            # our melt_potential is already <= 0 (J m-2); flux-ize it
            melt = jnp.minimum(sfc.melt_potential / dt_int, 0.0)
            q = jnp.where(q > 0.0, q, melt)
        # hand the frazil accumulator back zeroed (the cap consumed it)
        if model.state.frazil is not None:
            model.state = model.state.replace(
                frazil=jnp.zeros_like(model.state.frazil))
        bld = sfc.mld if sfc.mld is not None else jnp.zeros_like(sfc.sst)
        return {
            "So_omask": G.mask2dT,
            "So_t": sfc.sst,
            "So_s": sfc.sss,
            "So_u": sfc.u_sfc,
            "So_v": sfc.v_sfc,
            "So_dhdx": dhdx,
            "So_dhdy": dhdy,
            "Fioo_q": q,
            "So_bldepth": bld,
        }

    def write_restart(self) -> str:
        """Date-stamped CESM-style restart (mom.r.<date>.nc,
        mom_cap.F90:1935-1960)."""
        from mom6_tpu.framework.restart import RestartRegistry
        os.makedirs(self.restart_dir, exist_ok=True)
        path = os.path.join(self.restart_dir,
                            f"mom.r.{self.clock.date_stamp()}.nc")
        reg = RestartRegistry()
        names = [n for n in ("h", "u", "v", "T", "S")
                 if getattr(self.model.state, n) is not None]
        reg.register_state_attrs(names)
        reg.save_restart(path, self.model.state,
                         time_seconds=self.model.time_seconds)
        return path

    # -- ModelFinalize (ocean_model_end + final restart) ---------------
    def finalize(self, write_restart_at_end: bool = False):
        if write_restart_at_end:
            self.write_restart()
        return self.model.state
