"""Unsplit time stepping (no barotropic/baroclinic splitting).

Analogues of MOM6's MOM_dynamics_unsplit.F90 (3-stage RK, :775 LoC) and
MOM_dynamics_unsplit_RK2.F90: the full equations stepped explicitly at the
external-gravity-wave CFL.  Reference/debug schemes (the split solver is
the production path), and the tc1.a / tc1.b regression variants.

RK3 stages (matching the reference's 1/3, 1/2, 1 structure):
  u1 = u + dt/3 (PF + Cor)(u, h)    ; h unchanged
  u2 = u + dt/2 (PF + Cor)(u1, h1)  ; h1 from continuity(u1) over dt/2
  u3 = u + dt   (PF + Cor)(u2, h2)  ; h_new from continuity(u3...) over dt
with vertical viscosity applied implicitly at the end.
"""

from __future__ import annotations

from typing import NamedTuple

from mom6_tpu.core.continuity_ppm import continuity_ppm
from mom6_tpu.core.coriolis_adv import SADOURNY75_ENERGY, coriolis_adv
from mom6_tpu.core.pressure_force import pressure_force_montgomery
from mom6_tpu.core.state import OceanState
from mom6_tpu.core.dynamics_split_rk2 import MechForcing, _face_thickness
from mom6_tpu.physics.vertical.vert_friction import (vertvisc, vertvisc_coef)

__all__ = ["UnsplitParams", "step_dynamics_unsplit_rk3",
           "step_dynamics_unsplit_rk2"]


class UnsplitParams(NamedTuple):
    dt: float
    kv: float = 1e-4
    bottom_drag: float = 0.0
    coriolis_scheme: str = SADOURNY75_ENERGY


def _accel(u, v, h, uh, vh, G, GV, scheme, pf_fn):
    pf = pf_fn(h)
    cau, cav = coriolis_adv(u, v, h, uh, vh, G, GV, scheme=scheme)
    return (cau + pf.PFu) * G.mask2dCu, (cav + pf.PFv) * G.mask2dCv


def step_dynamics_unsplit_rk3(state: OceanState, forces: MechForcing,
                              G, GV, p: UnsplitParams, *,
                              pf_fn=None) -> OceanState:
    dt = p.dt
    h, u, v = state.h, state.u, state.v
    if pf_fn is None:
        pf_fn = lambda hh: pressure_force_montgomery(hh, G, GV)

    # stage 1: dt/3
    _, uh0, vh0, _, _ = continuity_ppm(u, v, h, dt, G, GV)
    au, av = _accel(u, v, h, uh0, vh0, G, GV, p.coriolis_scheme, pf_fn)
    u1 = (u + (dt / 3.0) * au) * G.mask2dCu
    v1 = (v + (dt / 3.0) * av) * G.mask2dCv

    # stage 2: dt/2, with h advanced dt/2 by the stage-1 velocities
    h1, uh1, vh1, _, _ = continuity_ppm(u1, v1, h, 0.5 * dt, G, GV)
    au, av = _accel(u1, v1, h1, uh1, vh1, G, GV, p.coriolis_scheme, pf_fn)
    u2 = (u + 0.5 * dt * au) * G.mask2dCu
    v2 = (v + 0.5 * dt * av) * G.mask2dCv

    # stage 3: full dt
    h2, uh2, vh2, _, _ = continuity_ppm(u2, v2, h, 0.5 * dt, G, GV)
    au, av = _accel(u2, v2, h2, uh2, vh2, G, GV, p.coriolis_scheme, pf_fn)
    u3 = (u + dt * au) * G.mask2dCu
    v3 = (v + dt * av) * G.mask2dCv

    # implicit vertical viscosity + wind/drag, then final continuity
    h_u, h_v = _face_thickness(h, G)
    cu = vertvisc_coef(h_u, p.kv, bottom_drag=p.bottom_drag)
    cv = vertvisc_coef(h_v, p.kv, bottom_drag=p.bottom_drag)
    u3 = vertvisc(u3, h_u, cu, dt, tau=forces.taux, rho0=GV.rho0) * G.mask2dCu
    v3 = vertvisc(v3, h_v, cv, dt, tau=forces.tauy, rho0=GV.rho0) * G.mask2dCv

    h_new, uh, vh, _, _ = continuity_ppm(0.5 * (u + u3), 0.5 * (v + v3),
                                         h, dt, G, GV)
    uhtr = state.uhtr + dt * uh if state.uhtr is not None else None
    vhtr = state.vhtr + dt * vh if state.vhtr is not None else None
    return state.replace(h=h_new, u=u3, v=v3, uh=uh, vh=vh,
                         uhtr=uhtr, vhtr=vhtr)


def step_dynamics_unsplit_rk2(state: OceanState, forces: MechForcing,
                              G, GV, p: UnsplitParams, *, be: float = 0.6,
                              pf_fn=None) -> OceanState:
    """2-stage unsplit scheme (MOM_dynamics_unsplit_RK2.F90): predictor to
    be*dt, corrector with accelerations at the predicted state."""
    dt = p.dt
    h, u, v = state.h, state.u, state.v
    if pf_fn is None:
        pf_fn = lambda hh: pressure_force_montgomery(hh, G, GV)

    _, uh0, vh0, _, _ = continuity_ppm(u, v, h, dt, G, GV)
    au, av = _accel(u, v, h, uh0, vh0, G, GV, p.coriolis_scheme, pf_fn)
    up = (u + be * dt * au) * G.mask2dCu
    vp = (v + be * dt * av) * G.mask2dCv
    hp, uhp, vhp, _, _ = continuity_ppm(up, vp, h, be * dt, G, GV)

    au, av = _accel(up, vp, hp, uhp, vhp, G, GV, p.coriolis_scheme, pf_fn)
    u_new = (u + dt * au) * G.mask2dCu
    v_new = (v + dt * av) * G.mask2dCv

    h_u, h_v = _face_thickness(h, G)
    cu = vertvisc_coef(h_u, p.kv, bottom_drag=p.bottom_drag)
    cv = vertvisc_coef(h_v, p.kv, bottom_drag=p.bottom_drag)
    u_new = vertvisc(u_new, h_u, cu, dt, tau=forces.taux,
                     rho0=GV.rho0) * G.mask2dCu
    v_new = vertvisc(v_new, h_v, cv, dt, tau=forces.tauy,
                     rho0=GV.rho0) * G.mask2dCv

    h_new, uh, vh, _, _ = continuity_ppm(u_new, v_new, h, dt, G, GV)
    uhtr = state.uhtr + dt * uh if state.uhtr is not None else None
    vhtr = state.vhtr + dt * vh if state.vhtr is not None else None
    return state.replace(h=h_new, u=u_new, v=v_new, uh=uh, vh=vh,
                         uhtr=uhtr, vhtr=vhtr)
