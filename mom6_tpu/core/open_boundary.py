"""Open boundary conditions.

TPU-native re-design of MOM6's segment OBC system (reference:
src/core/MOM_open_boundary.F90:41-60, 490: OBC_SEGMENT_xxx strings,
Flather/Orlanski radiation, nudging, tracer reservoirs).

Design: a segment is an edge strip (N/S/E/W plus an index range) carrying
exterior data (eta, normal velocity, T, S).  Instead of the reference's
per-segment pointer lists, each segment compiles to dense (ny, nx) masks
and data arrays once at init; application is branchless masked arithmetic:

* Flather radiation on the barotropic normal flow:
    u_b = u_ext +- sqrt(g/D) (eta - eta_ext)
  applied to every layer's boundary face (radiates the external mode);
* optional relaxation (nudging) of tracers toward exterior values on the
  boundary strip with a specified timescale.

The grid must be built with the corresponding edge faces unmasked:
``open_edges`` of build_cartesian_grid... round 1: OBC unmasks the faces
itself by operating on the last interior face (the wall face stays
masked; the Flather update writes the layer velocities at the face just
inside, which is equivalent for a one-cell sponge-style open boundary).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["OBCSegment", "OBCParams", "build_obc", "apply_obc"]


class OBCSegment(NamedTuple):
    edge: str                      # 'N' | 'S' | 'E' | 'W'
    lo: int = 0                    # start index along the edge
    hi: int = -1                   # end index (exclusive; -1 = to the end)
    eta_ext: float = 0.0           # exterior sea surface height [m]
    vel_ext: float = 0.0           # exterior normal velocity [m s-1]
    T_ext: Optional[float] = None
    S_ext: Optional[float] = None
    nudge_timescale: float = 3600.0


class OBCParams(NamedTuple):
    # dense compiled masks/data (built by build_obc)
    mask_u: jnp.ndarray            # (ny, nx) 1 on zonal OBC faces
    mask_v: jnp.ndarray
    sign_u: jnp.ndarray            # +1 at an east boundary, -1 at west
    sign_v: jnp.ndarray
    eta_ext: jnp.ndarray           # (ny, nx) at cells adjacent to the OBC
    uvel_ext: jnp.ndarray
    vvel_ext: jnp.ndarray
    mask_cell: jnp.ndarray         # boundary-strip cells (for nudging)
    T_ext: Optional[jnp.ndarray] = None
    S_ext: Optional[jnp.ndarray] = None
    inv_tau: Optional[jnp.ndarray] = None


def build_obc(segments: List[OBCSegment], ny: int, nx: int,
              dtype=jnp.float32) -> OBCParams:
    """Compile segment specs into dense masks (init-time, host-side)."""
    mu = np.zeros((ny, nx)); mv = np.zeros((ny, nx))
    su = np.zeros((ny, nx)); sv = np.zeros((ny, nx))
    eta = np.zeros((ny, nx)); ue = np.zeros((ny, nx)); ve = np.zeros((ny, nx))
    mc = np.zeros((ny, nx))
    te = np.zeros((ny, nx)); se = np.zeros((ny, nx))
    itau = np.zeros((ny, nx))
    any_ts = False
    for seg in segments:
        hi = seg.hi if seg.hi >= 0 else (nx if seg.edge in "NS" else ny)
        if seg.edge == "E":
            sl = (slice(seg.lo, hi), -2)     # last interior u face
            cell = (slice(seg.lo, hi), -1)
            mu[sl] = 1.0; su[sl] = 1.0; ue[sl] = seg.vel_ext
        elif seg.edge == "W":
            sl = (slice(seg.lo, hi), 0)
            cell = (slice(seg.lo, hi), 0)
            mu[sl] = 1.0; su[sl] = -1.0; ue[sl] = seg.vel_ext
        elif seg.edge == "N":
            sl = (-2, slice(seg.lo, hi))
            cell = (-1, slice(seg.lo, hi))
            mv[sl] = 1.0; sv[sl] = 1.0; ve[sl] = seg.vel_ext
        elif seg.edge == "S":
            sl = (0, slice(seg.lo, hi))
            cell = (0, slice(seg.lo, hi))
            mv[sl] = 1.0; sv[sl] = -1.0; ve[sl] = seg.vel_ext
        else:
            raise ValueError(f"bad OBC edge {seg.edge}")
        mc[cell] = 1.0
        eta[cell] = seg.eta_ext
        itau[cell] = 1.0 / max(seg.nudge_timescale, 1e-6)
        if seg.T_ext is not None:
            te[cell] = seg.T_ext; any_ts = True
        if seg.S_ext is not None:
            se[cell] = seg.S_ext

    J = lambda a: jnp.asarray(a, dtype)
    return OBCParams(mask_u=J(mu), mask_v=J(mv), sign_u=J(su), sign_v=J(sv),
                     eta_ext=J(eta), uvel_ext=J(ue), vvel_ext=J(ve),
                     mask_cell=J(mc),
                     T_ext=J(te) if any_ts else None,
                     S_ext=J(se) if any_ts else None,
                     inv_tau=J(itau))


def apply_obc(state, obc: OBCParams, G, GV, dt):
    """Apply Flather radiation + tracer nudging after a dynamics step."""
    h = state.h
    eta = jnp.sum(h, axis=0) - G.bathyT
    d = jnp.maximum(G.bathyT, 1.0)
    c_fac = jnp.sqrt(GV.g_earth / d)
    # Flather normal velocity at boundary cells, applied to every layer of
    # the corresponding face; sign: outward-positive radiation
    u_fl = obc.uvel_ext + obc.sign_u * c_fac * (eta - obc.eta_ext)
    v_fl = obc.vvel_ext + obc.sign_v * c_fac * (eta - obc.eta_ext)
    u = state.u * (1.0 - obc.mask_u)[None] + (obc.mask_u * u_fl)[None]
    v = state.v * (1.0 - obc.mask_v)[None] + (obc.mask_v * v_fl)[None]

    # the outermost cell row is the exterior reservoir: clamp its surface
    # height to the exterior value (the open boundary is non-conservative
    # by construction — volume leaves the domain here)
    col = jnp.maximum(jnp.sum(h, axis=0), 1e-10)
    col_ext = jnp.maximum(d + obc.eta_ext, 1e-3)
    scale = jnp.where(obc.mask_cell > 0.5, col_ext / col, 1.0)
    h_new = h * scale[None]

    out = state.replace(h=h_new, u=u * G.mask2dCu, v=v * G.mask2dCv)

    # tracer nudging on the boundary strip (reservoir role)
    if obc.T_ext is not None and state.T is not None:
        w = (dt * obc.inv_tau * obc.mask_cell)[None]
        denom = 1.0 / (1.0 + w)
        out = out.replace(
            T=(out.T + w * obc.T_ext[None]) * denom,
            S=(out.S + w * obc.S_ext[None]) * denom
            if state.S is not None else out.S)
    return out
