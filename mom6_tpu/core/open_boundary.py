"""Open boundary conditions.

TPU-native re-design of MOM6's segment OBC system (reference:
src/core/MOM_open_boundary.F90:41-60, 490: OBC_SEGMENT_xxx strings;
radiation_open_bdry_conds :2486-2545 for the Orlanski/oblique update,
Flather, gradient, nudging, tracer reservoirs).

Design: a segment is an edge strip (N/S/E/W plus an index range) carrying
exterior data (eta, normal velocity, T, S).  Instead of the reference's
per-segment pointer lists, each segment compiles to dense (ny, nx) masks
and data arrays once at init; application is branchless masked arithmetic:

* FLATHER radiation on the barotropic normal flow:
    u_b = u_ext +- sqrt(g/D) (eta - eta_ext)
  applied to every layer's boundary face (radiates the external mode);
* ORLANSKI baroclinic radiation: the outward phase speed is diagnosed
  from interior differences, rx = clip(dhdt/dhdx), and the boundary
  value follows  u_B <- (u_B + rx u_{B-1}) / (1 + rx)
  (reference :2486-2499, with OBC_RAD_VEL_WT = 1 so no rx memory);
* OBLIQUE radiation: adds the upwinded tangential phase speed ry with
  the cff = dhdx^2 + dhdy^2 normalization (reference :2506-2534);
* GRADIENT: zero-gradient extrapolation u_B <- u_{B-1};
* optional relaxation (nudging) of tracers toward exterior values on the
  boundary strip with a specified timescale.

All radiation schemes need the PREVIOUS step's velocities for dhdt: pass
``u_old``/``v_old`` to ``apply_obc`` (rx falls back to 0 — a clamped
boundary — when they are omitted).

Round 1 geometry: OBC operates on the last interior face (the wall face
stays masked; the update writes the layer velocities at the face just
inside, equivalent for a one-cell open boundary strip).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["OBCSegment", "OBCParams", "OBCData", "build_obc",
           "apply_obc", "merge_obc_data", "segment_slices",
           "update_tracer_reservoirs"]

FLATHER = "FLATHER"
ORLANSKI = "ORLANSKI"
OBLIQUE = "OBLIQUE"
GRADIENT = "GRADIENT"
SPECIFIED = "SPECIFIED"


class OBCSegment(NamedTuple):
    edge: str                      # 'N' | 'S' | 'E' | 'W'
    lo: int = 0                    # start index along the edge
    hi: int = -1                   # end index (exclusive; -1 = to the end;
    #                                 partial-edge extents come from the
    #                                 reference's I=a:b / J=a:b strings)
    eta_ext: float = 0.0           # exterior sea surface height [m]
    vel_ext: float = 0.0           # exterior normal velocity [m s-1]
    T_ext: Optional[float] = None
    S_ext: Optional[float] = None
    nudge_timescale: float = 3600.0
    # one scheme, or several joined with '+' (the reference's comma lists,
    # e.g. "FLATHER,ORLANSKI" = Flather on the barotropic normal flow AND
    # Orlanski radiation of the baroclinic part, MOM_open_boundary.F90:490)
    scheme: str = FLATHER   # FLATHER | ORLANSKI | OBLIQUE | GRADIENT |
    #                         SPECIFIED (clamped per-layer inflow, the
    #                         reference's OBC_SIMPLE segments — DOME)
    # SPECIFIED per-layer data: normal velocity (nz, seg_len) and
    # optional tracer profiles (nz,) or (nz, seg_len), host arrays
    vel_profile: Optional[object] = None
    T_profile: Optional[object] = None
    S_profile: Optional[object] = None


class OBCParams(NamedTuple):
    # dense compiled masks/data (built by build_obc)
    mask_u: jnp.ndarray            # (ny, nx) 1 on zonal FLATHER faces
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
    # radiation-scheme faces (Orlanski / oblique / gradient); the sign
    # arrays double as the interior-direction selectors
    mask_u_rad: Optional[jnp.ndarray] = None
    mask_v_rad: Optional[jnp.ndarray] = None
    mask_u_obl: Optional[jnp.ndarray] = None
    mask_v_obl: Optional[jnp.ndarray] = None
    mask_u_grad: Optional[jnp.ndarray] = None
    mask_v_grad: Optional[jnp.ndarray] = None
    rx_max: float = 1.0            # CFL cap on the diagnosed phase speed
    # per-tracer segment reservoirs (MOM_open_boundary.F90
    # update_segment_tracer_reservoirs): inflow/outflow length scales;
    # 0 disables (boundary tracers then use the specified T_ext/S_ext)
    res_len_in: float = 0.0
    res_len_out: float = 0.0
    # SPECIFIED (clamped per-layer inflow) faces: masks + (nz, ny, nx)
    # velocity profiles (OBC_SIMPLE, the DOME embayment inflow)
    mask_u_spec: Optional[jnp.ndarray] = None
    mask_v_spec: Optional[jnp.ndarray] = None
    uvel_spec: Optional[jnp.ndarray] = None
    vvel_spec: Optional[jnp.ndarray] = None


def segment_slices(edge: str, lo: int, hi: int, ny: int, nx: int):
    """(face_slice, cell_slice) of a boundary segment in the dense
    (ny, nx) arrays.  The face slice addresses the last INTERIOR u/v
    face; the cell slice the outermost (reservoir) cell strip."""
    hi = hi if hi >= 0 else (nx if edge in "NS" else ny)
    if edge == "E":
        return (slice(lo, hi), -2), (slice(lo, hi), -1)
    if edge == "W":
        return (slice(lo, hi), 0), (slice(lo, hi), 0)
    if edge == "N":
        return (-2, slice(lo, hi)), (-1, slice(lo, hi))
    if edge == "S":
        return (0, slice(lo, hi)), (0, slice(lo, hi))
    raise ValueError(f"bad OBC edge {edge}")


class OBCData(NamedTuple):
    """Time-dependent dense overrides of the OBC exterior data
    (update_OBC_segment_data, MOM_open_boundary.F90: file-driven
    segment SSH/velocity/tracers).  Built by the forcing provider each
    coupling interval and carried in Forcing so the jitted step sees it
    as a traced argument (no recompilation)."""
    eta_ext: Optional[jnp.ndarray] = None
    uvel_ext: Optional[jnp.ndarray] = None
    vvel_ext: Optional[jnp.ndarray] = None
    T_ext: Optional[jnp.ndarray] = None
    S_ext: Optional[jnp.ndarray] = None


def merge_obc_data(obc: "OBCParams", data: Optional[OBCData]
                   ) -> "OBCParams":
    if data is None:
        return obc
    rep = {}
    for f in ("eta_ext", "uvel_ext", "vvel_ext", "T_ext", "S_ext"):
        v = getattr(data, f)
        if v is not None:
            rep[f] = v
    return obc._replace(**rep)


def build_obc(segments: List[OBCSegment], ny: int, nx: int,
              dtype=jnp.float32, *, res_len_in: float = 0.0,
              res_len_out: float = 0.0, nz: int = 0) -> OBCParams:
    """Compile segment specs into dense masks (init-time, host-side).
    ``nz`` is required when any segment is SPECIFIED (per-layer
    profiles compile to dense (nz, ny, nx) arrays)."""
    mu = np.zeros((ny, nx)); mv = np.zeros((ny, nx))
    mur = np.zeros((ny, nx)); mvr = np.zeros((ny, nx))
    muo = np.zeros((ny, nx)); mvo = np.zeros((ny, nx))
    mug = np.zeros((ny, nx)); mvg = np.zeros((ny, nx))
    mus = np.zeros((ny, nx)); mvs = np.zeros((ny, nx))
    us3 = vs3 = None               # (nz, ny, nx) SPECIFIED profiles
    su = np.zeros((ny, nx)); sv = np.zeros((ny, nx))
    eta = np.zeros((ny, nx)); ue = np.zeros((ny, nx)); ve = np.zeros((ny, nx))
    mc = np.zeros((ny, nx))
    te = np.zeros((ny, nx)); se = np.zeros((ny, nx))
    prof_writes = []               # deferred 3-D tracer profile writes
    itau = np.zeros((ny, nx))
    any_ts = False
    pick_u = {FLATHER: mu, ORLANSKI: mur, OBLIQUE: muo, GRADIENT: mug,
              SPECIFIED: mus}
    pick_v = {FLATHER: mv, ORLANSKI: mvr, OBLIQUE: mvo, GRADIENT: mvg,
              SPECIFIED: mvs}
    for seg in segments:
        schemes = [s.strip().upper() for s in seg.scheme.split("+")
                   if s.strip()]
        for sch in schemes:
            if sch not in pick_u:
                raise ValueError(f"OBC scheme {sch!r}: expected one of "
                                 f"{sorted(pick_u)}")
        sl, cell = segment_slices(seg.edge, seg.lo, seg.hi, ny, nx)
        if SPECIFIED in schemes:
            if seg.vel_profile is None or nz <= 0:
                raise ValueError("SPECIFIED OBC segments need a "
                                 "vel_profile and build_obc(..., nz=nz)")
            prof = np.asarray(seg.vel_profile, np.float64)
            if prof.ndim == 1:
                prof = prof[:, None]
            prof = np.broadcast_to(prof, (nz, mu[sl].size))
            if seg.edge in ("E", "W"):
                if us3 is None:
                    us3 = np.zeros((nz, ny, nx))
                us3[(slice(None),) + sl] = prof
                ue[sl] = prof.mean(axis=0)    # barotropic clamp value
            else:
                if vs3 is None:
                    vs3 = np.zeros((nz, ny, nx))
                vs3[(slice(None),) + sl] = prof
                ve[sl] = prof.mean(axis=0)
        for sch in schemes:
            if seg.edge == "E":
                pick_u[sch][sl] = 1.0; su[sl] = 1.0
            elif seg.edge == "W":
                pick_u[sch][sl] = 1.0; su[sl] = -1.0
            else:
                pick_v[sch][sl] = 1.0
                sv[sl] = 1.0 if seg.edge == "N" else -1.0
            if sch != SPECIFIED:
                if seg.edge in ("E", "W"):
                    ue[sl] = seg.vel_ext
                else:
                    ve[sl] = seg.vel_ext
        mc[cell] = 1.0
        eta[cell] = seg.eta_ext
        itau[cell] = 1.0 / max(seg.nudge_timescale, 1e-6)
        if seg.T_ext is not None:
            te[cell] = seg.T_ext; any_ts = True
        if seg.S_ext is not None:
            se[cell] = seg.S_ext
        if seg.T_profile is not None or seg.S_profile is not None:
            any_ts = True
            prof_writes.append((cell, seg.T_profile, seg.S_profile))

    # promote tracer data to (nz, ny, nx) only when a profile was given
    if prof_writes:
        if nz <= 0:
            raise ValueError("tracer profiles need build_obc(..., nz=nz)")
        te3 = np.broadcast_to(te, (nz, ny, nx)).copy()
        se3 = np.broadcast_to(se, (nz, ny, nx)).copy()
        for cell, tp, sp in prof_writes:
            if tp is not None:
                te3[(slice(None),) + cell] = np.broadcast_to(
                    np.asarray(tp, np.float64).reshape(nz, -1),
                    (nz, te[cell].size))
            if sp is not None:
                se3[(slice(None),) + cell] = np.broadcast_to(
                    np.asarray(sp, np.float64).reshape(nz, -1),
                    (nz, se[cell].size))
        te, se = te3, se3

    J = lambda a: jnp.asarray(a, dtype)
    opt = lambda a: J(a) if a.any() else None
    return OBCParams(mask_u=J(mu), mask_v=J(mv), sign_u=J(su), sign_v=J(sv),
                     eta_ext=J(eta), uvel_ext=J(ue), vvel_ext=J(ve),
                     mask_cell=J(mc),
                     T_ext=J(te) if any_ts else None,
                     S_ext=J(se) if any_ts else None,
                     inv_tau=J(itau),
                     mask_u_rad=opt(mur), mask_v_rad=opt(mvr),
                     mask_u_obl=opt(muo), mask_v_obl=opt(mvo),
                     mask_u_grad=opt(mug), mask_v_grad=opt(mvg),
                     res_len_in=res_len_in, res_len_out=res_len_out,
                     mask_u_spec=opt(mus), mask_v_spec=opt(mvs),
                     uvel_spec=None if us3 is None else J(us3),
                     vvel_spec=None if vs3 is None else J(vs3))


def _radiate_normal(w, w_old, sign, mask_rad, mask_obl, mask_grad,
                    shift_in_pos, shift_in_neg, tshift_m, tshift_p,
                    rx_max):
    """Orlanski / oblique / gradient update of the normal velocity on the
    compiled radiation faces (vectorized form of
    MOM_open_boundary.F90:2486-2545).  ``shift_in_pos`` steps one cell
    toward the interior on sign>0 edges (E/N), ``shift_in_neg`` on
    sign<0 edges; ``tshift_m/p`` are the tangential shifts."""
    s3 = sign[None]
    nb1 = jnp.where(s3 > 0, shift_in_pos(w), shift_in_neg(w))
    nb2 = jnp.where(s3 > 0, shift_in_pos(shift_in_pos(w)),
                    shift_in_neg(shift_in_neg(w)))
    if w_old is None:
        dhdt = jnp.zeros_like(w)
    else:
        nb1_old = jnp.where(s3 > 0, shift_in_pos(w_old),
                            shift_in_neg(w_old))
        dhdt = nb1_old - nb1                     # old - new (ref :2486)
    dhdx = nb1 - nb2
    out = w
    if mask_rad is not None:
        ratio = dhdt * dhdx / (dhdx * dhdx + 1e-20)
        rx = jnp.clip(jnp.where(dhdt * dhdx > 0.0, ratio, 0.0),
                      0.0, rx_max)
        w_rad = (w + rx * nb1) / (1.0 + rx)
        out = out * (1.0 - mask_rad)[None] + (mask_rad[None] * w_rad)
    if mask_obl is not None:
        gj_m = nb1 - tshift_m(nb1)
        gj_p = tshift_p(nb1) - nb1
        ssel = dhdt * (gj_m + gj_p)
        dhdy = jnp.where(ssel > 0.0, gj_m,
                         jnp.where(ssel < 0.0, gj_p, 0.0))
        dhdt0 = jnp.where(dhdt * dhdx < 0.0, 0.0, dhdt)
        cff = jnp.maximum(dhdx * dhdx + dhdy * dhdy, 1e-20)
        rx = jnp.minimum(dhdt0 * dhdx, cff * rx_max)
        ry = jnp.clip(dhdt0 * dhdy, -cff, cff)
        bj_m = w - tshift_m(w)
        bj_p = tshift_p(w) - w
        w_obl = (cff * w + rx * nb1
                 - (jnp.maximum(ry, 0.0) * bj_m
                    + jnp.minimum(ry, 0.0) * bj_p)) / (cff + rx)
        out = out * (1.0 - mask_obl)[None] + (mask_obl[None] * w_obl)
    if mask_grad is not None:
        out = out * (1.0 - mask_grad)[None] + (mask_grad[None] * nb1)
    return out


def apply_obc(state, obc: OBCParams, G, GV, dt, u_old=None, v_old=None):
    """Apply radiation (Flather / Orlanski / oblique / gradient) + tracer
    nudging after a dynamics step.  ``u_old``/``v_old`` are the previous
    step's velocities, needed to diagnose the outward phase speed for the
    Orlanski and oblique schemes (omitting them clamps those faces)."""
    h = state.h
    eta = jnp.sum(h, axis=0) - G.bathyT
    d = jnp.maximum(G.bathyT, 1.0)
    c_fac = jnp.sqrt(GV.g_earth / d)
    # Flather normal velocity at boundary cells, applied to every layer of
    # the corresponding face; sign: outward-positive radiation.  eta is
    # taken on the INTERIOR side of each face: the face index itself on
    # E/N edges (sign>0), one cell inward on W/S edges (where the face
    # index coincides with the exterior-strip cell).
    eta_u = jnp.where(obc.sign_u >= 0.0, eta, ip1(eta))
    eta_v = jnp.where(obc.sign_v >= 0.0, eta, jp1(eta))
    u_fl = obc.uvel_ext + obc.sign_u * c_fac * (eta_u - obc.eta_ext)
    v_fl = obc.vvel_ext + obc.sign_v * c_fac * (eta_v - obc.eta_ext)

    m_u_bc = sum((m for m in (obc.mask_u_rad, obc.mask_u_obl,
                              obc.mask_u_grad) if m is not None),
                 jnp.zeros_like(obc.mask_u))
    m_v_bc = sum((m for m in (obc.mask_v_rad, obc.mask_v_obl,
                              obc.mask_v_grad) if m is not None),
                 jnp.zeros_like(obc.mask_v))
    m_u_both = jnp.clip(obc.mask_u * m_u_bc, 0.0, 1.0)
    m_v_both = jnp.clip(obc.mask_v * m_v_bc, 0.0, 1.0)

    # baroclinic radiation schemes on their compiled faces (run on the
    # pre-Flather velocities so the layer structure is what radiates)
    u = state.u
    v = state.v
    if (obc.mask_u_rad is not None or obc.mask_u_obl is not None
            or obc.mask_u_grad is not None):
        u = _radiate_normal(u, u_old, obc.sign_u, obc.mask_u_rad,
                            obc.mask_u_obl, obc.mask_u_grad,
                            im1, ip1, jm1, jp1, obc.rx_max)
    if (obc.mask_v_rad is not None or obc.mask_v_obl is not None
            or obc.mask_v_grad is not None):
        v = _radiate_normal(v, v_old, obc.sign_v, obc.mask_v_rad,
                            obc.mask_v_obl, obc.mask_v_grad,
                            jm1, jp1, im1, ip1, obc.rx_max)

    # Flather on the barotropic normal flow.  Faces with ONLY Flather set
    # every layer to the barotropic value (a one-scheme segment); faces
    # with Flather AND a baroclinic scheme (the reference's
    # "FLATHER,ORLANSKI" lists) keep the radiated layer structure but pin
    # its thickness-weighted depth mean to the Flather value — Flather
    # acts on ubt in btstep while radiation owns the layer anomalies
    # (MOM_barotropic.F90 apply_velocity_OBCs + radiation_open_bdry_conds).
    h_u = jnp.where(obc.sign_u >= 0.0, h, ip1(h))
    h_v = jnp.where(obc.sign_v >= 0.0, h, jp1(h))
    ubar = jnp.sum(h_u * u, axis=0) / jnp.maximum(jnp.sum(h_u, axis=0),
                                                  1e-10)
    vbar = jnp.sum(h_v * v, axis=0) / jnp.maximum(jnp.sum(h_v, axis=0),
                                                  1e-10)
    m_u_only = obc.mask_u * (1.0 - m_u_both)
    m_v_only = obc.mask_v * (1.0 - m_v_both)
    u = (u * (1.0 - m_u_only)[None] + (m_u_only * u_fl)[None]
         + (m_u_both * (u_fl - ubar))[None])
    v = (v * (1.0 - m_v_only)[None] + (m_v_only * v_fl)[None]
         + (m_v_both * (v_fl - vbar))[None])

    # SPECIFIED faces: clamp every layer to the given inflow profile
    # (the reference's OBC_SIMPLE / DOME segments)
    if obc.mask_u_spec is not None:
        u = u * (1.0 - obc.mask_u_spec)[None] \
            + obc.mask_u_spec[None] * obc.uvel_spec
    if obc.mask_v_spec is not None:
        v = v * (1.0 - obc.mask_v_spec)[None] \
            + obc.mask_v_spec[None] * obc.vvel_spec

    # the outermost cell row is the exterior reservoir: clamp its surface
    # height to the exterior value (the open boundary is non-conservative
    # by construction — volume leaves the domain here)
    col = jnp.maximum(jnp.sum(h, axis=0), 1e-10)
    col_ext = jnp.maximum(d + obc.eta_ext, 1e-3)
    scale = jnp.where(obc.mask_cell > 0.5, col_ext / col, 1.0)
    h_new = h * scale[None]

    out = state.replace(h=h_new, u=u * G.mask2dCu, v=v * G.mask2dCv)

    # tracer nudging on the boundary strip (reservoir role); T_ext/S_ext
    # are 2-D (uniform in k) or 3-D (per-layer SPECIFIED profiles)
    if obc.T_ext is not None and state.T is not None:
        w = (dt * obc.inv_tau * obc.mask_cell)[None]
        denom = 1.0 / (1.0 + w)
        t_ext = obc.T_ext if obc.T_ext.ndim == 3 else obc.T_ext[None]
        s_ext = obc.S_ext if obc.S_ext.ndim == 3 else obc.S_ext[None]
        out = out.replace(
            T=(out.T + w * t_ext) * denom,
            S=(out.S + w * s_ext) * denom
            if state.S is not None else out.S)
    return out


def update_tracer_reservoirs(state, obc: OBCParams, G, dt):
    """Advance the per-cell segment tracer reservoirs and write them
    into the boundary strip (the reference's
    update_segment_tracer_reservoirs, MOM_open_boundary.F90:41-60):

        res <- (res + a * T_adjacent) / (1 + a),
        a = |u_n| dt / L,   L = L_in for inflow, L_out for outflow,

    i.e. the reservoir relaxes toward the adjacent interior tracer at a
    rate set by the normal flow, with separate memory lengths for water
    entering and leaving.  The boundary strip carries the reservoir
    value (the upstream tracer inflowing advection sees).  Returns the
    updated state (obc_res_T / obc_res_S fields + strip T/S)."""
    if state.T is None or obc.res_len_in <= 0.0:
        return state
    res_T = state.obc_res_T if state.obc_res_T is not None else state.T
    res_S = state.obc_res_S if state.obc_res_S is not None else state.S

    col = jnp.maximum(jnp.sum(state.h, axis=0), 1e-10)
    ubar = jnp.sum(state.h * state.u, axis=0) / col
    vbar = jnp.sum(state.h * state.v, axis=0) / col
    # per-edge masks ON THE CELL STRIP (E/N faces sit one index inward
    # of their strip cells; W/S faces coincide with them)
    m_e = im1(jnp.where(obc.sign_u > 0.5, obc.mask_u, 0.0))
    m_w = jnp.where(obc.sign_u < -0.5, obc.mask_u, 0.0)
    m_n = jm1(jnp.where(obc.sign_v > 0.5, obc.mask_v, 0.0))
    m_s = jnp.where(obc.sign_v < -0.5, obc.mask_v, 0.0)
    msum = m_e + m_w + m_n + m_s
    on_strip = jnp.clip(msum, 0.0, 1.0)
    inv = 1.0 / jnp.maximum(msum, 1.0)
    # outward-positive depth-mean normal flow at the strip cells
    u_norm = (m_e * im1(ubar) - m_w * ubar
              + m_n * jm1(vbar) - m_s * vbar) * inv

    L = jnp.where(u_norm >= 0.0, obc.res_len_out, obc.res_len_in)
    a = jnp.abs(u_norm) * dt / jnp.maximum(L, 1e-3)

    def adjacent(f):
        adj = (m_e[None] * im1(f) + m_w[None] * ip1(f)
               + m_n[None] * jm1(f) + m_s[None] * jp1(f)) * inv[None]
        return jnp.where(on_strip[None] > 0.5, adj, f)

    w = (a * on_strip)[None]
    res_T = (res_T + w * adjacent(state.T)) / (1.0 + w)
    res_S = (res_S + w * adjacent(state.S)) / (1.0 + w)
    T_new = jnp.where(on_strip[None] > 0.5, res_T, state.T)
    S_new = jnp.where(on_strip[None] > 0.5, res_S, state.S)
    return state.replace(T=T_new, S=S_new, obc_res_T=res_T,
                         obc_res_S=res_S)
