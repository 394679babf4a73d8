"""Bottom boundary layer thickness and viscosity.

Analogue of MOM6's set_viscous_BBL (reference:
src/parameterizations/vertical/MOM_set_viscosity.F90:847-1016): the
law-of-the-wall bottom boundary layer with rotational limiting —

  u*_b      = sqrt(cdrag) |u_bbl|
  bbl_thick = htot / (0.5 + sqrt(0.25 + htot^2 (2f)^2 / u*^2))
              (floored at BBL_THICK_MIN, capped at HBBL)
  kv_bbl    = sqrt(cdrag) u*_b bbl_thick * visc_frac
              (floored at KV_BBL_MIN)

with |u_bbl| the flow speed averaged over the bottom HBBL metres.  The
whole plane solves at once: the near-bottom average uses fractional
overlap weights from reversed cumulative sums (no column loops), and
the outputs feed vert_friction's bottom coupling."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["SetViscParams", "set_viscous_bbl"]

_H_EPS = 1e-3


class SetViscParams(NamedTuple):
    cdrag: float = 0.003          # quadratic drag coefficient (CDRAG)
    hbbl: float = 10.0            # nominal BBL averaging depth [m] (HBBL)
    bbl_thick_min: float = 0.1    # [m] (BBL_THICK_MIN)
    kv_bbl_min: float = 1e-4      # [m2 s-1] (KV_BBL_MIN)
    visc_frac: float = 1.0        # BBL_visc_frac of the reference
    drag_bg_vel: float = 0.0      # background |u| for the drag law [m s-1]


def _bottom_avg(w, h, hbbl):
    """Thickness-weighted average of ``w`` over the bottom hbbl metres."""
    z_top_fb = jnp.cumsum(h[::-1], axis=0)[::-1]
    z_bot_fb = z_top_fb - h
    ov = (jnp.minimum(z_top_fb, hbbl) - jnp.minimum(z_bot_fb, hbbl))
    wsum = jnp.maximum(jnp.sum(ov, axis=0), _H_EPS)
    return jnp.sum(w * ov, axis=0) / wsum


def set_viscous_bbl(u, v, h, G, p: SetViscParams):
    """Returns (kv_bbl_u, kv_bbl_v, bbl_thick_u, bbl_thick_v): BBL
    viscosity [m2 s-1] and thickness [m] at u and v faces."""
    h_u = 0.5 * (h + ip1(h))
    fold = getattr(G, "fold_north", False)
    h_v = 0.5 * (h + jp1(h, "h" if fold else None))
    # speed at faces: own component + interpolated transverse component
    v_at_u = 0.25 * (v + jm1(v) + ip1(v) + ip1(jm1(v)))
    ju = jp1(u, "u" if fold else None)
    u_at_v = 0.25 * (u + im1(u) + ju + im1(ju))
    sp_u = jnp.sqrt(u * u + v_at_u * v_at_u)
    sp_v = jnp.sqrt(v * v + u_at_v * u_at_v)

    f2q = jnp.abs(G.CoriolisBu)
    f_u = 0.5 * (f2q + jm1(f2q))            # |f| at u faces
    f_v = 0.5 * (f2q + im1(f2q))

    cds = p.cdrag ** 0.5

    def one(face_h, speed, f_face, mask):
        ubbl = _bottom_avg(speed, face_h, p.hbbl) + p.drag_bg_vel
        ustar = cds * ubbl
        htot = jnp.minimum(jnp.sum(face_h, axis=0), p.hbbl)
        c2f = 2.0 * f_face
        rat = htot * htot * c2f * c2f / jnp.maximum(ustar * ustar, 1e-30)
        thick = htot / (0.5 + jnp.sqrt(0.25 + rat))
        thick = jnp.clip(thick, p.bbl_thick_min, p.hbbl)
        kv = jnp.maximum(cds * ustar * thick * p.visc_frac, p.kv_bbl_min)
        return kv * mask, thick * mask

    kv_u, th_u = one(h_u, sp_u, f_u, G.mask2dCu)
    kv_v, th_v = one(h_v, sp_v, f_v, G.mask2dCv)
    return kv_u, kv_v, th_u, th_v
