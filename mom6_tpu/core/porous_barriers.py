"""Porous barriers: sub-grid sill representation via effective face widths.

Analogue of MOM6's MOM_porous_barriers.F90:503 (porous_widths_layer):
at faces carrying a sub-grid obstruction profile (min/avg/max sill depth),
the fractional open width of each layer's face is the fraction of the
layer's depth range lying above the sill, from a piecewise-linear
topography distribution.  Output multiplies face widths in continuity
(the por_face_areaU of the reference)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import ip1, jp1

__all__ = ["PorousBarrier", "porous_face_areas"]


class PorousBarrier(NamedTuple):
    # sill depths at faces, positive down; +inf (= very deep) where no sill
    d_min_u: jnp.ndarray     # (ny, nx) shallowest sill depth at u faces
    d_max_u: jnp.ndarray     # deepest
    d_min_v: jnp.ndarray
    d_max_v: jnp.ndarray


def _face_fraction(e_top, e_bot, d_min, d_max):
    """Fraction of the layer [e_bot, e_top] (heights, up-positive) open,
    given a linear distribution of sill crest between depths d_min..d_max."""
    z_min = -d_min                       # highest crest (height)
    z_max = -d_max                       # lowest crest
    # open fraction at height z: 0 below z_max impossible... fraction of the
    # face width open at height z = clip((z - z_max)/(z_min - z_max), 0, 1)
    span = jnp.maximum(z_min - z_max, 1e-10)

    def frac_int(z):
        # integral of the open fraction from z_max up to z
        x = jnp.clip((z - z_max) / span, 0.0, 1.0)
        return 0.5 * span * x * x + jnp.maximum(z - z_min, 0.0)

    thick = jnp.maximum(e_top - e_bot, 1e-10)
    return jnp.clip((frac_int(e_top) - frac_int(e_bot)) / thick, 0.0, 1.0)


def porous_face_areas(h, G, pb: PorousBarrier):
    """(por_u, por_v): per-layer fractional open areas at faces (nz,ny,nx)."""
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e = jnp.concatenate([csum_below, jnp.zeros_like(h[:1])], axis=0) \
        - G.bathyT[None]
    e_t, e_b = e[:-1], e[1:]
    # interface heights at faces: mean of the two columns
    et_u = 0.5 * (e_t + ip1(e_t)); eb_u = 0.5 * (e_b + ip1(e_b))
    et_v = 0.5 * (e_t + jp1(e_t)); eb_v = 0.5 * (e_b + jp1(e_b))
    por_u = _face_fraction(et_u, eb_u, pb.d_min_u[None], pb.d_max_u[None])
    por_v = _face_fraction(et_v, eb_v, pb.d_min_v[None], pb.d_max_v[None])
    return por_u * G.mask2dCu, por_v * G.mask2dCv