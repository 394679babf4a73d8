"""Branchless C-grid stencil operators.

Grid convention (fixed throughout mom6_tpu):

* arrays have shape ``(..., ny, nx)``; axis -1 is x (index i), axis -2 is y (j);
* ``h``-points are cell centers ``(j, i)``;
* ``u``-points sit on the EAST face of cell ``(j, i)`` (i.e. at ``x_{i+1/2}``);
* ``v``-points sit on the NORTH face of cell ``(j, i)`` (at ``y_{j+1/2}``);
* ``q``-points (vorticity) sit on the NORTHEAST corner of cell ``(j, i)``.

This is the MOM6 "non-symmetric" staggering (reference:
src/framework/MOM_memory_macros.h and src/core/MOM_grid.F90:30-140) with the
halo machinery deleted: every shift is a circular roll and solid walls are
enforced by multiplying with face masks.  On a sharded axis XLA lowers
``jnp.roll``/shift-by-one to a ``CollectivePermute`` over ICI, which *is* the
halo exchange — there is no separate halo bookkeeping anywhere in the model.

Reference parity: pass_var/pass_vector of MOM_domains.F90:33-61 become no-ops
(GSPMD), directional/corner-omitting variants are unnecessary, and the
tripolar fold will be handled by the grid generator when global grids land.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "ip1", "im1", "jp1", "jm1",
    "delta_i", "delta_j", "mean_i", "mean_j",
    "h_to_u", "h_to_v", "u_to_h", "v_to_h",
    "u_to_q", "v_to_q", "q_to_u", "q_to_v",
    "h_to_q", "q_to_h",
]

_X = -1  # i axis
_Y = -2  # j axis


def ip1(a):
    """Value at (j, i+1): circular shift west by one."""
    return jnp.roll(a, -1, axis=_X)


def im1(a):
    """Value at (j, i-1)."""
    return jnp.roll(a, 1, axis=_X)


def jp1(a):
    """Value at (j+1, i)."""
    return jnp.roll(a, -1, axis=_Y)


def jm1(a):
    """Value at (j-1, i)."""
    return jnp.roll(a, 1, axis=_Y)


# -- first differences -------------------------------------------------------

def delta_i(a):
    """a(i+1) - a(i): center field -> u-point gradient numerator,
    or u-point flux -> divergence contribution at center i+1 ... use with care:
    for flux divergence at centers use ``a - im1(a)`` (see div_h)."""
    return ip1(a) - a


def delta_j(a):
    """a(j+1) - a(j)."""
    return jp1(a) - a


# -- two-point means between staggered locations ------------------------------

def mean_i(a):
    """0.5*(a(i) + a(i+1))."""
    return 0.5 * (a + ip1(a))


def mean_j(a):
    """0.5*(a(j) + a(j+1))."""
    return 0.5 * (a + jp1(a))


def h_to_u(a):
    """Center -> east-face (u-point) arithmetic mean."""
    return 0.5 * (a + ip1(a))


def h_to_v(a):
    """Center -> north-face (v-point) arithmetic mean."""
    return 0.5 * (a + jp1(a))


def u_to_h(a):
    """u-point -> center mean: faces at i-1/2 and i+1/2 of cell i are
    u[i-1] and u[i]."""
    return 0.5 * (a + im1(a))


def v_to_h(a):
    return 0.5 * (a + jm1(a))


def u_to_q(a):
    """u-point (east face) -> NE corner mean (average in j)."""
    return 0.5 * (a + jp1(a))


def v_to_q(a):
    """v-point (north face) -> NE corner mean (average in i)."""
    return 0.5 * (a + ip1(a))


def q_to_u(a):
    """Corner -> east face (average corners at j-1/2 and j+1/2)."""
    return 0.5 * (a + jm1(a))


def q_to_v(a):
    return 0.5 * (a + im1(a))


def h_to_q(a):
    """Center -> corner 4-point mean."""
    return 0.25 * ((a + ip1(a)) + (jp1(a) + ip1(jp1(a))))


def q_to_h(a):
    return 0.25 * ((a + im1(a)) + (jm1(a) + im1(jm1(a))))
