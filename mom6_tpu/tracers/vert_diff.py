"""Implicit vertical tracer diffusion (the diabatic column solve).

Analogue of MOM6's tracer_vertdiff (reference:
src/tracer/MOM_tracer_diabatic.F90:643 — tracer_vertdiff_Eulerian): a
backward-Euler vertical diffusion of tracers with interface diffusivities
Kd, optional surface flux into the top layer, as one batched tridiagonal
solve (tracer axis batched)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mom6_tpu.framework.solvers import tridiag_solve

__all__ = ["tracer_vertdiff"]

_H_EPS = 1e-3  # conditioning floor, see physics/vertical/vert_friction.py


def tracer_vertdiff(T, h, kd_int, dt, *, sfc_flux: Optional[jnp.ndarray] = None):
    """``T``: (n_tr, nz, ny, nx); ``h``: (nz, ny, nx);
    ``kd_int``: interface diffusivities (nz+1, ny, nx) [m2 s-1], or
    per-tracer (n_tr, nz+1, ny, nx) (double-diffusion gives T and S
    different diffusivities, CVMix_ddiff role)
    (kd_int[0] and kd_int[nz] are the surface/bottom, fluxes there are 0);
    ``sfc_flux``: (n_tr, ny, nx) tracer flux into the top layer
    [conc * m / s]."""
    per_tracer = kd_int.ndim == 4
    dz_int = 0.5 * (h[:-1] + h[1:])
    if per_tracer:
        a_int = kd_int[:, 1:-1] / jnp.maximum(dz_int, _H_EPS)[None]
    else:
        a_int = kd_int[1:-1] / jnp.maximum(dz_int, _H_EPS)  # (nz-1, ny, nx)
    # conditioning cap: the Thomas recursion in f32 loses the diagonal when
    # coupling/mass exceeds ~1e7 (massless layers + strong Kd), yielding
    # solutions OUTSIDE the input range.  1e4x the smaller neighboring
    # mass-rate still homogenizes a thin layer within one step (a*dt/h=1e4)
    # while keeping the solve exact to ~1e-3.
    hdt = jnp.maximum(h, _H_EPS) / dt
    a_cap = 1e4 * jnp.minimum(hdt[:-1], hdt[1:])
    a_int = jnp.minimum(a_int, a_cap)
    if per_tracer:
        # move the tracer axis to the batch position: (nz-1, n_tr, ny, nx)
        a_int = jnp.moveaxis(a_int, 0, 1)
        zeros = jnp.zeros_like(a_int[:1])
        hdt_b = hdt[:, None]
    else:
        zeros = jnp.zeros_like(h[:1])
        hdt_b = hdt
    a_above = jnp.concatenate([zeros, a_int], axis=0)
    a_below = jnp.concatenate([a_int, zeros], axis=0)

    b = hdt_b + a_above + a_below
    a = -a_above
    c = jnp.concatenate([-a_below[:-1], zeros], axis=0)

    rhs = hdt[None] * T
    if sfc_flux is not None:
        rhs = rhs.at[:, 0].add(sfc_flux)

    # solve along k with the tracer axis batched: (nz, n_tr, ny, nx)
    if not per_tracer:
        a, b, c = a[:, None], b[:, None], c[:, None]
    x = tridiag_solve(a, b, c, jnp.moveaxis(rhs, 0, 1))
    return jnp.moveaxis(x, 1, 0)
