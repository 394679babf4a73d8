"""Layered-mode interface regularization + mixing energy diagnostics.

* ``regularize_layers`` — role of MOM_regularize_layers.F90 (:60
  regularize_layers / regularize_surface): in layered mode the near-
  surface interfaces can become excessively jagged (one column's mixed
  layer much deeper than its neighbours'), which the pressure-force and
  continuity discretizations handle badly.  Where an interior interface
  deviates from the mean of its 4 neighbours by more than
  ``dev_frac`` of the local column depth, it is relaxed toward that
  mean, moving mass conservatively between the two bounding layers with
  donor tracer properties.

* ``diapyc_energy_req`` — role of MOM_diapyc_energy_req.F90: the rate
  of potential-energy increase implied by a diapycnal diffusivity
  profile, dPE/dt = integral( rho0 Kd N^2 ) dz [W m-2], the standard
  energetic bookkeeping for mixing schemes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["regularize_layers", "diapyc_energy_req"]

_H_EPS = 1e-3


def regularize_layers(h, T, S, G, *, dev_frac: float = 0.25,
                      rate: float = 0.5):
    """Relax excessively jagged interior interfaces toward their
    neighbour mean.  Returns (h_new, T_new, S_new); column sums, heat
    and salt are conserved exactly."""
    col = jnp.maximum(jnp.sum(h, axis=0), _H_EPS)
    z = jnp.cumsum(h, axis=0)[:-1]                 # interior interfaces
    zbar = 0.25 * (ip1(z) + im1(z) + jp1(z) + jm1(z))
    nmask = (ip1(G.mask2dT) * im1(G.mask2dT)
             * jp1(G.mask2dT) * jm1(G.mask2dT) * G.mask2dT)[None]
    dev = (z - zbar) * nmask
    thresh = dev_frac * col[None]
    excess = jnp.sign(dev) * jnp.maximum(jnp.abs(dev) - thresh, 0.0)
    dz = -rate * excess                            # interface displacement
    # positivity: an interface may not move past its neighbours
    dz = jnp.clip(dz, -0.9 * h[:-1], 0.9 * h[1:])

    # moving interface K down by dz>0 transfers dz of the LOWER layer's
    # water into the upper layer (and vice versa): donor properties
    up_gain = jnp.maximum(dz, 0.0)                 # from layer k+1 -> k
    dn_gain = jnp.maximum(-dz, 0.0)                # from layer k -> k+1
    zeros = jnp.zeros_like(h[:1])
    dh = (jnp.concatenate([up_gain, zeros], 0)
          - jnp.concatenate([dn_gain, zeros], 0)
          + jnp.concatenate([zeros, dn_gain], 0)
          - jnp.concatenate([zeros, up_gain], 0))
    h_new = h + dh

    def move(tr):
        htr = h * tr
        gain = (jnp.concatenate([up_gain * tr[1:], zeros], 0)
                + jnp.concatenate([zeros, dn_gain * tr[:-1]], 0))
        give = (jnp.concatenate([zeros, up_gain * tr[1:]], 0)
                + jnp.concatenate([dn_gain * tr[:-1], zeros], 0))
        return (htr + gain - give) / jnp.maximum(h_new, _H_EPS)

    T_new = move(T) if T is not None else None
    S_new = move(S) if S is not None else None
    m = G.mask2dT[None]
    h_new = jnp.where(m > 0.5, h_new, h)
    if T is not None:
        T_new = jnp.where(m > 0.5, T_new, T)
    if S is not None:
        S_new = jnp.where(m > 0.5, S_new, S)
    return h_new, T_new, S_new


def diapyc_energy_req(h, T, S, kd_int, G, GV, eos):
    """Column rate of PE increase from a diapycnal diffusivity profile
    [W m-2]: integral over interfaces of rho0 * Kd * N^2 * dz_int."""
    from mom6_tpu.physics.vertical.set_diffusivity import find_n2
    n2 = find_n2(h, T, S, G, GV, eos)              # (nz-1, ny, nx)
    dz_int = 0.5 * (h[:-1] + h[1:])
    return jnp.sum(GV.rho0 * kd_int[1:-1] * n2 * dz_int,
                   axis=0) * G.mask2dT
