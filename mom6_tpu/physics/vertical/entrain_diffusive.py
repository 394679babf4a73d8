"""Diapycnal mixing as inter-layer entrainment (layered/isopycnal mode).

Analogue of MOM6's MOM_entrain_diffusive.F90 (calculate_entrainment;
physics per Hallberg MWR 2000 and the MacDougall & Dewar 1997 dual-stream
scheme — see the module namespace doc at the end of the reference file):
in isopycnal coordinates a diapycnal diffusivity Kd does not diffuse
tracers across fixed interfaces — it moves MASS between density layers.
Layer k entrains ea_k from the layer above and eb_k from the layer below:

  dh_k = (ea_k + eb_k) - (ea_{k+1} + eb_{k-1})

"The entrainment rates are proportional to the buoyancy flux in a layer
and inversely proportional to the density differences between layers":

  ea_k = Kd_k dt (dRup + dRdn) / (2 h_k dRup)
  eb_k = Kd_k dt (dRup + dRdn) / (2 h_k dRdn)

with dRup = R_k - R_{k-1}, dRdn = R_{k+1} - R_k (coordinate targets).
This pair satisfies the density-target constraint
ea_k dRup = eb_k dRdn identically, so interior layers hold their target
density.  The topmost (mixed/buffer) and bottom layers are Eulerian:
they do not entrain, their thickness changes only because interior
layers entrain from them (reference doc: "If there is a bulk mixed
layer, the mixed and buffer layers are treated as Eulerian layers").

The reference iterates a per-column implicit solve to enforce
positivity; here each transfer is clipped so a donor never loses more
than ``max_frac`` of its mass per step (one transfer = one donor ->
one receiver, so clipping conserves mass exactly).  T/S ride the
entrained mass with donor properties — heat/salt conserved exactly
(tested)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["EntrainDiffusiveParams", "entrainment_diffusive"]

_H_EPS = 1e-3


class EntrainDiffusiveParams(NamedTuple):
    max_frac: float = 0.45      # max fraction of a donor layer per step
    rho_eps: float = 1e-4       # minimum density gap [kg m-3]
    n_eulerian_top: int = 1     # mixed/buffer layers that do not entrain


def entrainment_diffusive(h, T, S, G, GV, kd_int, dt,
                          p: EntrainDiffusiveParams = EntrainDiffusiveParams()):
    """Apply diapycnal diffusivity as dual-stream entrainment.

    kd_int: (nz+1, ny, nx) interface diffusivities [m2 s-1].
    Returns (h_new, T_new, S_new, ea, eb); ea/eb in [m]."""
    nz = h.shape[0]
    dtype = h.dtype
    rlay = jnp.asarray(GV.Rlay, dtype)
    dr = jnp.maximum(rlay[1:] - rlay[:-1], p.rho_eps)     # (nz-1,)
    dr3 = dr[:, None, None]
    kd_lay = 0.5 * (kd_int[:-1] + kd_int[1:])             # layer-centred

    hk = jnp.maximum(h, _H_EPS)
    zeros1 = jnp.zeros((1,) + h.shape[1:], dtype)

    # interior layers k = 1..nz-2 have both gaps; build full arrays
    dr_up = jnp.concatenate([dr3[:1] * 0 + 1.0, dr3], axis=0)   # pad k=0
    dr_dn = jnp.concatenate([dr3, dr3[-1:] * 0 + 1.0], axis=0)  # pad k=nz-1
    coef = kd_lay * dt * (dr_up + dr_dn) / (2.0 * hk)
    ea = coef / dr_up
    eb = coef / dr_dn

    # Eulerian layers: the top n_eulerian_top (mixed/buffer) and the
    # bottom layer entrain nothing themselves
    ktop = max(p.n_eulerian_top, 1)
    ea = ea.at[:ktop].set(0.0)
    eb = eb.at[:ktop].set(0.0)
    ea = ea.at[-1:].set(0.0)
    eb = eb.at[-1:].set(0.0)
    # top interior layer has no constrained layer above to balance: its
    # entrainment from the ML uses the downward gap on both sides
    ea = ea.at[ktop].set(kd_lay[ktop] * dt / hk[ktop])
    eb = eb.at[ktop].set(kd_lay[ktop] * dt / hk[ktop])

    # positivity: each transfer has one donor; cap at max_frac of donor.
    # ea_k takes from layer k-1; eb_k takes from layer k+1.  A donor may
    # feed two receivers (ea_{k+1} and eb_{k-1}); scale both by the
    # shared factor
    loss = jnp.concatenate([ea[1:], zeros1], axis=0) \
        + jnp.concatenate([zeros1, eb[:-1]], axis=0)
    # cap against the TRUE thickness, not the floored hk: a vanished
    # layer (h ~ angstrom) floored to 1e-3 would otherwise donate mass
    # it does not have, driving h negative over steep topography
    donor_scale = jnp.minimum(1.0, p.max_frac * h
                              / jnp.maximum(loss, 1e-30))
    ea = ea * jnp.concatenate([zeros1 + 1.0, donor_scale[:-1]], axis=0)
    eb = eb * jnp.concatenate([donor_scale[1:], zeros1 + 1.0], axis=0)

    gain = ea + eb
    give = jnp.concatenate([ea[1:], zeros1], axis=0) \
        + jnp.concatenate([zeros1, eb[:-1]], axis=0)
    h_new = h + gain - give

    def move(tr):
        htr = h * tr
        gain_tr = jnp.concatenate([zeros1, ea[1:] * tr[:-1]], axis=0) \
            + jnp.concatenate([eb[:-1] * tr[1:], zeros1], axis=0)
        give_tr = jnp.concatenate([ea[1:] * tr[:-1], zeros1], axis=0) \
            + jnp.concatenate([zeros1, eb[:-1] * tr[1:]], axis=0)
        return (htr + gain_tr - give_tr) / jnp.maximum(h_new, _H_EPS)

    T_new = move(T)
    S_new = move(S)
    mask = G.mask2dT[None]
    h_new = jnp.where(mask > 0.5, h_new, h)
    T_new = jnp.where(mask > 0.5, T_new, T)
    S_new = jnp.where(mask > 0.5, S_new, S)
    return h_new, T_new, S_new, ea, eb
