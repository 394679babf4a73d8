"""Sponge layers: restoring to reference profiles in damping regions.

Analogue of MOM6's ALE sponge (reference:
src/parameterizations/vertical/MOM_ALE_sponge.F90:1450; layered variant
MOM_sponge.F90:672): tracers (and optionally velocities) are relaxed
toward reference profiles with a spatially-varying inverse damping time,

    X_new = (X + dt * idamp * X_ref) / (1 + dt * idamp)

(implicit relaxation, unconditionally stable).  In ALE mode the reference
profile lives on the model's current grid (regrid the reference data once
per call via the remapping core if it is on its own grid)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

__all__ = ["SpongeParams", "apply_sponge"]


class SpongeParams(NamedTuple):
    idamp: jnp.ndarray = None        # (ny, nx) inverse damping time [s-1]
    T_ref: Optional[jnp.ndarray] = None   # (nz, ny, nx)
    S_ref: Optional[jnp.ndarray] = None
    u_ref: Optional[jnp.ndarray] = None
    v_ref: Optional[jnp.ndarray] = None
    sponge_uv: bool = False


def apply_sponge(state, dt, p: SpongeParams, G):
    """Implicit relaxation of T/S (and u/v) toward the references."""
    w = dt * p.idamp * G.mask2dT                 # (ny, nx)
    denom = 1.0 / (1.0 + w)

    def relax(x, ref):
        if x is None or ref is None:
            return x
        return (x + w[None] * ref) * denom[None]

    out = state
    if state.T is not None and p.T_ref is not None:
        out = out.replace(T=relax(state.T, p.T_ref))
    if state.S is not None and p.S_ref is not None:
        out = out.replace(S=relax(state.S, p.S_ref))
    if p.sponge_uv:
        wu = dt * 0.5 * (p.idamp + jnp.roll(p.idamp, -1, -1)) * G.mask2dCu
        wv = dt * 0.5 * (p.idamp + jnp.roll(p.idamp, -1, -2)) * G.mask2dCv
        if p.u_ref is not None:
            out = out.replace(u=(state.u + wu[None] * p.u_ref) / (1 + wu[None]))
        if p.v_ref is not None:
            out = out.replace(v=(state.v + wv[None] * p.v_ref) / (1 + wv[None]))
    return out
