"""Incremental analysis updates (data assimilation).

Analogue of MOM6's MOM_oda_incupd.F90:849 (the apply side of the ODA
subsystem, SURVEY.md §2.11): externally computed analysis increments for
T/S (and optionally u/v) are applied gradually over ``nhours`` so the
model adjusts without shocking the dynamics.  Increments defined on their
own vertical grid are remapped to the model's current grid with the
conservative remapping core.

The ensemble/filter side (gathering members, EAKF) composes from
parallel/ensemble.py + host-side analysis tooling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.ale.remapping import PLM, remap_column

__all__ = ["IncrementalUpdate", "apply_oda_increments"]


class IncrementalUpdate(NamedTuple):
    dT: Optional[jnp.ndarray] = None   # (nz_inc, ny, nx) analysis increments
    dS: Optional[jnp.ndarray] = None
    h_inc: Optional[jnp.ndarray] = None  # grid the increments live on
    ramp_seconds: float = 6.0 * 3600.0   # total application window


def apply_oda_increments(state, inc: IncrementalUpdate, dt, G):
    """Apply dt/ramp of the increments (call every thermo step until the
    window has elapsed; the caller tracks elapsed time)."""
    frac = dt / inc.ramp_seconds

    def to_model_grid(x):
        if x is None:
            return None
        if inc.h_inc is not None and x.shape[0] != state.h.shape[0]:
            col = jnp.sum(state.h, axis=0, keepdims=True)
            col_i = jnp.maximum(jnp.sum(inc.h_inc, axis=0, keepdims=True),
                                1e-10)
            h_src = inc.h_inc * (col / col_i)
            return remap_column(x, h_src, state.h, PLM)
        return x

    out = state
    if inc.dT is not None and state.T is not None:
        out = out.replace(T=out.T + frac * to_model_grid(inc.dT)
                          * G.mask2dT[None])
    if inc.dS is not None and state.S is not None:
        out = out.replace(S=out.S + frac * to_model_grid(inc.dS)
                          * G.mask2dT[None])
    return out