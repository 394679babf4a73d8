"""Offline tracer transport.

Analogue of MOM6's offline mode (reference: src/core/MOM.F90 step_offline
:1983 -> src/tracer/MOM_offline_main.F90): advance tracers with STORED
transports and thicknesses from a previous online run (or a coarse
archive), without re-running the dynamics.  Sequence per offline step:
advect with the stored accumulated transports, apply vertical diffusion
with stored diffusivities, regrid/remap to the stored end-of-step grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.ale.remapping import PPM_H4, remap_column
from mom6_tpu.tracers.advect import advect_tracers
from mom6_tpu.tracers.vert_diff import tracer_vertdiff

__all__ = ["OfflineFields", "step_offline"]


class OfflineFields(NamedTuple):
    """One archived interval of transport fields."""
    h_start: jnp.ndarray       # (nz, ny, nx) thickness at interval start
    h_end: jnp.ndarray         # thickness at interval end
    uhtr: jnp.ndarray          # accumulated transports [m3]
    vhtr: jnp.ndarray
    kd_int: Optional[jnp.ndarray] = None   # (nz+1, ny, nx) diffusivities


def step_offline(tracers, fields: OfflineFields, dt, G, *, n_sub: int = 4):
    """Advance stacked tracers (n_tr, nz, ny, nx) one archived interval."""
    tr, h_adv = advect_tracers(tracers, fields.h_start, fields.uhtr,
                               fields.vhtr, G, n_sub=n_sub)
    if fields.kd_int is not None:
        tr = tracer_vertdiff(tr, h_adv, fields.kd_int, dt)
    # remap from the advected grid onto the archived end-of-interval grid,
    # reconciling the offline continuity with the stored state
    # (offline_advection_ale's residual redistribution role)
    col_adv = jnp.sum(h_adv, axis=0, keepdims=True)
    col_end = jnp.sum(fields.h_end, axis=0, keepdims=True)
    h_target = fields.h_end * (col_adv / jnp.maximum(col_end, 1e-10))
    tr = jnp.stack([remap_column(tr[i], h_adv, h_target, PPM_H4)
                    for i in range(tr.shape[0])])
    return tr, h_target