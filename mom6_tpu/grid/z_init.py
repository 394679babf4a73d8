"""Initialize tracers from z-space profiles/climatology.

Analogue of MOM6's Z-space initialization (reference:
src/tracer/MOM_tracer_Z_init.F90 and
MOM_temp_salt_initialize_from_Z, MOM_state_initialization.F90:2523):
given data on fixed z levels (e.g. an observed climatology), map it
conservatively onto the model's layer grid with the ALE remapping core
(the Z_INIT_ALE_REMAPPING path)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mom6_tpu.ale.remapping import PLM, remap_column

__all__ = ["init_tracer_from_z"]


def init_tracer_from_z(z_edges, data, h, bathy):
    """Remap a z-space profile or 3-D field onto the layer grid.

    ``z_edges``: (nzd+1,) data level interfaces, positive down from 0;
    ``data``: (nzd,) profile or (nzd, ny, nx) field;
    ``h``: (nz, ny, nx) model thicknesses; ``bathy``: (ny, nx).
    Levels below the local bottom are truncated (the data column is
    clipped to the bathymetry, as Z_INIT does)."""
    z_edges = np.asarray(z_edges, np.float64)
    ny, nx = h.shape[1:]
    if np.ndim(data) == 1:
        data3 = jnp.asarray(np.broadcast_to(
            np.asarray(data)[:, None, None],
            (len(data), ny, nx)), h.dtype)
    else:
        data3 = jnp.asarray(data, h.dtype)
    # source thicknesses clipped to the local column depth, then rescaled
    # so source and target column sums agree exactly (remap requirement)
    col = jnp.sum(h, axis=0)
    ze = jnp.asarray(z_edges, h.dtype)[:, None, None]
    ze_clip = jnp.minimum(ze, col[None])
    h_src = jnp.maximum(ze_clip[1:] - ze_clip[:-1], 1e-10)
    scale = col / jnp.maximum(jnp.sum(h_src, axis=0), 1e-30)
    h_src = h_src * scale[None]
    return remap_column(data3, h_src, h, PLM)