"""Lateral tracer diffusion within the surface boundary layer.

Analogue of MOM6's horizontal boundary diffusion (reference:
src/tracer/MOM_hor_bnd_diffusion.F90: the "bulk" method — diffuse the
boundary-layer tracer inventory between adjacent columns using the
boundary-layer depth, independent of how the layers line up): in ALE
coordinates the mixed layer cuts across model layers, so layerwise
horizontal diffusion misrepresents along-boundary mixing; this operator
moves tracer between the COLUMNS' boundary-layer inventories and
redistributes the exchange inside each column proportionally to the
layers' overlap with the boundary layer.

Fluxes are flux-form (exactly conservative); the overlap weights come
from reversed cumulative sums over the whole plane at once."""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["hor_bnd_diffusion"]

_H_EPS = 1e-3


def _bl_overlap(h, bld):
    """Per-layer overlap [m] with the boundary layer [0, bld]."""
    z_b = jnp.cumsum(h, axis=0)
    z_t = z_b - h
    return jnp.maximum(jnp.minimum(z_b, bld[None])
                       - jnp.minimum(z_t, bld[None]), 0.0)


def hor_bnd_diffusion(tr, h, bld, khtr_bl, dt, G):
    """Diffuse stacked tracers (n_tr, nz, ny, nx) within the boundary
    layer; ``bld`` (ny, nx) boundary-layer depth [m], ``khtr_bl`` the
    along-boundary diffusivity [m2 s-1].  Returns the updated tracers."""
    ov = _bl_overlap(h, bld)                       # (nz, ny, nx)
    hbl = jnp.maximum(jnp.sum(ov, axis=0), _H_EPS)
    w = ov / hbl[None]                             # distribution weights
    cbar = jnp.sum(tr * ov[None], axis=1) / hbl[None]   # (n_tr, ny, nx)

    # bulk inventory exchange between adjacent columns [conc m3 s-1]
    cap_u = jnp.minimum(hbl, ip1(hbl)) * G.dyCu * G.IdxCu * G.mask2dCu
    fx = -khtr_bl * (ip1(cbar) - cbar) * cap_u[None]
    cap_v = jnp.minimum(hbl, jp1(hbl)) * G.dxCv * G.IdyCv * G.mask2dCv
    fy = -khtr_bl * (jp1(cbar) - cbar) * cap_v[None]

    div = ((fx - im1(fx)) + (fy - jm1(fy))) * G.IareaT[None]  # (n_tr,ny,nx)
    # distribute the column exchange over the boundary-layer overlap
    d_trh = -dt * div[:, None] * w[None]           # (n_tr, nz, ny, nx)
    tr_new = tr + d_trh / jnp.maximum(h, _H_EPS)[None]
    return jnp.where(G.mask2dT[None, None] > 0.5, tr_new, tr)
