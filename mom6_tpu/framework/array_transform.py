"""Quarter-turn rotation of the model domain.

Analogue of MOM6's MOM_array_transform.F90 (rotate_array / rotate_vector)
and the ROTATE_INDEX testing machinery (SURVEY.md §4 "Rotational
invariance"): rotate the grid, state and forcing by 90 degrees, run the
model, rotate back — the answers must match, which catches any
east-west/north-south asymmetry bug in the operators.

Convention (one CCW quarter turn, (x, y) -> (-y, x)):
* scalars at h points: A'[i, ny-1-j] = A[j, i]  (shape (ny,nx)->(nx,ny));
* u (east face of (j,i)) becomes the NORTH face of the rotated cell:
  v'[i, ny-1-j] = u[j, i];
* v (north face of (j,i)) becomes minus the east face of the cell at
  i' = ny-2-j: u'[i, ny-2-j] = -v[j, i] (one-index shift toward smaller
  i', the price of the non-symmetric staggering);
* q (NE corner of (j,i)) maps to the NE corner of cell (i, ny-2-j).
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.core.state import OceanState

__all__ = ["rotate_scalar", "rotate_uv", "unrotate_scalar", "unrotate_uv",
           "rotate_state", "rotate_grid"]


def rotate_scalar(a):
    """One CCW quarter turn of an (..., ny, nx) h-point field."""
    # out[..., i, ny-1-j] = a[..., j, i]
    return jnp.flip(jnp.swapaxes(a, -1, -2), -1)


def unrotate_scalar(a):
    return jnp.swapaxes(jnp.flip(a, -1), -1, -2)


def rotate_uv(u, v):
    """Rotate a C-grid vector pair; returns (u', v')."""
    v_new = rotate_scalar(u)
    u_new = -jnp.roll(rotate_scalar(v), -1, axis=-1)
    return u_new, v_new


def unrotate_uv(u, v):
    u_old = unrotate_scalar(v)
    v_old = -unrotate_scalar(jnp.roll(u, 1, axis=-1))
    return u_old, v_old


def rotate_state(state: OceanState) -> OceanState:
    u, v = rotate_uv(state.u, state.v)
    uh, vh = (rotate_uv(state.uh, state.vh)
              if state.uh is not None else (None, None))
    uhtr, vhtr = (rotate_uv(state.uhtr, state.vhtr)
                  if state.uhtr is not None else (None, None))
    return state.replace(
        h=rotate_scalar(state.h), u=u, v=v,
        T=rotate_scalar(state.T) if state.T is not None else None,
        S=rotate_scalar(state.S) if state.S is not None else None,
        uh=uh, vh=vh, uhtr=uhtr, vhtr=vhtr,
        E_meke=(rotate_scalar(state.E_meke)
                if state.E_meke is not None else None))


def rotate_grid(G):
    """Rotate the grid container (swaps x/y metrics appropriately)."""
    rs = rotate_scalar
    # metric lengths: dx' = dy, dy' = dx at the mapped locations
    dxT = rs(G.dyT); dyT = rs(G.dxT)
    m_u, m_v = rotate_uv(G.mask2dCu, G.mask2dCv)
    m_u = jnp.abs(m_u)
    dxCu = jnp.abs(jnp.roll(rs(G.dyCv), -1, -1))
    dyCu = jnp.abs(jnp.roll(rs(G.dxCv), -1, -1))
    dxCv = rs(G.dyCu); dyCv = rs(G.dxCu)
    # corners: q(j,i) maps to the NE corner of (i, ny-2-j)
    rq = lambda a: jnp.roll(rs(a), -1, -1)
    return G.replace(
        nx=G.ny, ny=G.nx,
        cyclic_x=G.reentrant_y, reentrant_y=G.cyclic_x,
        dxT=dxT, dyT=dyT, areaT=rs(G.areaT), IareaT=rs(G.IareaT),
        IdxT=rs(G.IdyT), IdyT=rs(G.IdxT),
        dxCu=dxCu, dyCu=dyCu,
        IdxCu=1.0 / dxCu, IdyCu=1.0 / dyCu,
        dxCv=dxCv, dyCv=dyCv,
        IdxCv=1.0 / dxCv, IdyCv=1.0 / dyCv,
        dxBu=rq(G.dyBu), dyBu=rq(G.dxBu),
        areaBu=rq(G.areaBu), IareaBu=rq(G.IareaBu),
        mask2dT=rs(G.mask2dT), mask2dCu=m_u, mask2dCv=m_v,
        mask2dBu=rq(G.mask2dBu), CoriolisBu=rq(G.CoriolisBu),
        bathyT=rs(G.bathyT),
        geoLonT=rs(G.geoLonT), geoLatT=rs(G.geoLatT),
        geoLonBu=rq(G.geoLonBu), geoLatBu=rq(G.geoLatBu))