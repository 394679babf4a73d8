"""Target-grid generation for the ALE vertical coordinate.

TPU-native analogue of MOM6's regridding (reference:
src/ALE/MOM_regridding.F90: regridding_main :133-144; coordinate modes in
src/ALE/regrid_consts.F90:13-22 and coord_zlike/sigma/rho.F90).

Implemented modes:
* ``ZSTAR``  — stretched geopotential: interface k sits at
               e_k = eta - z*_k * (D + eta) / D (collapses over topography);
* ``SIGMA``  — terrain following: e_k = eta - sigma_k * (D + eta);
* ``RHO``    — target isopycnals (interpolate the column's density profile
               onto prescribed Rlay targets) — planned;
* ``LAYER``  — no regridding (pure layered mode).

All modes return new thicknesses h_new with the same column sums as the
input (required by the conservative remap), built with branchless clipping
against the bathymetry.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["build_zstar_grid", "build_sigma_grid", "uniform_dz_profile"]


def uniform_dz_profile(nz: int, max_depth: float) -> np.ndarray:
    return np.full(nz, max_depth / nz)


def build_zstar_grid(h, bathy, dz_nominal, min_thickness: float = 1e-10):
    """New z* thicknesses for columns with current thickness ``h``.

    ``dz_nominal``: (nz,) nominal layer thicknesses summing to max depth.
    Interfaces of the z* grid: z_k = -cum(dz_nominal); stretched by the
    column's (D + eta)/D and clipped to the bottom.
    """
    dz = jnp.asarray(dz_nominal, h.dtype)
    depth_nom = jnp.sum(dz)
    col = jnp.sum(h, axis=0)                      # D + eta
    d = jnp.minimum(bathy, depth_nom)
    # nominal interface depths (positive down), shape (nz+1, 1, 1)
    z_nom = jnp.concatenate([jnp.zeros((1,), h.dtype), jnp.cumsum(dz)])
    z_nom = z_nom[:, None, None]
    # interface positions measured from the free surface downward (top = 0,
    # bottom = col): z*_k stretched by (D+eta)/D, clipped at the bottom
    stretch = col / jnp.maximum(d, 1e-10)
    z = jnp.minimum(z_nom * stretch, col[None])
    h_new = jnp.maximum(z[1:] - z[:-1], min_thickness)
    # renormalize so the column sum is preserved exactly despite the floor
    scale = col / jnp.maximum(jnp.sum(h_new, axis=0), 1e-30)
    return h_new * scale[None]


def build_sigma_grid(h, sigma_fractions=None, nz: int = None,
                     min_thickness: float = 1e-10):
    """Terrain-following grid: fixed fractions of the local column."""
    col = jnp.sum(h, axis=0)
    if sigma_fractions is None:
        nz = nz or h.shape[0]
        frac = jnp.full((nz,), 1.0 / nz, h.dtype)
    else:
        frac = jnp.asarray(sigma_fractions, h.dtype)
    return jnp.maximum(frac[:, None, None] * col[None], min_thickness)
