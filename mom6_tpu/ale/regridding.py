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

__all__ = ["build_zstar_grid", "build_sigma_grid", "build_rho_grid",
           "uniform_dz_profile"]


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


def build_rho_grid(h, T, S, GV, eos, rho_targets, *,
                   min_thickness: float = 1e-10, p_ref: float = 2e7):
    """Isopycnal-target grid (RHO mode of regridding_main; coord_rho.F90):
    interface k moves to the depth where the column's (monotonicized)
    potential density referenced to ``p_ref`` equals the target interface
    density 0.5*(Rlay[k-1] + Rlay[k]).

    Piecewise-linear inversion of the (rho, z) profile with the same
    branchless fractional-segment machinery as the remap core; interfaces
    clamp to [0, column depth] so column sums are preserved exactly."""
    import jax

    nz = h.shape[0]
    rho_t = jnp.asarray(rho_targets, h.dtype)
    rho_int_t = 0.5 * (rho_t[:-1] + rho_t[1:])          # (nz-1,) targets

    z_c = jnp.cumsum(h, axis=0) - 0.5 * h               # center depths
    rho_c = GV.rho0 + eos.density(T, S, jnp.full_like(T, p_ref),
                                  rho_ref=GV.rho0)
    rho_mono = jax.lax.cummax(rho_c, axis=0)            # enforce stability

    col = jnp.sum(h, axis=0)
    # invert rho(z): for each target, z = interpolated crossing depth
    r_lo = jnp.concatenate([rho_mono[:1], rho_mono[:-1]], 0)
    z_lo = jnp.concatenate([jnp.zeros_like(z_c[:1]), z_c[:-1]], 0)
    seg = z_c - z_lo

    def depth_of(rho_target):
        frac = jnp.clip((rho_target - r_lo)
                        / jnp.maximum(rho_mono - r_lo, 1e-12), 0.0, 1.0)
        frac = jnp.where(rho_mono - r_lo < 1e-12,
                         jnp.where(r_lo < rho_target, 1.0, 0.0), frac)
        return jnp.sum(seg * frac, axis=0)

    z_int = jnp.stack([depth_of(rho_int_t[k]) for k in range(nz - 1)])
    z_int = jnp.clip(z_int, 0.0, col[None])
    # enforce monotone interfaces
    z_int = jax.lax.cummax(z_int, axis=0)
    z_full = jnp.concatenate([jnp.zeros_like(col[None]), z_int,
                              col[None]], axis=0)
    h_new = jnp.maximum(z_full[1:] - z_full[:-1], min_thickness)
    scale = col / jnp.maximum(jnp.sum(h_new, axis=0), 1e-30)
    return h_new * scale[None]
