"""ALE driver: regrid to the target coordinate, conservatively remap state.

Analogue of MOM6's ALE driver (reference: src/ALE/MOM_ALE.F90:
ALE_regrid :518, ALE_remap_tracers :760, ALE_remap_velocities :1089).

One call = one regrid/remap cycle applied after the thermodynamic step:
build the new grid for the current column heights, remap T/S/tracers on
cell columns and u/v on face columns (face thicknesses are the mean of the
adjacent cell columns, before and after)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.ale.regridding import (AdaptParams, build_adaptive_grid,
                                     build_hybgen_grid, build_hycom1_grid,
                                     build_rho_grid, build_sigma_grid,
                                     build_sigma_shelf_zstar_grid,
                                     build_zstar_grid)
from mom6_tpu.ale.remapping import PPM_H4, remap_column
from mom6_tpu.framework.stencil import ip1, jp1

__all__ = ["ALEParams", "ale_regrid_remap"]

LAYER = "LAYER"
ZSTAR = "ZSTAR"
SIGMA = "SIGMA"
RHO = "RHO"
HYCOM1 = "HYCOM1"
ADAPTIVE = "ADAPTIVE"
HYBGEN = "HYBGEN"
SIGMA_SHELF_ZSTAR = "SIGMA_SHELF_ZSTAR"


class ALEParams(NamedTuple):
    mode: str = ZSTAR
    dz_nominal: tuple = ()         # nominal z* thicknesses (nz,)
    shelf_depth: float = 200.0     # SIGMA_SHELF_ZSTAR transition [m]
    rho_targets: tuple = ()        # RHO/HYCOM1 target densities (nz,)
    scheme: str = PPM_H4
    min_thickness: float = 1e-10
    eos_name: str = "WRIGHT"       # for RHO/HYCOM1/ADAPTIVE modes
    # ADAPTIVE-mode constants (MOM_regridding ADAPT_* defaults)
    adapt_time_ratio: float = 0.1
    adapt_zoom_depth: float = 200.0
    adapt_zoom_coeff: float = 0.2
    adapt_buoy_coeff: float = 0.8
    adapt_alpha: float = 1.0
    adapt_drho0: float = 0.5
    adapt_do_min: bool = False
    # HYBGEN-mode relaxation fraction (1 / HYBGEN_RELAX_PERIOD)
    hybgen_qrlx: float = 0.25


def ale_regrid_remap(state, G, GV, p: ALEParams,
                     extra_tracers: Optional[jnp.ndarray] = None):
    """Returns (new_state, extra_tracers_new)."""
    if p.mode == LAYER:
        return state, extra_tracers
    h = state.h
    if p.mode == ZSTAR:
        h_new = build_zstar_grid(h, G.bathyT, jnp.asarray(p.dz_nominal,
                                                          h.dtype),
                                 p.min_thickness)
    elif p.mode == SIGMA:
        h_new = build_sigma_grid(h, min_thickness=p.min_thickness)
    elif p.mode == SIGMA_SHELF_ZSTAR:
        h_new = build_sigma_shelf_zstar_grid(
            h, G.bathyT, jnp.asarray(p.dz_nominal, h.dtype),
            p.shelf_depth, p.min_thickness)
    elif p.mode == RHO:
        from mom6_tpu.eos import get_eos
        h_new = build_rho_grid(h, state.T, state.S, GV,
                               get_eos(p.eos_name),
                               jnp.asarray(p.rho_targets, h.dtype),
                               min_thickness=p.min_thickness)
    elif p.mode == HYCOM1:
        from mom6_tpu.eos import get_eos
        h_new = build_hycom1_grid(h, state.T, state.S, GV,
                                  get_eos(p.eos_name),
                                  jnp.asarray(p.rho_targets, h.dtype),
                                  jnp.asarray(p.dz_nominal, h.dtype),
                                  min_thickness=p.min_thickness)
    elif p.mode == HYBGEN:
        from mom6_tpu.eos import get_eos
        h_new = build_hybgen_grid(h, state.T, state.S, GV,
                                  get_eos(p.eos_name),
                                  jnp.asarray(p.rho_targets, h.dtype),
                                  jnp.asarray(p.dz_nominal, h.dtype),
                                  qhybrlx=p.hybgen_qrlx,
                                  min_thickness=p.min_thickness)
    elif p.mode == ADAPTIVE:
        from mom6_tpu.eos import get_eos
        ap = AdaptParams(time_ratio=p.adapt_time_ratio,
                         zoom_depth=p.adapt_zoom_depth,
                         zoom_coeff=p.adapt_zoom_coeff,
                         buoy_coeff=p.adapt_buoy_coeff,
                         alpha=p.adapt_alpha, drho0=p.adapt_drho0,
                         do_min=p.adapt_do_min)
        h_new = build_adaptive_grid(
            h, state.T, state.S, G, GV, get_eos(p.eos_name), ap,
            dz_nominal=(jnp.asarray(p.dz_nominal, h.dtype)
                        if p.dz_nominal else None),
            min_thickness=p.min_thickness)
    else:
        raise ValueError(f"unknown ALE mode {p.mode}")
    h_new = jnp.where(G.mask2dT[None] > 0.5, h_new, h)

    # all cell-centered fields share one column geometry: stack them into
    # a single multi-field remap so the target-position fractions are
    # computed once (remap_columns_multi's gather-free scan)
    from mom6_tpu.ale.remapping import remap_columns_multi
    cell_fields = []
    T_new = S_new = extra_new = None
    if state.T is not None:
        cell_fields += [state.T, state.S]
    n_extra = 0 if extra_tracers is None else extra_tracers.shape[0]
    if n_extra:
        cell_fields += [extra_tracers[i] for i in range(n_extra)]
    if cell_fields:
        out = remap_columns_multi(jnp.stack(cell_fields), h, h_new,
                                  p.scheme)
        idx = 0
        if state.T is not None:
            T_new, S_new = out[0], out[1]
            idx = 2
        if n_extra:
            extra_new = out[idx:idx + n_extra]

    if p.mode == HYBGEN and T_new is not None and p.rho_targets:
        # unmix the hybrid layers back toward their density targets
        # (MOM_hybgen_unmix.F90: remap-induced mixing across isopycnal
        # layers is reversed by conservative pairwise swaps)
        from mom6_tpu.ale.regridding import hybgen_unmix
        from mom6_tpu.eos import get_eos
        T_new, S_new = hybgen_unmix(T_new, S_new, h_new, GV,
                                    get_eos(p.eos_name), p.rho_targets)

    # velocities on face columns
    h_u_old = 0.5 * (h + ip1(h))
    h_u_new = 0.5 * (h_new + ip1(h_new))
    u_new = remap_column(state.u, h_u_old, h_u_new, p.scheme) * G.mask2dCu
    kh = "h" if getattr(G, "fold_north", False) else None
    h_v_old = 0.5 * (h + jp1(h, kh))
    h_v_new = 0.5 * (h_new + jp1(h_new, kh))
    v_new = remap_column(state.v, h_v_old, h_v_new, p.scheme) * G.mask2dCv

    return state.replace(h=h_new, T=T_new, S=S_new, u=u_new, v=v_new), extra_new
