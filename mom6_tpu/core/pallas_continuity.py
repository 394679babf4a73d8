"""Pallas TPU kernels for the PPM continuity passes.

The continuity solver is pure stencil work: at the global_half_deg size
the XLA lowering of one directional pass materializes every
reconstruction intermediate to HBM (~4.5 GB accessed per call against a
~0.4 GB ideal), and the whole dyn step sits exactly on the HBM roofline
(51 GB/step ≈ measured 61 ms on one v5e chip).  These kernels fuse the
reconstruction + flux of one pass into a single VMEM-resident sweep:

* the x pass uses ONLY i-shifts, so blocks carry full x rows
  ((1, BJ, nx) per layer-row tile) and the in-block shift is an exact
  circular roll — identical semantics to the global ``jnp.roll`` path;
* the y pass uses ONLY j-shifts, so blocks carry full y columns
  ((1, ny, BI)); the j+1 ghost row (periodic wrap, or the tripolar
  fold's x-mirrored rows — which live in OTHER x tiles) is precomputed
  on a 5-row slab in XLA and passed as (nz, nx) inputs.

The kernel bodies execute ``continuity_ppm._pass_core`` — the same
function the XLA path runs — with block-local shift closures, so the
two implementations cannot drift; parity is pinned by
tests/test_pallas_continuity.py (interpret mode on CPU).

Dispatch (``MOM6_TPU_CONTINUITY`` = auto|pallas|xla, default auto):
**auto currently resolves to the XLA path.**  Measured on a v5e at the
global_half_deg size (tools/ab_continuity.py, 2026-08-20): the kernels
win in isolation (plain pass 4.09 vs 6.12 ms, matched 8.23 vs
10.17 ms) but LOSE inside the full jitted dyn step (63.09 vs
59.56 ms) — a pallas_call is a fusion barrier, XLA CSEs the
reconstruction between the plain and matched continuity calls of the
split-RK2 step, and the kernel's Newton path re-runs the
reconstruction every iterate.  ``pallas`` forces the kernels on (used
by the parity gates and for isolated-pass workloads); multi-device
meshes always keep the XLA path — a pallas_call carries no GSPMD
partitioning rule, so jit would gather the sharded operands.
(Reference: src/core/MOM_continuity_PPM.F90; this file only changes
the schedule, not the math.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def continuity_mode() -> str:
    return os.environ.get("MOM6_TPU_CONTINUITY", "auto").lower()


def use_pallas_continuity(*arrays) -> bool:
    """True when the Pallas continuity kernels should run."""
    mode = continuity_mode()
    if mode == "xla":
        return False
    for a in arrays:
        if a is not None and jnp.asarray(a).dtype != jnp.float32:
            return False
    if mode == "pallas":
        return True
    # auto: stay on XLA — in-context the fused XLA step is faster than
    # the kernels despite their isolated win (see module docstring)
    return False


def _interpret() -> bool:
    # forced-on mode runs in the interpreter off-TPU (parity tests)
    return jax.default_backend() != "tpu"


def _block(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= cap and a multiple of 8 (the
    f32 sublane width — Mosaic requires sublane blocks %8 or full);
    ``n`` itself when nothing smaller fits."""
    cap = max(1, cap)
    best = 0
    for d in range(8, min(n, cap) + 1, 8):
        if n % d == 0:
            best = d
    return best or n


def _block_lane(n: int, cap: int) -> int:
    """Lane-dimension block: Mosaic requires %128 or the full dim."""
    best = 0
    for d in range(128, min(n, max(cap, 1)) + 1, 128):
        if n % d == 0:
            best = d
    return best or n


# ---------------------------------------------------------------------------
# in-block shift closures (exact equivalents of framework.stencil's rolls
# given a full-extent axis in VMEM)
# ---------------------------------------------------------------------------

def _ip1_b(a):
    return jnp.concatenate([a[..., 1:], a[..., :1]], axis=-1)


def _im1_b(a):
    return jnp.concatenate([a[..., -1:], a[..., :-1]], axis=-1)


def _jm1_b(a):
    return jnp.concatenate([a[-1:, :], a[:-1, :]], axis=0)


def _jp1_b(a, ghost):
    return jnp.concatenate([a[1:, :], ghost], axis=0)


# ---------------------------------------------------------------------------
# zonal pass kernel
# ---------------------------------------------------------------------------

def _zonal_kernel(h_min, monotonic, simple_2nd, with_adjust, *refs):
    from mom6_tpu.core.continuity_ppm import _pass_core
    if with_adjust:
        (u_ref, h_ref, rem_ref, dw_ref, mask_ref, face_ref, dp_ref,
         dm_ref, uh_ref, duh_ref) = refs
        w = u_ref[0] + dw_ref[...] * rem_ref[0]
    else:
        (u_ref, h_ref, mask_ref, face_ref, dp_ref, dm_ref, uh_ref,
         duh_ref) = refs
        w = u_ref[0]
    uh, duh = _pass_core(
        w, h_ref[0], mask_ref[...], face_ref[...], dp_ref[...],
        dm_ref[...], h_min, monotonic, simple_2nd,
        _im1_b, _ip1_b, _ip1_b, lambda l, r: (_ip1_b(l), _ip1_b(r)))
    uh_ref[0] = uh
    duh_ref[0] = duh


def zonal_flux_pallas(u, h, mask2dT, face, d_p, d_m, h_min,
                      monotonic=False, simple_2nd=False,
                      rem=None, dw=None):
    """(uh, duhdu) of the zonal PPM pass.  With ``rem``/``dw`` the
    effective velocity is u + dw*rem computed in-kernel (the Newton
    flux-adjust iterate) without materializing it to HBM."""
    nz, ny, nx = u.shape
    bj = _block(ny, 256 * 1024 // max(nx, 1) or 1)
    with_adjust = dw is not None
    # k is the FASTEST grid dim: the 2-D parameter blocks keep the same
    # index across the nz inner steps, so their DMA is skipped after the
    # first visit (they would otherwise dominate the traffic)
    grid = (ny // bj, nz)
    s3 = pl.BlockSpec((1, bj, nx), lambda j, k: (k, j, 0))
    s2 = pl.BlockSpec((bj, nx), lambda j, k: (j, 0))
    args = [u, h] + ([rem, dw] if with_adjust else []) + \
        [mask2dT, face, d_p, d_m]
    in_specs = [s3, s3] + ([s3, s2] if with_adjust else []) + \
        [s2, s2, s2, s2]
    out = pl.pallas_call(
        functools.partial(_zonal_kernel, float(h_min), monotonic,
                          simple_2nd, with_adjust),
        grid=grid,
        in_specs=in_specs,
        out_specs=(s3, s3),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype)),
        interpret=_interpret(),
    )(*args)
    return out


# ---------------------------------------------------------------------------
# meridional pass kernel
# ---------------------------------------------------------------------------

def _merid_kernel(h_min, monotonic, simple_2nd, with_adjust, *refs):
    from mom6_tpu.core.continuity_ppm import (_flux_eval_core,
                                              _flux_pre_core, _ppm_edges,
                                              _ppm_limit_cw84,
                                              _ppm_limit_pos)
    if with_adjust:
        (v_ref, h_ref, rem_ref, dw_ref, gh_h_ref, gh_slp_ref, gh_jS_ref,
         gh_jN_ref, gh_curv_ref, mask_ref, gh_mask_ref, face_ref,
         dp_ref, dm_ref, vh_ref, dvh_ref) = refs
        w = v_ref[0] + dw_ref[...] * rem_ref[0]
    else:
        (v_ref, h_ref, gh_h_ref, gh_slp_ref, gh_jS_ref, gh_jN_ref,
         gh_curv_ref, mask_ref, gh_mask_ref, face_ref, dp_ref, dm_ref,
         vh_ref, dvh_ref) = refs
        w = v_ref[0]
    h = h_ref[0]
    mask = mask_ref[...]
    gh_h, gh_slp = gh_h_ref[0], gh_slp_ref[0]
    gh_jS, gh_jN, gh_curv = gh_jS_ref[0], gh_jN_ref[0], gh_curv_ref[0]
    gh_mask = gh_mask_ref[...]

    # reconstruction with explicit ghost rows (mirrors _recon_core with
    # jp1(..., kh): the ghost of h/mask is "h"-kind, of slp "dh"-kind —
    # both precomputed outside and passed in, so the SAME kernel serves
    # periodic wrap and the tripolar fold)
    hm, hp = _jm1_b(h), _jp1_b(h, gh_h)
    mm, mp = _jm1_b(mask), _jp1_b(mask, gh_mask)
    if simple_2nd:
        h_m = mm * hm + (1.0 - mm) * h
        h_p = mp * hp + (1.0 - mp) * h
        h_S, h_N = 0.5 * (h_m + h), 0.5 * (h_p + h)
    else:
        h_m, h_p, slp = _ppm_edges(h, hm, hp, mm, mask, mp, h_min,
                                   monotonic)
        one_sixth = 1.0 / 6.0
        h_S = 0.5 * (h_m + h) + one_sixth * (_jm1_b(slp) - slp)
        h_N = 0.5 * (h_p + h) + one_sixth * (slp - _jp1_b(slp, gh_slp))
        if monotonic:
            h_S, h_N = _ppm_limit_cw84(h, h_S, h_N)
        else:
            h_S, h_N = _ppm_limit_pos(h, h_S, h_N, h_min)

    pre = _flux_pre_core(
        h, h_S, h_N, face_ref[...], dp_ref[...], dm_ref[...],
        lambda a: _jp1_b(a, gh_curv),
        lambda s, n: (_jp1_b(s, gh_jS), _jp1_b(n, gh_jN)))
    vh, dvh = _flux_eval_core(w, pre)
    vh_ref[0] = vh
    dvh_ref[0] = dvh


def merid_ghosts(h, mask2dT, h_min, monotonic, simple_2nd, fold):
    """The j+1 ghost rows the meridional kernel needs, computed on a
    5-row slab in XLA (wrap: rows [ny-2, ny-1, 0, 1, 2] so the row-0
    neighborhood is complete; fold: the top 4 rows with the fold's
    mirrored ghosts).  Returns (gh_h, gh_slp, gh_jS, gh_jN, gh_curv,
    gh_mask) with leading nz dim for the 3-D ones."""
    from mom6_tpu.core.continuity_ppm import (_ppm_edges,
                                              _ppm_limit_cw84,
                                              _ppm_limit_pos)
    from mom6_tpu.framework.stencil import fold_ghost, jm1, jp1

    if fold:
        gh_h = h[:, -1, ::-1]
        gh_mask = mask2dT[-1, ::-1]
        slab_h = h[:, -4:, :]
        slab_m = mask2dT[-4:, :]
        kh, kdh = "h", "dh"
    else:
        gh_h = h[:, 0, :]
        gh_mask = mask2dT[0, :]
        slab_h = jnp.concatenate([h[:, -2:, :], h[:, :3, :]], axis=1)
        slab_m = jnp.concatenate([mask2dT[-2:, :], mask2dT[:3, :]],
                                 axis=0)
        kh = kdh = None

    # slab reconstruction: rows with complete neighborhoods are exact
    hm, hp = jm1(slab_h), jp1(slab_h, kh)
    mm, mp = jm1(slab_m), jp1(slab_m, kh)
    if simple_2nd:
        h_m = mm * hm + (1.0 - mm) * slab_h
        h_p = mp * hp + (1.0 - mp) * slab_h
        hS4, hN4 = 0.5 * (h_m + slab_h), 0.5 * (h_p + slab_h)
        slp4 = jnp.zeros_like(slab_h)
    else:
        h_m, h_p, slp4 = _ppm_edges(slab_h, hm, hp, mm, slab_m, mp,
                                    h_min, monotonic)
        one_sixth = 1.0 / 6.0
        hS4 = 0.5 * (h_m + slab_h) + one_sixth * (jm1(slp4) - slp4)
        hN4 = 0.5 * (h_p + slab_h) + one_sixth * (
            slp4 - jp1(slp4, kdh))
        if monotonic:
            hS4, hN4 = _ppm_limit_cw84(slab_h, hS4, hN4)
        else:
            hS4, hN4 = _ppm_limit_pos(slab_h, hS4, hN4, h_min)

    if fold:
        # ghost row = the fold image of the TOP row (slab index -1,
        # whose neighborhood incl. its own mirrored ghost is complete)
        top = lambda a: a[:, -1, :]
        mirror = lambda r: r[:, ::-1]
        gh_slp = -mirror(top(slp4))                  # "dh" kind
        gh_jS = mirror(top(hN4))                     # S/N pair swaps
        gh_jN = mirror(top(hS4))
        gh_curv = mirror(top(hS4) + top(hN4) - 2.0 * h[:, -1, :])
    else:
        # wrap: ghost row = row 0 (slab index 2)
        r0 = lambda a: a[:, 2, :]
        gh_slp = r0(slp4)
        gh_jS, gh_jN = r0(hS4), r0(hN4)
        gh_curv = r0(hS4) + r0(hN4) - 2.0 * h[:, 0, :]
    return gh_h, gh_slp, gh_jS, gh_jN, gh_curv, gh_mask


def merid_flux_pallas(v, h, mask2dT, face, d_p, d_m, h_min,
                      monotonic=False, simple_2nd=False, fold=False,
                      rem=None, dw=None, ghosts=None):
    """(vh, dvhdv) of the meridional PPM pass.  ``ghosts`` (from
    merid_ghosts, reusable across Newton iterations) are recomputed when
    absent."""
    nz, ny, nx = v.shape
    bi = _block_lane(nx, 512 * 1024 // max(ny, 1) or 1)
    if ghosts is None:
        ghosts = merid_ghosts(h, mask2dT, h_min, monotonic, simple_2nd,
                              fold)
    gh_h, gh_slp, gh_jS, gh_jN, gh_curv, gh_mask = ghosts
    with_adjust = dw is not None
    grid = (nx // bi, nz)                        # k fastest (see zonal)
    s3 = pl.BlockSpec((1, ny, bi), lambda i, k: (k, 0, i))
    s2 = pl.BlockSpec((ny, bi), lambda i, k: (0, i))
    sg = pl.BlockSpec((1, 1, bi), lambda i, k: (k, 0, i))   # ghost rows
    sg2 = pl.BlockSpec((1, bi), lambda i, k: (0, i))
    g3 = lambda a: a[:, None, :]                # (nz, nx) -> (nz, 1, nx)
    g2 = lambda a: a[None, :]                   # (nx,) -> (1, nx)
    args = [v, h] + ([rem, dw] if with_adjust else []) + \
        [g3(gh_h), g3(gh_slp), g3(gh_jS), g3(gh_jN), g3(gh_curv),
         mask2dT, g2(gh_mask), face, d_p, d_m]
    in_specs = [s3, s3] + ([s3, s2] if with_adjust else []) + \
        [sg, sg, sg, sg, sg, s2, sg2, s2, s2, s2]
    out = pl.pallas_call(
        functools.partial(_merid_kernel, float(h_min), monotonic,
                          simple_2nd, with_adjust),
        grid=grid,
        in_specs=in_specs,
        out_specs=(s3, s3),
        out_shape=(jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    return out
