"""Pallas TPU kernel for the ALE column remap.

Why a hand kernel here and (deliberately) nowhere else: the remap's
cumulative-integral form

    I(z_t) = sum_k h_k * P_k( clip((z_t - z0_k)/h_k, 0, 1) )

is an O(nz_src * nz_tgt) contraction per column.  As a lax.scan over
source cells the (nf, nz_tgt+1, ny, nx) accumulator lives in HBM and is
re-read/re-written every one of the nz_src steps — measured 5.7 GB of
traffic per full-field remap at 360x280x32, ~15 ms on a v5e (ALE was
~18% of the full-physics cycle).  A broadcast+reduce form does not fuse
(XLA materializes the 6-D intermediate).  This kernel keeps the whole
column resident in VMEM: each (8, 128) surface tile loads its
polynomial coefficients once, runs the t x k contraction on the VPU,
and writes the remapped fields once — O(nz) HBM traffic, no sequential
scan latency.

Used by ale/remapping.remap_columns_multi when running on TPU; the scan
form remains the portable fallback (CPU tests, interpret-free).
Equivalence is gated in tests/test_remap_pallas.py (interpret mode on
CPU, native on TPU).

Reference role: MOM_remapping.F90 remapping_core_h (the reference
iterates per column with explicit sub-cell bookkeeping; the clipped
antiderivative form is the branch-free equivalent, cf.
ale/remapping.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10
_BY = 8          # sublane tile (f32 min 8)
_BX = 128        # lane tile


def _remap_kernel(coef_ref, h0_ref, h1_ref, lo_ref, hi_ref, out_ref,
                  *, nf: int, npoly: int):
    """One (BY, BX) tile of columns, whole depth resident in VMEM.

    coef: (nf, npoly, nz0, BY, BX) antiderivative coefficients
          P(xi) = xi*(b0 + xi*(b1 + xi*(b2 + ...)))
    h0:   (nz0, BY, BX) source thicknesses
    h1:   (nz1, BY, BX) target thicknesses
    lo/hi: (nf, BY, BX) per-column output bounds (source min/max)
    out:  (nf, nz1, BY, BX) remapped cell means
    """
    h0 = h0_ref[:]
    h1 = h1_ref[:]
    nz1 = h1.shape[0]
    # cumsum has no pallas-TPU lowering: unrolled running sum (nz0 is a
    # trace-time constant)
    tops = []
    z = jnp.zeros_like(h0[0])
    for k in range(h0.shape[0]):
        tops.append(z)
        z = z + h0[k]
    z0_top = jnp.stack(tops)                         # top interface of k
    col = z
    ih0 = 1.0 / jnp.maximum(h0, _EPS)
    coef = coef_ref[:]                               # resident in VMEM

    def integral_at(z):
        """I(z) for all fields: (nf, BY, BX); z: (BY, BX)."""
        xi = jnp.clip((z[None] - z0_top) * ih0, 0.0, 1.0)   # (nz0,BY,BX)
        acc = coef[:, npoly - 1]                     # (nf, nz0, BY, BX)
        for p in range(npoly - 2, -1, -1):
            acc = coef[:, p] + xi[None] * acc
        poly = xi[None] * acc
        return jnp.sum(h0[None] * poly, axis=1)      # (nf, BY, BX)

    # march down the target interfaces, carrying I at the previous one
    z = jnp.zeros_like(col)
    i_prev = integral_at(z)
    for t in range(nz1):
        z = jnp.minimum(z + h1[t], col)
        i_here = integral_at(z)
        u = (i_here - i_prev) / jnp.maximum(h1[t], _EPS)[None]
        out_ref[:, t] = jnp.clip(u, lo_ref[:], hi_ref[:])
        i_prev = i_here


@functools.partial(jax.jit, static_argnames=("npoly", "interpret"))
def remap_columns_pallas(coef, h0, h1, lo, hi, *, npoly: int,
                         interpret: bool = False):
    """Dispatch the remap kernel over surface tiles.

    coef: (nf, npoly, nz0, ny, nx); h0: (nz0, ny, nx); h1: (nz1, ny, nx);
    lo/hi: (nf, ny, nx).  Returns (nf, nz1, ny, nx).

    ny/nx need not be tile-multiples: partial edge tiles compute on
    padding lanes (all arithmetic is guarded by max(.., eps)) and the
    out-of-range lanes are dropped on the masked write.
    """
    nf, _, nz0, ny, nx = coef.shape
    nz1 = h1.shape[0]
    gy, gx = pl.cdiv(ny, _BY), pl.cdiv(nx, _BX)
    kernel = functools.partial(_remap_kernel, nf=nf, npoly=npoly)
    return pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((nf, npoly, nz0, _BY, _BX),
                         lambda i, j: (0, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nz0, _BY, _BX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nz1, _BY, _BX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, _BY, _BX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, _BY, _BX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nf, nz1, _BY, _BX),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, nz1, ny, nx), coef.dtype),
        interpret=interpret,
    )(coef, h0, h1, lo, hi)
