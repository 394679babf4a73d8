"""Pallas TPU kernel for the batched tridiagonal (Thomas) solver.

The column solves (vertical viscosity, diabatic diffusion) are the one
place the model's ``lax.scan`` over k produces long chains of small
elementwise ops.  This kernel runs the whole Thomas recursion inside one
Pallas program per (ny, nx) tile, with k as an in-VMEM loop: a single
kernel launch replaces ~2*nz scan steps.

Tiles are (nz, 8, 128) blocks (f32 min tile 8x128); inputs are padded to
tile multiples by the wrapper.  On non-TPU backends the wrapper falls
back to the scan implementation in framework/solvers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mom6_tpu.framework.solvers import tridiag_solve as _tridiag_scan

__all__ = ["tridiag_solve_opt"]

_BY = 8
_BX = 128


def _thomas_kernel(a_ref, b_ref, c_ref, d_ref, x_ref, cp_ref, dp_ref):
    import jax.lax as lax
    nz = a_ref.shape[0]

    inv0 = 1.0 / b_ref[0]
    cp_ref[0] = c_ref[0] * inv0
    dp_ref[0] = d_ref[0] * inv0

    def fwd(k, _):
        denom = b_ref[k] - a_ref[k] * cp_ref[k - 1]
        inv = 1.0 / denom
        cp_ref[k] = c_ref[k] * inv
        dp_ref[k] = (d_ref[k] - a_ref[k] * dp_ref[k - 1]) * inv
        return 0

    lax.fori_loop(1, nz, fwd, 0)

    x_ref[nz - 1] = dp_ref[nz - 1]

    def bwd(i, _):
        k = nz - 2 - i
        x_ref[k] = dp_ref[k] - cp_ref[k] * x_ref[k + 1]
        return 0

    lax.fori_loop(0, nz - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=())
def _pallas_call_padded(a, b, c, d):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nz, ny, nx = a.shape
    grid = (ny // _BY, nx // _BX)
    spec = pl.BlockSpec((nz, _BY, _BX), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((nz, _BY, _BX), a.dtype),
                        pltpu.VMEM((nz, _BY, _BX), a.dtype)],
    )(a, b, c, d)


def tridiag_solve_opt(a, b, c, d):
    """Drop-in tridiag_solve: Pallas kernel on TPU, scan elsewhere.

    Operates along axis 0 of (nz, ny, nx) arrays (coefficients may
    broadcast); same semantics as framework.solvers.tridiag_solve."""
    if jax.default_backend() != "tpu" or d.ndim != 3:
        return _tridiag_scan(a, b, c, d)
    nz, ny, nx = d.shape
    ab, bb, cb = (jnp.broadcast_to(x, d.shape) for x in (a, b, c))
    pad_y = (-ny) % _BY
    pad_x = (-nx) % _BX

    def pad(x, diag=False):
        # pad with identity rows (b=1) so the recursion stays finite
        cfg = ((0, 0), (0, pad_y), (0, pad_x))
        return jnp.pad(x, cfg, constant_values=1.0 if diag else 0.0)

    out = _pallas_call_padded(pad(ab), pad(bb, diag=True), pad(cb), pad(d))
    return out[:, :ny, :nx]