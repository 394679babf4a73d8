"""Pallas TPU kernel for the batched tridiagonal (Thomas) solver.

The column solves (vertical viscosity, diabatic/JHL diffusion, ALE edge
values, wave-speed inverse iteration) are the one place the model's
``lax.scan`` over k produces long chains of small elementwise kernels:
the scan form re-reads the (ny, nx) plane from HBM ~5x per k level.
This kernel runs the whole Thomas recursion inside one Pallas program
per column block, with k as an in-VMEM loop: one HBM read of each
input and one write of the output — speed-of-light for the op.

Layout: the wrapper flattens all batch dims to (nz, M, 128) (lane dim
128, padding M only — <= 1.5% waste for model-sized planes) and picks
the sublane block so ~7 VMEM-resident (nz, BM, 128) buffers stay under
the ~16 MB VMEM budget.  Measured on a v5e (tools/profile_r5.py):
4.07x over the scan at (75, 270, 360); the round-4 (8, 128)-tile
version was DMA/latency-bound at ~1x for nz <= 33.

On non-TPU backends callers fall back to the scan implementation in
framework/solvers.py (which owns the dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve_pallas"]

_LANE = 128
_VMEM_BUDGET = 8 * 1024 * 1024      # bytes; ~half of a v5e's VMEM


def _thomas_kernel(a_ref, b_ref, c_ref, d_ref, x_ref, cp_ref):
    import jax.lax as lax
    nz = a_ref.shape[0]

    inv0 = 1.0 / b_ref[0]
    cp_ref[0] = c_ref[0] * inv0
    x_ref[0] = d_ref[0] * inv0        # x doubles as dp storage

    def fwd(k, _):
        denom = b_ref[k] - a_ref[k] * cp_ref[k - 1]
        inv = 1.0 / denom
        cp_ref[k] = c_ref[k] * inv
        x_ref[k] = (d_ref[k] - a_ref[k] * x_ref[k - 1]) * inv
        return 0

    lax.fori_loop(1, nz, fwd, 0)

    def bwd(i, _):
        k = nz - 2 - i
        x_ref[k] = x_ref[k] - cp_ref[k] * x_ref[k + 1]
        return 0

    lax.fori_loop(0, nz - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("bm",))
def _pallas_call_flat(a, b, c, d, bm):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nz, m, _ = a.shape
    spec = pl.BlockSpec((nz, bm, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(m // bm,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((nz, bm, _LANE), a.dtype)],
    )(a, b, c, d)


def tridiag_solve_pallas(a, b, c, d):
    """Thomas solve along axis 0 on TPU via Pallas.

    Same semantics as framework.solvers.tridiag_solve (a/b/c may
    broadcast against d); any batch shape — trailing dims are flattened
    to the (M, 128) lane layout internally."""
    nz = d.shape[0]
    batch = d.shape[1:]
    ab, bb, cb = (jnp.broadcast_to(x, d.shape) for x in (a, b, c))

    n = 1
    for s in batch:
        n *= s
    m = -(-n // _LANE)                              # ceil
    # sublane block: fit 6 in+out+scratch (nz, BM, 128) f32 buffers in
    # the VMEM budget, multiple of 8
    bm_max = max(8, (_VMEM_BUDGET // (6 * nz * _LANE * 4)) // 8 * 8)
    bm = min(bm_max, -(-m // 8) * 8)
    m_pad = -(-m // bm) * bm
    pad = m_pad * _LANE - n

    def prep(x, diag=False):
        flat = x.reshape(nz, -1)
        # identity rows (b=1, a=c=d=0) keep the padded recursion finite
        flat = jnp.pad(flat, ((0, 0), (0, pad)),
                       constant_values=1.0 if diag else 0.0)
        return flat.reshape(nz, m_pad, _LANE)

    out = _pallas_call_flat(prep(ab), prep(bb, diag=True), prep(cb),
                            prep(d), bm)
    return out.reshape(nz, -1)[:, :n].reshape(d.shape)


def tridiag_solve_opt(a, b, c, d):
    """Back-compat dispatcher: Pallas on TPU, scan elsewhere (the
    production dispatch now lives in framework.solvers.tridiag_solve)."""
    if jax.default_backend() != "tpu" or d.ndim < 2:
        from mom6_tpu.framework.solvers import _tridiag_scan
        return _tridiag_scan(a, b, c, d)
    return tridiag_solve_pallas(a, b, c, d)

