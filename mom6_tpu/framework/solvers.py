"""Batched column solvers.

The vertical dimension is never sharded (SURVEY.md §5.7): every column solve
runs device-local, vectorized over (ny, nx) with the k loop as a
``lax.scan`` — or, on TPU, as one Pallas kernel that keeps the whole
Thomas recursion in VMEM (framework/pallas_tridiag.py; 4x the scan at
OM4 depths).  Used by vertical viscosity, diabatic diffusion, JHL shear
mixing, the ALE edge-value solvers and the wave-speed inverse iteration
(reference: tridiagonal solvers in
src/parameterizations/vertical/MOM_vert_friction.F90:557 and
src/ALE/regrid_solvers.F90).

Dispatch is controlled by MOM6_TPU_TRIDIAG = auto (default: Pallas on
TPU) | scan | pallas; the two paths agree bitwise (the recursions
perform identical operations — gated by tests/test_framework.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve"]


def _tridiag_scan(a, b, c, d):
    """Reference lax.scan Thomas solve (all backends)."""
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        a_k, b_k, c_k, d_k = abcd
        denom = b_k - a_k * cp_prev
        inv = 1.0 / denom
        cp = c_k * inv
        dp = (d_k - a_k * dp_prev) * inv
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cp, dp) = jax.lax.scan(fwd, (zeros, zeros), (a, b, c, d))

    def bwd(x_next, cpdp):
        cp_k, dp_k = cpdp
        x = dp_k - cp_k * x_next
        return x, x

    _, x_rev = jax.lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return x_rev


def _use_pallas() -> bool:
    mode = os.environ.get("MOM6_TPU_TRIDIAG", "auto").lower()
    if mode == "scan":
        return False
    if mode == "pallas":
        return True
    return jax.default_backend() == "tpu"


def tridiag_solve(a, b, c, d):
    """Solve tridiagonal systems along axis 0 (Thomas algorithm).

    ``a`` is the sub-diagonal (a[0] ignored), ``b`` the diagonal, ``c`` the
    super-diagonal (c[-1] ignored), ``d`` the RHS; all shaped (nz, ...)
    (a/b/c may broadcast against d).  Returns x with
    b·x + a·x_{k-1} + c·x_{k+1} = d.
    """
    if d.ndim >= 2 and d.shape[0] > 1 and d.dtype == jnp.float32 \
            and _use_pallas():
        from mom6_tpu.framework.pallas_tridiag import tridiag_solve_pallas
        return tridiag_solve_pallas(a, b, c, d)
    return _tridiag_scan(a, b, c, d)
