"""Order-invariant (reproducing) global sums.

Re-implements the idea of MOM6's extended-fixed-point (EFP) reproducing sums
(reference: src/framework/MOM_coms.F90:30-70): each real is decomposed into
integer limbs of a wide fixed-point accumulator; integer addition is exactly
associative, so the global sum is bitwise independent of summation order —
and therefore of the device-mesh layout.

Two implementations:

* :func:`reproducing_sum` — host-side numpy, 6 × int64 limbs of 46 bits each
  (the exact MOM6 design point).  Used by the ocean.stats writer, where the
  field is pulled to host anyway at a low cadence.
* :func:`fixed_point_sum` — jit/psum-compatible: decomposes into int32 limbs
  and reduces with integer ``jnp.sum`` (order-invariant on any sharding).
  Useful inside compiled code when layout-invariant reductions are required.
  Element counts per partial sum must keep carries in range; limbs hold
  ``bits``-bit chunks so up to ``2**(31-bits)`` elements per int32 partial
  accumulate safely; we widen via a two-stage tree to cover full grids.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["reproducing_sum", "fixed_point_sum"]

# MOM6 design point: 6 limbs x 2^46 (MOM_coms.F90:30-44)
_NLIMB = 6
_BITS = 46
_TOP_EXP = 3 * _BITS - 63  # largest representable magnitude ~ 2^75


def reproducing_sum(x, scale: float = 1.0) -> float:
    """Exact order-invariant sum of a real array (host-side).

    The result is identical for any permutation/partition of ``x``.
    Uses the native C++ kernel when available (mom6_tpu/native —
    bit-identical, same 6 x 2^46 EFP decomposition, one pass); numpy
    otherwise.
    """
    try:
        from mom6_tpu import native
        if native.available():
            return native.repro_sum(x, scale)
    except Exception:        # noqa: BLE001 — any native failure -> numpy
        pass
    x = np.asarray(x, dtype=np.float64).ravel() * scale
    if x.size == 0:
        return 0.0
    limbs = np.zeros(_NLIMB, dtype=np.int64)
    # decompose each element into 46-bit signed chunks relative to 2^_TOP_EXP
    r = x / (2.0 ** _TOP_EXP)
    for j in range(_NLIMB):
        r = r * (2.0 ** _BITS)
        c = np.floor(r)
        limbs[j] += np.sum(c.astype(np.int64))
        r = r - c
    # carry-propagate from least to most significant
    for j in range(_NLIMB - 1, 0, -1):
        carry = limbs[j] >> _BITS
        limbs[j] -= carry << _BITS
        limbs[j - 1] += carry
    total = 0.0
    for j in range(_NLIMB):
        total += float(limbs[j]) * 2.0 ** (_TOP_EXP - (j + 1) * _BITS)
    return total


def fixed_point_sum(x, max_mag: float, n_limbs: int = 4, bits: int = 14):
    """Order-invariant sum under jit, returning a float of ``x.dtype``.

    ``max_mag`` must statically bound ``max(|x|)``; values beyond it would
    lose high bits.  Works in int32 (no x64 requirement).  The reduction
    is exact to ``n_limbs*bits`` bits below ``max_mag``, which at the default
    (56 bits) exceeds float32 precision.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    top = float(2.0 ** np.ceil(np.log2(max_mag)))
    r = (x / dtype.type(top)).astype(jnp.float32)
    partials = []
    for _ in range(n_limbs):
        r = r * jnp.float32(2.0 ** bits)
        c = jnp.floor(r)
        partials.append(c.astype(jnp.int32))
        r = r - c
    # two-stage integer reduction: per-limb elementwise sums are associative,
    # so each limb's integer total is bitwise layout-invariant.  Collect the
    # exact float32 pieces of every limb total (each piece < 2^24 so the
    # int->float conversion is exact), then combine in a fixed order from the
    # smallest scale upward: the result is bitwise deterministic for any
    # sharding/permutation of ``x`` and accurate to float32 rounding of the
    # exact fixed-point sum (a single float return cannot carry more).
    pieces = []  # exact float32 terms (digit * power-of-two scale)
    for j, limb in enumerate(partials):
        scale = top * 2.0 ** (-(j + 1) * bits)
        for sub_scale, piece in _exact_int_sum_pieces(limb, bits):
            pieces.append(piece * jnp.float32(scale * sub_scale))
    # the terms span widely different scales and cancel (a digit split puts
    # +4095*4096 and -4096^2 next to each other), so plain accumulation
    # loses low bits; Neumaier compensated summation in a FIXED order keeps
    # the result within ~1 ulp of the exact fixed-point sum while staying
    # bitwise deterministic for any sharding/permutation of ``x``.
    total = jnp.zeros((), jnp.float32)
    comp = jnp.zeros((), jnp.float32)
    for v in pieces:
        t = total + v
        comp = comp + jnp.where(jnp.abs(total) >= jnp.abs(v),
                                (total - t) + v, (v - t) + total)
        total = t
    return (total + comp).astype(dtype)


def _exact_int_sum_pieces(limb, bits: int):
    """Sum an int32 array of |values| < 2^bits exactly, avoiding overflow.

    Splits each value into high/low 8-bit parts whose independent int32 sums
    stay in range for grids < 2^23 elements, then splits each integer partial
    sum into 12-bit chunks so every int->float32 conversion is exact.
    Returns [(scale, float32_piece), ...] with sum(scale*piece) == exact sum.
    """
    flat = limb.ravel()
    s_lo = jnp.sum(flat & 0xFF)   # < 2^8  * n, exact int32 for n < 2^23
    s_hi = jnp.sum(flat >> 8)     # < 2^(bits-8) * n
    out = []
    for base, s in ((256.0, s_hi), (1.0, s_lo)):
        # 12-bit base-4096 digits via arithmetic shifts (floor division):
        # s = c0 + 4096*c1 + 4096^2*s2 with c0,c1 in [0,4096) and the top
        # digit signed — exact for negative s too, every piece < 2^24.
        c0 = s - ((s >> 12) << 12)
        s1 = s >> 12
        c1 = s1 - ((s1 >> 12) << 12)
        s2 = s1 >> 12
        out.append((base, c0.astype(jnp.float32)))
        out.append((base * 4096.0, c1.astype(jnp.float32)))
        out.append((base * 4096.0 ** 2, s2.astype(jnp.float32)))
    return out
