"""Field checksums for debugging and regression fingerprints.

Re-implements MOM6's chksum machinery (reference:
src/framework/MOM_checksums.F90:20-23,110): a layout-invariant bitcount
checksum (population count of the IEEE bit pattern, summed mod 1e9) plus
min/mean/max statistics.  These are the per-field entries of the
``chksum_diag`` regression fingerprint (SURVEY.md §4).

Host-side numpy: checksums are a debugging/CI feature, not a hot path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["bitcount_checksum", "chksum_stats", "chksum_line"]

_MOD = 1_000_000_000


def bitcount_checksum(x) -> int:
    """Sum of per-element popcounts of the raw bit pattern, mod 1e9.

    Invariant to array layout/partitioning (it is a sum of per-element
    integers), like MOM6's ``subchk``/bitcount (MOM_checksums.F90:110).
    """
    a = np.asarray(x)
    if a.dtype == np.float64:
        bits = a.view(np.uint64)
    elif a.dtype == np.float32:
        bits = a.view(np.uint32).astype(np.uint64)
    else:
        bits = np.asarray(a, dtype=np.float64).view(np.uint64)
    # vectorized popcount via uint8 view + lookup
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)
    counts = table[bits.view(np.uint8)]
    return int(counts.sum() % _MOD)


def chksum_stats(x, mask=None) -> Dict[str, float]:
    a = np.asarray(x, dtype=np.float64)
    if mask is not None:
        m = np.asarray(mask, dtype=bool)
        m = np.broadcast_to(m, a.shape)
        vals = a[m]
    else:
        vals = a.ravel()
    if vals.size == 0:
        return {"chksum": 0, "min": 0.0, "max": 0.0, "mean": 0.0}
    return {
        "chksum": bitcount_checksum(vals),
        "min": float(vals.min()),
        "max": float(vals.max()),
        "mean": float(vals.mean()),
    }


def chksum_line(name: str, x, mask=None) -> str:
    """One formatted line of a chksum_diag-style fingerprint file."""
    s = chksum_stats(x, mask)
    return (f"{name:>24s}: chksum={s['chksum']:09d} "
            f"min={s['min']: .17e} max={s['max']: .17e} mean={s['mean']: .17e}")
