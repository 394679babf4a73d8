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

__all__ = ["bitcount_checksum", "chksum_stats", "chksum_line",
           "hchksum", "uvchksum", "Bchksum"]

_MOD = 1_000_000_000


def bitcount_checksum(x) -> int:
    """Sum of per-element popcounts of the raw bit pattern, mod 1e9.

    Invariant to array layout/partitioning (it is a sum of per-element
    integers), like MOM6's ``subchk``/bitcount (MOM_checksums.F90:110).
    Native C++ popcount when available, numpy lookup-table otherwise.
    """
    a = np.asarray(x)
    try:
        from mom6_tpu import native
        if native.available() and a.dtype in (np.float32, np.float64):
            return native.bitcount(a)
    except Exception:        # noqa: BLE001
        pass
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


# -- staggered-grid variants (the hchksum/uvchksum/Bchksum interfaces of
# MOM_checksums.F90).  Under GSPMD there are no redundant halo points to
# exclude, so each variant reduces to the same layout-invariant stats on
# its natively-staggered array; the separate entry points keep the
# reference's API surface (and its per-location masks).

def hchksum(x, mesg: str = "", mask=None) -> str:
    """Checksum of an h-point (cell center) field."""
    return chksum_line(mesg or "h-field", x, mask)


def uvchksum(mesg: str, u, v, mask_u=None, mask_v=None) -> str:
    """Paired checksum of a C-grid vector's u and v components
    (uvchksum of MOM_checksums.F90)."""
    return (chksum_line(f"{mesg}[u]", u, mask_u) + "\n"
            + chksum_line(f"{mesg}[v]", v, mask_v))


def Bchksum(x, mesg: str = "", mask=None) -> str:
    """Checksum of a B-grid (corner) field."""
    return chksum_line(mesg or "B-field", x, mask)
