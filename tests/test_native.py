"""Native C++ host-runtime kernels (mom6_tpu/native): bit-identical to
the numpy reference implementations, and the staggered checksum API."""

import numpy as np
import pytest

from mom6_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("no C++ toolchain available")
    return native


def test_repro_sum_matches_numpy_bitwise(lib):
    from mom6_tpu.framework.repro_sum import _BITS, _NLIMB, _TOP_EXP
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1e10, 40000) * 10.0 ** rng.integers(-8, 8, 40000)

    def numpy_efp(x, scale=1.0):
        x = np.asarray(x, np.float64).ravel() * scale
        limbs = np.zeros(_NLIMB, np.int64)
        r = x / (2.0 ** _TOP_EXP)
        for j in range(_NLIMB):
            r = r * (2.0 ** _BITS)
            c = np.floor(r)
            limbs[j] += np.sum(c.astype(np.int64))
            r = r - c
        for j in range(_NLIMB - 1, 0, -1):
            carry = limbs[j] >> _BITS
            limbs[j] -= carry << _BITS
            limbs[j - 1] += carry
        return sum(float(limbs[j]) * 2.0 ** (_TOP_EXP - (j + 1) * _BITS)
                   for j in range(_NLIMB))

    want = numpy_efp(x)
    got = lib.repro_sum(x)
    assert got == want                     # bitwise identical
    # order invariance of the native path itself
    assert lib.repro_sum(x[::-1].copy()) == got
    perm = x[np.random.default_rng(1).permutation(x.size)]
    assert lib.repro_sum(perm) == got


def test_bitcount_matches_numpy(lib):
    rng = np.random.default_rng(2)
    for dtype in (np.float64, np.float32):
        x = rng.normal(0, 1, 10007).astype(dtype)
        from mom6_tpu.framework.checksums import bitcount_checksum
        # numpy reference path (force it by viewing bits directly)
        if dtype == np.float64:
            bits = x.view(np.uint64)
        else:
            bits = x.view(np.uint32).astype(np.uint64)
        table = np.array([bin(i).count("1") for i in range(256)],
                         dtype=np.uint64)
        want = int(table[bits.view(np.uint8)].sum() % 1_000_000_000)
        assert lib.bitcount(x) == want
        assert bitcount_checksum(x) == want


def test_field_stats(lib):
    rng = np.random.default_rng(3)
    x = rng.normal(5, 2, 5000)
    mn, mx, mean, nbad = lib.field_stats(x)
    assert mn == x.min() and mx == x.max() and nbad == 0
    np.testing.assert_allclose(mean, x.mean(), rtol=1e-14)
    x2 = x.copy()
    x2[10] = np.nan
    mn2, mx2, mean2, nbad2 = lib.field_stats(x2)
    assert nbad2 == 1 and np.isfinite(mean2)


def test_staggered_checksum_api():
    from mom6_tpu.framework.checksums import Bchksum, hchksum, uvchksum
    rng = np.random.default_rng(4)
    u = rng.normal(0, 1, (4, 8, 8))
    v = rng.normal(0, 1, (4, 8, 8))
    s = uvchksum("vel", u, v)
    assert "vel[u]" in s and "vel[v]" in s and "chksum=" in s
    assert "chksum=" in hchksum(u, "h")
    assert "chksum=" in Bchksum(u, "q")
