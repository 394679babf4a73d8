"""Pallas column-remap kernel vs the portable scan implementation.

The kernel (ale/remap_pallas.py) is the TPU fast path of
remap_columns_multi; these gates run it in interpret mode on CPU so the
fast path stays pinned to the scan semantics without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.ale import remapping as R
from mom6_tpu.ale.remap_pallas import remap_columns_pallas


def _problem(nz0=10, nz1=14, ny=9, nx=17, nf=3, seed=0, vanished=False):
    rng = np.random.RandomState(seed)
    h0 = 20.0 + 10.0 * rng.rand(nz0, ny, nx).astype(np.float32)
    if vanished:
        h0[2] = 1e-10
        h0[7, : ny // 2] = 1e-10
    w = 0.5 + rng.rand(nz1, ny, nx).astype(np.float32)
    h1 = (w / w.sum(0, keepdims=True)
          * h0.sum(0, keepdims=True)).astype(np.float32)
    fields = rng.randn(nf, nz0, ny, nx).astype(np.float32)
    return jnp.asarray(fields), jnp.asarray(h0), jnp.asarray(h1)


def _coef(fields, h0, scheme):
    npoly = 5 if scheme in (R.P3M_H4, R.PQM_IH4IH3) else 3
    scale = (1.0, 0.5, 1.0 / 3.0, 0.25, 0.2)
    recon = [R.reconstruct(fields[i], h0, scheme)
             for i in range(fields.shape[0])]
    coef = jnp.stack([jnp.stack([scale[p] * r[p] for p in range(npoly)])
                      for r in recon])
    return coef, npoly


def _pallas(fields, h0, h1, scheme):
    coef, npoly = _coef(fields, h0, scheme)
    return remap_columns_pallas(coef, h0, h1,
                                jnp.min(fields, 1), jnp.max(fields, 1),
                                npoly=npoly, interpret=True)


def test_matches_scan_ppm():
    fields, h0, h1 = _problem()
    want = R.remap_columns_multi(fields, h0, h1, R.PPM_H4)
    got = _pallas(fields, h0, h1, R.PPM_H4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_matches_scan_pqm_five_coeffs():
    fields, h0, h1 = _problem(seed=3)
    want = R.remap_columns_multi(fields, h0, h1, R.PQM_IH4IH3)
    got = _pallas(fields, h0, h1, R.PQM_IH4IH3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_conserves_and_bounds_with_vanished_layers():
    fields, h0, h1 = _problem(vanished=True, seed=1)
    out = np.asarray(_pallas(fields, h0, h1, R.PLM), np.float64)
    assert np.isfinite(out).all()
    f64, h064, h164 = (np.asarray(a, np.float64)
                       for a in (fields, h0, h1))
    # column totals preserved (the integral form is exactly conservative
    # up to f32 roundoff of the cumulative sums)
    m0 = (f64 * h064[None]).sum(1)
    m1 = (out * h164[None]).sum(1)
    np.testing.assert_allclose(m1, m0, rtol=5e-5, atol=1e-3)
    # outputs bounded by the source column range
    lo = f64.min(1, keepdims=True) - 1e-5
    hi = f64.max(1, keepdims=True) + 1e-5
    assert (out >= lo).all() and (out <= hi).all()


def test_odd_sizes_partial_tiles():
    # ny/nx far from the (8, 128) tile: exercises masked partial tiles
    fields, h0, h1 = _problem(ny=5, nx=13, nf=2, seed=2)
    want = R.remap_columns_multi(fields, h0, h1, R.PPM_H4)
    got = _pallas(fields, h0, h1, R.PPM_H4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
