"""Parity gates for the Pallas continuity kernels.

The kernels (core/pallas_continuity.py) execute the SAME
``_pass_core``/``_ppm_edges`` math as the XLA path, with block-local
shifts replacing global rolls.  These tests force the kernel path
(MOM6_TPU_CONTINUITY=pallas; interpret mode off-TPU) and pin its output
against the XLA path on every topology the shift closures must get
right: solid walls, a reentrant-x channel with y wrap, and the tripolar
northern fold (whose j+1 ghost rows cross x-tile boundaries and are fed
to the kernel as precomputed slab inputs).  Matched (Newton
flux-adjust), monotonic, simple_2nd, and visc_rem variants included.
Reference: src/core/MOM_continuity_PPM.F90 (the physics being equal on
both paths is what makes this a schedule-only optimization).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from mom6_tpu.core.continuity_ppm import (continuity_ppm,  # noqa: E402
                                          meridional_mass_flux,
                                          zonal_mass_flux)
from mom6_tpu.grid.grid import build_cartesian_grid  # noqa: E402
from mom6_tpu.grid.vertical import build_layered_vgrid  # noqa: E402

NZ, NY, NX = 3, 16, 24


def _rand_state(G, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    ny, nx = G.ny, G.nx
    depth = np.asarray(G.bathyT)
    h = np.maximum(depth[None] / NZ
                   + 30.0 * rng.randn(NZ, ny, nx), 1e-10)
    # a few near-massless layers over "topography"
    h[-1, : ny // 4] = 1e-10
    u = 0.3 * rng.randn(NZ, ny, nx)
    v = 0.3 * rng.randn(NZ, ny, nx)
    m = np.asarray(G.mask2dT)
    return (jnp.asarray(h * m[None] + 1e-10 * (1 - m[None]), dtype),
            jnp.asarray(u, dtype), jnp.asarray(v, dtype))


def _grids():
    out = {}
    depth = np.full((NY, NX), 1000.0)
    depth[:2, :] = 0.0
    depth[:, :2] = 0.0                       # walls + a land strip
    out["walls"] = build_cartesian_grid(NX, NY, 2400.0, 1600.0,
                                        depth=depth, f0=1e-4)
    out["torus"] = build_cartesian_grid(NX, NY, 2400.0, 1600.0,
                                        max_depth=1000.0, f0=1e-4,
                                        cyclic_x=True, reentrant_y=True)
    from make_global_grid import make_tripolar_supergrid
    from mom6_tpu.grid.mosaic import build_grid_from_supergrid
    sg = make_tripolar_supergrid(NX, 10, 6, lat_s=30.0,
                                 lat_join=65.0, lon_bp=100.0)
    d = np.full((16, NX), 1000.0)
    out["fold"] = build_grid_from_supergrid(sg, d, cyclic_x=True,
                                            fold_north=True)
    return out


def _both(fn):
    """Run ``fn`` under the XLA and the forced-Pallas (interpret) paths."""
    old = os.environ.get("MOM6_TPU_CONTINUITY")
    try:
        os.environ["MOM6_TPU_CONTINUITY"] = "xla"
        a = fn()
        os.environ["MOM6_TPU_CONTINUITY"] = "pallas"
        b = fn()
    finally:
        if old is None:
            os.environ.pop("MOM6_TPU_CONTINUITY", None)
        else:
            os.environ["MOM6_TPU_CONTINUITY"] = old
    return a, b


def _assert_close(a, b, tol=1e-6):
    for x, y in zip(a, b):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        scale = np.abs(x).max() + 1e-30
        assert np.abs(x - y).max() <= tol * scale, \
            f"max rel diff {np.abs(x - y).max() / scale:.2e}"


@pytest.mark.parametrize("topo", ["walls", "torus", "fold"])
@pytest.mark.parametrize("variant", ["plain", "monotonic", "simple2nd"])
def test_pass_parity(topo, variant):
    grids = _grids()
    if topo not in grids:
        pytest.skip("mosaic builder unavailable")
    G = grids[topo]
    h, u, v = _rand_state(G, seed=1)
    kw = dict(monotonic=variant == "monotonic",
              simple_2nd=variant == "simple2nd")

    (uh_a, _), (uh_b, _) = _both(
        lambda: zonal_mass_flux(u, h, 900.0, G, **kw))
    _assert_close([uh_a], [uh_b])
    (vh_a, _), (vh_b, _) = _both(
        lambda: meridional_mass_flux(v, h, 900.0, G, **kw))
    _assert_close([vh_a], [vh_b])


@pytest.mark.parametrize("topo", ["walls", "torus", "fold"])
def test_matched_newton_parity(topo):
    """The Newton flux-adjust (kernel-evaluated iterates incl. the
    in-kernel u + du*rem) matches the XLA loop."""
    grids = _grids()
    if topo not in grids:
        pytest.skip("mosaic builder unavailable")
    G = grids[topo]
    h, u, v = _rand_state(G, seed=2)
    rng = np.random.RandomState(3)
    rem_u = jnp.asarray(
        np.clip(rng.rand(NZ, G.ny, G.nx), 0.2, 1.0), jnp.float32)
    rem_v = jnp.asarray(
        np.clip(rng.rand(NZ, G.ny, G.nx), 0.2, 1.0), jnp.float32)
    uh0, _ = zonal_mass_flux(u, h, 900.0, G)
    vh0, _ = meridional_mass_flux(v, h, 900.0, G)
    uhbt = jnp.sum(uh0, axis=0) * 1.1
    vhbt = jnp.sum(vh0, axis=0) * 0.9

    a, b = _both(lambda: zonal_mass_flux(
        u, h, 900.0, G, uhbt=uhbt, visc_rem=rem_u, return_cor=True))
    _assert_close(a, b)
    sum_b = np.asarray(jnp.sum(a[0], axis=0))
    mask = np.asarray(G.mask2dCu) > 0.5
    # and the adjustment really matched the target on wet faces
    denom = np.abs(np.asarray(uhbt))[mask] + 1e3
    assert np.median(np.abs(sum_b[mask] - np.asarray(uhbt)[mask])
                     / denom) < 1e-3

    a, b = _both(lambda: meridional_mass_flux(
        v, h, 900.0, G, vhbt=vhbt, visc_rem=rem_v, return_cor=True))
    _assert_close(a, b)


@pytest.mark.parametrize("topo", ["walls", "fold"])
@pytest.mark.parametrize("x_first", [True, False])
def test_full_continuity_parity(topo, x_first):
    grids = _grids()
    if topo not in grids:
        pytest.skip("mosaic builder unavailable")
    G = grids[topo]
    GV = build_layered_vgrid(NZ, gprime_int=0.01)
    h, u, v = _rand_state(G, seed=4)
    a, b = _both(lambda: continuity_ppm(u, v, h, 900.0, G, GV,
                                        x_first=x_first))
    _assert_close(a, b)
    # volume conservation through the kernel path on the closed basin
    if topo == "walls":
        area = np.asarray(G.areaT, np.float64)
        m0 = (np.asarray(h, np.float64) * area).sum()
        m1 = (np.asarray(b[0], np.float64) * area).sum()
        np.testing.assert_allclose(m1, m0, rtol=5e-6)
