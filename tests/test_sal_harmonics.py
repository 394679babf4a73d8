"""Spherical-harmonic SAL tests: eigenfunction property, Love scaling."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.grid.grid import build_spherical_grid
from mom6_tpu.physics.lateral.self_attr_load import (build_sal_harmonics,
                                                     calc_sal_harmonic,
                                                     _legendre_norm)

NX, NY = 96, 48


@pytest.fixture(scope="module")
def sphere():
    # near-global grid (poles excluded), cyclic in longitude
    G = build_spherical_grid(NX, NY, 0.0, -85.0, 360.0, 170.0,
                             cyclic_x=True)
    return G


def _ylm(G, n, m, part="cos"):
    lat = np.asarray(G.geoLatT)[:, 0] * np.pi / 180.0
    lon = np.asarray(G.geoLonT)[0, :] * np.pi / 180.0
    P = _legendre_norm(n, np.sin(lat))[n, m]             # (ny,)
    tr = np.cos(m * lon) if part == "cos" else np.sin(m * lon)
    return P[:, None] * tr[None, :]


@pytest.mark.parametrize("n,m", [(2, 0), (3, 2), (5, 5), (8, 3)])
def test_eigenfunction_scaling(sphere, n, m):
    """Y_nm maps to beta_n * Y_nm with beta_n = 3/(2n+1) rhoW/rhoE."""
    G = sphere
    sal = build_sal_harmonics(G, nmax=10)
    eta = jnp.asarray(_ylm(G, n, m), jnp.float32)
    out = np.asarray(calc_sal_harmonic(eta, sal))
    beta = 3.0 / (2.0 * n + 1.0) * 1035.0 / 5517.0
    want = beta * np.asarray(eta)
    scale = np.abs(want).max()
    assert np.abs(out - want).max() < 2e-3 * scale, (n, m)


def test_degrees_0_and_1_excluded(sphere):
    G = sphere
    sal = build_sal_harmonics(G, nmax=6)
    for (n, m) in [(0, 0), (1, 0), (1, 1)]:
        eta = jnp.asarray(_ylm(G, n, m), jnp.float32)
        out = np.asarray(calc_sal_harmonic(eta, sal))
        assert np.abs(out).max() < 1e-3 * (np.abs(np.asarray(eta)).max()
                                           + 1e-30), (n, m)


def test_love_factors_scale_linearly(sphere):
    G = sphere
    love = np.ones(7); love[3] = 0.7
    sal1 = build_sal_harmonics(G, nmax=6)
    sal2 = build_sal_harmonics(G, nmax=6, love_factors=love)
    eta = jnp.asarray(_ylm(G, 3, 1), jnp.float32)
    o1 = np.asarray(calc_sal_harmonic(eta, sal1))
    o2 = np.asarray(calc_sal_harmonic(eta, sal2))
    ratio = o2[np.abs(o1) > 0.1 * np.abs(o1).max()] \
        / o1[np.abs(o1) > 0.1 * np.abs(o1).max()]
    assert np.allclose(ratio, 0.7, atol=0.02)


def test_sal_is_small_and_smooth(sphere):
    """For a random eta the SAL correction is O(beta_2) ~ 10% at most."""
    G = sphere
    sal = build_sal_harmonics(G, nmax=12)
    rng = np.random.RandomState(0)
    eta = jnp.asarray(rng.randn(NY, NX), jnp.float32)
    out = np.asarray(calc_sal_harmonic(eta, sal))
    assert np.abs(out).max() < 0.15 * np.abs(np.asarray(eta)).max()
    assert np.isfinite(out).all()
