"""EAKF ensemble filter tests."""

import jax.numpy as jnp
import numpy as np

from mom6_tpu.physics.oda_eakf import EAKFParams, eakf_update, gaspari_cohn


def _ensemble(ne=40, n=100, seed=0, spread=1.0, mean=0.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(mean + spread * rng.randn(ne, n), jnp.float32)


def test_scalar_kalman_limit():
    """One observation of one state element: the ensemble mean and
    variance follow the textbook scalar Kalman update."""
    ens = _ensemble(ne=2000, n=1, spread=2.0, mean=1.0)
    yo, r = 5.0, 1.0
    out = eakf_update(ens, jnp.asarray([0]), jnp.asarray([yo]),
                      jnp.asarray([r]))
    s = float(jnp.var(ens[:, 0], ddof=1))
    m = float(jnp.mean(ens[:, 0]))
    s_a = s * r / (s + r)
    m_a = s_a * (m / s + yo / r)
    assert abs(float(jnp.mean(out[:, 0])) - m_a) < 0.02
    assert abs(float(jnp.var(out[:, 0], ddof=1)) - s_a) < 0.05


def test_correlated_element_updated_uncorrelated_not():
    """An unobserved element fully correlated with the observed one gets
    the same increment; an independent element is untouched."""
    rng = np.random.RandomState(1)
    base = rng.randn(500)
    ens = np.stack([base, base.copy(), rng.randn(500)], axis=1)
    ens = jnp.asarray(ens, jnp.float32)
    out = eakf_update(ens, jnp.asarray([0]), jnp.asarray([3.0]),
                      jnp.asarray([0.5]))
    d0 = np.asarray(out[:, 0] - ens[:, 0])
    d1 = np.asarray(out[:, 1] - ens[:, 1])
    d2 = np.asarray(out[:, 2] - ens[:, 2])
    assert np.abs(d0 - d1).max() < 1e-4 * (np.abs(d0).max() + 1e-12)
    assert np.abs(d2).max() < 0.05 * np.abs(d0).max()


def test_localization_cuts_remote_updates():
    ne, n = 100, 50
    rng = np.random.RandomState(2)
    # common signal -> spurious long-range sample correlations
    common = rng.randn(ne, 1)
    ens = jnp.asarray(common + 0.5 * rng.randn(ne, n), jnp.float32)
    coords = jnp.asarray(np.stack([np.arange(n), np.zeros(n)], axis=1),
                         jnp.float32)
    p = EAKFParams(loc_radius=3.0)
    out = eakf_update(ens, jnp.asarray([0]), jnp.asarray([2.0]),
                      jnp.asarray([0.25]), p, coords=coords)
    d = np.abs(np.asarray(out - ens)).mean(axis=0)
    assert d[0] > 10.0 * d[20]       # remote element barely touched
    assert d[40] < 1e-6 * (d[0] + 1e-12)   # beyond 2c: exactly zero


def test_gaspari_cohn_shape():
    c = 5.0
    d = jnp.asarray([0.0, 2.5, 5.0, 7.5, 10.0, 12.0])
    g = np.asarray(gaspari_cohn(d, c))
    assert abs(g[0] - 1.0) < 1e-6
    assert np.all(np.diff(g) <= 1e-6)
    assert g[-1] == 0.0 and g[-2] < 1e-6   # d=2c: zero up to f32


def test_multiple_obs_reduce_spread():
    ens = _ensemble(ne=60, n=30, spread=1.5)
    idx = jnp.asarray([3, 10, 25])
    out = eakf_update(ens, idx, jnp.asarray([0.5, -0.2, 1.0]),
                      jnp.asarray([0.3, 0.3, 0.3]))
    for i in [3, 10, 25]:
        assert float(jnp.var(out[:, i])) < float(jnp.var(ens[:, i]))
    assert np.isfinite(np.asarray(out)).all()
