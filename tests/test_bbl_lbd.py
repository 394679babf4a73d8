"""set_viscosity (BBL) and lateral boundary diffusion tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.physics.vertical.set_viscosity import (SetViscParams,
                                                     set_viscous_bbl)
from mom6_tpu.tracers.hor_bnd_diffusion import hor_bnd_diffusion

NZ, NY, NX = 8, 6, 10
DEPTH = 400.0


@pytest.fixture(scope="module")
def setup():
    G = build_cartesian_grid(NX, NY, 100.0, 60.0, max_depth=DEPTH,
                             f0=1e-4)
    h = jnp.full((NZ, NY, NX), DEPTH / NZ, jnp.float32)
    return G, h


def test_bbl_scales_with_bottom_speed(setup):
    G, h = setup
    p = SetViscParams()
    kvs = []
    for u0 in (0.05, 0.2):
        u = jnp.full((NZ, NY, NX), u0, jnp.float32) * G.mask2dCu
        v = jnp.zeros_like(u)
        kv_u, _, th_u, _ = set_viscous_bbl(u, v, h, G, p)
        kvs.append(float(kv_u[2, 4]))
        assert float(th_u[2, 4]) >= p.bbl_thick_min
        assert float(th_u[2, 4]) <= p.hbbl + 1e-6
    assert kvs[1] > 2.0 * kvs[0]            # kv ~ cdrag*u^2-ish growth


def test_bbl_rotation_limits_thickness(setup):
    """Stronger rotation -> thinner BBL (Ekman limiting)."""
    h = jnp.full((NZ, NY, NX), DEPTH / NZ, jnp.float32)
    ths = []
    for f0 in (1e-5, 3e-4):
        G = build_cartesian_grid(NX, NY, 100.0, 60.0, max_depth=DEPTH,
                                 f0=f0)
        u = jnp.full((NZ, NY, NX), 0.02, jnp.float32) * G.mask2dCu
        v = jnp.zeros_like(u)
        _, _, th_u, _ = set_viscous_bbl(u, v, h, G, SetViscParams())
        ths.append(float(th_u[2, 4]))
    assert ths[1] < ths[0]


def test_lbd_conserves_and_mixes_only_bl(setup):
    G, h = setup
    bld = jnp.full((NY, NX), 150.0, jnp.float32)   # top 3 layers
    x = jnp.arange(NX, dtype=jnp.float32)[None, None, :]
    tr = jnp.broadcast_to(10.0 + x / NX, (NZ, NY, NX)).astype(jnp.float32)
    trs = jnp.stack([tr])
    out = hor_bnd_diffusion(trs, h, bld, 500.0, 3600.0, G)
    # conservation
    q0 = float(jnp.sum(tr * h * G.areaT))
    q1 = float(jnp.sum(out[0] * h * G.areaT))
    assert abs(q1 - q0) / abs(q0) < 1e-6
    # the gradient within the BL was reduced; below the BL untouched
    d0 = np.asarray(tr)[:, 3, :]
    d1 = np.asarray(out[0])[:, 3, :]
    grad0 = np.abs(np.diff(d0[0])).mean()
    grad1 = np.abs(np.diff(d1[0])).mean()
    assert grad1 < grad0
    np.testing.assert_allclose(d1[5], d0[5], atol=1e-7)   # deep layer


def test_lbd_zero_kh_identity(setup):
    G, h = setup
    bld = jnp.full((NY, NX), 100.0, jnp.float32)
    tr = jnp.stack([jnp.ones((NZ, NY, NX), jnp.float32) * 3.0])
    out = hor_bnd_diffusion(tr, h, bld, 0.0, 3600.0, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tr))


def test_regularize_layers_smooths_and_conserves(setup):
    from mom6_tpu.physics.vertical.regularize_layers import \
        regularize_layers
    G, h0 = setup
    # one column with a much deeper interface 3 (jagged surface layer)
    h = np.asarray(h0).copy()
    h[0, 3, 5] += 120.0
    h[1, 3, 5] = np.maximum(h[1, 3, 5] - 120.0, 1.0)
    h = jnp.asarray(h)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T = (15.0 - 10.0 * z / DEPTH).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    h1, T1, S1 = regularize_layers(h, T, S, G)
    # interface 1 at the jagged column moved back toward the neighbors
    z0 = float(jnp.cumsum(h, axis=0)[0, 3, 5])
    z1 = float(jnp.cumsum(h1, axis=0)[0, 3, 5])
    assert z1 < z0
    # conservation of volume, heat and salt per column
    np.testing.assert_allclose(np.asarray(jnp.sum(h1, 0)),
                               np.asarray(jnp.sum(h, 0)), rtol=1e-6)
    q0 = float(jnp.sum(h * T)); q1 = float(jnp.sum(h1 * T1))
    assert abs(q1 - q0) / abs(q0) < 1e-5
    assert np.all(np.asarray(h1) > 0)


def test_diapyc_energy_req_positive_and_scales(setup):
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.eos import get_eos
    from mom6_tpu.physics.vertical.regularize_layers import \
        diapyc_energy_req
    G, h = setup
    GV = build_layered_vgrid(NZ)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T = (15.0 - 10.0 * z / DEPTH).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    eos = get_eos("LINEAR")
    kd = jnp.full((NZ + 1, NY, NX), 1e-4, jnp.float32)
    e1 = np.asarray(diapyc_energy_req(h, T, S, kd, G, GV, eos))
    e2 = np.asarray(diapyc_energy_req(h, T, S, 2 * kd, G, GV, eos))
    assert (e1 > 0).all()
    np.testing.assert_allclose(e2, 2 * e1, rtol=1e-5)
