"""Neutral diffusion tests: conservation, neutrality, variance decay."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.eos import get_eos
from mom6_tpu.tracers.neutral_diffusion import neutral_diffusion
from mom6_tpu.tracers.vert_diff import tracer_vertdiff


def setup(nz=8, nx=16):
    G = build_cartesian_grid(nx, nx, 400.0, 400.0, max_depth=2000.0,
                             cyclic_x=True, reentrant_y=True,
                             dtype=jnp.float32)
    GV = build_layered_vgrid(nz)
    eos = get_eos("LINEAR")
    h = jnp.full((nz, nx, nx), 2000.0 / nz, jnp.float32)
    return G, GV, eos, h


def test_conservation_and_variance_decay():
    G, GV, eos, h = setup()
    rng = np.random.default_rng(0)
    nz, ny, nx = h.shape
    zc = np.cumsum(np.full(nz, 250.0)) - 125.0
    T = jnp.asarray(np.broadcast_to((15.0 - 0.004 * zc)[:, None, None],
                                    h.shape), jnp.float32)
    S = jnp.full(h.shape, 35.0, jnp.float32)
    tr = jnp.asarray(rng.standard_normal((2,) + h.shape), jnp.float32)
    tr2, kd = neutral_diffusion(tr, h, T, S, G, GV, eos, 500.0, 3600.0)
    tr3 = tracer_vertdiff(tr2, h, kd, 3600.0)
    area = np.asarray(G.areaT, np.float64)
    m0 = (np.asarray(tr, np.float64) * np.asarray(h, np.float64)[None]
          * area).sum(axis=(1, 2, 3))
    m1 = (np.asarray(tr3, np.float64) * np.asarray(h, np.float64)[None]
          * area).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(m1, m0, rtol=1e-5)
    assert float(jnp.var(tr3)) < float(jnp.var(tr))


def test_neutrality_density_aligned_tracer():
    """A tracer that is a linear function of the (linear-EOS) density
    should feel (nearly) no neutral flux even with tilted isopycnals."""
    G, GV, eos, h = setup()
    nz, ny, nx = h.shape
    zc = (np.cumsum(np.full(nz, 250.0)) - 125.0)[:, None, None]
    x = np.arange(nx)[None, None, :]
    # temperature varies with depth AND (periodically) with x: tilted
    # isopycnals without a wrap seam
    T0 = 15.0 - 0.004 * zc + 0.3 * np.sin(2 * np.pi * x / nx)
    T = jnp.asarray(np.broadcast_to(T0, h.shape), jnp.float32)
    S = jnp.full(h.shape, 35.0, jnp.float32)
    # tracer = alpha*T => contours align with isopycnals (S uniform)
    tr = jnp.asarray(2.0 * np.asarray(T) + 1.0, jnp.float32)[None]
    tr2, kd = neutral_diffusion(tr, h, T, S, G, GV, eos, 1000.0, 3600.0)
    # compare against PURELY horizontal diffusion of the same tracer
    tr_h, _ = neutral_diffusion(tr, h, T, jnp.full_like(S, 35.0), G, GV,
                                eos, 1000.0, 3600.0, slope_max=0.0)
    dN = np.abs(np.asarray(tr2 - tr))[0]
    dH = np.abs(np.asarray(tr_h - tr))[0]
    # interior layers: exact neutrality (the rotated flux vanishes)
    assert dN[2:-2].max() <= 1e-6 * max(dH.max(), 1e-30)
    # overall (incl. surface/bottom where tapering is conventional):
    # still much less than plain horizontal diffusion
    assert dN.max() < 0.5 * dH.max()


def test_uniform_tracer_unchanged():
    G, GV, eos, h = setup()
    zc = np.cumsum(np.full(8, 250.0)) - 125.0
    T = jnp.asarray(np.broadcast_to((15.0 - 0.004 * zc)[:, None, None],
                                    h.shape), jnp.float32)
    S = jnp.full(h.shape, 35.0, jnp.float32)
    tr = jnp.full((1,) + h.shape, 7.0, jnp.float32)
    tr2, kd = neutral_diffusion(tr, h, T, S, G, GV, eos, 500.0, 3600.0)
    np.testing.assert_allclose(np.asarray(tr2), 7.0, rtol=1e-5)

def test_boundary_tapering_suppresses_cross_terms():
    """With bld covering the top layers, the cross-term vertical flux and
    kd_redi vanish there; tracers still conserved."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.eos import get_eos
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.tracers.neutral_diffusion import neutral_diffusion

    nz, ny, nx = 8, 6, 6
    G = build_cartesian_grid(nx, ny, 60.0, 60.0, max_depth=800.0)
    GV = build_layered_vgrid(nz)
    h = jnp.full((nz, ny, nx), 100.0, jnp.float32)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    x = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    T = (15.0 - 8.0 * z / 800.0 + 0.5 * x / nx).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    tr = jnp.stack([T])
    eos = get_eos("LINEAR")
    bld = jnp.full((ny, nx), 350.0, jnp.float32)

    out_t, kd_t = neutral_diffusion(tr, h, T, S, G, GV, eos, 500.0, 900.0,
                                    bld=bld)
    out_0, kd_0 = neutral_diffusion(tr, h, T, S, G, GV, eos, 500.0, 900.0)
    # kd_redi ~ 0 in the tapered zone (interfaces above ~350 m)
    assert float(jnp.max(kd_t[1:3])) < 1e-3 * float(jnp.max(kd_0[1:3]) + 1e-30)
    # deep interfaces barely affected
    deep_t = float(jnp.max(kd_t[6]))
    deep_0 = float(jnp.max(kd_0[6]))
    assert deep_t > 0.5 * deep_0
    # conservation intact
    q_t = float(jnp.sum(out_t[0] * h * G.areaT))
    q_in = float(jnp.sum(T * h * G.areaT))
    assert abs(q_t - q_in) / abs(q_in) < 1e-5


def test_neutral_surfaces_no_flux_for_density_tracer():
    """Neutral-surface (matched-position) diffusion: a tracer that is a
    function of density alone is (nearly) unchanged even with strongly
    tilted isopycnals, while a horizontally-varying tracer is mixed, and
    total content is conserved exactly (MOM_neutral_diffusion.F90
    find_neutral_surface_positions behavior)."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.eos import get_eos
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid
    from mom6_tpu.tracers.neutral_diffusion import \
        neutral_diffusion_surfaces
    ny, nx, nz = 4, 8, 8
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=400.0,
                             len_lat_km=200.0, max_depth=1000.0)
    GV = build_layered_vgrid(nz)
    eos = get_eos("LINEAR")
    h = jnp.full((nz, ny, nx), 1000.0 / nz, jnp.float32)
    # temperature surfaces tilt strongly in x: T(k, x)
    x = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    k = jnp.arange(nz, dtype=jnp.float32)[:, None, None]
    T = (20.0 - 1.5 * k - 0.8 * x) * jnp.ones((nz, ny, nx))
    S = jnp.full_like(T, 35.0)
    # tracer1 = linear function of T (hence of density): no neutral flux
    # tracer2 = curved function of x: nonzero flux DIVERGENCE (a linear
    # tracer has zero Laplacian, so curvature is what a diffusion test
    # must supply)
    x2 = (x - nx / 2.0) ** 2
    tr = jnp.stack([2.0 * T + 1.0,
                    jnp.broadcast_to(x2, T.shape).astype(jnp.float32)])
    dt, khtr = 3600.0, 1000.0
    tr_new = neutral_diffusion_surfaces(tr, h, T, S, G, GV, eos, khtr, dt)
    # conservation (volume-weighted totals)
    vol = np.asarray(h, np.float64) * np.asarray(G.areaT, np.float64)
    for i in range(2):
        tot0 = (np.asarray(tr[i], np.float64) * vol).sum()
        tot1 = (np.asarray(tr_new[i], np.float64) * vol).sum()
        np.testing.assert_allclose(tot1, tot0, rtol=5e-6)
    # interior change (away from the top/bottom outcrop layers, where
    # PLM end-cell slope limiting and unmatched density ranges leave the
    # reference-scheme's own reduced accuracy): density tracer ~still,
    # x tracer mixed at the diffusive rate
    ch_rho = float(jnp.abs(tr_new[0] - tr[0])[2:-2, :, 2:-2].max())
    ch_x = float(jnp.abs(tr_new[1] - tr[1])[2:-2, :, 2:-2].max())
    assert ch_x > 50.0 * max(ch_rho, 1e-12), (ch_rho, ch_x)
    # outcrop layers stay bounded (no runaway clamped-position fluxes)
    assert float(jnp.abs(tr_new[0] - tr[0]).max()) < 0.01
