"""Lateral friction tests: momentum conservation, energy dissipation,
smoothing, Smagorinsky scaling."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.physics.lateral.hor_visc import (HorViscParams,
                                               horizontal_viscosity)


def setup(nx=16, ny=16):
    return build_cartesian_grid(nx, ny, 100.0, 100.0, max_depth=1000.0,
                                cyclic_x=True, reentrant_y=True,
                                dtype=jnp.float32)


def rand_state(G, seed=0, nz=2):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(0.1 * rng.standard_normal((nz, G.ny, G.nx)), jnp.float32)
    v = jnp.asarray(0.1 * rng.standard_normal((nz, G.ny, G.nx)), jnp.float32)
    h = jnp.asarray(100.0 + 5 * rng.standard_normal((nz, G.ny, G.nx)),
                    jnp.float32)
    return u, v, h


def test_uniform_flow_no_friction():
    G = setup()
    u = jnp.full((1, 16, 16), 0.5, jnp.float32)
    v = jnp.full((1, 16, 16), -0.3, jnp.float32)
    h = jnp.full((1, 16, 16), 100.0, jnp.float32)
    du, dv = horizontal_viscosity(u, v, h, G, HorViscParams(kh=1e3))
    assert float(jnp.max(jnp.abs(du))) < 1e-10
    assert float(jnp.max(jnp.abs(dv))) < 1e-10


def test_laplacian_dissipates_energy():
    G = setup()
    u, v, h = rand_state(G)
    du, dv = horizontal_viscosity(u, v, h, G, HorViscParams(kh=1e3))
    h_u = 0.5 * (h + jnp.roll(h, -1, -1))
    h_v = 0.5 * (h + jnp.roll(h, -1, -2))
    work = float(np.asarray(u * du * h_u, np.float64).sum()
                 + np.asarray(v * dv * h_v, np.float64).sum())
    assert work < 0.0


def test_biharmonic_dissipates_energy():
    G = setup()
    u, v, h = rand_state(G, seed=1)
    du, dv = horizontal_viscosity(u, v, h, G, HorViscParams(ah=1e10))
    h_u = 0.5 * (h + jnp.roll(h, -1, -1))
    h_v = 0.5 * (h + jnp.roll(h, -1, -2))
    work = float(np.asarray(u * du * h_u, np.float64).sum()
                 + np.asarray(v * dv * h_v, np.float64).sum())
    assert work < 0.0


def test_smag_scales_with_shear():
    G = setup()
    u, v, h = rand_state(G, seed=2)
    p = HorViscParams(smag_lap_const=0.15, dt=1000.0)
    du1, _ = horizontal_viscosity(u, v, h, G, p)
    du2, _ = horizontal_viscosity(4.0 * u, 4.0 * v, h, G, p)
    # Smagorinsky stress ~ |S| * S => quadruple velocity -> ~16x accel
    r = float(jnp.max(jnp.abs(du2))) / max(float(jnp.max(jnp.abs(du1))), 1e-30)
    assert 8.0 < r < 32.0


def test_momentum_conservation_uniform_coef_flat_h():
    """With constant coefficient and flat thickness, the stress divergence
    integrates to zero over a periodic domain."""
    G = setup()
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.1 * rng.standard_normal((1, 16, 16)), jnp.float32)
    v = jnp.asarray(0.1 * rng.standard_normal((1, 16, 16)), jnp.float32)
    h = jnp.full((1, 16, 16), 100.0, jnp.float32)
    du, dv = horizontal_viscosity(u, v, h, G, HorViscParams(kh=1e3))
    s = abs(float(np.asarray(du, np.float64).sum()))
    scale = float(np.abs(np.asarray(du, np.float64)).sum()) + 1e-30
    assert s < 1e-4 * scale


def test_leith_dissipates_and_scales_with_vorticity_gradient():
    G = setup()
    u, v, h = rand_state(G, seed=7)
    p = HorViscParams(leith_lap_const=1.0, dt=1000.0)
    du, dv = horizontal_viscosity(u, v, h, G, p)
    h_u = 0.5 * (h + jnp.roll(h, -1, -1))
    h_v = 0.5 * (h + jnp.roll(h, -1, -2))
    work = float(np.asarray(u * du * h_u, np.float64).sum()
                 + np.asarray(v * dv * h_v, np.float64).sum())
    assert work < 0.0                      # dissipative
    du2, _ = horizontal_viscosity(2 * u, 2 * v, h, G, p)
    # Leith coefficient ~ |grad zeta| => accel ~ cubic in velocity
    r = float(jnp.max(jnp.abs(du2))) / max(float(jnp.max(jnp.abs(du))), 1e-30)
    assert 3.9 <= r < 16.0   # bound-clamped cells can cap at quadratic


def test_anisotropic_viscosity_prefers_direction():
    """Kh_aniso with a fixed x-aligned direction damps a pure-tension
    (du/dx) flow more than the same flow rotated into shear; total
    dissipation stays negative (stable)."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.physics.lateral.hor_visc import (HorViscParams,
                                                   horizontal_viscosity)
    ny = nx = 16
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=400.0,
                             len_lat_km=400.0, max_depth=1000.0,
                             cyclic_x=True, reentrant_y=True)
    h = jnp.full((1, ny, nx), 1000.0, jnp.float32)
    x = jnp.arange(nx, dtype=jnp.float32)
    # tension flow: u = sin(x), v = 0  (sh_xx dominant)
    u_t = jnp.broadcast_to(jnp.sin(2 * jnp.pi * x / nx), (1, ny, nx)) \
        * G.mask2dCu
    v_t = jnp.zeros_like(u_t)
    # shear flow: u = sin(y), v = 0  (sh_xy dominant)
    y = jnp.arange(ny, dtype=jnp.float32)[:, None]
    u_s = jnp.broadcast_to(jnp.sin(2 * jnp.pi * y / ny), (1, ny, nx)) \
        * G.mask2dCu
    v_s = jnp.zeros_like(u_s)
    # x-aligned direction: n=(1,0) -> s2t=0, c2t=1: full Kh_aniso acts
    # on tension, none on shear
    p = HorViscParams(kh=0.0, kh_aniso=300.0, aniso_mode=0,
                      aniso_n=(1.0, 0.0), dt=0.0)

    def dissipation(u, v):
        du, dv = horizontal_viscosity(u, v, h, G, p)
        return float(jnp.sum(u * du) + jnp.sum(v * dv))

    d_tension = dissipation(u_t, v_t)
    d_shear = dissipation(u_s, v_s)
    assert d_tension < 0.0                      # damps tension flow
    assert abs(d_shear) < 0.05 * abs(d_tension)  # ~blind to shear flow


def test_qg_leith_bounded_by_relative_gradient():
    """QG Leith's vorticity gradient never exceeds the relative-only
    gradient (the min() cap), so kh_qg <= kh_leith pointwise."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.physics.lateral.hor_visc import (HorViscParams,
                                                   _coefficients, _strains)
    rng = np.random.default_rng(9)
    ny = nx = 16
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=400.0,
                             len_lat_km=400.0, max_depth=1000.0, f0=1e-4,
                             beta=2e-11)
    u = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32)
    sh_xx, sh_xy = _strains(u, v, G)
    kh_l, _ = _coefficients(u, v, sh_xx, sh_xy, G,
                            HorViscParams(leith_lap_const=1.0))
    kh_qg, _ = _coefficients(u, v, sh_xx, sh_xy, G,
                             HorViscParams(leith_lap_const=1.0,
                                           use_qg_leith=True))
    assert (np.asarray(kh_qg) <= np.asarray(kh_l) + 1e-6).all()
