"""HYCOM1 and ADAPTIVE regridding tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.ale.regridding import (AdaptParams, build_adaptive_grid,
                                     build_hycom1_grid, build_rho_grid)
from mom6_tpu.eos import get_eos
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid

NZ, NY, NX = 12, 5, 5
DEPTH = 1200.0


@pytest.fixture(scope="module")
def setup():
    G = build_cartesian_grid(NX, NY, 50.0, 50.0, max_depth=DEPTH)
    GV = build_layered_vgrid(NZ)
    h = jnp.full((NZ, NY, NX), DEPTH / NZ, jnp.float32)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T = (18.0 - 12.0 * z / DEPTH).astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    eos = get_eos("LINEAR")
    return G, GV, h, T, S, eos


def test_hycom_conserves_and_floors(setup):
    """HYCOM1 preserves column sums, and every interface is at least as
    deep as the nominal z* grid (the hybrid rule)."""
    G, GV, h, T, S, eos = setup
    dz = np.full(NZ, DEPTH / NZ)
    rho_t = np.asarray(GV.Rlay)
    h_new = build_hycom1_grid(h, T, S, GV, eos, rho_t, dz)
    col0 = np.asarray(jnp.sum(h, axis=0))
    col1 = np.asarray(jnp.sum(h_new, axis=0))
    assert np.allclose(col0, col1, rtol=1e-6)
    z_new = np.asarray(jnp.cumsum(h_new, axis=0))
    z_nom = np.cumsum(dz)
    for k in range(NZ - 1):
        assert np.all(z_new[k] >= z_nom[k] - 1e-3), k
    assert np.all(np.asarray(h_new) > 0)


def test_hycom_interior_follows_isopycnals():
    """Where the stratification puts isopycnal interfaces DEEPER than the
    nominal z grid, HYCOM follows the isopycnal (same as RHO mode)."""
    G = build_cartesian_grid(NX, NY, 50.0, 50.0, max_depth=DEPTH)
    GV = build_layered_vgrid(NZ)
    h = jnp.full((NZ, NY, NX), DEPTH / NZ, jnp.float32)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    # very weak stratification in the upper half, strong below: the
    # low-density targets live deep
    T = jnp.where(z < 600.0, 18.0, 18.0 - 16.0 * (z - 600.0) / DEPTH)
    T = T.astype(jnp.float32)
    S = jnp.full_like(T, 35.0)
    eos = get_eos("LINEAR")
    # nominal z resolution concentrated near the surface so it doesn't bind
    dz = np.concatenate([np.full(NZ - 1, 10.0),
                         [DEPTH - 10.0 * (NZ - 1)]])
    rho_t = np.asarray(GV.Rlay)
    h_hyc = build_hycom1_grid(h, T, S, GV, eos, rho_t, dz)
    h_rho = build_rho_grid(h, T, S, GV, eos, rho_t)
    z_hyc = np.asarray(jnp.cumsum(h_hyc, axis=0))[:, 2, 2]
    z_rho = np.asarray(jnp.cumsum(h_rho, axis=0))[:, 2, 2]
    z_nom = np.cumsum(dz)
    # interfaces where the isopycnal position is deeper than nominal match
    # the RHO-mode position
    deeper = z_rho[:-1] > z_nom[:-1] + 1.0
    assert deeper.any()
    assert np.allclose(z_hyc[:-1][deeper], z_rho[:-1][deeper], atol=1.0)


def test_adaptive_conserves_and_smooths(setup):
    """ADAPTIVE preserves column sums; with buoyancy attraction, layers
    in the strongly stratified region get thinner than uniform."""
    G, GV, h, T, S, eos = setup
    # strong pycnocline in the middle
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T2 = (18.0 - 10.0 * jax_sigmoid((z - 600.0) / 60.0)).astype(jnp.float32)
    p = AdaptParams(time_ratio=0.5)
    h_new = build_adaptive_grid(h, T2, S, G, GV, eos, p)
    col0 = np.asarray(jnp.sum(h, axis=0))
    col1 = np.asarray(jnp.sum(h_new, axis=0))
    assert np.allclose(col0, col1, rtol=1e-5)
    assert np.all(np.asarray(h_new) > 0)
    # layer containing the pycnocline (~600 m, layer 5/6) thinned
    hcol = np.asarray(h_new)[:, 2, 2]
    assert hcol[5] < DEPTH / NZ or hcol[6] < DEPTH / NZ


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def test_adaptive_uniform_diffusion_is_identity(setup):
    """With zoom and buoyancy attraction off, the background grid
    diffusion of already-equispaced interfaces is the identity."""
    G, GV, h, T, S, eos = setup
    p = AdaptParams(time_ratio=0.5, zoom_coeff=0.0, buoy_coeff=0.0)
    h_new = build_adaptive_grid(h, T, S, G, GV, eos, p)
    dev = np.abs(np.asarray(h_new) - DEPTH / NZ).max()
    assert dev < 1e-2 * DEPTH / NZ, dev


def test_adaptive_zoom_refines_surface(setup):
    """The near-surface zooming term concentrates resolution above the
    zoom depth: the top layer gets thinner than uniform."""
    G, GV, h, T, S, eos = setup
    p = AdaptParams(time_ratio=0.3, zoom_coeff=1.0, buoy_coeff=0.0,
                    zoom_depth=200.0)
    h_new = np.asarray(build_adaptive_grid(h, T, S, G, GV, eos, p))
    assert h_new[0, 2, 2] < DEPTH / NZ
    # monotone growth with depth under pure zooming
    assert h_new[0, 2, 2] < h_new[NZ - 1, 2, 2]
    assert np.all(h_new > 0)


def test_adaptive_via_ale_driver(setup):
    """ADAPTIVE mode through ale_regrid_remap keeps T/S conserved."""
    from mom6_tpu.ale.ale import ADAPTIVE, ALEParams, ale_regrid_remap
    from mom6_tpu.core.state import OceanState
    G, GV, h, T, S, eos = setup
    st = OceanState(h=h, u=jnp.zeros_like(h), v=jnp.zeros_like(h),
                    T=T, S=S)
    p = ALEParams(mode=ADAPTIVE, eos_name="LINEAR")
    st2, _ = ale_regrid_remap(st, G, GV, p)
    q0 = np.asarray(jnp.sum(st.h * st.T, axis=0))
    q1 = np.asarray(jnp.sum(st2.h * st2.T, axis=0))
    assert np.allclose(q0, q1, rtol=1e-4)


def test_hycom_via_config_driver(tmp_path):
    """REGRIDDING_COORDINATE_MODE=HYCOM1 builds and steps."""
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    cfg = tmp_path / "MOM_input"
    cfg.write_text("""
NIGLOBAL = 8
NJGLOBAL = 8
NK = 6
LENLON = 500.0
LENLAT = 500.0
MAXIMUM_DEPTH = 1000.0
DT = 900.0
ENABLE_THERMODYNAMICS = True
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = HYCOM1
""")
    import jax

    from mom6_tpu.core.mom import step_mom
    pf = ParamFile([str(cfg)])
    ms = build_model_from_params(pf)
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid, ms.vgrid,
                                      ms.params))
    out = step(ms.state)
    assert np.all(np.isfinite(np.asarray(out.h)))
    assert np.all(np.asarray(out.h) > 0)


def test_hybgen_relaxes_toward_isopycnal(setup):
    """HYBGEN moves a fraction qhybrlx of the way toward the RHO-mode
    interfaces per call and converges to them under iteration (where the
    minimum-z profile doesn't bind)."""
    from mom6_tpu.ale.regridding import build_hybgen_grid
    G, GV, h, T, S, eos = setup
    rho_t = np.asarray(GV.Rlay)
    dz0 = np.full(NZ, 1.0)                 # tiny floor: isopycnal wins
    h_rho = build_rho_grid(h, T, S, GV, eos, rho_t)
    z_rho = np.asarray(jnp.cumsum(h_rho, axis=0))
    h1 = build_hybgen_grid(h, T, S, GV, eos, rho_t, dz0, qhybrlx=0.5)
    z0 = np.asarray(jnp.cumsum(h, axis=0))
    z1 = np.asarray(jnp.cumsum(h1, axis=0))
    # half-way move on interior interfaces with real targets
    mid = NZ // 2
    expect = z0[mid] + 0.5 * (z_rho[mid] - z0[mid])
    np.testing.assert_allclose(z1[mid], expect, atol=2.0)
    # iterate to convergence
    hk = h
    for _ in range(20):
        hk = build_hybgen_grid(hk, T, S, GV, eos, rho_t, dz0, qhybrlx=0.5)
    zk = np.asarray(jnp.cumsum(hk, axis=0))
    # T/S are on the ORIGINAL grid here, so the fixed point tracks the
    # rho positions computed from (h, T, S)... verify column sums and
    # monotonicity instead of exact equality
    assert np.allclose(zk[-1], z0[-1], rtol=1e-5)
    assert np.all(np.diff(zk, axis=0) > -1e-3)


def test_hybgen_min_dz_profile_binds(setup):
    """A thick minimum-dz profile forces z-like layers near the surface."""
    from mom6_tpu.ale.regridding import build_hybgen_grid
    G, GV, h, T, S, eos = setup
    rho_t = np.asarray(GV.Rlay)
    dz0 = np.full(NZ, DEPTH / NZ)          # full-depth z profile
    h1 = np.asarray(build_hybgen_grid(h, T, S, GV, eos, rho_t, dz0,
                                      qhybrlx=1.0))
    # every layer at least its dz0 (where the column allows)
    assert h1[0].min() >= DEPTH / NZ - 1.0


def test_hybgen_unmix_restores_targets_conservatively():
    """Unmixing pulls off-target isopycnal-layer densities back toward
    Rlay while conserving column heat and salt exactly
    (MOM_hybgen_unmix.F90 role)."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.ale.regridding import hybgen_unmix
    from mom6_tpu.eos import get_eos
    from mom6_tpu.grid.vertical import build_layered_vgrid
    nz = 6
    GV = build_layered_vgrid(nz)
    eos = get_eos("LINEAR")
    h = jnp.full((nz, 1, 1), 200.0, jnp.float32)
    # construct targets = densities of a clean profile, then perturb the
    # T of interior layers (the remap-mixing error to be undone)
    T_clean = jnp.asarray(np.linspace(18.0, 4.0, nz),
                          jnp.float32)[:, None, None]
    S = jnp.full_like(T_clean, 35.0)
    p_ref = 2e7
    rho_t = GV.rho0 + eos.density(T_clean[:, 0, 0],
                                  S[:, 0, 0],
                                  jnp.full((nz,), p_ref),
                                  rho_ref=GV.rho0)
    T_pert = T_clean.at[3].add(0.8)     # layer 3 too light
    T1, S1 = hybgen_unmix(T_pert, S, h, GV, eos, rho_t, k_fixed=2)
    # column heat conserved exactly
    np.testing.assert_allclose(float(jnp.sum(T1 * h)),
                               float(jnp.sum(T_pert * h)), rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(S1 * h)),
                               float(jnp.sum(S * h)), rtol=1e-7)
    # layer 3's density moved toward its target
    def rho(Tk):
        return float(GV.rho0 + eos.density(Tk, 35.0, p_ref,
                                           rho_ref=GV.rho0))
    d0 = abs(rho(float(T_pert[3, 0, 0])) - float(rho_t[3]))
    d1 = abs(rho(float(T1[3, 0, 0])) - float(rho_t[3]))
    assert d1 < d0
