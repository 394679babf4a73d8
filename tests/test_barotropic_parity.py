"""Barotropic parity features: reference filter-weight shapes,
the exact set_dtbt stability bound, and Flather OBCs applied inside the
subcycle (reference: MOM_barotropic.F90:1739-1781 weights, :3509
set_dtbt, :3639 apply_velocity_OBCs)."""

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.core.barotropic import (BTParams, _weights, btstep,
                                      dtbt_max_from_state, set_dtbt)
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid


def test_weight_shapes_match_reference_construction():
    """wt_vel is the normalized flat-top window; wt_trans is the
    normalized reverse cumulative sum of it (MOM_barotropic.F90:
    1745-1776 with the post-20190101 normalization)."""
    nstep, nfilter = 12, 3
    wt_trans, wt_vel, _ = _weights(nstep, nfilter, jnp.float64)
    wt_trans = np.asarray(wt_trans); wt_vel = np.asarray(wt_vel)
    n = np.arange(1, nstep + nfilter + 1)
    wt_eta = np.where(np.abs(n - nstep) <= nfilter, 1.0, 0.0)
    np.testing.assert_allclose(wt_vel, wt_eta / wt_eta.sum(), atol=1e-14)
    rev = np.cumsum(wt_eta[::-1])[::-1]
    np.testing.assert_allclose(wt_trans, rev / rev.sum(), atol=1e-14)
    # both normalized; transports weight EVERY substep (the revcumsum is
    # positive from substep 1), velocities only the window
    assert abs(wt_trans.sum() - 1.0) < 1e-12
    assert abs(wt_vel.sum() - 1.0) < 1e-12
    assert wt_trans[0] > 0.0 and wt_vel[0] == 0.0


def _setup(ny=16, nx=16, nz=2, depth=1000.0, f0=0.0):
    G = build_cartesian_grid(ny=ny, nx=nx, len_lon_km=320.0,
                             len_lat_km=320.0, max_depth=depth, f0=f0,
                             beta=0.0)
    GV = build_layered_vgrid(nz)
    h = jnp.full((nz, ny, nx), depth / nz, jnp.float32)
    return G, GV, h


def test_dtbt_max_matches_gravity_wave_cfl():
    """Flat bottom, f=0, pbce=g per layer: the exact bound equals the
    2-D shallow-water CFL  dt = 1/sqrt((1+2*bebt)/2 * gH*(4/dx^2))
    (uniform square grid)."""
    G, GV, h = _setup()
    depth = 1000.0
    g = GV.g_earth
    pbce = jnp.full_like(h, g)
    bebt = 0.2
    got = float(dtbt_max_from_state(h, pbce, G, bebt))
    dx = float(np.asarray(G.dxT)[0, 0])
    # interior cell: 4 faces, each gtot*Dat*Idx/area = g*depth/dx^2
    want = 1.0 / np.sqrt(0.5 * (1 + 2 * bebt) * g * depth * 4.0 / dx**2)
    np.testing.assert_allclose(got, want, rtol=2e-2)
    # deeper water -> faster waves -> smaller dtbt; larger bebt -> smaller
    G2, GV2, h2 = _setup(depth=4000.0)
    got_deep = float(dtbt_max_from_state(h2, jnp.full_like(h2, g), G2, bebt))
    assert got_deep < got
    got_b = float(dtbt_max_from_state(h, pbce, G, 0.5))
    assert got_b < got


def test_dtbt_max_consistent_with_host_estimate():
    """The jittable bound and the host-side set_dtbt estimate agree to
    within their CFL-safety conventions (same scaling)."""
    G, GV, h = _setup(depth=2000.0)
    pbce = jnp.full_like(h, GV.g_earth)
    exact = float(dtbt_max_from_state(h, pbce, G, 0.2))
    nstep, dtbt_est = set_dtbt(G, GV, 2000.0, 1200.0, cfl=1.0)
    # host estimate: dx/(sqrt(2) c); exact: 1/sqrt(0.7*4gH/dx^2)
    assert 0.3 < exact / dtbt_est < 3.0


def _bt_args(G, GV, h, eta0):
    nz, ny, nx = h.shape
    z3 = jnp.zeros((nz, ny, nx), jnp.float32)
    z2 = jnp.zeros((ny, nx), jnp.float32)
    ones3 = jnp.ones((nz, ny, nx), jnp.float32)
    pbce = jnp.full_like(h, GV.g_earth)
    return dict(u_in=z3, v_in=z3, eta_in=eta0, bc_accel_u=z3,
                bc_accel_v=z3, h=h, uh_in=z3, vh_in=z3,
                visc_rem_u=ones3, visc_rem_v=ones3, pbce=pbce,
                eta_PF=z2, dt=600.0, G=G, GV=GV)


def test_obc_in_subcycle_radiates_eta_bump():
    """A free-surface bump in a basin with Flather east/west boundaries
    must lose eta variance through the open boundaries within one
    barotropic cycle, while the closed basin conserves it (the
    apply_velocity_OBCs-inside-btstep behavior, :3639)."""
    from mom6_tpu.core.open_boundary import OBCSegment, build_obc
    ny, nx, depth = 16, 16, 1000.0
    # small domain + long cycle so the gravity wave (c ~ 99 m/s) crosses
    # to the boundaries within the one barotropic cycle integrated here
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=100.0,
                             len_lat_km=100.0, max_depth=depth, f0=0.0,
                             beta=0.0)
    GV = build_layered_vgrid(2)
    h = jnp.full((2, ny, nx), depth / 2, jnp.float32)
    x = np.arange(nx) - nx / 2.0
    y = np.arange(ny)[:, None] - ny / 2.0
    eta0 = jnp.asarray(0.5 * np.exp(-(x**2 + y**2) / 8.0), jnp.float32)
    obc = build_obc([OBCSegment(edge="E"), OBCSegment(edge="W")],
                    ny, nx)
    params = BTParams(nstep=150, nfilter=30, bebt=0.2)
    args = _bt_args(G, GV, h, eta0)
    args["dt"] = 1800.0
    out_open = btstep(params=params, obc=obc, **args)
    out_closed = btstep(params=params, obc=None, **args)
    var0 = float(jnp.sum(eta0 ** 2))
    v_open = float(jnp.sum(out_open.eta_out ** 2))
    v_closed = float(jnp.sum(out_closed.eta_out ** 2))
    assert np.isfinite(v_open)
    # open boundaries radiate: variance decays well below the closed run
    assert v_open < 0.7 * v_closed
    assert v_open < 0.7 * var0


def test_solo_dynamic_dtbt_reset(tmp_path):
    """DTBT_RESET_PERIOD=0 re-evaluates the barotropic substep count
    every segment from the current stratification (set_dtbt per cycle,
    MOM_dynamics_split_RK2.F90:661)."""
    import os
    from mom6_tpu.drivers import solo
    cfg = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 3
LENLON = 500.0
LENLAT = 500.0
MAXIMUM_DEPTH = 1000.0
TOPO_CONFIG = flat
F_0 = 1.0e-4
DT = 600.0
ENABLE_THERMODYNAMICS = True
EQN_OF_STATE = WRIGHT
T_REF = 10.0
DTBT_RESET_PERIOD = 0.0
DAYMAX = 0.25
"""
    rd = tmp_path / "run"
    rd.mkdir()
    (rd / "MOM_input").write_text(cfg)
    solo.main([str(rd)])
    assert os.path.exists(rd / "ocean.stats")
    lines = (rd / "ocean.stats").read_text().strip().splitlines()
    assert len(lines) > 1


def test_gl90_redistributes_momentum():
    """GL90 interfacial viscosity mixes a sheared column toward its
    vertical mean (stress-free top/bottom: the thickness-weighted mean
    is conserved), and vanishes where f=0 (nu = kappa f^2/N^2)."""
    from mom6_tpu.physics.vertical.vert_friction import (gl90_coupling,
                                                         vertvisc,
                                                         vertvisc_coef)
    nz, ny, nx = 4, 4, 4
    h = jnp.full((nz, ny, nx), 100.0, jnp.float32)
    u = jnp.broadcast_to(
        jnp.asarray([0.4, 0.2, -0.1, -0.3], jnp.float32)[:, None, None],
        (nz, ny, nx))
    f2 = jnp.full((ny, nx), (1e-4) ** 2, jnp.float32)
    gp = jnp.asarray([9.8, 0.01, 0.01, 0.01], jnp.float32)
    a_gl = gl90_coupling(h, f2, gp, kappa_gl90=1000.0, hbbl_gl90=5.0)
    assert float(jnp.max(a_gl)) > 0.0
    c = vertvisc_coef(h, 0.0, a_gl90=a_gl)
    dt = 3600.0
    u1 = vertvisc(u, h, c, dt)
    # shear strictly reduced, mean conserved
    sh0 = float(jnp.sum((u[1:] - u[:-1]) ** 2))
    sh1 = float(jnp.sum((u1[1:] - u1[:-1]) ** 2))
    assert sh1 < sh0
    np.testing.assert_allclose(float(jnp.mean(u1)), float(jnp.mean(u)),
                               rtol=1e-5)
    # no rotation, no GL90
    a0 = gl90_coupling(h, jnp.zeros((ny, nx)), gp, kappa_gl90=1000.0)
    assert float(jnp.max(jnp.abs(a0))) == 0.0


def test_arakawa_lamb_schemes():
    """AL81/AH90/blend 4-weight structure: on a uniform-q field all
    schemes reduce to f x (flux mean), matching Sadourny energy; AL81
    conserves total KE of the Coriolis term (antisymmetry: the PV flux
    does no net work) and the blend equals AL81 on uniform thickness."""
    from mom6_tpu.core.coriolis_adv import coriolis_adv
    from mom6_tpu.grid.vertical import build_layered_vgrid
    rng = np.random.default_rng(7)
    ny = nx = 12
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=1e-4, beta=0.0)
    GV = build_layered_vgrid(1)
    h = jnp.full((1, ny, nx), 1000.0, jnp.float32)
    u = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32) \
        * G.mask2dCu
    v = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32) \
        * G.mask2dCv
    uh = u * 1000.0 * G.dyCu
    vh = v * 1000.0 * G.dxCv
    outs = {}
    for sch in ("SADOURNY75_ENERGY", "ARAKAWA_HSU90", "ARAKAWA_LAMB81",
                "ARAKAWA_LAMB_BLEND", "SADOURNY75_ENSTRO"):
        cau, cav = coriolis_adv(u, v, h, uh, vh, G, GV, scheme=sch)
        assert np.isfinite(np.asarray(cau)).all(), sch
        outs[sch] = (np.asarray(cau), np.asarray(cav))
    # uniform h: the blend takes AL_wt=1 everywhere -> identical to AL81
    np.testing.assert_allclose(outs["ARAKAWA_LAMB_BLEND"][0],
                               outs["ARAKAWA_LAMB81"][0], atol=1e-10)
    # all schemes agree to leading order on smooth fields (same operator
    # up to discretization): correlation > 0.99 on the interior
    ref = outs["SADOURNY75_ENERGY"][0][0, 2:-2, 2:-2].ravel()
    for sch in ("ARAKAWA_HSU90", "ARAKAWA_LAMB81"):
        o = outs[sch][0][0, 2:-2, 2:-2].ravel()
        cc = np.corrcoef(ref, o)[0, 1]
        assert cc > 0.99, (sch, cc)
    # energy conservation of the PV-flux term (Coriolis does no work):
    # sum(uh*CAu_pv + vh*CAv_pv) ~ 0 for the energy-conserving schemes.
    # Use zero velocity in KE so the KE-gradient part drops out.
    z = jnp.zeros_like(u)
    for sch in ("SADOURNY75_ENERGY", "ARAKAWA_LAMB81"):
        cau, cav = coriolis_adv(z, z, h, uh, vh, G, GV, scheme=sch)
        # relative vorticity of z is 0 -> q = f/h_q; work integral:
        work = float(jnp.sum(uh * cau * G.dxCu) +
                     jnp.sum(vh * cav * G.dyCv))
        scale = float(jnp.sum(jnp.abs(uh * cau * G.dxCu)) +
                      jnp.sum(jnp.abs(vh * cav * G.dyCv)))
        assert abs(work) < 1e-5 * scale, (sch, work, scale)


def test_dynamic_psurf_damps_under_rigid_ice():
    """DYNAMIC_SURFACE_PRESSURE with a coupler rigidity map: the viscous
    under-ice pressure damps the external mode's sloshing (eta variance
    after one cycle well below the ice-free run), stays stable (the
    dyn_coef_max cap), and a zero-rigidity map reproduces the ice-free
    answer exactly (MOM_barotropic.F90:1590-1632, 3153-3207)."""
    ny, nx, depth = 16, 16, 1000.0
    G = build_cartesian_grid(nx=nx, ny=ny, len_lon_km=100.0,
                             len_lat_km=100.0, max_depth=depth, f0=0.0,
                             beta=0.0)
    GV = build_layered_vgrid(2)
    h = jnp.full((2, ny, nx), depth / 2, jnp.float32)
    x = np.arange(nx) - nx / 2.0
    y = np.arange(ny)[:, None] - ny / 2.0
    eta0 = jnp.asarray(0.5 * np.exp(-(x**2 + y**2) / 8.0), jnp.float32)
    params = BTParams(nstep=150, nfilter=30, bebt=0.2,
                      dynamic_psurf=True)
    args = _bt_args(G, GV, h, eta0)
    args["dt"] = 1800.0
    out_free = btstep(params=params, rigidity_ice=None, **args)
    out_zero = btstep(params=params,
                      rigidity_ice=jnp.zeros((ny, nx), jnp.float32),
                      **args)
    out_soft = btstep(params=params,
                      rigidity_ice=jnp.full((ny, nx), 1.0e9,
                                            jnp.float32), **args)
    out_ice = btstep(params=params,
                     rigidity_ice=jnp.full((ny, nx), 1.0e11,
                                           jnp.float32), **args)
    np.testing.assert_array_equal(np.asarray(out_zero.eta_out),
                                  np.asarray(out_free.eta_out))
    # the rigid lid damps the bump's collapse: the solution stays finite
    # (the dyn_coef_max stability cap) and the filtered velocities are
    # far weaker than ice-free, monotonically in the rigidity
    assert np.isfinite(np.asarray(out_ice.eta_out)).all()
    ke_free = float(jnp.sum(out_free.ubt_av**2 + out_free.vbt_av**2))
    ke_soft = float(jnp.sum(out_soft.ubt_av**2 + out_soft.vbt_av**2))
    ke_ice = float(jnp.sum(out_ice.ubt_av**2 + out_ice.vbt_av**2))
    assert ke_ice < ke_soft < ke_free
    assert ke_ice < 0.1 * ke_free
