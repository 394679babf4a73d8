"""Wide-halo barotropic vs the GSPMD dense path: production parity.

The march-inward shard_map subcycle (core/bt_widehalo.py, the analogue
of the reference's BT_HALO_SIZE widened halos,
src/core/MOM_barotropic.F90:2506-2518,5450) must reproduce the dense
path's answers — same substep arithmetic, only the halo plumbing
differs — on every topology the production configs use: walled basins,
reentrant-x channels, and the tripolar northern fold, with the full
physics kit (BT_cont curves, implicit drag, bt_rem, OBC)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_global_grid import make_tripolar_supergrid  # noqa: E402

from mom6_tpu.core.barotropic import BTParams, btstep  # noqa: E402
from mom6_tpu.core.continuity_ppm import set_bt_cont  # noqa: E402
from mom6_tpu.grid.grid import build_cartesian_grid  # noqa: E402
from mom6_tpu.grid.mosaic import build_grid_from_supergrid  # noqa: E402
from mom6_tpu.grid.vertical import build_layered_vgrid  # noqa: E402
from mom6_tpu.parallel.mesh import make_mesh  # noqa: E402


def _smooth(ny, nx, kx, ky, amp, phase=0.0):
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    z = amp * np.sin(2 * np.pi * (kx * i / nx + ky * j / ny) + phase)
    return jnp.asarray(z, jnp.float32)


def _state(G, GV, nz, depth):
    ny, nx = G.mask2dT.shape
    fold = bool(getattr(G, "fold_north", False))
    # bumpy interior flow + eta anomaly; masks applied by btstep itself
    u = jnp.stack([_smooth(ny, nx, 2, 1, 0.08, 0.3 * k)
                   for k in range(nz)]) * G.mask2dCu
    v = jnp.stack([_smooth(ny, nx, 1, 2, 0.06, 1.1 + 0.2 * k)
                   for k in range(nz)]) * G.mask2dCv
    if fold:
        # the top v-face row LIES ON the fold: face (ny-1, i) is
        # identified with face (ny-1, nx-1-i) carrying -v (the
        # 180-degree rotation).  A physical tripolar state satisfies
        # this exactly; antisymmetrize the synthetic IC so both halo
        # paths read the same identified face.
        v = v.at[:, -1, :].set(
            0.5 * (v[:, -1, :] - v[:, -1, ::-1]))
    eta = _smooth(ny, nx, 1, 1, 0.4) * G.mask2dT
    h = jnp.maximum(
        depth / nz + jnp.stack([_smooth(ny, nx, 3, 2, 8.0, 0.7 * k)
                                for k in range(nz)]),
        1.0) * G.mask2dT + (1.0 - G.mask2dT) * GV.angstrom
    accel_u = jnp.stack([_smooth(ny, nx, 2, 2, 2e-6, 0.5 * k)
                         for k in range(nz)])
    accel_v = jnp.stack([_smooth(ny, nx, 2, 3, 2e-6, 1.7 + 0.5 * k)
                         for k in range(nz)])
    visc_rem_u = jnp.clip(
        0.9 + jnp.stack([_smooth(ny, nx, 1, 3, 0.08, k) for k in
                         range(nz)]), 0.2, 1.0)
    visc_rem_v = jnp.clip(
        0.9 + jnp.stack([_smooth(ny, nx, 3, 1, 0.08, k + 0.4) for k in
                         range(nz)]), 0.2, 1.0)
    if fold:
        # same identification for everything driving the on-fold face:
        # y-vector forcings antisymmetric, face scalars symmetric
        accel_v = accel_v.at[:, -1, :].set(
            0.5 * (accel_v[:, -1, :] - accel_v[:, -1, ::-1]))
        visc_rem_v = visc_rem_v.at[:, -1, :].set(
            0.5 * (visc_rem_v[:, -1, :] + visc_rem_v[:, -1, ::-1]))
    pbce = jnp.full_like(h, GV.g_earth) \
        * (1.0 - 0.1 * jnp.arange(nz, dtype=jnp.float32)[:, None, None])
    return dict(u=u, v=v, eta=eta, h=h, accel_u=accel_u,
                accel_v=accel_v, visc_rem_u=visc_rem_u,
                visc_rem_v=visc_rem_v, pbce=pbce)


def _run_both(G, GV, nz=3, depth=1000.0, dt=900.0, wide_halo=8,
              use_bt_cont=True, obc=None, taux=None):
    s = _state(G, GV, nz, depth)
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    btc = set_bt_cont(s["h"], dt, G, GV) if use_bt_cont else None
    uh = jnp.zeros_like(s["u"])
    vh = jnp.zeros_like(s["v"])
    common = dict(
        u_in=s["u"], v_in=s["v"], eta_in=s["eta"],
        bc_accel_u=s["accel_u"], bc_accel_v=s["accel_v"], h=s["h"],
        uh_in=uh, vh_in=vh, visc_rem_u=s["visc_rem_u"],
        visc_rem_v=s["visc_rem_v"], pbce=s["pbce"],
        eta_PF=0.5 * s["eta"], dt=dt, G=G, GV=GV,
        bt_cont=btc, obc=obc, taux=taux)
    base = dict(nstep=24, nfilter=8, bebt=0.2, use_bt_cont=use_bt_cont,
                lin_drag=1e-4, cdrag=0.003)
    out_d = btstep(params=BTParams(**base), **common)
    out_w = btstep(params=BTParams(**base, wide_halo=wide_halo,
                                   mesh=mesh), **common)
    return out_d, out_w


def _assert_close(out_d, out_w, rtol=3e-6):
    for name in out_d._fields:
        a = np.asarray(getattr(out_d, name))
        b = np.asarray(getattr(out_w, name))
        scale = np.max(np.abs(a)) + 1e-30
        err = np.max(np.abs(a - b)) / scale
        assert err < rtol, f"{name}: rel err {err:.2e} (scale {scale:.2e})"


def test_widehalo_matches_dense_walled_basin():
    """Walled basin, beta plane, bumpy layers, BT_cont + drag: the
    wide-halo path reproduces the dense answers to f32 roundoff."""
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=6e-5, beta=2e-11)
    GV = build_layered_vgrid(3)
    _assert_close(*_run_both(G, GV))


def test_widehalo_matches_dense_reentrant_channel():
    """Reentrant-x channel: the x rim rides the periodic ppermute."""
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=2000.0,
                             len_lat_km=1000.0, max_depth=800.0,
                             f0=-4e-5, beta=1.5e-11, cyclic_x=True)
    GV = build_layered_vgrid(3)
    _assert_close(*_run_both(G, GV))


def test_widehalo_matches_dense_linear_transports():
    """Datu linear transports (no BT_cont) + wind stress forcing."""
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=6e-5, beta=2e-11)
    GV = build_layered_vgrid(2)
    taux = _smooth(64, 64, 1, 1, 0.05) * G.mask2dCu
    _assert_close(*_run_both(G, GV, nz=2, use_bt_cont=False, taux=taux))


def test_widehalo_matches_dense_tripolar_fold():
    """Global tripolar cap: the fold rim (mirrored partner exchange,
    BT_cont E/W swap + threshold sign flip) reproduces the dense fold
    ghost-row stencils.  The mesh's top shard row has the fold crossing
    both shard boundaries and the bipolar seam."""
    sg = make_tripolar_supergrid(64, 20, 12, lat_s=30.0, lat_join=65.0,
                                 lon_bp=100.0)
    ny, nx = 32, 64
    depth = np.full((ny, nx), 1000.0)
    # carve two continents so masks exercise the wall handling too
    lat_t = sg["y"][1::2, 1::2]
    lon_t = sg["x"][1::2, 1::2]
    for plon in (100.0, 280.0):
        dlon = np.abs(np.mod(lon_t - plon + 180.0, 360.0) - 180.0)
        depth[(np.abs(lat_t - 65.0) < 2.5)
              & (dlon * np.cos(np.deg2rad(lat_t)) < 4.0)] = 0.0
    G = build_grid_from_supergrid(sg, depth, cyclic_x=True,
                                  fold_north=True)
    GV = build_layered_vgrid(3)
    _assert_close(*_run_both(G, GV, dt=600.0))


def test_widehalo_rejects_undersized_halo():
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=6e-5)
    GV = build_layered_vgrid(2)
    with pytest.raises(ValueError, match="wide_halo"):
        _run_both(G, GV, nz=2, wide_halo=2)
    with pytest.raises(ValueError, match="shard"):
        _run_both(G, GV, nz=2, wide_halo=40)


def test_auto_wide_halo_selection():
    """BT_WIDE_HALO = -1 (AUTO): off on a single device, a positive
    even width targeting ~8 substeps/exchange on a real mesh, capped by
    the shard size (round-5 verdict item 6; ref BTHALO default logic,
    MOM_barotropic.F90:5450)."""
    from mom6_tpu.core.barotropic import auto_wide_halo
    p1 = BTParams(nstep=24, nfilter=8, mesh=None, wide_halo=-1)
    assert auto_wide_halo(p1, (64, 64)) == 0
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    p8 = BTParams(nstep=24, nfilter=8, mesh=mesh, wide_halo=-1)
    w = auto_wide_halo(p8, (64, 64))
    # shards are 32x16 -> cap (16//2)//2*2 = 8; target 8*R = 16 -> 8
    assert w == 8
    # big shards: the 8-substeps-per-exchange target governs
    assert auto_wide_halo(p8, (256, 512)) == 16
    # tiny shards: not worth a rim -> dense
    assert auto_wide_halo(p8, (8, 8)) == 0
    # R > 1 scales the target and the floor
    p8r3 = p8._replace(halo_per_substep=3)
    assert auto_wide_halo(p8r3, (256, 512)) == 24


def test_auto_matches_dense():
    """AUTO (-1) through the full btstep: same answers as dense."""
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=6e-5, beta=2e-11)
    GV = build_layered_vgrid(3)
    _assert_close(*_run_both(G, GV, wide_halo=-1))


def test_w_r_boundary_envelope():
    """The W/(R*E) envelope at its boundary, incl. R > 1 (round-4
    verdict weak item 6): W = 2R is the smallest legal width (E = 2),
    W < 2R raises, and odd W just above the floor runs with the spare
    rim cell unused."""
    G = build_cartesian_grid(ny=64, nx=64, len_lon_km=1000.0,
                             len_lat_km=1000.0, max_depth=1000.0,
                             f0=6e-5, beta=2e-11)
    GV = build_layered_vgrid(2)

    def run_wr(w, r):
        s = _state(G, GV, 2, 1000.0)
        mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
        uh = jnp.zeros_like(s["u"])
        vh = jnp.zeros_like(s["v"])
        common = dict(
            u_in=s["u"], v_in=s["v"], eta_in=s["eta"],
            bc_accel_u=s["accel_u"], bc_accel_v=s["accel_v"], h=s["h"],
            uh_in=uh, vh_in=vh, visc_rem_u=s["visc_rem_u"],
            visc_rem_v=s["visc_rem_v"], pbce=s["pbce"],
            eta_PF=0.5 * s["eta"], dt=900.0, G=G, GV=GV,
            bt_cont=None, obc=None, taux=None)
        base = dict(nstep=24, nfilter=8, bebt=0.2, use_bt_cont=False,
                    lin_drag=1e-4)
        dense = btstep(params=BTParams(**base), **common)
        wide = btstep(params=BTParams(**base, wide_halo=w, mesh=mesh,
                                      halo_per_substep=r), **common)
        return dense, wide

    # R=2 (the physical radius): W=4 is the floor and must match dense
    _assert_close(*run_wr(4, 2))
    # odd W just above the floor: spare rim cell, still exact
    _assert_close(*run_wr(5, 2))
    # below the floor: loud error
    with pytest.raises(ValueError, match="wide_halo"):
        run_wr(3, 2)
    with pytest.raises(ValueError, match="wide_halo"):
        run_wr(2, 2)
    # R=3 floor (W=6): a wider-radius scheme still exchanges correctly
    # (R=3 consumes rim FASTER than the physics needs - always safe)
    _assert_close(*run_wr(6, 3))
