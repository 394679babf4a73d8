"""Column-level parity gates for the layered-mode approximations.

PARITY.md documents two deliberate deviations from the reference's
layered diabatic machinery: bulk-ML detrainment is density-bracket
splitting (vs mixedlayer_detrain_2's buffer-layer cascade,
src/parameterizations/vertical/MOM_bulk_mixed_layer.F90:2456) and
entrain_diffusive is clipped explicit dual-stream transfers (vs the
implicit positivity iteration of MOM_entrain_diffusive.F90).  These
gates pin the approximations to the reference FORMULATION's defining
column properties, so the deviations stay approximations of the same
physics rather than silent drift:

* entrain_diffusive converges to the exact (iterated / dt -> 0)
  solution of the Hallberg (2000) dual-stream ODE as the step shrinks
  — the quantity the reference's implicit iteration solves for;
* interior layers at their coordinate target densities STAY at target
  (ea*dRup == eb*dRdn, the defining constraint of the scheme);
* the detrainment split conserves mass AND coordinate density exactly
  (the defining property of mixedlayer_detrain_2's two-layer split);
* bulk-ML mechanical entrainment is energetically exact: the column's
  potential-energy rise equals BULK_RI_ML times the wind-work TKE
  (mechanical_entrainment, MOM_bulk_mixed_layer.F90:1850-1950).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.eos import get_eos
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.vertical.bulk_mixed_layer import (
    BulkMLParams, _detrain_to_interior, bulkmixedlayer)
from mom6_tpu.physics.vertical.entrain_diffusive import (
    EntrainDiffusiveParams, entrainment_diffusive)


def _column_setup(nz=8, h0=50.0):
    G = build_cartesian_grid(1, 1, 10.0, 10.0, max_depth=nz * h0)
    GV = build_layered_vgrid(nz)
    h = jnp.full((nz, 1, 1), h0, jnp.float32)
    # layer densities exactly at the coordinate targets (linear EOS:
    # rho = 1000 - 0.2 T + 0.8 S with S = 35)
    rlay = np.asarray(GV.Rlay, np.float64)
    T = jnp.asarray(((1028.0 - rlay) / 0.2)[:, None, None], jnp.float32) \
        * jnp.ones((nz, 1, 1), jnp.float32)
    S = jnp.full((nz, 1, 1), 35.0, jnp.float32)
    return G, GV, h, T, S


def _dual_stream_rhs(h, rlay, kd, ktop):
    """d(h)/dt of the unclipped dual-stream scheme (the ODE the
    reference's implicit positivity iteration integrates), float64."""
    nz = h.shape[0]
    dr = np.maximum(np.diff(rlay), 1e-4)
    ea = np.zeros(nz)
    eb = np.zeros(nz)
    for k in range(ktop + 1, nz - 1):
        coef = kd * (dr[k - 1] + dr[k]) / (2.0 * max(h[k], 1e-3))
        ea[k] = coef / dr[k - 1]
        eb[k] = coef / dr[k]
    ea[ktop] = eb[ktop] = kd / max(h[ktop], 1e-3)
    gain = ea + eb
    give = np.concatenate([ea[1:], [0.0]]) + np.concatenate([[0.0],
                                                             eb[:-1]])
    return gain - give


def test_entrain_diffusive_converges_to_continuum():
    """Sub-stepping the explicit scheme converges (first order) to the
    exact solution of the dual-stream ODE — the answer the reference's
    per-column implicit iteration produces for the same Kd."""
    nz, h0 = 8, 50.0
    G, GV, h, T, S = _column_setup(nz, h0)
    kd = 1.0e-3
    t_total = 1.0e6
    kd_int = jnp.full((nz + 1, 1, 1), kd, jnp.float32)
    p = EntrainDiffusiveParams()

    # float64 reference: RK4 at tiny steps of the unclipped ODE
    rlay = np.asarray(GV.Rlay, np.float64)
    href = np.full(nz, h0)
    nref = 4096
    dtr = t_total / nref
    for _ in range(nref):
        k1 = _dual_stream_rhs(href, rlay, kd, p.n_eulerian_top)
        k2 = _dual_stream_rhs(href + 0.5 * dtr * k1, rlay, kd,
                              p.n_eulerian_top)
        k3 = _dual_stream_rhs(href + 0.5 * dtr * k2, rlay, kd,
                              p.n_eulerian_top)
        k4 = _dual_stream_rhs(href + dtr * k3, rlay, kd,
                              p.n_eulerian_top)
        href = href + (dtr / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    assert abs(href.sum() - nz * h0) < 1e-8   # sanity: ODE conserves

    errs = {}
    for n_sub in (1, 4, 16, 64):
        hh, tt, ss = h, T, S
        for _ in range(n_sub):
            hh, tt, ss, _, _ = entrainment_diffusive(
                hh, tt, ss, G, GV, kd_int, t_total / n_sub, p)
        errs[n_sub] = float(np.abs(np.asarray(hh)[:, 0, 0] - href).max())
    # the total transfer is ~40% of a layer, so the single big step is
    # heavily clipped; refinement must converge monotonically onto the
    # continuum answer
    assert errs[1] > errs[4] > errs[16] > errs[64], errs
    assert errs[64] < 0.02 * h0, errs     # within 2% of a layer
    assert errs[64] < 0.1 * errs[1], errs


def test_entrain_diffusive_holds_density_targets():
    """Interior layers whose densities sit exactly on the coordinate
    targets stay there: the dual-stream rates satisfy
    ea*dRup == eb*dRdn, so the entrained (light-from-above +
    dense-from-below) mixture has exactly the layer's target density
    (Hallberg MWR 2000; the property MOM_entrain_diffusive.F90's
    iteration preserves)."""
    nz = 8
    G, GV, h, T, S = _column_setup(nz)
    kd_int = jnp.full((nz + 1, 1, 1), 2.0e-3, jnp.float32)
    p = EntrainDiffusiveParams()
    eos = get_eos("LINEAR")
    rho0 = np.asarray(eos.density(T, S, jnp.zeros(())), np.float64)
    rlay = np.asarray(GV.Rlay, np.float64)
    np.testing.assert_allclose(rho0[:, 0, 0], rlay, rtol=0, atol=1e-4)

    hh, tt, ss = h, T, S
    for _ in range(10):
        hh, tt, ss, ea, eb = entrainment_diffusive(
            hh, tt, ss, G, GV, kd_int, 5.0e4, p)
    # thicknesses moved substantially ...
    assert float(jnp.abs(hh - h).max()) > 1.0
    # ... but every layer below the top-interior one is still on target
    # (the top interior layer legitimately absorbs the Eulerian mixed
    # layer's off-target water; the bottom layer only receives from
    # above, shedding mass at its own density)
    rho1 = np.asarray(eos.density(tt, ss, jnp.zeros(())), np.float64)
    k0 = p.n_eulerian_top + 1
    np.testing.assert_allclose(rho1[k0:, 0, 0], rlay[k0:],
                               rtol=0, atol=2e-3)
    # and the discrete constraint holds exactly where both gaps exist
    ea_n = np.asarray(ea, np.float64)[:, 0, 0]
    eb_n = np.asarray(eb, np.float64)[:, 0, 0]
    dr = np.diff(rlay)
    for k in range(k0, nz - 1):
        np.testing.assert_allclose(ea_n[k] * dr[k - 1], eb_n[k] * dr[k],
                                   rtol=1e-5)


def test_detrain_split_conserves_mass_and_density():
    """The two-target split of detrained mixed/buffer water reproduces
    mixedlayer_detrain_2's defining invariants: total mass conserved
    and the mass-weighted target density of the receiving pair equals
    the detrained water's coordinate density exactly."""
    rng = np.random.RandomState(3)
    targets = jnp.asarray(np.linspace(1030.0, 1036.0, 7), jnp.float32)
    nsrc, ny, nx = 3, 4, 5
    h_left = jnp.asarray(rng.uniform(0.5, 20.0, (nsrc, ny, nx)),
                         jnp.float32)
    rcv = jnp.asarray(rng.uniform(1030.2, 1035.8, (nsrc, ny, nx)),
                      jnp.float32)
    add = _detrain_to_interior(h_left, rcv, targets)
    # mass: column sums match the detrained totals
    np.testing.assert_allclose(
        np.asarray(jnp.sum(add, axis=0)),
        np.asarray(jnp.sum(h_left, axis=0)), rtol=1e-6)
    # density: sum_k add_k * R_k == sum_src h_src * rcv_src per column
    got = np.asarray(jnp.sum(add * jnp.asarray(targets)[:, None, None],
                             axis=0), np.float64)
    want = np.asarray(jnp.sum(h_left * rcv, axis=0), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bulkml_mechanical_entrainment_energetics():
    """Wind-driven deepening is energetically exact: with no surface
    buoyancy flux and no TKE decay, the column potential-energy rise
    equals BULK_RI_ML * MSTAR * ustar^3 * dt * rho0 until the TKE is
    exhausted (mechanical_entrainment's budget,
    MOM_bulk_mixed_layer.F90:1850-1950; the two-slab homogenization
    energy (g/2) dRho a b is exact, so sequential accounting
    telescopes to the exact column Delta-PE)."""
    nz, h0 = 20, 50.0
    G = build_cartesian_grid(1, 1, 10.0, 10.0, max_depth=nz * h0)
    GV = build_layered_vgrid(nz, gprime_int=9.8e-4)   # dRho ~ 0.104
    h = jnp.full((nz, 1, 1), h0, jnp.float32)
    # stable column, d(rho)/layer = 0.104 (linear EOS, dT = -0.52).
    # The gap must be >> the f32 density quantum (~6e-5 at rho ~ 1024):
    # the scheme is exact in exact arithmetic, and at 0.104 (~1700
    # quanta) the f32 anomaly accounting resolves the budget to ~0.2%.
    T = jnp.asarray((18.0 - 0.52 * np.arange(nz))[:, None, None],
                    jnp.float32) * jnp.ones((nz, 1, 1), jnp.float32)
    S = jnp.full((nz, 1, 1), 35.0, jnp.float32)
    eos = get_eos("LINEAR")
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    p = BulkMLParams(nkml=1, nkbl=0, tke_decay=0.0)
    dt = 86400.0
    ustar = jnp.full((1, 1), 0.095, jnp.float32)
    buoy = jnp.zeros((1, 1), jnp.float32)

    h1, T1, S1, hml = bulkmixedlayer(h, u, v, T, S, G, GV, eos, dt,
                                     ustar, buoy, p)
    # TKE must be exhausted mid-column (the gate is vacuous otherwise)
    assert h0 * 3 < float(hml[0, 0]) < h0 * (nz - 2)

    h_tot0 = float(np.asarray(h, np.float64)[:, 0, 0].sum())

    def pe(hc, Tc, Sc):
        """Column PE [J m-2] from the density ANOMALY, f64, with the
        column mass normalized to the initial total: the constant-rho0
        part of PE is rho0*g*H^2/2 in both states, so evaluating the
        anomaly on mass-normalized columns cancels it exactly — the
        raw f32 thickness roundoff (~2e-5 of 360 m) otherwise enters
        scaled by the full rho0*g*z and swamps the signal."""
        hn = np.asarray(hc, np.float64)[:, 0, 0]
        hn = hn * (h_tot0 / hn.sum())
        rho = np.asarray(eos.density(Tc, Sc, jnp.zeros(())),
                         np.float64)[:, 0, 0]
        z_bot = h_tot0 - np.cumsum(hn)            # bottom of each layer
        zc = z_bot + 0.5 * hn
        return float(((rho - float(GV.rho0)) * 9.8 * zc * hn).sum())

    dpe = pe(h1, T1, S1) - pe(h, T, S)
    want = p.bulk_ri_ml * p.mstar * float(ustar[0, 0]) ** 3 * dt \
        * float(GV.rho0)
    assert dpe > 0.0
    np.testing.assert_allclose(dpe, want, rtol=1e-2)
