"""The classic idealized user configurations (reference src/user/*):
each shipped run directory builds and steps stably for a few cycles,
with case-specific physical checks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.core.mom import step_mom
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.framework.config import ParamFile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = ["seamount", "lock_exchange", "sloshing", "internal_wave",
         "rossby_front", "dome2d_overflow", "dumbbell",
         "phillips_channel", "scm_kpp", "external_gwave", "soliton",
         "dense_water", "supercritical"]


def _run(name, n_cycles=4):
    pf = ParamFile([os.path.join(REPO, "configs", name, "MOM_input")])
    ms = build_model_from_params(pf)
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid, ms.vgrid,
                                      ms.params))
    s0 = ms.state
    s = s0
    for _ in range(n_cycles):
        s = step(s)
    return ms, s0, s


@pytest.mark.parametrize("name", CASES)
def test_config_steps_stably(name):
    ms, s0, s = _run(name)
    for f in ("h", "u", "v"):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), (name, f)
    # mass conservation (open-boundary configs exchange volume with the
    # exterior by design, so the closed-domain check does not apply)
    if ms.params.obc is None:
        a = np.asarray(ms.grid.areaT, np.float64)
        m0 = (np.asarray(s0.h, np.float64) * a).sum()
        m1 = (np.asarray(s.h, np.float64) * a).sum()
        np.testing.assert_allclose(m1, m0, rtol=1e-5)
    # velocities bounded (no blow-up within a few cycles)
    assert float(jnp.max(jnp.abs(s.u))) < 5.0, name


def test_seamount_resting_state_stays_slow():
    """The seamount PGF-error test: a resting stratified column over
    steep topography must generate only weak spurious currents."""
    ms, _, s = _run("seamount", n_cycles=8)
    assert float(jnp.max(jnp.abs(s.u))) < 0.05


def test_lock_exchange_front_propagates():
    """Dense water slumps under light: depth-mean flow develops and the
    bottom-layer T at mid-domain freshens toward the dense side."""
    ms, s0, s = _run("lock_exchange", n_cycles=8)
    assert float(jnp.max(jnp.abs(s.u))) > 1e-3
    # available PE decreases as the front slumps: T variance on the
    # bottom layer spreads in x
    t0 = np.asarray(s0.T[-1, 1])
    t1 = np.asarray(s.T[-1, 1])
    assert np.abs(np.diff(t1)).max() <= np.abs(np.diff(t0)).max() + 1e-6


def test_phillips_jet_is_balanced():
    """The initialized jet is geostrophic: within a few steps the flow
    does not explosively accelerate (balanced initialization of
    Phillips_initialize_velocity)."""
    ms, s0, s = _run("phillips_channel", n_cycles=4)
    u0 = float(jnp.max(jnp.abs(s0.u)))
    u1 = float(jnp.max(jnp.abs(s.u)))
    assert u0 > 0.01                       # the jet is there
    assert u1 < 3.0 * u0 + 0.1             # and stays of the same order


def test_scm_kpp_mixes_under_wind():
    """Single column: wind stress deepens the KPP boundary layer,
    mixing the initially-stratified T profile near the surface."""
    ms, s0, s = _run("scm_kpp", n_cycles=12)
    dT0 = float(s0.T[0, 1, 1] - s0.T[5, 1, 1])
    dT1 = float(s.T[0, 1, 1] - s.T[5, 1, 1])
    assert dT1 < dT0        # near-surface stratification reduced


def test_soliton_moves_west():
    """The equatorial Rossby soliton propagates WESTWARD keeping a
    coherent shape (Boyd 1980; soliton_initialization role).  The
    position is the peak of eta projected on the meridional mode-1
    structure (the equator row itself is the saddle between the twin
    off-equator maxima).  The quantitative Boyd speed gate lives in
    test_analytic_parity.py."""
    import numpy as np
    ms, s0, s = _run("soliton", n_cycles=72)     # 3 days at dt=3600
    G = ms.grid
    c0 = np.sqrt(9.8 * 0.8)
    L_eq = np.sqrt(c0 / 2.3e-11)
    y_nd = np.asarray(G.geoLatT)[:, 0] * 1e3 / L_eq
    w = (3 + 6 * y_nd ** 2) / 4 * np.exp(-0.5 * y_nd ** 2)

    def env(st):
        eta = np.asarray(st.h.sum(0)) - np.asarray(G.bathyT)
        return (eta * w[:, None]).sum(0)

    e0, e1 = env(s0), env(s)
    x0, x1 = int(np.argmax(e0)), int(np.argmax(e1))
    nx = e0.shape[0]
    west = (x0 - x1) % nx           # positive = net westward cells
    assert 0 < west < nx // 2, (x0, x1, west)
    assert e1.max() > 0.5 * e0.max()        # coherent, not dispersed


# ---------------------------------------------------------------------------
# round-4 additions: the OBC/forcing-driven classics
# (Kelvin, shelfwave, DOME, adjustment, Neverworld, idealized hurricane)
# ---------------------------------------------------------------------------

def _run_provider(name, n_cycles, collect=None):
    """Step a config whose forcing is time-dependent (analytic OBC data
    or translating winds): re-evaluate the provider each thermo cycle,
    the solo driver's set_forcing-per-segment role."""
    pf = ParamFile([os.path.join(REPO, "configs", name, "MOM_input")])
    ms = build_model_from_params(pf)
    assert ms.forcing_provider is not None, name
    step = jax.jit(lambda s, f: step_mom(s, f, ms.grid, ms.vgrid,
                                         ms.params))
    dt_cycle = ms.params.dyn.dt * ms.params.n_dyn_per_thermo
    s = ms.state
    out = []
    for n in range(n_cycles):
        f = ms.forcing_provider(n * dt_cycle)
        s = step(s, f)
        if collect is not None:
            out.append(collect(s))
    return ms, s, out


def test_adjustment_front_stays_balanced():
    """Geostrophic adjustment: the released front radiates gravity
    waves and settles toward a thermal-wind jet along the front —
    along-front flow (v for an x-front) develops and dominates the
    cross-front flow, while the front survives (T variance retained)."""
    ms, s0, s = _run("adjustment", n_cycles=24)       # ~2 inertial periods
    v_amp = float(jnp.max(jnp.abs(s.v)))
    assert v_amp > 1e-3
    # along-front (v) jet stronger than the residual cross-front (u) flow
    # once the waves have radiated through the periodic y
    assert v_amp > 0.5 * float(jnp.max(jnp.abs(s.u)))
    t0 = np.asarray(s0.T[0]).std()
    t1 = np.asarray(s.T[0]).std()
    assert t1 > 0.3 * t0                  # the front is still there


def test_neverworld_topography_and_stability():
    """The Neverworld basin: land continents + an open reentrant
    channel at Drake latitudes, stable stepping under the zonal wind."""
    ms, s0, s = _run("neverworld", n_cycles=6)
    G = ms.grid
    mask = np.asarray(G.mask2dT)
    ny, nx = mask.shape
    # continents exist (South America / Africa land columns)
    assert mask.mean() < 0.95
    # the Drake-passage channel row is open all the way around
    jc = int(0.09 * ny)
    assert mask[jc].min() > 0.5
    # wind has started spinning up a circulation
    assert float(jnp.max(jnp.abs(s.u))) > 1e-4
    # thickness-weighted flow stays slow (raw max|u| lives in massless
    # layers over steep topography, bounded by the CFL truncation —
    # layered-mode behavior shared with the reference)
    h = np.asarray(s.h, np.float64)
    u = np.asarray(s.u, np.float64)
    h_u = 0.5 * (h + np.roll(h, -1, axis=2))
    uw = (h_u * np.abs(u)).sum() / h_u.sum()
    assert uw < 0.5, uw


@pytest.mark.slow
def test_neverworld_acc_is_eastward():
    """Westerlies over the reentrant channel drive an eastward
    circumpolar transport through it (the Neverworld ACC)."""
    ms, s, _ = _run_acc("neverworld", n_cycles=240)    # 2.5 days
    G = ms.grid
    ny = G.ny
    rows = slice(int(0.04 * ny), int(0.14 * ny))       # channel band
    h_u = np.asarray(s.h)
    u = np.asarray(s.u)
    dy = np.asarray(G.dyCu)[rows, 0]
    trans = (h_u[:, rows, 0] * u[:, rows, 0] * dy[None]).sum()
    assert trans > 0.0                                 # eastward ACC


def _run_acc(name, n_cycles):
    pf = ParamFile([os.path.join(REPO, "configs", name, "MOM_input")])
    ms = build_model_from_params(pf)
    step = jax.jit(lambda s, f: step_mom(s, f, ms.grid, ms.vgrid,
                                         ms.params))
    s = ms.state
    for _ in range(n_cycles):
        s = step(s, ms.forcing)
    return ms, s, None


def test_kelvin_wave_trapped_at_coast():
    """Mode-0 Kelvin wave (Kelvin_set_OBC_data): the SSH response is
    coastally trapped — its amplitude decays offshore with the
    barotropic deformation radius c/f, and the wave propagates with
    the coast on its right (eastward along the southern wall)."""
    period = 44714.0
    n = int(round(period / 300.0)) + 30          # one period + spin-in

    def collect(s):
        eta = np.asarray(s.h.sum(0), np.float64)
        return eta

    ms, s, etas = _run_provider("kelvin", n, collect)
    G = ms.grid
    eta_t = np.stack(etas[30:]) - np.asarray(G.bathyT)[None]
    # max amplitude per row at a column near the west forcing
    icol = 6
    amp = np.abs(eta_t[:, :, icol]).max(axis=0)
    wet = np.asarray(G.mask2dT)[:, icol] > 0.5
    f0, c = 1.0e-4, np.sqrt(9.8 * 100.0)
    y = np.asarray(G.geoLatT)[:, icol] * 1e3
    rows = np.where(wet & (amp > 1e-3 * amp.max()))[0][:16]
    # fitted exponential decay rate ~ f/c (within 40%: the discrete
    # wave also feels the angled-coast reflections and friction)
    slope = np.polyfit(y[rows], np.log(amp[rows]), 1)[0]
    assert -slope == pytest.approx(f0 / c, rel=0.4), (slope, -f0 / c)
    # propagation: the signal at a downstream column lags the forcing
    # column (eastward phase propagation along the south wall).  The
    # coasts are ANGLED (Kelvin_initialize_topography) — pick the
    # southernmost row that is wet at BOTH columns, else the land
    # column gives a constant series and a NaN correlation.
    mask = np.asarray(G.mask2dT)
    wet_both = np.where((mask[:, 8] > 0.5) & (mask[:, 24] > 0.5))[0]
    j0 = int(wet_both[0])
    a = eta_t[:, j0, 8]
    b = eta_t[:, j0, 24]
    lags = range(0, 40)
    xc = [np.corrcoef(a[:-L if L else None], b[L:])[0, 1] for L in lags]
    assert int(np.argmax(xc)) > 0        # downstream maximum at a lag


def test_shelfwave_response_trapped_on_shelf():
    """Continental shelf wave: the forced response is trapped over the
    exponential shelf — the depth-mean along-shore response near the
    coast dominates the response offshore."""
    n = 144                                           # half a day
    ms, s, _ = _run_provider("shelfwave", n)
    u = np.asarray(s.u, np.float64)
    v = np.asarray(s.v, np.float64)
    speed = np.sqrt(u.mean(0) ** 2 + v.mean(0) ** 2)
    ny = speed.shape[0]
    near = speed[: ny // 4].mean()
    far = speed[-ny // 4:].mean()
    assert np.isfinite(speed).all()
    assert near > 3.0 * far, (near, far)


def test_dome_inflow_enters_and_descends():
    """DOME: the SPECIFIED embayment inflow is active (southward flow
    in the channel, strongest at depth) and dense water appears on the
    slope below the shelf edge."""
    ms, s0, s = _run("dome", n_cycles=16)             # ~5.3 hours
    G = ms.grid
    obc = ms.params.obc
    assert obc is not None and obc.mask_v_spec is not None
    # the clamped per-layer inflow: southward, bottom-intensified
    vspec = np.asarray(obc.vvel_spec)
    msk = np.asarray(obc.mask_v_spec) > 0.5
    assert msk.any()
    prof = vspec[:, msk]
    assert prof.min() < -0.1                    # a real inflow
    assert abs(prof[-1]).max() > abs(prof[0]).max()   # dense layers fastest
    # flow actually enters: thickness-weighted v at the spec faces is
    # southward (in Z* the shelf column's deep GLOBAL layers are
    # massless — the inflow lives in the deepest layers with mass, so
    # weight by the face thickness rather than indexing layer -1)
    v = np.asarray(s.v, np.float64)
    h = np.asarray(s.h, np.float64)
    jf = np.where(msk.any(axis=1))[0][0]
    cols = np.where(msk[jf])[0]
    h_v = 0.5 * (h[:, jf, cols] + h[:, min(jf + 1, G.ny - 1), cols])
    vw = (v[:, jf, cols] * h_v).sum() / max(h_v.sum(), 1e-30)
    assert vw < -0.01, vw
    # inflow water is colder than ambient: T in the embayment strip at
    # depth is below T_REF
    jrow = G.ny - 1
    t_bot = np.asarray(s.T)[-1, jrow, 40:44].mean()
    assert t_bot < 20.0 - 0.5


@pytest.mark.slow
def test_dome_plume_turns_west():
    """After ~2 days the dense plume has descended the slope and turned
    westward (right of downslope, f>0): cold bottom water is found west
    of the embayment longitude on the slope."""
    ms, s0, s = _run("dome", n_cycles=288)            # 2 days
    G = ms.grid
    T1 = np.asarray(s.T, np.float64)
    T0 = np.asarray(s0.T, np.float64)
    lon = np.asarray(G.geoLonT)[0]
    # bottom-layer cooling west of the inflow edge, on the slope
    slope_rows = slice(int(0.55 * G.ny), int(0.72 * G.ny))
    west_cols = (lon > 500.0) & (lon < 950.0)
    dT = (T1 - T0)[-1, slope_rows][:, west_cols]
    assert dT.min() < -0.2, dT.min()


def test_hurricane_wind_structure():
    """The Holland-profile stress field: calm at the storm center,
    ring of maximum stress near RAD_MAX_WIND, cyclonic rotation
    (counterclockwise, f>0), decaying beyond the ambient radius to the
    uniform translation-only stress (the reference adds U_TS = half the
    translation speed to the 10-m wind EVERYWHERE,
    Idealized_Hurricane.F90:641-646, so the far field is not calm:
    |tau| = rho_a*Cd_calm*(0.5*trans_spd)^2).  Pure forcing check."""
    pf = ParamFile([os.path.join(REPO, "configs", "hurricane",
                                 "MOM_input")])
    ms = build_model_from_params(pf)
    taux = np.asarray(ms.forcing.mech.taux, np.float64)
    tauy = np.asarray(ms.forcing.mech.tauy, np.float64)
    mag = np.sqrt(taux ** 2 + tauy ** 2)
    assert 1.0 < mag.max() < 20.0                # hurricane-force stress
    G = ms.grid
    x = np.asarray(G.geoLonT) * 1e3
    y = np.asarray(G.geoLatT) * 1e3
    r = np.sqrt((x - 1.35e6) ** 2 + (y - 3.75e5) ** 2)
    # far field: exactly the uniform translation-only ambient stress
    # (1.2 * 1.2e-3 * 2.5^2 = 0.009 Pa for TRAN_SPEED=5)
    tau_amb = 1.2 * 1.2e-3 * (0.5 * 5.0) ** 2
    far = mag[r > 13 * 50.0e3]
    np.testing.assert_allclose(far, tau_amb, rtol=1e-5)
    # cyclonic: along the ring, stress curls counterclockwise — north
    # of the center the wind (and stress) blows westward
    ring_n = (np.abs(r - 50.0e3) < 30e3) & (y - 3.75e5 > 30e3)
    assert taux[ring_n].mean() < 0.0
    ring_s = (np.abs(r - 50.0e3) < 30e3) & (y - 3.75e5 < -30e3)
    assert taux[ring_s].mean() > 0.0


@pytest.mark.slow
def test_hurricane_cold_wake_right_of_track():
    """After a day of westward translation the SST wake is cold and
    biased to the RIGHT of the track (north side, NH): the inertially
    resonant side mixes deeper (Price 1981)."""
    n = 72                                           # 1 day, dt_therm 1200
    ms, s, _ = _run_provider("hurricane", n)
    G = ms.grid
    sst0 = float(np.asarray(ms.state.T)[0].mean())
    sst = np.asarray(s.T, np.float64)[0]
    y = np.asarray(G.geoLatT)[:, 0] * 1e3
    yc = 3.75e5
    north = sst[(y > yc + 25e3) & (y < yc + 200e3)].mean()
    south = sst[(y < yc - 25e3) & (y > yc - 200e3)].mean()
    assert north < sst0 - 0.05          # a real cold wake
    assert north < south                # rightward bias
