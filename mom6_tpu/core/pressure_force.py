"""Hydrostatic pressure-force accelerations.

Three forms: the Montgomery-potential form for layered (adiabatic,
stacked-shallow-water) mode (MOM_PressureForce_Montgomery.F90), the
Boussinesq finite-volume form with a full EOS
(MOM_PressureForce_FV.F90:947 — analytic Wright layer integrals or
5-point Boole quadrature, optional PLM in-layer T/S reconstruction and
the Stanley SGS-variance EOS correction), and the non-Boussinesq FV
form in pressure coordinates.

For a Boussinesq stack of layers with reduced gravities g'_k at the top
interface of layer k (g'_1 = g at the free surface):

    M_1 = g'_1 * e_1            (e_1 = free surface height, positive up)
    M_k = M_{k-1} + g'_k * e_k  (e_k = height of interface above layer k)

    PFu_k = -dM_k/dx,   PFv_k = -dM_k/dy

Also returns ``pbce`` — the sensitivity of the column-mean pressure-force
to free-surface height used by the barotropic solver (dM_k/d eta = g'_1
for every layer in this stacked form), and ``eta_PF`` — the free surface
used, so btstep can form pressure-force anomalies.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import ip1, jp1

__all__ = ["PressureForceOut", "pressure_force_montgomery",
           "pressure_force_fv", "pressure_force_fv_nonbous", "find_eta",
           "spv_avg", "find_eta_nonbouss"]


class PressureForceOut(NamedTuple):
    PFu: jnp.ndarray      # (nz, ny, nx) zonal accel [m s-2]
    PFv: jnp.ndarray
    pbce: jnp.ndarray     # (nz, ny, nx) d(accel)/d(eta) [s-2... m s-2 per m]
    eta_PF: jnp.ndarray   # (ny, nx) free surface used [m]


def find_eta(h, G):
    """Free-surface height (positive up) from thicknesses and bathymetry
    (analogue of MOM_interface_heights.F90 find_eta).  In non-Boussinesq
    mode this is the COLUMN MASS measure (mass/rho0 - depth, the H-units
    eta the split scheme evolves); the geometric SSH is
    :func:`find_eta_nonbouss`."""
    return jnp.sum(h, axis=0) - G.bathyT


def spv_avg(h, T, S, GV, eos, p_surf=None):
    """Layer-mean in-situ specific volume [m3 kg-1] at the hydrostatic
    layer pressures of the mass column ``h`` (in rho0-equivalent meters,
    mass = rho0*h) — the SpV_avg of calc_derived_thermo
    (MOM_interface_heights.F90; reference non-Boussinesq thermo
    derivation).  Exact Boole layer-mean via the dza integrals."""
    g = GV.g_earth
    dp = g * GV.rho0 * h
    p_top = jnp.zeros_like(dp[:1]) if p_surf is None else p_surf[None]
    p = jnp.concatenate([p_top, p_top + jnp.cumsum(dp, axis=0)], axis=0)
    dza, _ = _dza_column(T, S, p[:-1], p[1:], 0.0, eos)
    return dza / jnp.maximum(dp, 1e-3)


def geometric_to_mass_h(h_geom, T, S, GV, eos, n_iter: int = 5):
    """Convert GEOMETRIC layer thicknesses [m] to the non-Boussinesq
    prognostic thickness h = mass/rho0 [rho0-equivalent m], fixed-pointing
    the hydrostatic in-situ density at the layer's own pressure (the
    convert_thickness init step, MOM_state_initialization.F90).  Without
    this, a z-space initial condition read as mass is out of hydrostatic
    balance by the full in-situ/rho0 density ratio (~2% of the column —
    tens of meters of spurious eta)."""
    g = GV.g_earth
    rho = GV.rho0 + eos.density(T, S, jnp.zeros_like(T), rho_ref=GV.rho0)
    for _ in range(n_iter):
        dp = g * rho * h_geom
        p_int = jnp.concatenate([jnp.zeros_like(dp[:1]),
                                 jnp.cumsum(dp, axis=0)], axis=0)
        p_mid = 0.5 * (p_int[:-1] + p_int[1:])
        rho = GV.rho0 + eos.density(T, S, p_mid, rho_ref=GV.rho0)
    return h_geom * rho / GV.rho0


def find_eta_nonbouss(h, T, S, G, GV, eos, p_surf=None):
    """GEOMETRIC free-surface height [m] of a non-Boussinesq column:
    eta = sum_k (rho0 * h_k) * SpV_avg_k - depth (the find_eta
    non-Boussinesq branch, MOM_interface_heights.F90).  This is the SSH
    a tide gauge sees — it rises sterically when the column warms even
    though the mass (sum h) is unchanged."""
    dz = (GV.rho0 * h) * spv_avg(h, T, S, GV, eos, p_surf=p_surf)
    return jnp.sum(dz, axis=0) - G.bathyT


# Boole's rule weights for 5-point quadrature over 4 equal intervals
_BOOLE = (7.0 / 90.0, 32.0 / 90.0, 12.0 / 90.0, 32.0 / 90.0, 7.0 / 90.0)
_H_NEGLECT = 1e-10


def _dpa_column(T, S, e_t, e_b, g, rho0, eos, varT=None,
                dT=None, dS=None):
    """Pressure-anomaly change and its in-layer integral (int_density_dz,
    MOM_density_integrals.F90): 5-point Boole quadrature of
    g*(rho(T,S,p(z)) - rho0) over [e_b, e_t].

    ``dT``/``dS``: optional top-to-bottom in-layer changes from a PLM
    vertical reconstruction (int_density_dz_generic_plm): the quadrature
    then samples T(z) = T + dT*(zfrac - 1/2) instead of the layer mean
    (PCM).  The analytic Wright fast path requires layer-constant T/S
    and is bypassed when they are given.

    ``varT``: optional layer-constant SGS temperature variance; adds the
    Stanley et al. correction 0.5 * d2rho/dT2 * varT to each density
    sample (the use_Stanley branch of int_density_dz, wired from
    MOM_stoch_eos.F90:261).

    Returns (dpa [Pa], intz_dpa [Pa m]): dpa = pa(e_b) - pa(e_t) and
    intz_dpa = int over the layer of (pa(z) - pa(e_t)) dz."""
    if varT is None and dT is None \
            and getattr(eos, "int_density_dz", None) is not None:
        # Wright-family EOS: exact closed-form layer integral
        # (int_density_dz_wright, MOM_EOS_Wright.F90:389) — no
        # quadrature error and ~5x fewer density evaluations
        return eos.int_density_dz(T, S, e_t, e_b, g, rho0, rho_ref=rho0)
    dz = e_t - e_b
    gxrho = g * rho0
    # 5 sample heights from the top of the layer downward
    rho5 = []
    for n in range(5):
        z_n = e_t - (n / 4.0) * dz
        p_n = -gxrho * z_n
        T_n, S_n = T, S
        if dT is not None:
            T_n = T + dT * (n / 4.0 - 0.5)
        if dS is not None:
            S_n = S + dS * (n / 4.0 - 0.5)
        r = eos.density(T_n, S_n, p_n, rho_ref=rho0)
        if varT is not None:
            from mom6_tpu.eos.stoch_eos import stanley_density_correction
            r = r + stanley_density_correction(T_n, S_n, p_n, eos, varT)
        rho5.append(r)
    dpa = (g * dz) * sum(w * r for w, r in zip(_BOOLE, rho5))
    # pa(z) - pa(e_t) at the 5 points by cumulative Simpson/trapezoid
    pa_rel = [jnp.zeros_like(dpa)]
    for n in range(1, 5):
        inc = (g * dz / 8.0) * (rho5[n - 1] + rho5[n])   # trapezoid, dz/4
        pa_rel.append(pa_rel[-1] + inc)
    intz = dz * sum(w * p for w, p in zip(_BOOLE, pa_rel))
    return dpa, intz


def _dpa_face(T_l, S_l, T_r, S_r, et_l, eb_l, et_r, eb_r,
              dpa_l, dpa_r, bathy_l, bathy_r, g, rho0, eos,
              varT_l=None, varT_r=None, dT_l=None, dT_r=None,
              dS_l=None, dS_r=None):
    """x-integral of the pressure-anomaly change through a layer along a
    face: the end points reuse the column integrals (exact telescoping at
    rest); 3 interior positions interpolate properties and geometry and
    are Boole-combined.  Tracer interpolation is MASS WEIGHTED toward the
    thicker column when one side's layer lies below the other side's
    bathymetry (the hWght scheme of int_density_dz,
    MOM_density_integrals.F90:276-305) — the against-topography guard."""
    eps = _H_NEGLECT
    hL = (et_l - eb_l) + eps
    hR = (et_r - eb_r) + eps
    hwght = jnp.maximum(0.0, jnp.maximum(-bathy_l - et_r, -bathy_r - et_l))
    hwght = hwght * ((hL - hR) / (hL + hR)) ** 2
    iden = 1.0 / (hwght * (hR + hL) + hL * hR)
    hwt_ll = (hwght * hL + hR * hL) * iden
    hwt_lr = (hwght * hR) * iden
    hwt_rr = (hwght * hR + hR * hL) * iden
    hwt_rl = (hwght * hL) * iden

    total = _BOOLE[0] * dpa_l + _BOOLE[4] * dpa_r
    for m in (1, 2, 3):
        w = m / 4.0
        wt_l, wt_r = 1.0 - w, w
        wtt_l = wt_l * hwt_ll + wt_r * hwt_rl
        wtt_r = wt_l * hwt_lr + wt_r * hwt_rr
        T_m = wtt_l * T_l + wtt_r * T_r
        S_m = wtt_l * S_l + wtt_r * S_r
        et_m = wt_l * et_l + wt_r * et_r
        eb_m = wt_l * eb_l + wt_r * eb_r
        varT_m = (wtt_l * varT_l + wtt_r * varT_r) \
            if varT_l is not None else None
        dT_m = (wtt_l * dT_l + wtt_r * dT_r) if dT_l is not None else None
        dS_m = (wtt_l * dS_l + wtt_r * dS_r) if dS_l is not None else None
        dpa_m, _ = _dpa_column(T_m, S_m, et_m, eb_m, g, rho0, eos, varT_m,
                               dT=dT_m, dS=dS_m)
        total = total + _BOOLE[m] * dpa_m
    return total


def pressure_force_fv(h, T, S, G, GV, eos, p_surf=None, e_tidal=None,
                      varT=None, plm_ts: bool = False) -> PressureForceOut:
    """Boussinesq finite-volume (contact-force) pressure gradient with a
    full equation of state — the analytically-integrated Adcroft form of
    MOM6's PressureForce_FV_Bouss (reference:
    src/core/MOM_PressureForce_FV.F90:947; density integrals from
    MOM_density_integrals.F90 via 5-point Boole quadrature).

    Per layer k at a u face:

      PFu = [ (pa_i h_i + intz_i) - (pa_{i+1} h_{i+1} + intz_{i+1})
              + (h_{i+1} - h_i) intx_pa(K)
              - (e_{i+1,K+1} - e_{i,K+1}) intx_dpa(k) ]
            * 2 / (rho0 dx (h_i + h_{i+1}))

    where pa is the pressure anomaly relative to the rho0 hydrostatic
    profile, intz its in-layer vertical integral, and intx_pa/intx_dpa its
    integrals along the face.  This form is exact for a resting stratified
    state over arbitrary topography up to quadrature error.
    """
    g = GV.g_earth
    rho0 = GV.rho0
    # interface heights, positive up: e[K] for K=0..nz (bottom = -bathy)
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e = jnp.concatenate([csum_below, jnp.zeros_like(h[:1])], axis=0) \
        - G.bathyT[None]                                 # (nz+1, ny, nx)
    if e_tidal is not None:
        # heights relative to the perturbed geopotential: equilibrium
        # tidal potential + self-attraction/loading (the e_tidal of
        # PressureForce_FV_Bouss, fed by MOM_tidal_forcing.F90:817 and
        # MOM_self_attr_load.F90:392)
        e = e - e_tidal[None]

    e_t, e_b = e[:-1], e[1:]
    # optional PLM vertical reconstruction of T/S within each layer
    # (RECONSTRUCT_FOR_PRESSURE -> int_density_dz_generic_plm): reduces
    # the PGF truncation error where properties vary strongly across a
    # layer (thermocline-crossing ALE layers)
    dT = dS = None
    if plm_ts:
        from mom6_tpu.ale.remapping import _plm_slopes
        dT = _plm_slopes(T, h)
        dS = _plm_slopes(S, h)
    dpa, intz_dpa = _dpa_column(T, S, e_t, e_b, g, rho0, eos, varT,
                                dT=dT, dS=dS)

    # pa at interfaces: pa(surface) = g*rho0*e1 (+ p_surf), then accumulate
    pa_top = g * rho0 * e[0]
    if p_surf is not None:
        pa_top = pa_top + p_surf
    pa = jnp.concatenate([pa_top[None],
                          pa_top[None] + jnp.cumsum(dpa, axis=0)], axis=0)

    i_rho0 = 1.0 / rho0

    def pf_dir(roll_fn, idx_metric, mask_face):
        T_r, S_r = roll_fn(T), roll_fn(S)
        et_r, eb_r = roll_fn(e_t), roll_fn(e_b)
        intx_dpa = _dpa_face(T, S, T_r, S_r, e_t, e_b, et_r, eb_r,
                             dpa, roll_fn(dpa),
                             G.bathyT[None], roll_fn(G.bathyT)[None],
                             g, rho0, eos,
                             varT, roll_fn(varT) if varT is not None
                             else None,
                             dT_l=dT,
                             dT_r=roll_fn(dT) if dT is not None else None,
                             dS_l=dS,
                             dS_r=roll_fn(dS) if dS is not None else None)
        # x-integral of pa along interfaces: surface from the linear mean,
        # deeper interfaces by accumulating intx_dpa
        intx_pa_top = 0.5 * (pa[0] + roll_fn(pa[0]))
        intx_pa = jnp.concatenate(
            [intx_pa_top[None],
             intx_pa_top[None] + jnp.cumsum(intx_dpa, axis=0)], axis=0)
        h_r = roll_fn(h)
        pf = (((pa[:-1] * h + intz_dpa)
               - (roll_fn(pa[:-1]) * h_r + roll_fn(intz_dpa)))
              + ((h_r - h) * intx_pa[:-1]
                 - (roll_fn(e_b) - e_b) * intx_dpa)) \
            * (2.0 * i_rho0 * idx_metric) / ((h + h_r) + _H_NEGLECT)
        # NO massless-face gate (r5): the hWght mass-weighted face
        # integral above IS the reference's against-topography guard
        # (int_density_dz, MOM_density_integrals.F90:276-305) and the
        # form telescopes exactly at rest, vanished layers included.
        # Two earlier patches were both wrong: a smooth ramp
        # hmin/(hmin+1e-3) rescaled thin-but-real faces (non-conservative
        # -> 3-day-efolding energy source), and the r4 hard gate at
        # hmin > 2e-3 SNAPPED the full face force on whenever a vanished
        # layer at a topography step inflated past 2 mm — the
        # discontinuity injected ~0.3 m/s per step at shelf breaks and
        # cascaded (the global_half_deg cap blowup, r5 probes).  The
        # reference runs ungated for the same reason.
        return pf * mask_face

    kh = "h" if getattr(G, "fold_north", False) else None
    pfu = pf_dir(ip1, G.IdxCu, G.mask2dCu)
    pfv = pf_dir(lambda a: jp1(a, kh), G.IdyCv, G.mask2dCv)

    # pbce: d(layer PF)/d(eta) with the stratification's response to the
    # column stretching (Set_pbce_Bouss EOS branch,
    # MOM_PressureForce_Montgomery.F90:699-724):
    #   pbce_1 = (g/rho0) rho_sfc
    #   pbce_k = pbce_{k-1} + (g/rho0) (e_K - e_bot)/H *
    #            (dR/dT dT + dR/dS dS) across interface K.
    # The constant-g placeholder this replaces left the split scheme's
    # layer-accel coupling identically zero, which destabilizes long
    # stratified runs over topography (seeded ~2-day-efolding KE growth).
    g_rho0 = g / rho0
    htot = jnp.maximum(e[0] - e[-1], 1e-10)
    p_sfc = -g * rho0 * e[0]
    rho_sfc = rho0 + eos.density(T[0], S[0], p_sfc, rho_ref=rho0)
    pbce1 = (g_rho0 * rho_sfc)[None]
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    p_i = -g * rho0 * e[1:-1]
    dr_dt, dr_ds = eos.density_derivs(t_i, s_i, p_i)
    frac = (e[1:-1] - e[-1][None]) / htot[None]
    dpbce = g_rho0 * frac * (dr_dt * (T[1:] - T[:-1])
                             + dr_ds * (S[1:] - S[:-1]))
    pbce = jnp.cumsum(jnp.concatenate([pbce1, dpbce], axis=0), axis=0)
    eta = e[0]
    return PressureForceOut(pfu, pfv, pbce.astype(h.dtype), eta)


def pressure_force_montgomery(h, G, GV, e_tidal=None) -> PressureForceOut:
    """Montgomery-potential PF for the layered stack."""
    # interface heights, positive up: e[k] = top interface of layer k
    # e_bot = -D;  e[k] = -D + sum_{m>=k} h_m
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]      # sum_{m>=k} h_m
    e = csum_below - G.bathyT[None]                     # (nz, ny, nx), top interfaces
    if e_tidal is not None:
        e = e - e_tidal[None]
    gp = GV.g_prime[:, None, None]
    M = jnp.cumsum(gp * e, axis=0)
    pfu = -(ip1(M) - M) * G.IdxCu * G.mask2dCu
    kh = "h" if getattr(G, "fold_north", False) else None
    pfv = -(jp1(M, kh) - M) * G.IdyCv * G.mask2dCv
    # pbce: d(layer PF)/d(eta) (Set_pbce_Bouss, non-EOS branch,
    # MOM_PressureForce_Montgomery.F90:726-736).  When the free surface
    # rises by d(eta) the whole column stretches, so interface K moves by
    # d(eta)*(e_K - e_bot)/htot, and layer k's Montgomery potential gains
    # sum_{m<=k} g'_m * (that interface's move).  Getting this
    # stratification dependence right is what keeps the split scheme
    # stable (Hallberg & Adcroft 2009) — a constant pbce = g lets the
    # baroclinic modes resonate against the barotropic solver, which
    # shows up as ~2-day-efolding KE growth over topography.
    e_bot = e[0] - jnp.sum(h, axis=0)                   # = -bathyT
    ihtot = 1.0 / jnp.maximum(e[0] - e_bot, 1e-10)
    frac = (e - e_bot[None]) * ihtot[None]              # (e_K - e_bot)/H
    pbce = jnp.cumsum(gp * frac.at[0].set(1.0), axis=0)
    eta = e[0]
    return PressureForceOut(pfu, pfv, pbce.astype(h.dtype), eta)


def _dza_column(T, S, p_t, p_b, alpha_ref, eos):
    """Geopotential-anomaly change and its in-layer pressure integral for
    layer-constant T/S (the PCM form of int_spec_vol_dp,
    MOM_density_integrals.F90): 5-point Boole quadrature of
    (alpha(T,S,p) - alpha_ref) over [p_t, p_b].

    Returns (dza [m2 s-2], intp_dza [Pa m2 s-2]): dza = za(p_t) - za(p_b)
    and intp_dza = int over the layer of (za(p) - za(p_b)) dp."""
    dp = p_b - p_t
    a5 = []
    for n in range(5):
        p_n = p_t + (n / 4.0) * dp
        a5.append(eos.specific_volume(T, S, p_n, spv_ref=alpha_ref))
    dza = dp * sum(w * a for w, a in zip(_BOOLE, a5))
    # za(p) - za(p_b) at the 5 points, accumulating upward from p_b
    za_rel = [jnp.zeros_like(dza)]        # at p_b (n = 4)
    for n in range(3, -1, -1):
        inc = (dp / 8.0) * (a5[n] + a5[n + 1])
        za_rel.insert(0, za_rel[0] + inc)
    intp = dp * sum(w * z for w, z in zip(_BOOLE, za_rel))
    return dza, intp


def _dza_face(T_l, S_l, T_r, S_r, pt_l, pb_l, pt_r, pb_r,
              dza_l, dza_r, pbot_l, pbot_r, alpha_ref, eos):
    """x-integral of the geopotential-anomaly change through a layer
    along a face, the dual of _dpa_face: mass weighting toward the
    thicker (in pressure) column when one side lies below the other's
    bottom pressure (the hWght guard of int_spec_vol_dp)."""
    eps = 1e-3          # pressure neglect [Pa]
    hL = (pb_l - pt_l) + eps
    hR = (pb_r - pt_r) + eps
    hwght = jnp.maximum(0.0, jnp.maximum(pb_r - pbot_l, pb_l - pbot_r))
    hwght = hwght * ((hL - hR) / (hL + hR)) ** 2
    iden = 1.0 / (hwght * (hR + hL) + hL * hR)
    hwt_ll = (hwght * hL + hR * hL) * iden
    hwt_lr = (hwght * hR) * iden
    hwt_rr = (hwght * hR + hR * hL) * iden
    hwt_rl = (hwght * hL) * iden

    total = _BOOLE[0] * dza_l + _BOOLE[4] * dza_r
    for m in (1, 2, 3):
        w = m / 4.0
        wt_l, wt_r = 1.0 - w, w
        wtt_l = wt_l * hwt_ll + wt_r * hwt_rl
        wtt_r = wt_l * hwt_lr + wt_r * hwt_rr
        T_m = wtt_l * T_l + wtt_r * T_r
        S_m = wtt_l * S_l + wtt_r * S_r
        pt_m = wt_l * pt_l + wt_r * pt_r
        pb_m = wt_l * pb_l + wt_r * pb_r
        dza_m, _ = _dza_column(T_m, S_m, pt_m, pb_m, alpha_ref, eos)
        total = total + _BOOLE[m] * dza_m
    return total


def pressure_force_fv_nonbous(h_mass, T, S, G, GV, eos,
                              p_surf=None) -> PressureForceOut:
    """Non-Boussinesq finite-volume pressure gradient — the dual of
    ``pressure_force_fv`` with the roles of height/density played by
    pressure/specific-volume (reference: PressureForce_FV_nonBouss,
    src/core/MOM_PressureForce_FV.F90:120; spec-vol integrals from
    MOM_density_integrals.F90 int_spec_vol_dp).

    ``h_mass``: layer mass thickness [kg m-2].  Per layer k at a u face:

      PFu = [ (za_b dp + intp_dza)_i - (za_b dp + intp_dza)_{i+1}
              + (dp_{i+1} - dp_i) intx_za(K+1)
              - (p_{i+1,K+1} - p_{i,K+1}) intx_dza(k) ]
            * 2 / (dx (dp_i + dp_{i+1}))

    where za = Phi + alpha_ref p is the geopotential anomaly (constant at
    rest), dp = g h_mass, and the za accumulation starts at the SEA FLOOR
    (za_bot = -g bathy + alpha_ref p_bot).  Exact for a resting
    stratified state over arbitrary topography up to quadrature error."""
    g = GV.g_earth
    alpha_ref = 1.0 / GV.rho0
    dp = g * h_mass                                     # (nz, ny, nx) [Pa]
    p_top = jnp.zeros_like(dp[:1]) if p_surf is None else p_surf[None]
    p = jnp.concatenate([p_top, p_top + jnp.cumsum(dp, axis=0)], axis=0)
    p_t, p_b = p[:-1], p[1:]

    dza, intp_dza = _dza_column(T, S, p_t, p_b, alpha_ref, eos)

    # za at interfaces, accumulated upward from the bottom
    za_bot = -g * G.bathyT + alpha_ref * p[-1]
    za = jnp.concatenate(
        [za_bot[None] + (jnp.cumsum(dza[::-1], axis=0))[::-1],
         za_bot[None]], axis=0)                          # (nz+1, ny, nx)

    def pf_dir(roll_fn, idx_metric, mask_face):
        T_r, S_r = roll_fn(T), roll_fn(S)
        pt_r, pb_r = roll_fn(p_t), roll_fn(p_b)
        intx_dza = _dza_face(T, S, T_r, S_r, p_t, p_b, pt_r, pb_r,
                             dza, roll_fn(dza),
                             p[-1][None], roll_fn(p[-1])[None],
                             alpha_ref, eos)
        # x-integral of za along interfaces, accumulated DOWNWARD from
        # the surface (intx_za(1) = mean of the column za's, then
        # intx_za(K+1) = intx_za(K) - intx_dza(k); reference :557-568).
        # The column za is integrated UP from the bottom, so the surface
        # geopotential varies linearly between thickness points while the
        # bottom one does not — the order that guarantees no motion with
        # flat isopycnals under a nonlinear EOS.  Accumulating intx_za up
        # from the bottom instead leaves an O(quadrature) inconsistency
        # that concentrates in slope-intersecting bottom layers
        # (2e-3 m s-2 from rest — an immediate CFL-limit blowup).
        intx_za_top = 0.5 * (za[0] + roll_fn(za[0]))
        intx_za = jnp.concatenate(
            [intx_za_top[None],
             intx_za_top[None] - jnp.cumsum(intx_dza, axis=0)], axis=0)
        dp_r = roll_fn(dp)
        # reference :831-835: za/intx_za at the layer BOTTOM (K+1), the
        # pressure difference at the layer TOP (K)
        pf = (((za[1:] * dp + intp_dza)
               - (roll_fn(za[1:]) * dp_r + roll_fn(intp_dza)))
              + ((dp_r - dp) * intx_za[1:]
                 - (roll_fn(p_t) - p_t) * intx_dza)) \
            * (2.0 * idx_metric) / ((dp + dp_r) + 1e-3)
        # hard gate on truly massless faces (the dual of PF_GATE in the
        # Boussinesq path: 2e-3 m of water ~ 20 Pa).  The previous smooth
        # ramp pmin/(pmin+10) rescaled the PGF at every thin-but-real face
        # along slopes — a non-conservative force (energy source with a
        # 2-4 day KE e-folding) diagnosed and fixed in the Bouss path.
        pmin = jnp.minimum(dp, dp_r)
        gate = (pmin > 20.0).astype(pf.dtype)
        return pf * gate * mask_face

    kh = "h" if getattr(G, "fold_north", False) else None
    pfu = pf_dir(ip1, G.IdxCu, G.mask2dCu)
    pfv = pf_dir(lambda a: jp1(a, kh), G.IdyCv, G.mask2dCv)

    # stratified pbce (Set_pbce_nonBouss role,
    # MOM_PressureForce_Montgomery.F90:745-818): mirror the Boussinesq
    # EOS-branch structure on geopotential heights e = za/g.  A constant
    # pbce = g has zero layer/BT coupling, which destabilizes the split
    # scheme over topography (see pressure_force_fv's pbce note).
    rho0 = GV.rho0
    g_rho0 = g / rho0
    # GEOMETRIC interface heights: dz_k = int alpha dp / g (dza holds the
    # anomaly part, alpha_ref*dp the reference part).  NOT za/g — za is a
    # geopotential ANOMALY, O(meters) and non-monotone, and using it as a
    # height collapses htot to its floor and sends frac to ~1e11 (a
    # 3-step KE explosion once anything perturbs eta).
    dz = (dza + alpha_ref * dp) / g
    e = jnp.concatenate(
        [jnp.cumsum(dz[::-1], axis=0)[::-1], jnp.zeros_like(dz[:1])],
        axis=0) - G.bathyT[None]                # (nz+1, ny, nx) heights
    htot = jnp.maximum(e[0] - e[-1], 1e-10)
    rho_sfc = rho0 + eos.density(T[0], S[0], p[0], rho_ref=rho0)
    pbce1 = (g_rho0 * rho_sfc)[None]
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    dr_dt, dr_ds = eos.density_derivs(t_i, s_i, p[1:-1])
    frac = (e[1:-1] - e[-1][None]) / htot[None]
    dpbce = g_rho0 * frac * (dr_dt * (T[1:] - T[:-1])
                             + dr_ds * (S[1:] - S[:-1]))
    pbce = jnp.cumsum(jnp.concatenate([pbce1, dpbce], axis=0), axis=0)
    # The split scheme's prognostic eta is the COLUMN-MASS measure
    # sum(h) - depth (h in rho0-equivalent meters, find_eta) — NOT the
    # geometric surface height.  Chain-rule the pbce to that variable:
    # adding d(h~) of rho0-equivalent surface mass raises the geometric
    # surface by rho0*alpha_sfc*d(h~), so d(accel)/d(eta_H) =
    # d(accel)/d(eta_geom) * rho0*alpha_sfc (the H-unit pbce of
    # Set_pbce_nonBouss, which works in accel per mass-thickness).
    alpha_sfc = eos.specific_volume(T[0], S[0], p[0])
    pbce = pbce * (rho0 * alpha_sfc)[None]
    eta_h = jnp.sum(h_mass, axis=0) / rho0 - G.bathyT
    return PressureForceOut(pfu, pfv, pbce.astype(h_mass.dtype), eta_h)
