"""K-profile parameterization (KPP) boundary-layer mixing.

Native implementation of the Large, McWilliams & Doney (1994) scheme —
the algorithms MOM6 obtains from CVMix (reference:
src/parameterizations/vertical/MOM_CVMix_KPP.F90: KPP_compute_BLD :994,
KPP_calculate :663, KPP_NonLocalTransport :1660; CVMix surface listed in
SURVEY.md §2.4).  Implemented natively from the published formulation.

Pieces:
* SURFACE-LAYER-AVERAGED reference values: for each candidate depth d the
  bulk Richardson number compares against buoyancy/velocity averaged over
  the top ``epsilon * d`` (CVMix_kpp_compute_bulk_Richardson), computed
  here with a lax.map over levels (O(nz^2) flops, O(nz) memory);
* bulk Richardson number profile Rib(z) with unresolved-shear term Vt^2
  (LMD94 eq. 21) using either a constant Cv or the CVMix Cv(N) =
  max(1.7, 2.1 - 200 N) option;
* boundary-layer depth = first depth where Rib exceeds Ric (vectorized
  masked-min search with linear interpolation, no data-dependent loops);
* turbulent velocity scales w_s with LMD94 stability functions;
* K = hbl * w_s(sigma) * G(sigma), G = sigma (1-sigma)^2 shape function,
  applied to interfaces inside the boundary layer, optionally enhanced by
  a Langmuir factor;
* nonlocal transport shape N(sigma) at interfaces (KPP_calculate :884-921:
  CS2*sigma*(1-sigma)^2 cubic-LMD, (1-sigma)^2 parabolic [recommended],
  cubic, or linear), active only under destabilizing surface buoyancy
  flux; the tendency (N_k - N_{k+1})/h * surfFlux is applied by the
  caller via ``apply_nonlocal_transport`` (KPP_NonLocalTransport :1699).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["KPPParams", "kpp_diffusivity", "apply_nonlocal_transport"]

_KAPPA = 0.4        # von Karman
_EPS = 1e-10


class KPPParams(NamedTuple):
    ric: float = 0.3            # critical bulk Richardson number
    cs: float = 98.96           # LMD94 unresolved shear constant
    cv: float = 0.0             # ratio of N at entrainment depth to mean;
    #                             <= 0 selects the CVMix Cv(N) function
    surf_layer_ext: float = 0.1  # surface-layer fraction epsilon
    kd_interior_max_boost: float = 0.0
    min_hbl: float = 1.0        # [m]
    enhance_entrainment: bool = True
    nlt_shape: str = "PARABOLIC"   # NLT_SHAPE: PARABOLIC|CUBIC|LINEAR|CUBIC_LMD
    cs2: float = 6.32739901508     # CS2 of the reference (cubic-LMD ampl.)
    apply_nonlocal: bool = True


def _w_scales(sigma_z, hbl, ustar, bflux_sfc, p: KPPParams):
    """Scalar turbulent velocity scale w_s at depth d = sigma_z (LMD94
    appendix B / eq. B1; zeta = d/L with L = u*^3/(kappa Bf)):
      phi_s = 1 + 5 zeta                     (zeta >= 0, stable)
      phi_s = (1 - 16 zeta)^(-1/2)           (-1 <= zeta < 0)
      phi_s = (-28.86 - 98.96 zeta)^(-1/3)   (zeta < -1, convective)
    The convective branch is evaluated in the analytically-cancelled
    form w = kappa (c_s kappa |Bf| d - a_s u*^3)^(1/3) so the free-
    convection limit u* -> 0 keeps w ~ (|Bf| d)^(1/3) instead of
    underflowing through the kappa u* / phi quotient."""
    ustar3 = ustar ** 3
    zeta = _KAPPA * bflux_sfc * sigma_z / jnp.maximum(ustar3, _EPS)
    w_stable = _KAPPA * ustar / jnp.maximum(1.0 + 5.0 * zeta, _EPS)
    w_unstable = _KAPPA * ustar * jnp.sqrt(1.0 - 16.0 *
                                           jnp.maximum(zeta, -1.0))
    w_conv = _KAPPA * jnp.cbrt(jnp.maximum(
        -28.86 * ustar3 - 98.96 * _KAPPA * bflux_sfc * sigma_z, 0.0))
    return jnp.where(zeta >= 0.0, w_stable,
                     jnp.where(zeta > -1.0, w_unstable, w_conv))


def _surface_layer_means(z_c, h, fields, eps_frac):
    """For each level k, the average of each field over the surface layer
    [0, max(eps_frac * z_c[k], z_c[0])] — the reference values of
    CVMix_kpp_compute_bulk_Richardson.  ``fields``: tuple of (nz, ny, nx).
    Returns (n, nz, ny, nx).  lax.map over k keeps memory O(nz)."""
    z_top = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)[:-1]], axis=0)
    z_bot = z_top + h

    def ref_at(k):
        d = jnp.maximum(eps_frac * z_c[k], z_c[0])
        ov = jnp.maximum(jnp.minimum(z_bot, d) - jnp.minimum(z_top, d), 0.0)
        wsum = jnp.maximum(jnp.sum(ov, axis=0), _EPS)
        return jnp.stack([jnp.sum(f * ov, axis=0) / wsum for f in fields])

    ks = jnp.arange(z_c.shape[0])
    refs = jax.lax.map(ref_at, ks)          # (nz, n, ny, nx)
    return jnp.moveaxis(refs, 1, 0)


def kpp_diffusivity(h, u, v, T, S, G, GV, eos, taux, tauy, heat_flux,
                    p: KPPParams = KPPParams(), cp: float = 3991.87,
                    lang_enh=None, la_fn=None, return_rib: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Boundary-layer interface diffusivity, BLD and nonlocal shape.

    Inputs at h points (velocities averaged to centers); returns
    (kd_bl (nz+1, ny, nx) [m2 s-1], hbl (ny, nx) [m],
    nonlocal (nz+1, ny, nx) [nondim] — multiply by the surface tracer
    flux and take the vertical divergence, apply_nonlocal_transport)."""
    from mom6_tpu.framework.stencil import im1, jm1

    nz = h.shape[0]

    # surface friction velocity & buoyancy flux
    tx = 0.5 * (taux + im1(taux))
    ty = 0.5 * (tauy + jm1(tauy))
    ustar = jnp.sqrt(jnp.sqrt(tx * tx + ty * ty) / GV.rho0)
    # surface buoyancy flux [m2 s-3]; sign convention: bflux > 0 =
    # stabilizing (surface heating); zeta = kappa z bflux / u*^3 = z/L
    if heat_flux is None:
        bflux = jnp.zeros_like(ustar)
    else:
        drho_dT, _ = eos.density_derivs(T[0], S[0], jnp.zeros_like(T[0]))
        bflux = -(GV.g_earth / GV.rho0) * drho_dT * heat_flux / \
            (GV.rho0 * cp)

    # layer-center depths and buoyancy from surface-referenced POTENTIAL
    # density (in-situ density would read adiabatic compression as
    # stratification), as an anomaly (full density in f32 carries ~1e-6
    # noise that poisons Rib in neutral water)
    z_c = jnp.cumsum(h, axis=0) - 0.5 * h          # positive down
    rho_anom = eos.density(T, S, jnp.zeros_like(T), rho_ref=GV.rho0)
    b = -(GV.g_earth / GV.rho0) * rho_anom         # buoyancy (anomaly)
    uc = 0.5 * (u + im1(u))
    vc = 0.5 * (v + jm1(v))

    # surface-layer-averaged reference values (the epsilon-layer means of
    # CVMix_kpp_compute_bulk_Richardson, not the top-layer approximation)
    refs = _surface_layer_means(z_c, h, (b, uc, vc), p.surf_layer_ext)
    b_ref, u_ref, v_ref = refs[0], refs[1], refs[2]

    # N at interfaces -> at centers for Vt2
    db = b[:-1] - b[1:]                             # b decreases downward
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), 1e-3)
    n2_int = jnp.maximum(db / dz, 0.0)
    n_int = jnp.sqrt(n2_int)
    # N at layer centers: average the bounding interfaces, one-sided at ends
    if nz > 1:
        n_c = jnp.concatenate(
            [n_int[:1], 0.5 * (n_int[:-1] + n_int[1:]), n_int[-1:]], axis=0)
    else:
        n_c = jnp.zeros_like(b)

    ws_c = _w_scales(z_c, None, ustar[None], bflux[None], p)
    # Cv: constant, or the CVMix Cv(N) = max(1.7, 2.1 - 200 N) option
    # (CVMix_kpp_compute_unresolved_shear's Cv function)
    cv = p.cv if p.cv > 0.0 else jnp.maximum(1.7, 2.1 - 200.0 * n_c)
    vt2_coef = cv * jnp.sqrt(0.2 / (p.cs * p.surf_layer_ext)) / \
        (p.ric * _KAPPA ** (2.0 / 3.0))
    # floor the unresolved shear with a u*-scaled minimum so roundoff in
    # the numerator cannot fabricate Rib crossings in neutral water
    vt2_min = 1e-4 * ustar[None] ** 2 + _EPS
    vt2 = jnp.maximum(vt2_coef * z_c * n_c * ws_c, vt2_min)

    du2 = (u_ref - uc) ** 2 + (v_ref - vc) ** 2
    rib = (b_ref - b) * z_c / jnp.maximum(du2 + vt2, _EPS)

    # boundary-layer depth: interpolated first crossing of rib = ric
    # (CVMix_kpp_compute_OBL_depth interpolates between cell centers).
    # cummax makes the profile monotone so a fractional-segment sum finds
    # the FIRST crossing branchlessly.
    rib_mono = jax.lax.cummax(rib, axis=0)
    rib0 = jnp.zeros_like(rib_mono[:1])
    r_lo = jnp.concatenate([rib0, rib_mono[:-1]], axis=0)
    z_lo = jnp.concatenate([jnp.zeros_like(z_c[:1]), z_c[:-1]], axis=0)
    seg = z_c - z_lo
    frac = jnp.clip((p.ric - r_lo) / jnp.maximum(rib_mono - r_lo, _EPS),
                    0.0, 1.0)
    frac = jnp.where(rib_mono - r_lo < _EPS,
                     jnp.where(r_lo < p.ric, 1.0, 0.0), frac)
    hbl = jnp.sum(seg * frac, axis=0)
    col_depth = jnp.sum(h, axis=0)
    hbl = jnp.minimum(hbl, col_depth)
    hbl = jnp.maximum(hbl, p.min_hbl) * G.mask2dT

    # interface depths & K profile
    z_int = jnp.cumsum(h, axis=0)                   # bottom interfaces of layers
    sigma = jnp.clip(z_int / jnp.maximum(hbl[None], _EPS), 0.0, 1.0)
    shape = sigma * (1.0 - sigma) ** 2
    # LMD94: under unstable forcing w_s below the surface layer is
    # evaluated at d = epsilon*hbl (caps convective enhancement); under
    # stable forcing it uses the actual depth
    d_eval = jnp.where(bflux[None] >= 0.0, z_int,
                       jnp.minimum(z_int, p.surf_layer_ext * hbl[None]))
    ws_int = _w_scales(d_eval, None, ustar[None], bflux[None], p)
    kd = hbl[None] * ws_int * shape
    if la_fn is not None:
        # Langmuir number at the diagnosed boundary-layer depth
        # (get_Langmuir_Number called from KPP_compute_BLD), applied as
        # the Li et al. 2016 velocity-scale factor (LT_K_ENHANCEMENT)
        from mom6_tpu.physics.waves import langmuir_enhancement
        lang_enh = langmuir_enhancement(la_fn(hbl))
    if lang_enh is not None:
        # Langmuir-turbulence enhancement (Li et al. 2016 factor applied
        # to the velocity scale, MOM_CVMix_KPP's LT_K_ENHANCEMENT)
        kd = kd * lang_enh[None]
    # assemble (nz+1): zero at surface and bottom
    kd_full = jnp.concatenate([jnp.zeros_like(kd[:1]), kd], axis=0)
    kd_full = kd_full.at[-1].set(0.0)

    # --- nonlocal transport shape at interfaces (KPP_calculate :884-921):
    # active only when the surface buoyancy forcing destabilizes
    # (surfBuoyFlux < 0 in the reference's loss-positive convention =
    # bflux < 0 here); interface 1 (the surface) stays 0 so the surface
    # forcing is not double-counted, and N vanishes at/below sigma = 1.
    key = p.nlt_shape.upper()
    if key == "CUBIC":
        nlt = (1.0 - sigma) ** 2 * (1.0 + 2.0 * sigma)
    elif key == "LINEAR":
        nlt = 1.0 - sigma
    elif key == "CUBIC_LMD":
        nlt = p.cs2 * sigma * (1.0 - sigma) ** 2
    else:                           # PARABOLIC (MOM6 recommended)
        nlt = (1.0 - sigma) ** 2
    nlt = jnp.where(sigma < 1.0, nlt, 0.0)
    nlt = nlt * (bflux[None] < 0.0)
    nonlocal_full = jnp.concatenate([jnp.zeros_like(nlt[:1]), nlt], axis=0)
    nonlocal_full = nonlocal_full.at[-1].set(0.0)

    if return_rib:
        # parity-gate hook (tests/test_epbl_kpp_parity.py): the raw bulk
        # Richardson profile + layer-center depths behind the BLD search
        return (kd_full * G.mask2dT[None], hbl,
                nonlocal_full * G.mask2dT[None], rib, z_c)
    return kd_full * G.mask2dT[None], hbl, nonlocal_full * G.mask2dT[None]


def apply_nonlocal_transport(scalar, h, nlt, surf_flux, dt):
    """Redistribute a surface flux through the boundary layer with the
    KPP nonlocal shape (KPP_NonLocalTransport, MOM_CVMix_KPP.F90:1699):
      d(scalar)/dt = (N_k - N_{k+1}) / h_k * surf_flux
    Conservative: the column integral of the tendency is zero
    (N_1 = N_{nz+1} = 0).  ``surf_flux`` in [conc m s-1]."""
    dtr = (nlt[:-1] - nlt[1:]) / jnp.maximum(h, 1e-10)
    return scalar + dt * dtr * surf_flux[None]
