"""Variable lateral mixing coefficients (VarMix).

Analogue of MOM6's MOM_lateral_mixing_coeffs.F90 (2183 LoC):

* ``calc_resoln_function`` — how well the first-mode deformation radius
  is resolved (reference :340-470, power-2 branch):

      Res_fn = dx_term / (dx_term + (Res_coef * cg1)^2),
      dx_term = f^2 dx^2 + cg1 * beta * dx^2,

  with cg1 the first-mode gravity wave speed (diagnostics/wave_speed);
  Res_fn -> 1 where eddies are unresolved (parameterizations on) and
  -> 0 where resolved.  Scales Kh / KhTh / KhTr under
  RESOLN_SCALED_KH / _KHTH / _KHTR.

* ``calc_slope_functions`` — the vertical-mean Eady slope-stratification
  product SN_u / SN_v at faces (calc_slope_functions_using_just_e,
  reference :1116-1275): per layer the squared interface slope S2
  (normal slope plus the 4-corner mean of the transverse one) times the
  interfacial N^2 = g'_k / max(Hdn, Hup), integrated with the geometric
  mean thickness and divided by the column depth:

      SN = sqrt( sum_k H_geom S2 g'_k / max(Hdn, Hup) / depth ).

  Slopes are masked where the interface intersects topography
  (H_cutoff = 2 nz Angstrom).  Feeds the Visbeck diffusivity
  KhTh += KHTH_SLOPE_CFF * L^2 * SN (VISBECK_L_SCALE).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["VarMixParams", "calc_resoln_function",
           "calc_slope_functions"]

_EPS = 1e-14


class VarMixParams(NamedTuple):
    # USE_VARIABLE_MIXING master switch lives in the config driver (a
    # None VarMixParams on MOMParams = off)
    resoln_scaled_kh: bool = False      # RESOLN_SCALED_KH
    resoln_scaled_khth: bool = False    # RESOLN_SCALED_KHTH
    resoln_scaled_khtr: bool = False    # RESOLN_SCALED_KHTR
    use_visbeck: bool = False           # USE_VISBECK
    res_coef: float = 1.0               # KH_RES_SCALE_COEF
    res_fn_power: int = 2               # KH_RES_FN_POWER (even)
    khth_slope_cff: float = 0.0         # KHTH_SLOPE_CFF
    khtr_slope_cff: float = 0.0         # KHTR_SLOPE_CFF
    visbeck_l_scale: float = 0.0        # VISBECK_L_SCALE [m]


def calc_resoln_function(cg1, G, p: VarMixParams) -> jnp.ndarray:
    """Res_fn at h points from the first-mode speed cg1 (ny, nx)."""
    f_q = G.CoriolisBu
    f2 = 0.25 * ((f_q ** 2 + im1(jm1(f_q ** 2)))
                 + (im1(f_q ** 2) + jm1(f_q ** 2)))
    # |grad f| as the beta magnitude at h points
    dfdx = (f_q - im1(f_q)) * G.IdxT
    dfdy = (f_q - jm1(f_q)) * G.IdyT
    beta = jnp.sqrt(dfdx * dfdx + dfdy * dfdy)
    dx2 = G.dxT * G.dyT
    dx_term = f2 * dx2 + cg1 * beta * dx2
    if p.res_fn_power == 2:
        return dx_term / (dx_term + (p.res_coef * cg1) ** 2 + _EPS)
    pw = p.res_fn_power // 2
    dt_p = dx_term ** pw
    return dt_p / (dt_p + (p.res_coef * cg1) ** p.res_fn_power + _EPS)


def calc_slope_functions(h, G, GV, p: VarMixParams,
                         e: Optional[jnp.ndarray] = None,
                         n2_int: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(SN_u, SN_v) at u/v faces [s-1].

    ``e``: interface heights (nz+1, ny, nx), positive up (computed from
    h and the bathymetry when omitted).  ``n2_int``: optional interface
    N^2 (nz-1, ny, nx) — used in ALE mode where the layered
    g'/thickness form would see only the coordinate's nominal
    stratification; when omitted, N^2 across interface K is
    g'_K / max(Hdn, Hup) from the layered reduced gravities."""
    nz = h.shape[0]
    h_neglect = GV.h_subroundoff
    h_cutoff = 2.0 * nz * (GV.angstrom + h_neglect)
    if e is None:
        csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
        e = jnp.concatenate([csum_below, jnp.zeros_like(h[:1])],
                            axis=0) - G.bathyT[None]
    # interior interfaces K = 1..nz-1
    eK = e[1:nz]
    ex = (ip1(eK) - eK) * G.IdxCu              # at u faces
    ey = (jp1(eK, "h" if getattr(G, "fold_north", False) else None)
          - eK) * G.IdyCv                      # at v faces
    # mask slopes where the interface intersects topography: the layers
    # bounding interface K are k-1 = K-1 and k = K (0-based h indices)
    h_up, h_dn = h[:-1], h[1:]                 # bounding layers per iface
    thin_u = (jnp.minimum(jnp.minimum(h_up, ip1(h_up)),
                          jnp.minimum(h_dn, ip1(h_dn))) < h_cutoff)
    thin_v = (jnp.minimum(jnp.minimum(h_up, jp1(h_up)),
                          jnp.minimum(h_dn, jp1(h_dn))) < h_cutoff)
    ex = jnp.where(thin_u, 0.0, ex) * G.mask2dCu
    ey = jnp.where(thin_v, 0.0, ey) * G.mask2dCv

    ex2, ey2 = ex * ex, ey * ey
    # S2 at u faces: own ex^2 + 4-corner mean of ey^2 (reference :1201)
    s2_u = ex2 + 0.25 * ((ey2 + ip1(jm1(ey2))) + (ip1(ey2) + jm1(ey2)))
    s2_v = ey2 + 0.25 * ((ex2 + im1(jp1(ex2))) + (jp1(ex2) + im1(ex2)))

    # harmonic bounding thicknesses and interfacial N^2
    hdn = 2.0 * h_dn * h_up / (h_dn + h_up + h_neglect)
    hdn_u, hup_u = hdn, ip1(hdn)
    hdn_v, hup_v = hdn, jp1(hdn)
    hgeom_u = jnp.sqrt(hdn_u * hup_u)
    hgeom_v = jnp.sqrt(hdn_v * hup_v)
    if n2_int is not None:
        n2_u = 0.5 * (n2_int + ip1(n2_int))
        n2_v = 0.5 * (n2_int + jp1(n2_int))
        s2n2_u = hgeom_u * s2_u * jnp.maximum(n2_u, 0.0)
        s2n2_v = hgeom_v * s2_v * jnp.maximum(n2_v, 0.0)
    else:
        gp = jnp.asarray(GV.g_prime)[1:nz, None, None]   # interior g'
        s2n2_u = hgeom_u * s2_u * gp \
            / jnp.maximum(jnp.maximum(hdn_u, hup_u), 1e-3)
        s2n2_v = hgeom_v * s2_v * gp \
            / jnp.maximum(jnp.maximum(hdn_v, hup_v), 1e-3)

    depth_u = jnp.maximum(jnp.maximum(G.bathyT, ip1(G.bathyT)), 1e-3)
    depth_v = jnp.maximum(jnp.maximum(G.bathyT, jp1(G.bathyT)), 1e-3)
    sn_u = jnp.sqrt(jnp.sum(s2n2_u, axis=0) / depth_u) * G.mask2dCu
    sn_v = jnp.sqrt(jnp.sum(s2n2_v, axis=0) / depth_v) * G.mask2dCv
    return sn_u, sn_v
