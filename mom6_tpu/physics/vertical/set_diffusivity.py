"""Interface diapycnal diffusivities.

Analogue of MOM6's set_diffusivity (reference:
src/parameterizations/vertical/MOM_set_diffusivity.F90:243 with find_N2
:1095) assembling the total interface diffusivity from:

* a constant background (KD),
* optional Bryan-Lewis-style depth profile (MOM_bkgnd_mixing),
* shear-driven mixing (kappa-shear / CVMix LMD94 — see kappa_shear.py),
* tidal dissipation (St Laurent / Polzin — see tidal_mixing.py),
* BBL-drag contributions (planned).

Also provides ``find_n2``: the squared buoyancy frequency at interfaces,
needed by KPP/shear mixing/GM."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["DiffusivityParams", "set_diffusivity", "find_n2", "bbl_lotw_kd"]

_H_EPS = 1e-3


class DiffusivityParams(NamedTuple):
    kd: float = 1e-5               # background diapycnal diffusivity [m2 s-1]
    kd_min: float = 0.0
    kd_max: float = -1.0           # < 0: no cap (MOM6 KD_MAX default)
    bryan_lewis: bool = False
    bl_kd_surf: float = 1e-5       # surface value of the BL profile
    bl_kd_deep: float = 1.3e-4     # abyssal value
    bl_depth: float = 2500.0       # transition depth [m]
    bl_width: float = 300.0        # transition width [m]
    tidal: Optional["TidalMixingParams"] = None  # INT_TIDE_DISSIPATION
    # BBL-drag-sustained mixing (BOTTOMDRAGLAW + BBL_EFFIC,
    # add_LOTW_BBL_diffusivity MOM_set_diffusivity.F90:1606)
    bbl_effic: float = 0.0         # fraction of BBL dissipation that mixes
    bbl_cdrag: float = 0.003       # drag coefficient for ustar_BBL
    bbl_mixing_max_decay: float = 200.0   # max TKE decay scale [m]
    von_karm: float = 0.41


def find_n2(h, T, S, G, GV, eos, p_ref: float = 2e7):
    """N^2 at interior interfaces (nz-1, ny, nx), from locally-referenced
    potential density differences (cf. find_N2, MOM_set_diffusivity.F90:1095)."""
    drho_dT, drho_dS = eos.density_derivs(T, S, jnp.asarray(p_ref, T.dtype))
    # interface-mean coefficients
    a_T = 0.5 * (drho_dT[:-1] + drho_dT[1:])
    a_S = 0.5 * (drho_dS[:-1] + drho_dS[1:])
    drho = a_T * (T[1:] - T[:-1]) + a_S * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), _H_EPS)
    n2 = (GV.g_earth / GV.rho0) * drho / dz
    return jnp.maximum(n2, 0.0)


def bbl_lotw_kd(h, u, v, T, S, G, GV, eos, p: DiffusivityParams):
    """Law-of-the-wall BBL diffusivity sustained by bottom-drag dissipation
    (reference: add_LOTW_BBL_diffusivity, MOM_set_diffusivity.F90:1606).

    Kd at interface K (height z above bottom, D_minus_z below surface):
        Kd_wall = von_karm * u*^2 * z * (D-z)
                  / (u* * D + |f| * h_bot * (D-z))
    limited so the implied TKE consumption, Kd * dz * N^2, never exceeds
    the remaining BBL_EFFIC fraction of the drag dissipation
    cdrag * |u_bbl|^3, which also decays upward with scale
    min(200 m, u*/|f|).  Implemented as a bottom-up lax.scan over layers.
    """
    from mom6_tpu.framework.stencil import im1, jm1
    # near-bottom speed at T points, averaged over the bottom 10 m of water
    u_t = 0.5 * (u + im1(u))
    v_t = 0.5 * (v + jm1(v))
    sp = jnp.sqrt(u_t * u_t + v_t * v_t)
    z_fb = jnp.cumsum(h[::-1], axis=0)[::-1]
    ov = jnp.minimum(z_fb, 10.0) - jnp.minimum(z_fb - h, 10.0)
    sp_bbl = (jnp.sum(sp * ov, axis=0)
              / jnp.maximum(jnp.sum(ov, axis=0), _H_EPS))
    cdrag_sqrt = p.bbl_cdrag ** 0.5
    ustar = cdrag_sqrt * sp_bbl
    tke_col = p.bbl_effic * p.bbl_cdrag * sp_bbl ** 3       # [m3 s-3]

    f_q = jnp.abs(G.CoriolisBu)
    absf = 0.25 * ((f_q + im1(jm1(f_q))) + (im1(f_q) + jm1(f_q)))
    idecay = jnp.maximum(1.0 / p.bbl_mixing_max_decay,
                         absf / jnp.maximum(ustar, 1e-10))

    n2 = find_n2(h, T, S, G, GV, eos) if T is not None else \
        jnp.zeros_like(h[:-1])
    total_depth = jnp.sum(h, axis=0) + _H_EPS
    ustar_d = ustar * total_depth

    nz = h.shape[0]

    def body(carry, k):
        tke_rem, z_bot, h_bot = carry
        hk = h[k]
        tke_rem = jnp.exp(-idecay * hk) * tke_rem
        z_bot = z_bot + hk
        h_bot = h_bot + hk
        d_minus_z = jnp.maximum(total_depth - z_bot, 0.0)
        denom = ustar_d + absf * (h_bot * d_minus_z)
        kd_wall = jnp.where(
            denom > 0.0,
            (p.von_karm * ustar ** 2) * (z_bot * d_minus_z)
            / jnp.maximum(denom, 1e-30), 0.0)
        # interface K sits between layers k and k-1 (k indexed 0-based,
        # bottom-up iteration over k = nz-1 .. 1)
        dz_int = 0.5 * (h[k] + h[jnp.maximum(k - 1, 0)])
        n2_k = n2[jnp.maximum(k - 1, 0)]
        tke_kd = kd_wall * dz_int * jnp.maximum(n2_k, 1e-10)
        tke_used = jnp.minimum(tke_kd, tke_rem)
        kd_wall = jnp.where(tke_kd > 0.0,
                            (tke_used / jnp.maximum(tke_kd, 1e-30))
                            * kd_wall, 0.0)
        tke_rem = tke_rem - tke_used
        return (tke_rem, z_bot, h_bot), kd_wall

    zero2 = jnp.zeros_like(total_depth)
    ks = jnp.arange(nz - 1, 0, -1)
    _, kd_up = jax.lax.scan(body, (tke_col, zero2, zero2), ks)
    # kd_up[i] is the diffusivity at interface k = nz-1-i (interior, 1..nz-1)
    kd_int = jnp.concatenate(
        [jnp.zeros_like(h[:1]), kd_up[::-1], jnp.zeros_like(h[:1])], axis=0)
    return kd_int * G.mask2dT[None]


def set_diffusivity(h, G, GV, p: DiffusivityParams,
                    kd_extra: Optional[jnp.ndarray] = None,
                    T=None, S=None, eos=None, u=None, v=None,
                    components: Optional[dict] = None):
    """Total interface diffusivity (nz+1, ny, nx) [m2 s-1].

    ``components``: optional dict into which the per-mechanism pieces
    are recorded (the Kd_bkgnd / Kd_BBL / Kd_itides diagnostics of
    MOM_set_diffusivity.F90's register section) for the diag catalog."""
    nz = h.shape[0]
    shape = (nz + 1,) + h.shape[1:]
    kd = jnp.full(shape, p.kd, h.dtype)
    if p.bbl_effic > 0.0 and u is not None and v is not None \
            and eos is not None:
        kd_bbl = bbl_lotw_kd(h, u, v, T, S, G, GV, eos, p)
        if components is not None:
            components["Kd_BBL"] = kd_bbl
        kd = kd + kd_bbl
    if p.tidal is not None and T is not None and eos is not None:
        from mom6_tpu.physics.vertical.tidal_mixing import tidal_mixing_kd
        kd_tide = tidal_mixing_kd(h, T, S, G, GV, eos, p.tidal)
        if components is not None:
            components["Kd_itides"] = kd_tide
        kd = kd + kd_tide
    if p.bryan_lewis:
        # depth of each interface below the surface
        z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                                 jnp.cumsum(h, axis=0)], axis=0)
        prof = p.bl_kd_surf + 0.5 * (p.bl_kd_deep - p.bl_kd_surf) * (
            1.0 + jnp.tanh((z_int - p.bl_depth) / p.bl_width))
        kd = jnp.maximum(kd, prof)
    if components is not None:
        # background = constant KD or the Bryan-Lewis floor, whichever
        # governs at each interface
        bk = jnp.full(shape, p.kd, h.dtype)
        if p.bryan_lewis:
            bk = jnp.maximum(bk, prof)
        components["Kd_bkgnd"] = bk * G.mask2dT[None]
    if kd_extra is not None:
        kd = kd + kd_extra
    kd = jnp.maximum(kd, p.kd_min)
    if p.kd_max > 0:
        kd = jnp.minimum(kd, p.kd_max)
    # no flux through surface/bottom
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return kd * G.mask2dT[None]
