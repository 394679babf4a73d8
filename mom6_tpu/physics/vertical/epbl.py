"""Energetically-constrained planetary boundary layer (ePBL).

TPU-native re-design of MOM6's energetic_PBL (reference:
src/parameterizations/vertical/MOM_energetic_PBL.F90, Reichl & Hallberg
2018): the boundary-layer depth is set by an integrated TKE budget —
mechanical energy input m* u*^3 (plus a convective contribution) is
consumed by the potential-energy cost of mixing against stratification,
integrated downward until exhausted.

The reference iterates per column with data-dependent loops; here the
budget is evaluated as a single downward cumulative sum (the energy left
after penetrating each interface), the MLD is the zero crossing found
with a vectorized masked min, and the diffusivity profile inside the
layer follows the same shape as KPP.  This fixed-shape formulation keeps
the scheme one fused kernel (SURVEY.md §7 "column physics divergence").
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

__all__ = ["EPBLParams", "epbl_diffusivity"]

_EPS = 1e-10


class EPBLParams(NamedTuple):
    mstar: float = 1.2        # mechanical TKE efficiency (MSTAR)
    nstar: float = 0.2        # convective energy efficiency (NSTAR)
    mix_len_exp: float = 2.0  # shape exponent
    mke_to_tke_frac: float = 0.0
    min_mld: float = 1.0
    kd_max: float = 1e-1
    c_eps: float = 0.06       # TKE dissipation fraction (was inline)


def epbl_diffusivity(h, T, S, G, GV, eos, taux, tauy, heat_flux,
                     p: EPBLParams = EPBLParams(), cp: float = 3991.87,
                     lang_enh=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (kd (nz+1,ny,nx), mld (ny,nx))."""
    from mom6_tpu.framework.stencil import im1, jm1

    dtype = h.dtype
    tx = 0.5 * (taux + im1(taux))
    ty = 0.5 * (tauy + jm1(tauy))
    ustar = jnp.sqrt(jnp.sqrt(tx * tx + ty * ty) / GV.rho0)

    # buoyancy flux (positive = destabilizing/convective)
    if heat_flux is None:
        wb0 = jnp.zeros_like(ustar)
    else:
        drho_dT, _ = eos.density_derivs(T[0], S[0], jnp.zeros_like(T[0]))
        wb0 = (GV.g_earth / GV.rho0) * drho_dT * heat_flux / (GV.rho0 * cp)
        wb0 = jnp.maximum(wb0, 0.0)

    # Energy balance: the TKE supplied at depth H,
    #   budget(H) = mstar u*^3 + nstar <w'b'> H,
    # is consumed by the buoyancy work of mixing against stratification,
    # modeled as  cost(H) = c_eps u* (1/H) int_0^H N^2 z^2 dz  (the z^2
    # weight is the PE cost of lifting stratified water through the layer;
    # for uniform N^2 this yields the classic H ~ u*/N scaling).  cost is
    # a cumulative sum over interfaces, the MLD the interpolated crossing —
    # one fused kernel in place of the reference's per-column iteration.
    z_int = jnp.cumsum(h, axis=0)                  # interface depths (1..nz)
    # locally-referenced N^2 via EOS derivatives at the interface pressure
    p_int = GV.rho0 * GV.g_earth * z_int[:-1]
    t_i = 0.5 * (T[:-1] + T[1:])
    s_i = 0.5 * (S[:-1] + S[1:])
    a_t, a_s = eos.density_derivs(t_i, s_i, p_int)
    drho = a_t * (T[1:] - T[:-1]) + a_s * (S[1:] - S[:-1])
    dz = jnp.maximum(0.5 * (h[:-1] + h[1:]), 1e-3)
    n2 = jnp.maximum((GV.g_earth / GV.rho0) * drho / dz, 0.0)
    n2_full = jnp.concatenate([n2[:1] * 0.0, n2], axis=0)  # at interfaces 1..nz

    wscale = jnp.maximum(ustar[None], 1e-6)
    cum_nz2 = jnp.cumsum(n2_full * z_int * z_int * h, axis=0)
    cost = p.c_eps * wscale * cum_nz2 / jnp.maximum(z_int, _EPS)
    mstar_eff = p.mstar
    if lang_enh is not None:
        # Langmuir enhancement of the mechanical energy input (the
        # MSTAR_LT pathway of MOM_energetic_PBL / Reichl & Hallberg 2018)
        mstar_eff = p.mstar * lang_enh
    budget = mstar_eff * ustar[None] ** 3 + p.nstar * wb0[None] * z_int

    # continuous MLD: sum full layers while affordable plus the fractional
    # crossing layer (cost is monotone non-decreasing in depth)
    cost_above = jnp.concatenate([jnp.zeros_like(cost[:1]), cost[:-1]], 0)
    frac = jnp.clip((budget - cost_above)
                    / jnp.maximum(cost - cost_above, _EPS), 0.0, 1.0)
    mld = jnp.sum(h * frac, axis=0)
    mld = jnp.maximum(mld, p.min_mld) * G.mask2dT

    # diffusivity profile: K = kappa u* z (1 - z/mld)^e inside the layer
    sigma = jnp.clip(z_int / jnp.maximum(mld[None], _EPS), 0.0, 1.0)
    kd = 0.4 * wscale * z_int * (1.0 - sigma) ** p.mix_len_exp
    kd = jnp.minimum(kd, p.kd_max)
    kd_full = jnp.concatenate([jnp.zeros_like(kd[:1]), kd], axis=0)
    kd_full = kd_full.at[-1].set(0.0)
    return kd_full * G.mask2dT[None], mld
