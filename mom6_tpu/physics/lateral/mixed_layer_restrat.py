"""Mixed-layer restratification by submesoscale eddies (Fox-Kemper).

Analogue of MOM6's MOM_mixed_layer_restrat.F90 (Fox-Kemper et al. 2008,
as implemented for coarse models): an overturning streamfunction in the
mixed layer,

    Psi = C_e * (H_ml^2 * grad_b_ml) / sqrt(f^2 + 1/tau^2),

structured vertically as mu(z) = (1 - (2z/H - 1)^2) (parabolic, zero at
surface and ML base), applied as extra thickness transports confined to
the mixed layer.  Volume-conserving by construction (the streamfunction
vanishes at both ends).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jm1_s0, jp1

__all__ = ["MLRestratParams", "mixedlayer_restrat"]

_EPS = 1e-14


class MLRestratParams(NamedTuple):
    fox_kemper_coef: float = 0.0625   # C_e ~ 0.06-0.08
    ml_restrat_tau: float = 86400.0   # equatorial timescale regularization
    min_f: float = 1e-6


def mixedlayer_restrat(h, T, S, mld, G, GV, eos, dt,
                       p: MLRestratParams = MLRestratParams()
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (h_new, uh_mlr, vh_mlr).  ``mld``: mixed layer depth (ny,nx)."""
    # ML-mean buoyancy from the density anomaly over the mixed layer
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]), jnp.cumsum(h, axis=0)], 0)
    # fraction of each layer inside the ML
    top = z_int[:-1]
    frac = jnp.clip((mld[None] - top) / jnp.maximum(h, 1e-10), 0.0, 1.0)
    w = frac * h
    wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-10)
    rho_a = eos.density(T, S, jnp.zeros_like(T), rho_ref=GV.rho0)
    b_ml = -(GV.g_earth / GV.rho0) * jnp.sum(rho_a * w, axis=0) / wsum

    fold = getattr(G, "fold_north", False)
    kh = "h" if fold else None
    dbdx = (ip1(b_ml) - b_ml) * G.IdxCu * G.mask2dCu
    dbdy = (jp1(b_ml, kh) - b_ml) * G.IdyCv * G.mask2dCv

    f_q = G.CoriolisBu
    f_u = jnp.abs(0.5 * (f_q + jm1(f_q)))
    f_v = jnp.abs(0.5 * (f_q + im1(f_q)))
    itau = 1.0 / p.ml_restrat_tau
    h_ml_u = 0.5 * (mld + ip1(mld))
    h_ml_v = 0.5 * (mld + jp1(mld, kh))
    psi0_u = p.fox_kemper_coef * h_ml_u ** 2 * dbdx / \
        jnp.sqrt(f_u * f_u + itau * itau)
    psi0_v = p.fox_kemper_coef * h_ml_v ** 2 * dbdy / \
        jnp.sqrt(f_v * f_v + itau * itau)

    # vertical structure: psi(z) = psi0 * mu(sigma) with mu(0)=mu(1)=0
    def transports(psi0, h_ml_face, h_face):
        z_if = jnp.concatenate([jnp.zeros_like(h_face[:1]),
                                jnp.cumsum(h_face, axis=0)], 0)
        sig = jnp.clip(z_if / jnp.maximum(h_ml_face[None], _EPS), 0.0, 1.0)
        mu = jnp.maximum(1.0 - (2.0 * sig - 1.0) ** 2, 0.0)
        psi = psi0[None] * mu                       # (nz+1, ...)
        return psi[ :-1] - psi[1:]                  # per-layer [m2 s-1]

    h_u = 0.5 * (h + ip1(h))
    h_v = 0.5 * (h + jp1(h, kh))
    uh = G.dyCu * transports(psi0_u, h_ml_u, h_u) * G.mask2dCu
    vh = G.dxCv * transports(psi0_v, h_ml_v, h_v) * G.mask2dCv

    h_new = h - dt * G.IareaT * ((uh - im1(uh)) + (vh - jm1_s0(vh, fold)))
    h_new = jnp.maximum(h_new, GV.angstrom)
    return h_new, uh, vh
