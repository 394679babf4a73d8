"""Mixed-layer depth diagnostics.

Analogue of MOM6's diagnose_MLD (src/diagnostics/): MLD as the depth where
the surface-referenced potential density first exceeds the surface value
by ``drho_crit`` (default 0.03 kg m-3, the deBoyer Montegut criterion),
with interpolated crossing (same branchless pattern as the KPP BLD)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["diagnose_mld"]

_EPS = 1e-14


def diagnose_mld(h, T, S, G, GV, eos, drho_crit: float = 0.03):
    z_c = jnp.cumsum(h, axis=0) - 0.5 * h
    rho = eos.density(T, S, jnp.zeros_like(T), rho_ref=GV.rho0)
    drho = rho - rho[0]
    drho_mono = jax.lax.cummax(drho, axis=0)
    d_lo = jnp.concatenate([jnp.zeros_like(drho_mono[:1]),
                            drho_mono[:-1]], 0)
    z_lo = jnp.concatenate([jnp.zeros_like(z_c[:1]), z_c[:-1]], 0)
    seg = z_c - z_lo
    frac = jnp.clip((drho_crit - d_lo)
                    / jnp.maximum(drho_mono - d_lo, _EPS), 0.0, 1.0)
    frac = jnp.where(drho_mono - d_lo < _EPS,
                     jnp.where(d_lo < drho_crit, 1.0, 0.0), frac)
    mld = jnp.sum(seg * frac, axis=0)
    return jnp.minimum(mld, jnp.sum(h, axis=0)) * G.mask2dT
