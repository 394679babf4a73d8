"""Linear equation of state (reference: src/equation_of_state/MOM_EOS_linear.F90).

rho = RHO_T0_S0 + dRho_dT * T + dRho_dS * S  (optionally + dRho_dp * p).
"""

from __future__ import annotations

__all__ = ["density", "density_derivs", "specific_volume"]


def density(T, S, p, rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8,
            rho_ref: float = 0.0):
    return (rho_t0_s0 - rho_ref) + (drho_dt * T + drho_ds * S)


def density_derivs(T, S, p, drho_dt=-0.2, drho_ds=0.8):
    import jax.numpy as jnp
    return (jnp.full_like(T, drho_dt), jnp.full_like(S, drho_ds))


def specific_volume(T, S, p, rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8,
                    spv_ref: float = 0.0):
    rho = density(T, S, p, rho_t0_s0, drho_dt, drho_ds)
    return 1.0 / rho - spv_ref
