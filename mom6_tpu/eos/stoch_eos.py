"""Stanley parameterized SGS temperature variance correction to the EOS.

Analogue of MOM6's MOM_stoch_eos.F90:261 (Stanley et al. 2020): the mean
density of a grid cell with unresolved temperature variance sigma_T^2
differs from the density of the mean temperature by

    rho_correction = 0.5 * d2rho/dT2 * sigma_T^2,

with sigma_T^2 parameterized from the resolved horizontal T gradients,
sigma_T^2 = (stanley_coeff) * |grad T|^2 * dx^2.  The second derivative
comes from finite differences of the analytic first derivative (exact to
the EOS fit's smoothness, dtype-generic).
"""

from __future__ import annotations

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["sgs_t_variance", "stanley_density_correction"]


def sgs_t_variance(T, G, stanley_coeff: float = 0.5):
    """Parameterized subgrid T variance from resolved gradients [degC2]."""
    dtx = 0.5 * ((ip1(T) - T) + (T - im1(T)))
    dty = 0.5 * ((jp1(T) - T) + (T - jm1(T)))
    return stanley_coeff * (dtx * dtx + dty * dty) * G.mask2dT[None]


def stanley_density_correction(T, S, p, eos, sigma_t2, eps: float = 1e-2):
    """0.5 * d2rho/dT2 * sigma_T^2 [kg m-3] (MOM_stoch_eos.F90:261 role)."""
    if eos.density_second_derivs is not None:
        _, _, d2rho_dt2, _, _ = eos.density_second_derivs(T, S, p)
    else:
        dT_p, _ = eos.density_derivs(T + eps, S, p)
        dT_m, _ = eos.density_derivs(T - eps, S, p)
        d2rho_dt2 = (dT_p - dT_m) / (2.0 * eps)
    return 0.5 * d2rho_dt2 * sigma_t2