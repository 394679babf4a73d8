"""Seawater freezing point (reference: src/equation_of_state/MOM_TFreeze.F90).

Forms: LINEAR (TFREEZE_S0_P0 + dTFr_dS*S + dTFr_dp*p) and MILLERO_78.
"""

from __future__ import annotations

__all__ = ["tfreeze_linear", "tfreeze_millero"]


def tfreeze_linear(S, p, tf_s0_p0: float = 0.0, dtfr_ds: float = -0.054,
                   dtfr_dp: float = -7.75e-8):
    """Linear freezing point [degC]; p in Pa."""
    return tf_s0_p0 + dtfr_ds * S + dtfr_dp * p


def tfreeze_millero(S, p):
    """Millero (1978) freezing point of seawater [degC] (PSS-78 S, Pa)."""
    return (-0.0575 * S + 1.710523e-3 * S ** 1.5 - 2.154996e-4 * S * S
            - 7.75e-8 * p)
