"""Online streaming band-pass filters for tidal signals.

Analogue of MOM_streaming_filter.F90 (reference: Filt_accum :147-182,
following Wang et al.'s streaming tidal detection): a pair of coupled
first-order updates per target frequency extracts the instantaneous
narrow-band signal u1 (and its quadrature s1) from a broadband input
while the model runs — no stored time series:

  s1 <- s1 + (w dt) u1
  u1 <- -(w dt) (s1 - alpha u) + (1 - alpha w dt) u1

with w the target frequency and alpha the bandwidth parameter.  The
state (s1, u1) is a pytree carried by the caller (restartable); the
update is one fused elementwise kernel over any field shape, vmappable
over constituents.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["FilterState", "init_filter", "filt_accum"]


class FilterState(NamedTuple):
    s1: jnp.ndarray     # (nf, ...) quadrature component
    u1: jnp.ndarray     # (nf, ...) in-phase narrow-band signal
    omega: jnp.ndarray  # (nf,) target frequencies [s-1]
    alpha: jnp.ndarray  # (nf,) bandwidth parameters [nondim]


def init_filter(omegas, field_shape, alpha=0.05, dtype=jnp.float32):
    """nf-frequency filter state over fields of ``field_shape``."""
    om = jnp.asarray(omegas, dtype).reshape(-1)
    nf = om.shape[0]
    al = jnp.broadcast_to(jnp.asarray(alpha, dtype), (nf,))
    z = jnp.zeros((nf,) + tuple(field_shape), dtype)
    return FilterState(s1=z, u1=z, omega=om, alpha=al)


def filt_accum(state: FilterState, u, dt) -> FilterState:
    """Advance the filters one step with input field ``u``; returns the
    new state (state.u1[k] is the narrow-band signal at omega[k])."""
    extra = (1,) * (state.s1.ndim - 1)
    c1 = (state.omega * dt).reshape((-1,) + extra)
    al = state.alpha.reshape((-1,) + extra)
    s1 = state.s1 + c1 * state.u1
    u1 = -c1 * (s1 - al * u[None]) + (1.0 - al * c1) * state.u1
    return state._replace(s1=s1, u1=u1)
