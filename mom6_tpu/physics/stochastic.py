"""Stochastic physics: SPPT and SKEB-style perturbations.

Analogue of MOM6's stochastic hooks (reference:
src/parameterizations/stochastic/MOM_stochastics.F90:452 — SPPT diabatic
tendency perturbation, ePBL perturbations, apply_skeb; pattern generation
delegated there to an external package, implemented here natively).

Pattern generator: a first-order autoregressive (AR1) field with spatial
smoothing — red in time, correlated in space — built from the JAX
counter-based PRNG so runs are reproducible and restartable from (key,
step) alone.  All jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["SPPTParams", "ar1_pattern", "apply_sppt", "apply_skeb"]


class SPPTParams(NamedTuple):
    amplitude: float = 0.5       # pattern std dev (clipped at +-1)
    tau: float = 6.0 * 3600.0    # decorrelation time [s]
    smooth_passes: int = 4       # spatial smoothing (sets length scale)
    clip: float = 0.8


def _smooth(x, n):
    for _ in range(n):
        x = 0.5 * x + 0.125 * ((ip1(x) + im1(x)) + (jp1(x) + jm1(x)))
    return x


def ar1_pattern(pattern, key, dt, shape, p: SPPTParams):
    """Advance the AR1 pattern one step; returns (new_pattern, new_key)."""
    key, sub = jax.random.split(key)
    phi = jnp.exp(-dt / p.tau)
    noise = jax.random.normal(sub, shape)
    noise = _smooth(noise, p.smooth_passes)
    # renormalize the smoothed noise to unit variance
    noise = noise / jnp.maximum(jnp.std(noise), 1e-12)
    new = phi * pattern + jnp.sqrt(jnp.maximum(1.0 - phi * phi, 0.0)) * \
        p.amplitude * noise
    return new, key


def apply_sppt(tendency, pattern, p: SPPTParams):
    """Multiply a (diabatic) tendency by (1 + clipped pattern) — the SPPT
    perturbation of Buizza et al. applied as in MOM_stochastics."""
    r = jnp.clip(pattern, -p.clip, p.clip)
    return tendency * (1.0 + r)[None]


def apply_skeb(u, v, pattern, ke_scale: float, p: SPPTParams):
    """Stochastic kinetic energy backscatter: rotational forcing from the
    pattern's streamfunction (apply_skeb role)."""
    # psi lives at q (corner) points: u(I,j) couples the corners above and
    # below the face, v(i,J) the corners left/right — exactly div-free on
    # the C grid
    psi = pattern * ke_scale
    du = -(psi - jm1(psi))        # u += -dpsi/dy
    dv = (psi - im1(psi))         # v += +dpsi/dx
    return u + du[None], v + dv[None]