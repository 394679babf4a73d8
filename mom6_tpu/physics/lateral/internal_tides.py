"""Low-mode internal tide propagation (energy-density ray tracing).

TPU-native re-design of MOM6's MOM_internal_tides.F90 (propagate_int_tide
:236, refraction via propagate_corner/teleport machinery, itidal_lowmode
losses): the internal-tide energy density En(angle, y, x) per vertical
mode propagates horizontally at the group speed along a discretized set
of ray directions, refracts as the mode speed varies, and loses energy
to background decay and wave drag; the loss field feeds the lowmode term
of tidal mixing.

Where the reference pushes energy between angular bins with per-cell
corner transports and a halo "teleport" pass, everything here is
flux-form upwind advection, vectorized over the whole
(n_angle, ny, nx) block at once:

* spatial propagation: upwind fluxes with velocity
  (cg cos(th_a), cg sin(th_a)) per angle, where the group speed is
  cg = cn sqrt(max(0, 1 - f^2/w^2)) for mode speed cn and frequency w;
* refraction: upwind transport in the (periodic) angle dimension with
  the ray-theory turning rate  dth/dt = sin(th) dc/dx - cos(th) dc/dy;
* forcing: a (1 - q_local) share of the barotropic-to-internal-tide
  conversion enters isotropically across angles;
* losses: a uniform background decay rate plus a quadratic (Froude-like)
  saturation drag; the column loss [W m-2] is returned for the
  tidal-mixing lowmode deposition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["InternalTidesParams", "init_int_tide_energy",
           "step_internal_tides"]


class InternalTidesParams(NamedTuple):
    n_angle: int = 8                 # angular bins (INTERNAL_TIDE_ANGLES)
    freq: float = 1.4052e-4          # M2 frequency [s-1]
    q_local: float = 0.3333          # locally dissipated fraction (Gamma)
    decay_rate: float = 0.0          # uniform background loss [s-1]
    drag_coef: float = 1e-4          # quadratic saturation drag [m-1]-ish
    cg_max: float = 4.0              # group-speed cap [m s-1]
    en_check: float = 1e-20          # negative-energy floor


def init_int_tide_energy(p: InternalTidesParams, ny: int, nx: int,
                         dtype=jnp.float32):
    """Zero energy density (n_angle, ny, nx) [J m-2 per bin]."""
    return jnp.zeros((p.n_angle, ny, nx), dtype)


def _upwind_div_x(E, cgx, G):
    """Flux-form upwind x transport divergence for (na, ny, nx) energy
    with per-angle face speeds cgx (na, ny, nx at u faces)."""
    face = (G.dyCu * G.mask2dCu)[None]
    flux = face * (jnp.maximum(cgx, 0.0) * E
                   + jnp.minimum(cgx, 0.0) * ip1(E))
    return G.IareaT[None] * (flux - im1(flux))


def _upwind_div_y(E, cgy, G):
    face = (G.dxCv * G.mask2dCv)[None]
    flux = face * (jnp.maximum(cgy, 0.0) * E
                   + jnp.minimum(cgy, 0.0) * jp1(E))
    return G.IareaT[None] * (flux - jm1(flux))


def _refract(E, rate, dt):
    """Periodic upwind transport in the angle dimension (axis 0) with
    per-cell-per-angle turning rate [rad s-1] scaled to bins."""
    na = E.shape[0]
    dth = 2.0 * np.pi / na
    w = rate * dt / dth                         # bins moved this step
    w = jnp.clip(w, -1.0, 1.0)                  # angular CFL
    flux = jnp.maximum(w, 0.0) * E + jnp.minimum(w, 0.0) * jnp.roll(E, -1,
                                                                    axis=0)
    return E - (flux - jnp.roll(flux, 1, axis=0))


def step_internal_tides(En, tke_input, cn, G, GV, dt,
                        p: InternalTidesParams):
    """Advance the energy density one step.

    En: (n_angle, ny, nx) [J m-2/bin]; tke_input: (ny, nx) [W m-2]
    barotropic conversion; cn: (ny, nx) mode speed [m s-1].

    Returns (En_new, loss) with loss the column dissipation [W m-2]
    available to tidal mixing's lowmode deposition."""
    na = p.n_angle
    dtype = En.dtype
    th = jnp.asarray(2.0 * np.pi * (np.arange(na) + 0.5) / na, dtype)
    cos_t = jnp.cos(th)[:, None, None]
    sin_t = jnp.sin(th)[:, None, None]

    f2 = G.CoriolisBu ** 2
    f2_h = 0.25 * (f2 + im1(f2) + jm1(f2) + im1(jm1(f2)))
    sub = jnp.maximum(1.0 - f2_h / (p.freq ** 2), 0.0)
    cg = jnp.minimum(cn * jnp.sqrt(sub), p.cg_max) * G.mask2dT

    # --- forcing: (1-q_local) of the conversion, isotropic over bins ---
    En = En + (dt * (1.0 - p.q_local) / na) * tke_input[None]

    # --- refraction (ray turning as c varies) --------------------------
    dcdx = (ip1(cg) - im1(cg)) * (0.5 * G.IdxT)
    dcdy = (jp1(cg) - jm1(cg)) * (0.5 * G.IdyT)
    rate = sin_t * dcdx[None] - cos_t * dcdy[None]
    En = _refract(En, rate, dt)

    # --- propagation (upwind, per angle) -------------------------------
    cg_u = 0.5 * (cg + ip1(cg)) * G.mask2dCu
    cg_v = 0.5 * (cg + jp1(cg)) * G.mask2dCv
    cgx = cos_t * cg_u[None]
    cgy = sin_t * cg_v[None]
    En = En - dt * (_upwind_div_x(En, cgx, G) + _upwind_div_y(En, cgy, G))
    En = jnp.maximum(En, 0.0)

    # --- losses ---------------------------------------------------------
    e_tot = jnp.sum(En, axis=0)
    # quadratic saturation: rate grows with the energy itself (Froude-like
    # capping of large E), plus the uniform background
    rate_loss = p.decay_rate + p.drag_coef * jnp.sqrt(
        jnp.maximum(e_tot, 0.0) / GV.rho0)
    damp = 1.0 / (1.0 + dt * rate_loss)
    En_new = En * damp[None]
    loss = jnp.sum(En - En_new, axis=0) / dt     # [W m-2]
    return En_new * G.mask2dT[None], loss * G.mask2dT
