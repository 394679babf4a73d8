"""Barotropic internal-wave (tidal) drag.

Role of MOM_wave_drag.F90 (reference: wave_drag_init :29 reads a
piston-velocity coefficient map from file; wave_drag_calc :91 multiplies
it with the — typically streaming-filtered tidal — barotropic
velocities to form a linear drag on the external mode).

Two pieces:

* ``wave_drag_piston`` builds the piston-velocity map [m s-1] from the
  same ingredients as the internal-tide conversion, the Jayne &
  St. Laurent (2001) linear wave drag  r = gamma * (kappa h^2 / 2) N_b
  (topographic wavenumber kappa, roughness variance h^2, bottom
  buoyancy frequency N_b) — the analytic stand-in for the reference's
  file-read coefficients;
* the resulting (ny, nx) map feeds ``BTParams.lin_drag`` (btstep's
  implicit barotropic drag accepts an array), or ``wave_drag_accel``
  applies it directly to given barotropic velocities as in
  wave_drag_calc.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["wave_drag_piston", "wave_drag_accel"]


def wave_drag_piston(h, T, S, G, GV, eos, *, gamma: float = 1.0,
                     kappa_itides: float = 2.0 * 3.141592653589793 / 1.25e5,
                     h2=100.0, bbl_thick: float = 100.0):
    """Piston velocity r(x, y) [m s-1] of the linear tidal wave drag,
    r = gamma * (kappa h2 / 2) * N_b  (Jayne & St. Laurent 2001)."""
    from mom6_tpu.physics.vertical.tidal_mixing import (TidalMixingParams,
                                                        _bottom_n2,
                                                        _layer_n2)
    p = TidalMixingParams(bbl_thick=bbl_thick)
    n2_lay = _layer_n2(h, T, S, G, GV, eos)
    nb = jnp.sqrt(_bottom_n2(h, n2_lay, p))
    return (gamma * 0.5 * kappa_itides * h2 * nb) * G.mask2dT


def wave_drag_accel(ubt, vbt, piston, depth_u, depth_v, G):
    """Drag accelerations on the barotropic velocities
    (wave_drag_calc role): a = -r u / D at the faces."""
    from mom6_tpu.framework.stencil import ip1, jp1
    r_u = 0.5 * (piston + ip1(piston)) * G.mask2dCu
    r_v = 0.5 * (piston + jp1(piston)) * G.mask2dCv
    au = -r_u * ubt / jnp.maximum(depth_u, 1e-3)
    av = -r_v * vbt / jnp.maximum(depth_v, 1e-3)
    return au, av
