"""Forcing-type utilities: rotation and homogenization.

Analogues of the reference's MOM_forcing_type.F90 service routines:

* ``rotate_forcing`` / ``rotate_mech_forcing`` — quarter-turn the forcing
  fields onto a rotated domain (rotate_forcing :3875, rotate_mech_forcing
  :4017), completing the ROTATE_INDEX machinery (grid + state + forcing).
* ``homogenize_mech_forcing`` / ``homogenize_forcing`` — replace each
  forcing field with its global area-weighted mean over wet points
  (homogenize_mech_forcing :4076, homogenize_forcing :4153; the
  WIND_CONFIG/BUOY homogenize debugging aids that isolate
  forcing-pattern sensitivity from model response).
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.framework.array_transform import rotate_scalar, rotate_uv

__all__ = ["rotate_mech_forcing", "rotate_forcing",
           "homogenize_mech_forcing", "homogenize_forcing"]


def _rot2(a):
    return rotate_scalar(a) if a is not None else None


def rotate_mech_forcing(mech):
    """Quarter-turn a MechForcing (taux/tauy rotate as a C-grid vector
    pair; scalars rotate as h-point fields)."""
    taux, tauy = ((None, None) if mech.taux is None
                  else rotate_uv(mech.taux, mech.tauy))
    return mech._replace(taux=taux, tauy=tauy,
                         p_surf=_rot2(mech.p_surf), u10=_rot2(mech.u10))


def rotate_forcing(forcing):
    """Quarter-turn the full Forcing pytree (mech + buoyancy; OBC/ODA
    side-channels are domain-specific and must be rebuilt, as in the
    reference where rotation happens at allocation time)."""
    buoy = forcing.buoy._replace(
        heat_flux=_rot2(forcing.buoy.heat_flux),
        salt_flux=_rot2(forcing.buoy.salt_flux),
        sw_flux=_rot2(forcing.buoy.sw_flux),
        fw_flux=_rot2(forcing.buoy.fw_flux),
        t_restore=_rot2(forcing.buoy.t_restore),
        s_restore=_rot2(forcing.buoy.s_restore))
    return forcing._replace(mech=rotate_mech_forcing(forcing.mech),
                            buoy=buoy)


def _mean_u(a, G):
    w = G.dyCu * G.dxCu * G.mask2dCu
    return jnp.sum(a * w) / jnp.maximum(jnp.sum(w), 1e-30)


def _mean_v(a, G):
    w = G.dxCv * G.dyCv * G.mask2dCv
    return jnp.sum(a * w) / jnp.maximum(jnp.sum(w), 1e-30)


def _mean_t(a, G):
    w = G.areaT * G.mask2dT
    return jnp.sum(a * w) / jnp.maximum(jnp.sum(w), 1e-30)


def _homog_t(a, G):
    return None if a is None else jnp.where(G.mask2dT > 0, _mean_t(a, G),
                                            0.0)


def homogenize_mech_forcing(mech, G):
    """Area-mean wind stresses on their native faces, surface pressure
    and 10 m wind on h cells (homogenize_mech_forcing,
    MOM_forcing_type.F90:4076)."""
    taux = tauy = None
    if mech.taux is not None:
        taux = jnp.where(G.mask2dCu > 0, _mean_u(mech.taux, G), 0.0)
        tauy = jnp.where(G.mask2dCv > 0, _mean_v(mech.tauy, G), 0.0)
    return mech._replace(taux=taux, tauy=tauy,
                         p_surf=_homog_t(mech.p_surf, G),
                         u10=_homog_t(mech.u10, G))


def homogenize_forcing(forcing, G):
    """Homogenize every mechanical and thermodynamic forcing field
    (homogenize_forcing, MOM_forcing_type.F90:4153)."""
    buoy = forcing.buoy._replace(
        heat_flux=_homog_t(forcing.buoy.heat_flux, G),
        salt_flux=_homog_t(forcing.buoy.salt_flux, G),
        sw_flux=_homog_t(forcing.buoy.sw_flux, G),
        fw_flux=_homog_t(forcing.buoy.fw_flux, G),
        t_restore=_homog_t(forcing.buoy.t_restore, G),
        s_restore=_homog_t(forcing.buoy.s_restore, G))
    return forcing._replace(mech=homogenize_mech_forcing(forcing.mech, G),
                            buoy=buoy)
