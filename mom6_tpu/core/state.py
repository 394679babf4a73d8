"""Model state pytree.

Analogue of the prognostic parts of MOM6's control structure / thermo_var_ptrs
(reference: src/core/MOM_variables.F90), as one immutable pytree of dense
arrays with shape (nz, ny, nx):

* ``h``  layer thickness [m] at h-points
* ``u``  zonal velocity [m s-1] at u-points (east faces)
* ``v``  meridional velocity [m s-1] at v-points (north faces)
* ``T``/``S`` optional potential temperature [degC] / salinity [ppt]
* ``uh``/``vh`` diagnosed volume transports [m3 s-1] of the last step
* ``uhtr``/``vhtr`` time-integrated transports for tracer advection [m3]

All dynamics functions are pure: ``state -> state``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mom6_tpu.framework.pytree import pytree_dataclass

__all__ = ["OceanState", "init_state_resting"]


@pytree_dataclass
class OceanState:
    h: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    T: Optional[jnp.ndarray] = None
    S: Optional[jnp.ndarray] = None
    uh: Optional[jnp.ndarray] = None
    vh: Optional[jnp.ndarray] = None
    uhtr: Optional[jnp.ndarray] = None
    vhtr: Optional[jnp.ndarray] = None
    E_meke: Optional[jnp.ndarray] = None   # (ny, nx) eddy energy [m2 s-2]
    En_itide: Optional[jnp.ndarray] = None  # (n_angle, ny, nx) internal-tide
    #                                         energy density [J m-2 / bin]
    # registry-driven passive tracers (MOM_tracer_registry role): a dict
    # {name: (nz, ny, nx)}; names starting with "_" are package scalars
    # (clocks etc.) that are carried but never advected/diffused
    tr: Optional[dict] = None
    # model time [s] since start (drives astronomical tidal forcing)
    time: Optional[jnp.ndarray] = None
    # stochastic physics (SPPT/SKEB): AR(1) patterns + PRNG key
    sppt_pattern: Optional[jnp.ndarray] = None  # (ny, nx)
    skeb_pattern: Optional[jnp.ndarray] = None  # (ny, nx) at q points
    rng_key: Optional[jnp.ndarray] = None       # jax PRNG key data
    # open-boundary segment tracer reservoirs (update_segment_tracer_
    # reservoirs role; values only meaningful on the boundary strip)
    obc_res_T: Optional[jnp.ndarray] = None     # (nz, ny, nx)
    obc_res_S: Optional[jnp.ndarray] = None
    # RK2b scheme restart fields (MOM_dynamics_split_RK2b.F90): the 2-D
    # barotropic corrections relating the prognostic time-filtered
    # velocities to the instantaneous ones,
    # u_inst = u - du_av_inst * visc_rem_u
    du_av_inst: Optional[jnp.ndarray] = None    # (ny, nx) at u faces
    dv_av_inst: Optional[jnp.ndarray] = None    # (ny, nx) at v faces
    # accumulated frazil heat deficit [J m-2] since the coupler last
    # collected it (CS%tv%frazil role, MOM_variables.F90; exported as
    # Fioo_q by the NUOPC cap).  None = not tracked.
    frazil: Optional[jnp.ndarray] = None
    # interface viscosity from the boundary-layer + shear-mixing schemes
    # at h points [(nz+1, ny, nx), m2 s-1] — the visc%Kv_shear/Kv_slow
    # role of MOM_set_viscosity/MOM_vert_friction: computed in the
    # thermo block, consumed by the next cycle's implicit vertical
    # friction (restart-registered so the first post-restart dyn step
    # sees the same viscosity, as the reference's "Kv_shear" restart)
    kv_shear: Optional[jnp.ndarray] = None


def init_state_resting(grid, vgrid, thicknesses, dtype=jnp.float32,
                       with_thermo: bool = False) -> OceanState:
    """Resting initial state with prescribed layer thickness profile.

    ``thicknesses`` is an (nz,) profile; each column is clipped against the
    local bathymetry so that the column sum equals the depth (thin layers
    collapse to the Angstrom thickness over shallow topography), following
    the intent of MOM6 THICKNESS_CONFIG="uniform"
    (src/initialization/MOM_state_initialization.F90).
    """
    nz = vgrid.nz
    ny, nx = grid.ny, grid.nx
    prof = jnp.asarray(thicknesses, dtype=dtype)
    # interface depths of the nominal profile (0 at surface, positive down)
    e_nom = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(prof)])
    depth = grid.bathyT[None, :, :]
    e = jnp.minimum(e_nom[:, None, None], depth)  # clip interfaces to bottom
    h = jnp.maximum(e[1:] - e[:-1], vgrid.angstrom)
    h = h * grid.mask2dT[None] + vgrid.angstrom * (1.0 - grid.mask2dT[None])
    def z():
        # distinct buffers: donation (jit donate_argnums) rejects a state
        # whose fields alias the same underlying array
        return jnp.zeros((nz, ny, nx), dtype)

    st = OceanState(h=h.astype(dtype), u=z(), v=z(), uh=z(), vh=z(),
                    uhtr=z(), vhtr=z())
    if with_thermo:
        st = st.replace(T=jnp.full((nz, ny, nx), 10.0, dtype),
                        S=jnp.full((nz, ny, nx), 35.0, dtype))
    return st
