"""MEKE: prognostic mesoscale eddy kinetic energy budget.

Analogue of MOM6's MOM_MEKE.F90 (step_forward_MEKE :174): a 2-D
depth-integrated eddy energy equation

    dE/dt = src_GM + src_friction - lambda E - C_d E^(3/2)/L + del.(K del E)

whose equilibrium energy sets an eddy velocity scale U_e = sqrt(2E) and an
eddy diffusivity  K_MEKE = gamma * U_e * L_mix  fed back to GM/backscatter.
One explicit elementwise update per thermo step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jp1

__all__ = ["MEKEParams", "step_meke", "meke_diffusivity"]


class MEKEParams(NamedTuple):
    gm_src_frac: float = 1.0      # fraction of GM PE release feeding MEKE
    damping: float = 1e-6         # linear damping lambda [s-1]
    cdrag: float = 0.003          # bottom drag on eddies
    kh_meke: float = 100.0        # diffusion of MEKE itself [m2 s-1]
    l_mix: float = 2e4            # eddy mixing length [m]
    ke_coeff: float = 0.2         # K = ke_coeff * Ue * L_mix
    kh_max: float = 2000.0


def step_meke(E, src_gm, h, G, dt, p: MEKEParams = MEKEParams()):
    """Advance the depth-mean eddy energy E [m2 s-2] one step.

    ``src_gm``: PE release rate per unit mass [m2 s-3] (from GM work)."""
    col = jnp.maximum(jnp.sum(h, axis=0), 1.0)
    src = p.gm_src_frac * jnp.maximum(src_gm, 0.0)
    sink = p.damping * E + p.cdrag * E * jnp.sqrt(jnp.maximum(2.0 * E, 0.0)) \
        / p.l_mix
    # lateral diffusion of E
    fx = p.kh_meke * G.dyCu * G.IdxCu * (ip1(E) - E) * G.mask2dCu
    fy = p.kh_meke * G.dxCv * G.IdyCv * (jp1(E) - E) * G.mask2dCv
    diff = G.IareaT * ((fx - im1(fx)) + (fy - jm1(fy)))
    E_new = E + dt * (src - sink + diff)
    return jnp.maximum(E_new, 0.0) * G.mask2dT


def meke_diffusivity(E, p: MEKEParams = MEKEParams()):
    """Eddy diffusivity from the MEKE field (feeds GM's khth_2d)."""
    ue = jnp.sqrt(jnp.maximum(2.0 * E, 0.0))
    return jnp.minimum(p.ke_coeff * ue * p.l_mix, p.kh_max)


def gm_pe_release(h, uhd, vhd, G, GV, T=None, S=None, eos=None):
    """PE release rate by the GM transports [m2 s-3 per unit mass]:
    the work done flattening interfaces, estimated from the bolus flux
    down the thickness gradient (layered form)."""
    # rate ~ g' * sum_k uhD_k * d(e_k)/dx / area; cheap proxy:
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e = csum_below - G.bathyT[None]
    dedx = (ip1(e) - e) * G.IdxCu
    dedy = (jp1(e) - e) * G.IdyCv
    gp = 0.001 * GV.g_earth  # representative interior reduced gravity
    work = gp * G.IareaT * (jnp.sum(-uhd * dedx, axis=0)
                            + jnp.sum(-vhd * dedy, axis=0))
    col = jnp.maximum(jnp.sum(h, axis=0), 1.0)
    return jnp.maximum(work / col, 0.0)
