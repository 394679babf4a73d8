"""MEKE: prognostic mesoscale eddy kinetic energy budget.

Analogue of MOM6's MOM_MEKE.F90 (step_forward_MEKE :174,
MEKE_lengthScales :1183, MEKE_lengthScales_0d :1260): a 2-D
depth-integrated eddy energy equation

    dE/dt = bgsrc + gm_coeff*src_GM + fr_coeff*src_friction
            - (lambda + gamma_b^2 * drag_rate) E + del.(K del E)

advanced with the reference's semi-implicit (Strang) damping:
sources explicit, bottom drag and linear damping as a 1/(1+dt*rate)
implicit factor evaluated at the updated energy.  The drag rate is the
eddy-velocity-dependent
    drag_rate = sqrt(drag_visc^2 + cdrag^2 (2 gamma_b^2 E + Uscale^2)) / H

The eddy mixing length is the harmonic combination of the deformation,
frictional-arrest, Rhines, Eady and grid scales (:1260-1320), each with
its own coefficient; gamma_b (bottom) and gamma_t (barotropic) project
the column energy onto the bottom velocity (for drag) and the
barotropic velocity (for the diffusivity velocity scale):

    gamma_b^2 = cd_scale^2 + [1 + c_b (Ldeform/Lfrict)]^-0.8
    gamma_t^2 = [1 + c_t (Ldeform/Lfrict)]^-0.25

Feedbacks: ``meke_diffusivity`` (K = khcoeff * gamma_t Ue * Lmix) boosts
GM/KhTr; ``meke_viscosity`` (Ku = ku_coeff * gamma_t Ue * Lmix) is the
backscatter (negative Laplacian viscosity) amplitude of the reference's
MEKE_VISCOSITY_COEFF_KU.  All elementwise jnp; one fused update per
thermo step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.framework.stencil import im1, ip1, jm1, jm1_s0, jp1

__all__ = ["MEKEParams", "step_meke", "meke_diffusivity",
           "meke_viscosity", "meke_length_scales", "gm_pe_release"]


class MEKEParams(NamedTuple):
    # sources (MOM_input names in comments)
    gm_src_frac: float = 1.0      # MEKE_GMCOEFF: GM PE release fraction
    fr_coeff: float = 0.0         # MEKE_FRCOEFF: friction dissipation frac
    bgsrc: float = 0.0            # MEKE_BGSRC background source [m2 s-3]
    # sinks
    damping: float = 1e-6         # MEKE_DAMPING linear rate [s-1]
    cdrag: float = 0.003          # CDRAG bottom drag on eddies
    cd_scale: float = 0.0         # MEKE_CD_SCALE: bottom/column vel ratio
    cb: float = 25.0              # MEKE_CB in gamma_b
    ct: float = 50.0              # MEKE_CT in gamma_t
    min_gamma: float = 0.0001     # MEKE_MIN_GAMMA2
    uscale: float = 0.0           # MEKE_USCALE drag background vel [m s-1]
    # transport of E
    kh_meke: float = 100.0        # MEKE_KH [m2 s-1]
    # mixing-length coefficients (MEKE_ALPHA_*)
    a_deform: float = 0.0
    a_frict: float = 0.0
    a_rhines: float = 0.0
    a_eady: float = 0.0
    a_grid: float = 1.0
    l_fixed: float = 0.0          # LFIXED [m]; >0 adds a fixed scale
    # feedback coefficients
    ke_coeff: float = 0.2         # MEKE_KHCOEFF
    ku_coeff: float = 0.0         # MEKE_VISCOSITY_COEFF_KU (backscatter)
    kh_max: float = 2000.0
    topo_beta: float = 0.0        # MEKE_TOPOGRAPHIC_BETA
    # legacy simple length scale (pre-length-scale-machinery runs)
    l_mix: float = 2e4            # fallback when every a_* is 0


def _f_at_h(G):
    q = G.CoriolisBu
    return 0.25 * ((q + im1(jm1(q))) + (im1(q) + jm1(q)))


def meke_length_scales(E, h, G, p: MEKEParams, rd_dx=None, sn=None):
    """(bottomFac2, barotrFac2, LmixScale) per cell
    (MEKE_lengthScales, MOM_MEKE.F90:1183)."""
    depth = jnp.maximum(jnp.sum(h, axis=0), 1e-3)
    l_grid = jnp.sqrt(G.areaT)
    rd_dx = jnp.asarray(1.0 if rd_dx is None else rd_dx)
    l_deform = l_grid * rd_dx
    l_frict = depth / jnp.maximum(p.cdrag, 1e-12)
    ratio = l_deform / jnp.maximum(l_frict, 1e-12)
    bottom2 = p.cd_scale ** 2
    if p.cb > 0.0:
        bottom2 = bottom2 + 1.0 / (1.0 + p.cb * ratio) ** 0.8
    bottom2 = jnp.maximum(bottom2, p.min_gamma)
    if p.ct > 0.0:
        barotr2 = 1.0 / (1.0 + p.ct * ratio) ** 0.25
    else:
        barotr2 = jnp.ones_like(depth)
    barotr2 = jnp.maximum(barotr2, p.min_gamma)

    any_scale = (p.a_deform + p.a_frict + p.a_rhines + p.a_eady
                 + p.a_grid + p.l_fixed) > 0.0
    if not any_scale:
        return bottom2, barotr2, jnp.full_like(depth, p.l_mix)

    ue = jnp.sqrt(2.0 * jnp.maximum(barotr2 * E, 0.0))
    # combined planetary + topographic PV gradient for the Rhines scale
    f_h = _f_at_h(G)
    kh = "h" if getattr(G, "fold_north", False) else None
    df_dx = 0.5 * ((ip1(f_h) - f_h) * G.IdxCu
                   + (f_h - im1(f_h)) * im1(G.IdxCu))
    df_dy = 0.5 * ((jp1(f_h, kh) - f_h) * G.IdyCv
                   + (f_h - jm1(f_h)) * jm1(G.IdyCv))
    if p.topo_beta != 0.0:
        dmax_x = jnp.maximum(jnp.maximum(ip1(depth), depth), 1e-3)
        bt_x = -p.topo_beta * f_h * 0.5 * (
            (ip1(depth) - depth) * G.IdxCu / dmax_x
            + (depth - im1(depth)) * im1(G.IdxCu)
            / jnp.maximum(jnp.maximum(depth, im1(depth)), 1e-3))
        dmax_y = jnp.maximum(jnp.maximum(jp1(depth, kh), depth), 1e-3)
        bt_y = -p.topo_beta * f_h * 0.5 * (
            (jp1(depth, kh) - depth) * G.IdyCv / dmax_y
            + (depth - jm1(depth)) * jm1(G.IdyCv)
            / jnp.maximum(jnp.maximum(depth, jm1(depth)), 1e-3))
        df_dx, df_dy = df_dx + bt_x, df_dy + bt_y
    beta = jnp.sqrt(df_dx ** 2 + df_dy ** 2)
    l_rhines = jnp.sqrt(ue / jnp.maximum(beta, 1e-30))
    sn = jnp.asarray(0.0 if sn is None else sn)
    l_eady = ue / jnp.maximum(sn, 1e-15)

    # harmonic combination (the use_min_lscale=False branch, :1315-1325)
    inv = jnp.zeros_like(depth)
    for a, L in ((p.a_deform, l_deform), (p.a_frict, l_frict),
                 (p.a_rhines, l_rhines), (p.a_eady, l_eady),
                 (p.a_grid, l_grid)):
        if a > 0.0:
            inv = inv + 1.0 / jnp.maximum(a * L, 1e-6)
    if p.l_fixed > 0.0:
        inv = inv + 1.0 / p.l_fixed
    l_mix = 1.0 / jnp.maximum(inv, 1e-30)
    return bottom2, barotr2, l_mix


def step_meke(E, src_gm, h, G, dt, p: MEKEParams = MEKEParams(), *,
              src_mom=None, drag_visc=None, rd_dx=None, sn=None):
    """Advance the depth-mean eddy energy E [m2 s-2] one thermo step.

    ``src_gm``: GM PE release rate per unit mass [m2 s-3];
    ``src_mom``: frictional dissipation rate per unit mass [m2 s-3]
    (the MEKE%mom_src backscatter source, scaled by ``fr_coeff``);
    ``drag_visc``: near-bottom mean-flow speed [m s-1] entering the
    eddy drag rate (drag_rate_visc of :329-355)."""
    depth = jnp.maximum(jnp.sum(h, axis=0), 1e-3)
    bottom2, _, _ = meke_length_scales(E, h, G, p, rd_dx=rd_dx, sn=sn)

    src = p.bgsrc + p.gm_src_frac * jnp.maximum(src_gm, 0.0)
    if src_mom is not None and p.fr_coeff > 0.0:
        src = src + p.fr_coeff * jnp.maximum(src_mom, 0.0)

    # lateral diffusion of E (kh_flux branch, :609-660)
    fold = getattr(G, "fold_north", False)
    kh = "h" if fold else None
    fx = p.kh_meke * G.dyCu * G.IdxCu * (ip1(E) - E) * G.mask2dCu
    fy = p.kh_meke * G.dxCv * G.IdyCv * (jp1(E, kh) - E) * G.mask2dCv
    diff = G.IareaT * ((fx - im1(fx)) + (fy - jm1_s0(fy, fold)))

    e1 = E + dt * (src + diff)
    # eddy-energy-dependent bottom drag rate, applied implicitly at the
    # updated energy (:524-555)
    dvisc = jnp.asarray(0.0 if drag_visc is None else drag_visc)
    drag_rate = jnp.sqrt(
        dvisc ** 2 + p.cdrag ** 2 * (2.0 * bottom2
                                     * jnp.maximum(e1, 0.0)
                                     + p.uscale ** 2)) / depth
    damp_rate = p.damping + drag_rate * bottom2
    e2 = e1 / (1.0 + dt * damp_rate)
    return jnp.maximum(e2, 0.0) * G.mask2dT


def meke_diffusivity(E, p: MEKEParams = MEKEParams(), *, h=None, G=None,
                     rd_dx=None, sn=None):
    """Eddy diffusivity K = khcoeff * gamma_t Ue * Lmix (feeds GM's
    khth_2d and the tracer diffusivity; MEKE%Kh of the reference)."""
    if h is not None and G is not None:
        _, barotr2, l_mix = meke_length_scales(E, h, G, p, rd_dx=rd_dx,
                                               sn=sn)
    else:
        barotr2, l_mix = 1.0, p.l_mix
    ue = jnp.sqrt(2.0 * jnp.maximum(barotr2 * E, 0.0))
    return jnp.minimum(p.ke_coeff * ue * l_mix, p.kh_max)


def meke_viscosity(E, p: MEKEParams = MEKEParams(), *, h=None, G=None,
                   rd_dx=None, sn=None):
    """Backscatter (anti-)viscosity Ku = ku_coeff * gamma_t Ue * Lmix
    (MEKE_VISCOSITY_COEFF_KU; applied as a NEGATIVE Laplacian viscosity
    in hor_visc to return eddy energy to the resolved flow)."""
    if p.ku_coeff == 0.0:
        return None
    if h is not None and G is not None:
        _, barotr2, l_mix = meke_length_scales(E, h, G, p, rd_dx=rd_dx,
                                               sn=sn)
    else:
        barotr2, l_mix = 1.0, p.l_mix
    ue = jnp.sqrt(2.0 * jnp.maximum(barotr2 * E, 0.0))
    return p.ku_coeff * ue * l_mix


def gm_pe_release(h, uhd, vhd, G, GV, T=None, S=None, eos=None):
    """PE release rate by the GM transports [m2 s-3 per unit mass]:
    the work done flattening interfaces, estimated from the bolus flux
    down the thickness gradient (layered form)."""
    # rate ~ g' * sum_k uhD_k * d(e_k)/dx / area; cheap proxy:
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e = csum_below - G.bathyT[None]
    kh = "h" if getattr(G, "fold_north", False) else None
    dedx = (ip1(e) - e) * G.IdxCu
    dedy = (jp1(e, kh) - e) * G.IdyCv
    gp = 0.001 * GV.g_earth  # representative interior reduced gravity
    work = gp * G.IareaT * (jnp.sum(-uhd * dedx, axis=0)
                            + jnp.sum(-vhd * dedy, axis=0))
    col = jnp.maximum(jnp.sum(h, axis=0), 1.0)
    return jnp.maximum(work / col, 0.0)
