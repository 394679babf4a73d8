"""NPZD biogeochemistry package — the generic-tracer coupling surface.

The reference couples external BGC models (MARBL, GFDL's TOPAZ/COBALT)
through the generic-tracer API (src/tracer/MOM_generic_tracer.F90 +
config_src/external/GFDL_ocean_BGC): a package registers N tracers, the
flow control advects/diffuses them with everything else, and a per-step
column callback applies interior sources/sinks driven by the physical
state (T, shortwave, thicknesses) and coupler deposition fluxes.

This package exercises that whole surface with a self-contained
nitrogen-based NPZD ecosystem (Franks 2002 review form): nutrient -
phytoplankton - zooplankton - detritus [mmol N m-3], with

* light-limited, nutrient-limited (Michaelis-Menten) phytoplankton
  growth under a self-shading exponential PAR profile driven by the
  model's penetrating shortwave;
* Holling-III zooplankton grazing with assimilation efficiency;
* linear phytoplankton and quadratic zooplankton mortality to detritus;
* temperature-modulated (Q10) detritus remineralization to nutrient;
* upwind detritus sinking (conservative; the bottom cell retains its
  load — no burial, so total N is exactly conserved without coupler
  deposition);
* atmospheric nitrogen deposition into the top layer from the coupler
  (the Faxa_ndep import of mom_cap.F90:856).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from mom6_tpu.tracers.packages import TracerPackage

__all__ = ["NPZD"]


@dataclass
class NPZD(TracerPackage):
    name: str = "npzd"
    # ecosystem constants (Franks 2002 canonical ranges)
    mu0: float = 2.0 / 86400.0        # max phyto growth [s-1]
    k_no3: float = 0.5                # nutrient half-sat [mmol N m-3]
    k_par: float = 20.0               # light half-sat [W m-2]
    par_frac: float = 0.43            # PAR fraction of shortwave
    k_w: float = 0.04                 # water attenuation [m-1]
    k_chl: float = 0.03               # self-shading [m2 (mmol N)-1]
    graze0: float = 1.0 / 86400.0     # max grazing [s-1]
    k_graze: float = 1.0              # grazing half-sat [mmol N m-3]
    assim: float = 0.7                # zoo assimilation efficiency
    m_phy: float = 0.05 / 86400.0     # phyto mortality [s-1]
    m_zoo: float = 0.2 / 86400.0      # zoo quad mortality [s-1 (mmolN m-3)-1]
    remin0: float = 0.1 / 86400.0     # detritus remineralization [s-1]
    q10: float = 2.0                  # remineralization Q10
    t_ref: float = 10.0               # Q10 reference temperature [degC]
    w_sink: float = 10.0 / 86400.0    # detritus sinking [m s-1]
    # initial conditions [mmol N m-3]
    no3_0: float = 8.0
    phy_0: float = 0.1
    zoo_0: float = 0.05
    det_0: float = 0.0

    def register(self, reg):
        reg.register("no3", units="mmol N m-3", longname="Nitrate")
        reg.register("phy", units="mmol N m-3", longname="Phytoplankton N")
        reg.register("zoo", units="mmol N m-3", longname="Zooplankton N")
        reg.register("det", units="mmol N m-3", longname="Detrital N")

    def init_fields(self, shape, dtype):
        return {
            "no3": jnp.full(shape, self.no3_0, dtype),
            "phy": jnp.full(shape, self.phy_0, dtype),
            "zoo": jnp.full(shape, self.zoo_0, dtype),
            "det": jnp.full(shape, self.det_0, dtype),
        }

    def column_physics(self, fields, h, dt, G, GV, T=None, S=None,
                       forcing=None, **kw):
        no3, phy = fields["no3"], fields["phy"]
        zoo, det = fields["zoo"], fields["det"]

        # --- PAR profile with self-shading: I at layer centers from
        # exponential decay through the overlying attenuation integral
        sw = None
        if forcing is not None and forcing.buoy.sw_flux is not None:
            sw = forcing.buoy.sw_flux
        i0 = self.par_frac * (sw if sw is not None
                              else jnp.zeros_like(h[0]))
        katt = self.k_w + self.k_chl * jnp.maximum(phy, 0.0)
        tau = jnp.cumsum(katt * h, axis=0) - 0.5 * katt * h
        par = i0[None] * jnp.exp(-tau)

        # --- rates (all positive-clipped concentrations)
        no3_p = jnp.maximum(no3, 0.0)
        phy_p = jnp.maximum(phy, 0.0)
        zoo_p = jnp.maximum(zoo, 0.0)
        det_p = jnp.maximum(det, 0.0)
        lim_n = no3_p / (no3_p + self.k_no3)
        lim_i = par / (par + self.k_par)
        growth = self.mu0 * lim_n * lim_i * phy_p
        graze = self.graze0 * phy_p ** 2 \
            / (phy_p ** 2 + self.k_graze ** 2) * zoo_p
        mort_p = self.m_phy * phy_p
        mort_z = self.m_zoo * zoo_p ** 2
        tC = T if T is not None else jnp.full_like(h, self.t_ref)
        remin = self.remin0 * self.q10 ** ((tC - self.t_ref) / 10.0) \
            * det_p

        # positivity limiter: scale each pool's OUTGOING fluxes so the
        # pool cannot be overdrawn in one step; receiving pools see the
        # same scaled flux, so total N is conserved exactly
        def limiter(pool, loss):
            return jnp.minimum(1.0, pool / jnp.maximum(dt * loss, 1e-30))
        growth = growth * limiter(no3_p, growth)
        s_phy = limiter(phy_p, graze + mort_p)
        graze, mort_p = graze * s_phy, mort_p * s_phy
        mort_z = mort_z * limiter(zoo_p, mort_z)
        remin = remin * limiter(det_p, remin)

        no3 = no3 + dt * (-growth + remin)
        phy = phy + dt * (growth - graze - mort_p)
        zoo = zoo + dt * (self.assim * graze - mort_z)
        det = det + dt * ((1.0 - self.assim) * graze + mort_p
                          + mort_z - remin)

        # --- coupler nitrogen deposition into the top layer
        # (Faxa_ndep -> forcing.tr_fluxes["ndep"] [mmol N m-2 s-1])
        ndep = None
        if forcing is not None and getattr(forcing, "tr_fluxes", None):
            ndep = forcing.tr_fluxes.get("ndep")
        if ndep is not None:
            no3 = no3.at[0].add(dt * ndep / jnp.maximum(h[0], 1e-3)
                                * G.mask2dT)

        # --- upwind detritus sinking, flux-form (conservative; no flux
        # through the bottom)
        flux = self.w_sink * det[:-1]                   # leaving layer k
        cfl = 0.9 * h[:-1] / dt
        flux = jnp.minimum(flux, cfl * det[:-1])        # positivity
        det = det.at[:-1].add(-dt * flux / jnp.maximum(h[:-1], 1e-3))
        det = det.at[1:].add(dt * flux / jnp.maximum(h[1:], 1e-3))

        m = G.mask2dT[None]
        return {**fields, "no3": no3 * m, "phy": phy * m,
                "zoo": zoo * m, "det": det * m}
