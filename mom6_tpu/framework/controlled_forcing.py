"""Controlled forcing: P+I feedback of surface fluxes toward climatology.

Analogue of MOM6's MOM_controlled_forcing (reference:
src/user/MOM_controlled_forcing.F90 apply_ctrl_forcing): the surface
heat flux and freshwater flux acquire proportional plus integral
corrections driven by the model's SST/SSS anomalies from target
climatologies,

    dQ  = -lam_heat * dSST - heat_int,   d(heat_int)/dt = lam_int*dSST
    dFW = +lam_prec * dSSS + prec_int,   d(prec_int)/dt = lam_int*dSSS

so persistent biases are removed by the accumulating integral term
while the proportional part damps fast excursions.  (The reference
additionally decomposes the integral into annual-harmonic bins; the
controller here carries the mean term, the dominant one for climate
drift control.)

Host-side state updated once per forcing segment — the cadence the
reference applies it at — and fed back through the solo driver's
forcing provider.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["ControlledForcing"]


class ControlledForcing:
    def __init__(self, sst_target, sss_target=None, *,
                 lam_heat: float = 0.0, lam_prec: float = 0.0,
                 lam_int_period: float = 0.0):
        """``lam_heat`` [W m-2 K-1] proportional heat feedback;
        ``lam_prec`` [kg m-2 s-1 ppt-1] proportional freshwater feedback;
        ``lam_int_period`` [s]: e-folding time of the integral
        accumulation (0 disables the integral term)."""
        self.sst_target = np.asarray(sst_target, np.float64)
        self.sss_target = None if sss_target is None \
            else np.asarray(sss_target, np.float64)
        self.lam_heat = float(lam_heat)
        self.lam_prec = float(lam_prec)
        self.lam_int_period = float(lam_int_period)
        self.heat_int = np.zeros_like(self.sst_target)
        self.prec_int = None if sss_target is None \
            else np.zeros_like(self.sss_target)

    def update(self, sst, sss, dt: float):
        """Advance the integral terms one segment; returns
        (heat_adjustment [W m-2], fw_adjustment [kg m-2 s-1] or None)."""
        d_sst = np.asarray(sst, np.float64) - self.sst_target
        heat_adj = -self.lam_heat * d_sst
        if self.lam_int_period > 0.0:
            rate = dt / self.lam_int_period
            self.heat_int += -self.lam_heat * rate * d_sst
            heat_adj = heat_adj + self.heat_int
        fw_adj = None
        if self.sss_target is not None and sss is not None:
            d_sss = np.asarray(sss, np.float64) - self.sss_target
            fw_adj = self.lam_prec * d_sss
            if self.lam_int_period > 0.0:
                rate = dt / self.lam_int_period
                self.prec_int += self.lam_prec * rate * d_sss
                fw_adj = fw_adj + self.prec_int
        return heat_adj, fw_adj
