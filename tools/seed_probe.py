"""Where does the first acceleration come from?  Evaluate the t=0 RHS
pieces (pressure force, Coriolis/KE, barotropic accel) of the
global_half_deg state and print their extrema + locations.

Usage: python tools/seed_probe.py RUNDIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def locmax(name, f, G, shape3=None):
    a = np.abs(np.asarray(f))
    idx = np.unravel_index(np.argmax(a), a.shape)
    lat = np.asarray(G.geoLatT)
    j, i = idx[-2], idx[-1]
    print(f"{name:12s} max {a[idx]:11.4e} @ {idx} lat={lat[j, i]:.1f}",
          flush=True)


def main():
    rundir = sys.argv[1]
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    cfgs = [os.path.join(rundir, "MOM_input")]
    ov = os.path.join(rundir, "MOM_override")
    if os.path.exists(ov):
        cfgs.append(ov)
    cwd = os.getcwd()
    os.chdir(rundir)
    try:
        ms = build_model_from_params(ParamFile(cfgs))
    finally:
        os.chdir(cwd)
    G, GV, state, params, forcing = (ms.grid, ms.vgrid, ms.state,
                                     ms.params, ms.forcing)
    p = params
    from mom6_tpu.core.continuity_ppm import continuity_ppm
    from mom6_tpu.core.coriolis_adv import coriolis_adv
    from mom6_tpu.core.pressure_force import pressure_force_fv
    from mom6_tpu.eos import get_eos
    eos = get_eos(p.eos_name)
    h, u, v, T, S = state.h, state.u, state.v, state.T, state.S

    @jax.jit
    def rhs():
        pf = pressure_force_fv(h, T, S, G, GV, eos)
        _, uh, vh, _, _ = continuity_ppm(u, v, h, p.dyn.dt, G, GV)
        cau, cav = coriolis_adv(u, v, h, uh, vh, G, GV,
                                scheme=p.dyn.coriolis_scheme)
        return pf.PFu, pf.PFv, cau, cav, pf.pbce

    PFu, PFv, cau, cav, pbce = jax.device_get(rhs())
    locmax("PFu", PFu, G)
    locmax("PFv", PFv, G)
    locmax("CAu", cau, G)
    locmax("CAv", cav, G)
    # PF accel summed over a column weighted by h (what the BT mode sees)
    hn = np.asarray(h)
    wu = (hn * np.asarray(PFu)).sum(0) / hn.sum(0)
    wv = (hn * np.asarray(PFv)).sum(0) / hn.sum(0)
    locmax("PFu_depthavg", wu, G)
    locmax("PFv_depthavg", wv, G)
    # top/bottom layer separately
    locmax("PFu_k0", PFu[0], G)
    locmax("PFu_k31", PFu[-1], G)
    # print a j-profile of the worst |PF| per row
    a = np.maximum(np.abs(PFu), np.abs(PFv)).max(0)
    prof = a.max(axis=1)
    for j in range(0, a.shape[0], 16):
        print(f"  j={j:3d} maxPF={prof[j]:9.3e}", flush=True)
    j0 = int(np.argmax(prof))
    print("worst row:", j0, prof[j0], flush=True)


if __name__ == "__main__":
    main()
