"""Dyn-only Coriolis-scheme comparison on the global_half_deg init:
step the SPLIT DYNAMICS alone (no thermo) from the clean initial state
and print per-step max |u|,|v| for each scheme.

Usage: python tools/scheme_probe.py RUNDIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rundir = sys.argv[1]
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
    from mom6_tpu.core.pressure_force import pressure_force_fv
    from mom6_tpu.eos import get_eos

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
    G, GV, state0, params, forcing = (ms.grid, ms.vgrid, ms.state,
                                      ms.params, ms.forcing)
    print("h_subroundoff:", GV.h_subroundoff, "angstrom:", GV.angstrom,
          flush=True)
    eos = get_eos(params.eos_name)

    def pf_fn(hh, st):
        return pressure_force_fv(hh, st.T, st.S, G, GV, eos)

    lat = np.asarray(G.geoLatT)
    for scheme in ("SADOURNY75_ENERGY", "ARAKAWA_HSU90",
                   "ARAKAWA_LAMB_BLEND", "SADOURNY75_ENSTRO"):
        p = params.dyn._replace(coriolis_scheme=scheme)
        step = jax.jit(lambda s, p=p: step_dynamics_split_rk2(
            s, forcing.mech, G, GV, p, pf_fn=pf_fn))
        s = state0
        print(f"--- {scheme}", flush=True)
        for n in range(6):
            s = step(s)
            u = np.asarray(jnp.nan_to_num(jnp.abs(s.u), nan=np.inf))
            v = np.asarray(jnp.nan_to_num(jnp.abs(s.v), nan=np.inf))
            ku, ju, iu = np.unravel_index(np.argmax(u), u.shape)
            kv, jv, iv = np.unravel_index(np.argmax(v), v.shape)
            print(f"  step {n+1}: |u| {u.max():10.3e}@k{ku},j{ju},i{iu}"
                  f"(lat{lat[ju, iu]:.0f})  |v| {v.max():10.3e}"
                  f"@k{kv},j{jv},i{iv}(lat{lat[jv, iv]:.0f})", flush=True)


if __name__ == "__main__":
    main()
