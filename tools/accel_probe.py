"""Per-term acceleration breakdown at the blowup epicenter
(k31, j348, i387 of global_half_deg): step the split dynamics with
return_accel and print each term at the worst-growing point.

Usage: python tools/accel_probe.py RUNDIR [N_STEPS]
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
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
    G, GV, state, params, forcing = (ms.grid, ms.vgrid, ms.state,
                                     ms.params, ms.forcing)
    eos = get_eos(params.eos_name)

    def pf_fn(hh, st):
        return pressure_force_fv(hh, st.T, st.S, G, GV, eos)

    step = jax.jit(lambda s: step_dynamics_split_rk2(
        s, forcing.mech, G, GV, params.dyn, pf_fn=pf_fn,
        return_accel=True))

    # watch the v epicenter and whatever the current max is
    for n in range(n_steps):
        state, acc = step(state)
        vmax = np.asarray(jnp.abs(state.v))
        kv, jv, iv = np.unravel_index(np.argmax(vmax), vmax.shape)
        print(f"step {n+1}: max|v| {vmax.max():9.3e} @ k{kv},j{jv},i{iv}",
              flush=True)
        for (k, j, i) in [(int(kv), int(jv), int(iv)), (31, 348, 387)]:
            terms = {
                "v": np.asarray(state.v)[k, j, i],
                "CAv": np.asarray(acc.CAv)[k, j, i],
                "PFv": np.asarray(acc.PFv)[k, j, i],
                "bt_v": np.asarray(acc.v_bt_accel)[k, j, i],
                "diffv": np.asarray(acc.diffv)[k, j, i],
                "visc_v": np.asarray(acc.dv_dt_visc)[k, j, i],
            }
            h_here = np.asarray(state.h)[:, j, i]
            print(f"  ({k},{j},{i}): " + "  ".join(
                f"{t}={v:10.3e}" for t, v in terms.items())
                + f"  h[k]={h_here[k]:8.2e} hcol={h_here.sum():7.1f}",
                flush=True)


if __name__ == "__main__":
    main()
