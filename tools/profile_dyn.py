"""Dyn-core phase attribution at the global_half_deg size (honest
feedback timing — see tools/profile_r5.py for the tunnel-dedup trap).

Each phase fn maps its own args -> args (eps-mixed) so REP applications
chain inside one jit AND the outer timed calls chain through feedback.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t_phase(fn, args, rep=8, n_calls=3, n_warm=1):
    @jax.jit
    def f(a):
        def body(c, _):
            return fn(*c), None
        c, _ = jax.lax.scan(body, a, None, length=rep)
        return c

    x = args
    for _ in range(n_warm):
        x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        x = f(x)
    jax.block_until_ready(x)
    return 1e6 * (time.perf_counter() - t0) / (n_calls * rep)


def main():
    from tools.profile_r5 import _build_global, timeit
    print("backend:", jax.default_backend(), flush=True)
    G, GV, state, params, forcing = _build_global()
    p = params
    from mom6_tpu.core.barotropic import btstep
    from mom6_tpu.core.continuity_ppm import continuity_ppm
    from mom6_tpu.core.coriolis_adv import coriolis_adv
    from mom6_tpu.core.dynamics_split_rk2 import (_visc_setup,
                                                  step_dynamics_split_rk2)
    from mom6_tpu.core.pressure_force import find_eta, pressure_force_fv
    from mom6_tpu.eos import get_eos
    from mom6_tpu.physics.vertical.vert_friction import vertvisc

    eos = get_eos(p.eos_name)
    h, u, v, T, S = state.h, state.u, state.v, state.T, state.S
    dt = p.dyn.dt
    eta = find_eta(h, G)
    h_u, h_v, cu, cv, vr_u, vr_v = _visc_setup(h, u, v, G, GV, p.dyn,
                                               None)
    pf = pressure_force_fv(h, T, S, G, GV, eos)
    _, uh, vh, _, _ = continuity_ppm(u, v, h, dt, G, GV)
    eps = u.dtype.type(1e-30)

    # full dyn step (the quantity the phases must explain); NO donation —
    # the phase closures capture the same buffers
    def dstep(s):
        def pf_fn(hh, st):
            return pressure_force_fv(hh, st.T, st.S, G, GV, eos)
        return step_dynamics_split_rk2(s, forcing.mech, G, GV, p.dyn,
                                       pf_fn=pf_fn)
    sd = jax.jit(dstep)
    x = sd(state)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(6):
        x = sd(x)
    jax.block_until_ready(x)
    td = (time.perf_counter() - t0) / 6
    print(f"dyn_step_total  : {1e3*td:9.2f} ms", flush=True)

    def p_cont(u_, v_, h_):
        h2, uh_, vh_, _, _ = continuity_ppm(u_, v_, h_, dt, G, GV)
        return u_ + eps * uh_, v_ + eps * vh_, h2

    def p_cor(u_, v_):
        cau, cav = coriolis_adv(u_, v_, h, uh, vh, G, GV,
                                scheme=p.dyn.coriolis_scheme)
        return u_ + eps * cau, v_ + eps * cav

    def p_pf(h_):
        o = pressure_force_fv(h_, T, S, G, GV, eos)
        return (h_ + eps * o.eta_PF,)

    zs = jnp.zeros_like(u), jnp.zeros_like(v)

    def p_bt(u_, v_, eta_):
        o = btstep(u_, v_, eta_, zs[0], zs[1], h, uh, vh, vr_u, vr_v,
                   pf.pbce, pf.eta_PF, dt, G, GV, p.dyn.bt,
                   taux=forcing.mech.taux, tauy=forcing.mech.tauy)
        return (u_ + eps * o.accel_layer_u, v_ + eps * o.accel_layer_v,
                o.eta_out)

    def p_vv(u_):
        out = vertvisc(u_, h_u, cu, dt, tau=forcing.mech.taux,
                       rho0=GV.rho0)
        return (u_ + eps * out,)

    def p_vs(h_, u_, v_):
        _, _, _, _, vru, vrv = _visc_setup(h_, u_, v_, G, GV, p.dyn,
                                           None)
        return h_ + eps * vru, u_ + eps * vru, v_ + eps * vrv

    phases = {
        "continuity_ppm": (p_cont, (u, v, h)),
        "coriolis_adv": (p_cor, (u, v)),
        "pressure_force_fv": (p_pf, (h,)),
        "btstep": (p_bt, (u, v, eta)),
        "vertvisc": (p_vv, (u,)),
        "visc_setup": (p_vs, (h, u, v)),
    }
    total = 0.0
    for name, (fn, args) in phases.items():
        us = t_phase(fn, args)
        total += us
        print(f"{name:18s}: {us:9.1f} us", flush=True)
    print(f"{'sum of phases':18s}: {total:9.1f} us "
          f"(x2 per step in RK2 predictor+corrector for some)",
          flush=True)


if __name__ == "__main__":
    main()
