"""A/B the Pallas continuity kernels inside the full continuity_ppm
call at the global_half_deg size (feedback-chained timing; run twice
with MOM6_TPU_CONTINUITY=xla / =pallas)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from tools.profile_r5 import _build_global
    mode = os.environ.get("MOM6_TPU_CONTINUITY", "auto")
    print("backend:", jax.default_backend(), "mode:", mode, flush=True)
    G, GV, state, params, forcing = _build_global()
    p = params
    from mom6_tpu.core.continuity_ppm import continuity_ppm
    from mom6_tpu.core.dynamics_split_rk2 import step_dynamics_split_rk2
    from mom6_tpu.core.pressure_force import pressure_force_fv
    from mom6_tpu.eos import get_eos

    eos = get_eos(p.eos_name)
    h, u, v = state.h, state.u, state.v
    dt = p.dyn.dt
    eps = u.dtype.type(1e-30)
    uhbt = jnp.sum(
        continuity_ppm(u, v, h, dt, G, GV)[1], axis=0)
    vhbt = jnp.sum(
        continuity_ppm(u, v, h, dt, G, GV)[2], axis=0)

    # matched continuity (the Newton loop — what btstep uses)
    @jax.jit
    def cont(c):
        u_, v_, h_ = c
        def body(cc, _):
            uu, vv, hh = cc
            h2, uh, vh, _, _ = continuity_ppm(uu, vv, hh, dt, G, GV,
                                              uhbt=uhbt, vhbt=vhbt)
            return (uu + eps * uh, vv + eps * vh, h2), None
        c, _ = jax.lax.scan(body, c, None, length=4)
        return c

    x = (u, v, h)
    x = cont(x); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(4):
        x = cont(x)
    jax.block_until_ready(x)
    t_matched = 1e6 * (time.perf_counter() - t0) / 16
    print(f"continuity(matched) : {t_matched:9.1f} us", flush=True)

    # plain continuity (no Newton)
    @jax.jit
    def cont0(c):
        u_, v_, h_ = c
        def body(cc, _):
            uu, vv, hh = cc
            h2, uh, vh, _, _ = continuity_ppm(uu, vv, hh, dt, G, GV)
            return (uu + eps * uh, vv + eps * vh, h2), None
        c, _ = jax.lax.scan(body, c, None, length=4)
        return c

    x = (u, v, h)
    x = cont0(x); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(4):
        x = cont0(x)
    jax.block_until_ready(x)
    t_plain = 1e6 * (time.perf_counter() - t0) / 16
    print(f"continuity(plain)   : {t_plain:9.1f} us", flush=True)

    # full dyn step
    def dstep(s):
        def pf_fn(hh, st):
            return pressure_force_fv(hh, st.T, st.S, G, GV, eos)
        return step_dynamics_split_rk2(s, forcing.mech, G, GV, p.dyn,
                                       pf_fn=pf_fn)
    sd = jax.jit(dstep)
    x = sd(state); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(6):
        x = sd(x)
    jax.block_until_ready(x)
    td = (time.perf_counter() - t0) / 6
    print(f"dyn_step_total      : {1e3*td:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
