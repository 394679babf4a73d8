"""Headline benchmark: full-physics ocean model throughput on one chip.

Prints ONE JSON line whose headline metric is the FULL-PHYSICS
benchmark-class case (EOS + KPP boundary layer + GM/MEKE + passive tracer
+ z* ALE regrid/remap, 360x280x32), with an OM4_025-shaped case
(1440x1080x75) and the adiabatic dynamical-core case as additional
entries under "cases".

``vs_baseline`` compares each case against a physics-matched CPU-node
estimate (MOM6 publishes no absolute numbers in-repo; BASELINE.md
"Baseline derivation"):
- full-physics cases vs 1.5e6 gridpoint-steps/s/node, derived from the
  published OM4_025 throughput (~5 SYPD at dt=900 s on ~200 Broadwell
  nodes => 2.4e8 total gps/s => ~1.2e6/node; rounded up to be
  conservative);
- the adiabatic dynamical-core case vs 5e7 gps/s/node (96 cores at
  ~2 us per gridpoint-step for the dyn core alone).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

CPU_NODE_DYNCORE_GPS = 5.0e7     # dyn-core-only estimate; see BASELINE.md
CPU_NODE_FULLMODEL_GPS = 1.5e6   # full-model OM4 derivation; see BASELINE.md


def _full_physics_setup(nx, ny, nz, dt, n_dyn_per_thermo=2):
    from mom6_tpu.drivers.experiments import thermo_gyre
    from mom6_tpu.physics.lateral.meke import MEKEParams
    from mom6_tpu.physics.lateral.thickness_diffuse import GMParams
    from mom6_tpu.tracers.packages import IdealAge, TracerFlowControl

    G, GV, state, params, forcing = thermo_gyre(
        nx=nx, ny=ny, nz=nz, len_lon_km=4500.0, len_lat_km=3500.0,
        dt=dt, n_dyn_per_thermo=n_dyn_per_thermo)
    tfc = TracerFlowControl([IdealAge()])
    params = params._replace(
        gm=GMParams(khth=100.0), meke=MEKEParams(), khtr=50.0, tfc=tfc,
        diabatic=params.diabatic._replace(boundary_layer_scheme="KPP",
                                          use_shear_mixing=True))
    state = state.replace(
        E_meke=jnp.zeros((ny, nx), jnp.float32),
        tr=tfc.init_tracers(state.h.shape, jnp.float32))
    return G, GV, state, params, forcing


def _time_case(step_fn, state, n_warm=1, n_calls=4, steps_per_call=1):
    for _ in range(n_warm):
        state = step_fn(state)
    jax.block_until_ready(state.h)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = step_fn(state)
    jax.block_until_ready(state.h)
    return (time.perf_counter() - t0) / (n_calls * steps_per_call)


def bench_full(nx=360, ny=280, nz=32, dt=1200.0):
    """Full-physics thermo cycle throughput (one cycle = 2 dyn steps)."""
    from mom6_tpu.core.mom import step_mom
    n_per = 2
    G, GV, state, params, forcing = _full_physics_setup(
        nx, ny, nz, dt, n_dyn_per_thermo=n_per)
    step = jax.jit(lambda s: step_mom(s, forcing, G, GV, params),
                   donate_argnums=0)
    sec_per_cycle = _time_case(step, state, n_calls=3)
    gps = nx * ny * nz * n_per / sec_per_cycle
    sypd = (n_per * dt / sec_per_cycle) / 365.0
    return dict(grid=f"{nx}x{ny}x{nz}", gps=round(gps, 1),
                sypd=round(sypd, 2),
                bt_substeps=params.dyn.bt.nstep, physics="full")


def bench_om4_shape(nx=360, ny=270, nz=75, dt=900.0):
    """OM4_025 per-chip tile: the 1440x1080x75 grid sharded over a 4x4
    mesh gives each chip this 360x270x75 tile (the full grid with full
    physics exceeds one v5e's 16 GB HBM).  Per-chip throughput here is
    the per-chip term of a 16-chip pod run; its SYPD is the
    perfect-scaling projection for OM4_025 on 16 chips."""
    try:
        return dict(bench_full(nx, ny, nz, dt), physics="full-om4-tile",
                    note="1/16 tile of 1440x1080x75; SYPD = perfect-"
                         "scaling 16-chip projection")
    except Exception as e:                       # noqa: BLE001
        return dict(grid=f"{nx}x{ny}x{nz}", error=type(e).__name__)


def bench_global():
    """Real-continents GLOBAL tripolar case at half-degree (720x400x32):
    sourced from the configs/global_half_deg run dir (mosaic supergrid +
    file topography + TRIPOLAR_N fold, WRIGHT EOS, KPP, GM, tracer
    diffusion, z* ALE).  This is the OM4-class capability benchmark on
    the REAL grid — fold stencils, land masking and all — not a
    rectangular stand-in.  Grid inputs generate on first use
    (configs/global_half_deg/make_inputs.py)."""
    import os
    import sys

    import numpy as np

    from mom6_tpu.core.mom import step_mom
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    repo = os.path.dirname(os.path.abspath(__file__))
    rundir = os.path.join(repo, "configs", "global_half_deg")
    if not os.path.exists(os.path.join(rundir, "ocean_hgrid.nc")):
        sys.path.insert(0, rundir)
        import make_inputs
        make_inputs.main(rundir)
    cfg = os.path.join(rundir, "MOM_input")
    cwd = os.getcwd()
    os.chdir(rundir)             # GRID_FILE/TOPO_FILE are relative
    try:
        ms = build_model_from_params(ParamFile([cfg]))
    finally:
        os.chdir(cwd)
    p = ms.params
    nz, ny, nx = ms.state.h.shape
    dt = p.dyn.dt
    n_per = p.n_dyn_per_thermo
    step = jax.jit(lambda s: step_mom(s, ms.forcing, ms.grid,
                                      ms.vgrid, ms.params),
                   donate_argnums=0)
    sec_per_cycle = _time_case(step, ms.state, n_calls=3)
    wet = float(np.asarray(ms.grid.mask2dT).mean())
    gps = nx * ny * nz * n_per / sec_per_cycle
    sypd = (n_per * dt / sec_per_cycle) / 365.0
    return dict(grid=f"{nx}x{ny}x{nz}", gps=round(gps, 1),
                sypd=round(sypd, 2), ocean_frac=round(wet, 2),
                physics="full-global-tripolar",
                source="configs/global_half_deg")


def _phase_breakdown(G, GV, state, params, forces):
    """Per-phase wall times [us/call] of the dyn-core building blocks on
    the bench state, each jitted separately (attribution tool: separate
    jits lose cross-phase fusion, so the parts exceed the whole — ratios
    between phases are what matters for spotting a regression)."""
    from mom6_tpu.core.barotropic import btstep
    from mom6_tpu.core.continuity_ppm import continuity_ppm
    from mom6_tpu.core.coriolis_adv import coriolis_adv
    from mom6_tpu.core.dynamics_split_rk2 import _visc_setup
    from mom6_tpu.core.pressure_force import (find_eta,
                                              pressure_force_montgomery)
    from mom6_tpu.physics.vertical.vert_friction import vertvisc

    h, u, v = state.h, state.u, state.v
    dt = params.dt
    eta = find_eta(h, G)
    h_u, h_v, cu, cv, vr_u, vr_v = _visc_setup(h, u, v, G, GV, params,
                                               None)
    pf = pressure_force_montgomery(h, G, GV)
    _, uh, vh, _, _ = continuity_ppm(u, v, h, dt, G, GV)
    zs = jnp.zeros_like(u), jnp.zeros_like(v)
    REP = 20

    def t(fn, *args):
        """us per application of ``fn``, measured as REP chained
        applications inside ONE jit (fn returns its next arguments) so
        the per-call dispatch/tunnel overhead — larger than any single
        phase at this grid size — amortizes away."""
        def chained(a):
            def body(c, _):
                return fn(*c), None
            c, _ = jax.lax.scan(body, a, None, length=REP)
            return c
        f = jax.jit(chained)
        out = f(args)         # compile + warm
        jax.block_until_ready(out)
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(args)
        jax.block_until_ready(out)
        return round(1e6 * (time.perf_counter() - t0) / (n * REP), 1)

    eps = u.dtype.type(1e-30)

    def p_cont(u_, v_, h_):
        h2, uh_, vh_, _, _ = continuity_ppm(u_, v_, h_, dt, G, GV)
        return u_ + eps * uh_, v_ + eps * vh_, h2

    def p_cor(u_, v_):
        cau, cav = coriolis_adv(u_, v_, h, uh, vh, G, GV,
                                scheme=params.coriolis_scheme)
        return u_ + eps * cau, v_ + eps * cav

    def p_pf(h_):
        o = pressure_force_montgomery(h_, G, GV)
        return (h_ + eps * o.eta_PF,)

    def p_bt(u_, v_, eta_):
        o = btstep(u_, v_, eta_, zs[0], zs[1], h, uh, vh, vr_u, vr_v,
                   pf.pbce, pf.eta_PF, dt, G, GV, params.bt,
                   taux=forces.taux, tauy=forces.tauy)
        return (u_ + eps * o.accel_layer_u, v_ + eps * o.accel_layer_v,
                o.eta_out)

    def p_vv(u_):
        return (vertvisc(u_, h_u, cu, dt, tau=forces.taux,
                         rho0=GV.rho0),)

    def p_vs(h_, u_, v_):
        _, _, _, _, vru, vrv = _visc_setup(h_, u_, v_, G, GV, params,
                                           None)
        return h_ + eps * vru, u_ + eps * vru, v_ + eps * vrv

    phases = {
        "continuity_ppm": t(p_cont, u, v, h),
        "coriolis_adv": t(p_cor, u, v),
        "pressure_force": t(p_pf, h),
        "btstep": t(p_bt, u, v, eta),
        "vertvisc": t(p_vv, u),
        "visc_setup": t(p_vs, h, u, v),
    }
    return phases


def bench_adiabatic(nx=360, ny=280, nz=8, dt=1200.0, with_phases=True):
    from mom6_tpu.drivers.experiments import double_gyre
    from mom6_tpu.drivers.solo import make_stepper

    G, GV, state, params, forces = double_gyre(
        nx=nx, ny=ny, nz=nz, len_lon_km=4500.0, len_lat_km=3500.0, dt=dt)
    phases = (_phase_breakdown(G, GV, state, params, forces)
              if with_phases else None)   # before the stepper donates state
    steps_per_call = 10
    stepper = make_stepper(G, GV, params, forces,
                           steps_per_call=steps_per_call)
    sec_per_step = _time_case(stepper, state, n_calls=5,
                              steps_per_call=steps_per_call)
    gps = nx * ny * nz / sec_per_step
    sypd = (dt / sec_per_step) / 365.0
    out = dict(grid=f"{nx}x{ny}x{nz}", gps=round(gps, 1),
               sypd=round(sypd, 2), bt_substeps=params.bt.nstep,
               physics="adiabatic")
    if phases is not None:
        out["phases_us"] = phases
        out["step_us"] = round(1e6 * sec_per_step, 1)
    return out


def main():
    full = bench_full()
    om4 = bench_om4_shape()
    try:
        glob = bench_global()
    except Exception as e:                       # noqa: BLE001
        glob = dict(error=type(e).__name__, msg=str(e)[:200])
    adia = bench_adiabatic()
    for c in (full, om4, glob):
        if "gps" in c:
            c["vs_cpu_node"] = round(c["gps"] / CPU_NODE_FULLMODEL_GPS, 2)
    adia["vs_cpu_node"] = round(adia["gps"] / CPU_NODE_DYNCORE_GPS, 2)
    head = full
    print(json.dumps({
        "metric": (f"full-physics gridpoint-timesteps/s/chip "
                   f"({head['grid']}, KPP+GM/MEKE+tracer+zstar-ALE, "
                   f"{head['bt_substeps']} BT substeps, "
                   f"SYPD={head['sypd']})"),
        "value": head["gps"],
        "unit": "gridpoint-steps/s",
        "vs_baseline": head["vs_cpu_node"],
        "cases": {"full": full, "om4_tile": om4,
                  "global_half_deg": glob, "adiabatic": adia},
    }))


if __name__ == "__main__":
    main()
