"""Ocean-only driver.

Analogue of MOM6's solo driver (reference:
config_src/drivers/solo_driver/MOM_driver.F90:457-530): owns the run
segment loop, compiles the step function once, and writes the energy
statistics file.  The inner loop over ``steps_per_call`` baroclinic steps is
a ``lax.scan`` inside one jitted call, so the host only sees the state at
the diagnostics cadence.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax

from mom6_tpu.core.dynamics_split_rk2 import (DynParams, MechForcing,
                                              step_dynamics_split_rk2)
from mom6_tpu.diagnostics.sum_output import StatsWriter, compute_stats

__all__ = ["run_segment", "make_stepper"]


def make_stepper(G, GV, params: DynParams, forces: MechForcing,
                 steps_per_call: int = 1) -> Callable:
    """A jitted function advancing the state ``steps_per_call`` steps."""

    def many_steps(state):
        def body(s, _):
            return step_dynamics_split_rk2(s, forces, G, GV, params), None
        # modest unroll lets XLA fuse across adjacent steps (~10% on TPU)
        state, _ = jax.lax.scan(body, state, None, length=steps_per_call,
                                unroll=min(4, steps_per_call))
        return state

    return jax.jit(many_steps, donate_argnums=0)


def make_mom_stepper(G, GV, params, forcing, cycles_per_call: int = 1):
    """Jitted thermo-cycle stepper for the full model (step_mom)."""
    from mom6_tpu.core.mom import step_mom

    def many(state):
        def body(s, _):
            return step_mom(s, forcing, G, GV, params), None
        state, _ = jax.lax.scan(body, state, None, length=cycles_per_call)
        return state

    return jax.jit(many, donate_argnums=0)


def main(argv=None):
    """Command-line solo driver (program MOM6 analogue,
    config_src/drivers/solo_driver/MOM_driver.F90:1): reads MOM_input
    (+ MOM_override) from a run directory, integrates, writes ocean.stats,
    MOM_parameter_doc and a restart file."""
    import argparse

    from mom6_tpu.core.mom import step_mom
    from mom6_tpu.diagnostics.sum_output import (StatsWriter, compute_stats,
                                                 format_stats_line)
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.framework.restart import RestartRegistry

    ap = argparse.ArgumentParser(prog="mom6_tpu.drivers.solo")
    ap.add_argument("rundir", help="directory containing MOM_input")
    ap.add_argument("--days", type=float, default=None,
                    help="override DAYMAX")
    ap.add_argument("--restart-in", default=None)
    args = ap.parse_args(argv)

    import os
    paths = [os.path.join(args.rundir, "MOM_input")]
    ov = os.path.join(args.rundir, "MOM_override")
    if os.path.exists(ov):
        paths.append(ov)
    pf = ParamFile(paths)
    setup = build_model_from_params(pf, doc_dir=args.rundir)
    G, GV, state, params, forcing = (setup.grid, setup.vgrid, setup.state,
                                     setup.params, setup.forcing)
    days = pf.get("DAYMAX", float, default=1.0, units="days",
                  module="MOM_driver")
    if args.days is not None:
        days = args.days
    dt_cycle = params.dyn.dt * params.n_dyn_per_thermo
    n_cycles = max(1, int(round(days * 86400.0 / dt_cycle)))
    stats_every = max(1, n_cycles // 20)

    reg = RestartRegistry()
    fields = ["h", "u", "v", "uh", "vh", "uhtr", "vhtr"]
    if params.thermo_enabled:
        fields += ["T", "S"]
    reg.register_state_attrs(fields)
    reg.lock()
    t0 = 0.0
    if args.restart_in:
        state, t0, _ = reg.restore_state(args.restart_in, state)

    stepper = make_mom_stepper(G, GV, params, forcing,
                               cycles_per_call=stats_every)
    writer = StatsWriter(os.path.join(args.rundir, "ocean.stats"))

    # gridded time-mean diagnostics through the mediator (diag_table role)
    from mom6_tpu.framework.diag_mediator import DiagMediator
    import numpy as np
    dm = DiagMediator()
    diag_ids = {}
    diag_fields = ["h", "u", "v"] + (["T", "S"] if params.thermo_enabled
                                     else [])
    for name in diag_fields:
        diag_ids[name] = dm.register_diag_field("ocean_model", name,
                                                time_avg=True)
    id_ssh = dm.register_diag_field("ocean_model", "SSH", units="m")

    start = time.time()
    for c in range(n_cycles // stats_every):
        state = stepper(state)
        jax.block_until_ready(state.h)
        step = (c + 1) * stats_every
        tdays = (t0 + step * dt_cycle) / 86400.0
        s = compute_stats(state, G, GV, params.dyn.dt)
        writer.write(step, tdays, s)
        print(format_stats_line(step, tdays, s))
        for name in diag_fields:
            dm.post_data(diag_ids[name], jax.device_get(getattr(state, name)))
        dm.post_data(id_ssh, np.asarray(jax.device_get(state.h)).sum(0)
                     - np.asarray(jax.device_get(G.bathyT)))
    dm.flush(os.path.join(args.rundir, "ocean_diags.nc"),
             time_seconds=t0 + n_cycles * dt_cycle)
    elapsed = time.time() - start
    reg.save_restart(os.path.join(args.rundir, "MOM.res.nc"), state,
                     time_seconds=t0 + n_cycles * dt_cycle, step=n_cycles)
    # chksum_diag-style fingerprint of the final state (the second half of
    # the regression oracle, SURVEY.md §4)
    from mom6_tpu.framework.checksums import chksum_line
    with open(os.path.join(args.rundir, "chksum_diag"), "w") as f:
        for name in fields:
            val = getattr(state, name)
            if val is not None:
                f.write(chksum_line(name, jax.device_get(val)) + "\n")
    sypd = (n_cycles * dt_cycle / max(elapsed, 1e-9)) / 365.0
    # ocean.cputime log (MOM_write_cputime role): cumulative cpu/wall
    # seconds per model day for perf monitoring across segments
    import resource
    cpu = resource.getrusage(resource.RUSAGE_SELF).ru_utime
    with open(os.path.join(args.rundir, "ocean.cputime"), "a") as f:
        f.write(f"{days:12.4f} days  wall {elapsed:10.2f} s  "
                f"cpu {cpu:10.2f} s  SYPD {sypd:8.2f}\n")
    print(f"run complete: {days} days in {elapsed:.1f}s ({sypd:.1f} SYPD)")
    unused = pf.unused_params()
    if unused:
        print("WARNING: unused parameters:", ", ".join(unused))
    return state


def run_segment(state, G, GV, params: DynParams, forces: MechForcing, *,
                n_steps: int, stats_interval: int = 10,
                stats_path: Optional[str] = None, verbose: bool = False):
    """Run ``n_steps`` baroclinic steps, writing stats every interval."""
    stepper = make_stepper(G, GV, params, forces,
                           steps_per_call=stats_interval)
    writer = StatsWriter(stats_path) if stats_path else None
    n_calls = n_steps // stats_interval
    t0 = time.time()
    for c in range(n_calls):
        state = stepper(state)
        step = (c + 1) * stats_interval
        jax.block_until_ready(state.h)
        s = compute_stats(state, G, GV, params.dt)
        tdays = step * params.dt / 86400.0
        if writer:
            writer.write(step, tdays, s)
        if verbose:
            from mom6_tpu.diagnostics.sum_output import format_stats_line
            print(format_stats_line(step, tdays, s))
    elapsed = time.time() - t0
    return state, elapsed


if __name__ == "__main__":
    main()
