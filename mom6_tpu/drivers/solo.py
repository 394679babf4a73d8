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
from functools import partial
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
        state, _ = jax.lax.scan(body, state, None, length=steps_per_call)
        return state

    return jax.jit(many_steps, donate_argnums=0)


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
