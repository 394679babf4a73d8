"""Headline benchmark: wind-driven basin throughput on one chip.

Prints ONE JSON line: grid-point-timesteps per second per chip on a
benchmark-class grid (the reference's .testing/p0 analogue scaled up to a
production-like resolution; see BASELINE.md).

``vs_baseline``: MOM6 publishes no absolute numbers (BASELINE.md); the
comparison constant below is a CPU-node estimate derived from MOM6's widely
reported ~1-2 us per gridpoint-timestep per core for the dynamical core
(so ~5e7 gridpoint-steps/s for a 96-core node at 2 us/pt).  vs_baseline is
this chip's throughput over that node estimate.
"""

from __future__ import annotations

import json
import time

import jax

CPU_NODE_GRIDPOINT_STEPS_PER_S = 5.0e7  # estimate, see module docstring


def main():
    from mom6_tpu.drivers.experiments import double_gyre
    from mom6_tpu.drivers.solo import make_stepper

    # benchmark-class grid: 360x280x8 (~OM4-like aspect, laptop of p0 config)
    nx, ny, nz = 360, 280, 8
    dt = 1200.0
    G, GV, state, params, forces = double_gyre(nx=nx, ny=ny, nz=nz,
                                               len_lon_km=4500.0,
                                               len_lat_km=3500.0, dt=dt)
    steps_per_call = 10
    stepper = make_stepper(G, GV, params, forces,
                           steps_per_call=steps_per_call)

    # warmup/compile
    state = stepper(state)
    jax.block_until_ready(state.h)

    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = stepper(state)
    jax.block_until_ready(state.h)
    elapsed = time.perf_counter() - t0

    steps = n_calls * steps_per_call
    gps = nx * ny * nz * steps / elapsed
    sypd = (steps * dt / elapsed) * 86400.0 / (365.0 * 86400.0) * 86400.0 / 86400.0
    # SYPD = (model seconds per wall second) * (86400 wall s/day) / (365*86400 model s/yr)
    sypd = (steps * dt / elapsed) * 86400.0 / (365.0 * 86400.0)

    print(json.dumps({
        "metric": f"gridpoint-timesteps/s/chip ({nx}x{ny}x{nz}, "
                  f"{params.bt.nstep} BT substeps, SYPD={sypd:.2f})",
        "value": round(gps, 1),
        "unit": "gridpoint-steps/s",
        "vs_baseline": round(gps / CPU_NODE_GRIDPOINT_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
