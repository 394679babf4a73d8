"""Standalone ice-shelf driver.

Analogue of MOM6's ice-only driver (reference:
config_src/drivers/ice_solo_driver/ice_shelf_driver.F90): advances the
SSA ice-shelf dynamics and thickness advection WITHOUT an ocean
underneath — the configuration used to spin up shelf geometry and to
test the ice dynamics in isolation.

Reads MOM_input from a run directory (NIGLOBAL/NJGLOBAL/LENLON/LENLAT,
DT, DAYMAX plus the ICE_* parameters below), integrates, and writes
``ice.stats`` (area, volume, max speed per segment) and a final
``ICE.res.nc``.

Run:  python -m mom6_tpu.drivers.ice_solo <rundir>
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["main"]


def main(argv=None):
    import argparse

    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.io.netcdf import NCWriter
    from mom6_tpu.physics.ice_shelf_dynamics import (
        SSAParams, ice_shelf_advect_thickness, ssa_solve)

    ap = argparse.ArgumentParser(prog="mom6_tpu.drivers.ice_solo")
    ap.add_argument("rundir")
    ap.add_argument("--days", type=float, default=None)
    args = ap.parse_args(argv)

    pf = ParamFile([os.path.join(args.rundir, "MOM_input")])
    m = "ice_solo"
    nx = pf.get("NIGLOBAL", int, module=m)
    ny = pf.get("NJGLOBAL", int, module=m)
    lenlon = pf.get("LENLON", float, default=100.0, units="km", module=m)
    lenlat = pf.get("LENLAT", float, default=100.0, units="km", module=m)
    dt = pf.get("DT", float, default=86400.0, units="s", module=m)
    days = args.days if args.days is not None else \
        pf.get("DAYMAX", float, default=10.0, units="days", module=m)

    G = build_cartesian_grid(nx, ny, lenlon, lenlat, max_depth=1000.0)
    p = SSAParams(
        glen_a=pf.get("ICE_A_GLEN", float, default=2.261e-25, module=m,
                      desc="Glen's-law rate factor [Pa-3 s-1]"),
        glen_n=pf.get("ICE_N_GLEN", float, default=3.0, module=m),
        rho_ice=pf.get("ICE_DENSITY", float, default=918.0,
                       units="kg m-3", module=m))

    # initial shelf: thick at the grounded (south) edge, thinning toward
    # the calving front (the ice_shelf_driver wedge initialization)
    h0 = pf.get("ICE_THICKNESS_SOUTH", float, default=800.0, units="m",
                module=m)
    h1 = pf.get("ICE_THICKNESS_NORTH", float, default=200.0, units="m",
                module=m)
    yfr = (np.arange(ny) + 0.5) / ny
    h_ice = jnp.asarray(
        np.broadcast_to((h0 + (h1 - h0) * yfr)[:, None], (ny, nx)),
        jnp.float32)
    shelf_frac = pf.get("ICE_SHELF_FRAC", float, default=0.8, module=m,
                        desc="Fraction of the domain covered by shelf")
    mask_shelf = jnp.asarray((yfr < shelf_frac)[:, None]
                             * np.ones((ny, nx)), jnp.float32)
    h_ice = h_ice * mask_shelf
    smb = pf.get("ICE_SMB", float, default=0.0, units="m s-1", module=m,
                 desc="Surface mass balance applied each step")

    @jax.jit
    def step(h_ice, u, v):
        u, v = ssa_solve(h_ice, G, p, mask_shelf=mask_shelf, u0=u, v0=v)
        h_new = ice_shelf_advect_thickness(h_ice, u, v, dt, G, mask_shelf)
        h_new = jnp.maximum(h_new + dt * smb, 0.0) * mask_shelf
        return h_new, u, v

    u = jnp.zeros((ny, nx), jnp.float32)
    v = jnp.zeros((ny, nx), jnp.float32)
    n_steps = max(1, int(round(days * 86400.0 / dt)))
    every = max(1, n_steps // 10)
    area = np.asarray(G.areaT, np.float64)
    t0 = time.time()
    stats_path = os.path.join(args.rundir, "ice.stats")
    with open(stats_path, "w") as f:
        f.write("# step, days, volume [m3], area [m2], max|u| [m yr-1]\n")
        for n in range(1, n_steps + 1):
            h_ice, u, v = step(h_ice, u, v)
            if n % every == 0 or n == n_steps:
                jax.block_until_ready(h_ice)
                hv = np.asarray(h_ice, np.float64)
                vol = float((hv * area).sum())
                a = float((area * (hv > 1.0)).sum())
                sp = float(np.max(np.hypot(np.asarray(u),
                                           np.asarray(v)))) * 3.15576e7
                line = (f"{n:8d}, {n * dt / 86400.0:10.3f} days: "
                        f"Vol {vol:.6e}  Area {a:.6e}  "
                        f"max|u| {sp:9.2f} m/yr")
                print(line)
                f.write(line + "\n")
    w = NCWriter(os.path.join(args.rundir, "ICE.res.nc"))
    w.write_static("h_ice", np.asarray(h_ice))
    w.write_static("u_ice", np.asarray(u))
    w.write_static("v_ice", np.asarray(v))
    w.close()
    print(f"ice run complete: {days} days in {time.time() - t0:.1f}s")
    return h_ice


if __name__ == "__main__":
    main()
