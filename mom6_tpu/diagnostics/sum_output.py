"""Global energy / mass statements — the ocean.stats analogue.

Re-implements the content of MOM6's write_energy
(reference: src/diagnostics/MOM_sum_output.F90:223-321): per-call global
kinetic + available potential energy, total mass, and maximum CFL, computed
with order-invariant reproducing sums so the numbers are independent of the
device-mesh layout.  These lines are the model-state fingerprint used by the
regression tests (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mom6_tpu.framework.repro_sum import reproducing_sum

__all__ = ["compute_stats", "format_stats_line", "StatsWriter"]


def compute_stats(state, G, GV, dt: float) -> Dict[str, float]:
    h = np.asarray(state.h, dtype=np.float64)
    u = np.asarray(state.u, dtype=np.float64)
    v = np.asarray(state.v, dtype=np.float64)
    area = np.asarray(G.areaT, dtype=np.float64) * np.asarray(G.mask2dT, np.float64)
    depth = np.asarray(G.bathyT, dtype=np.float64)

    # mass [kg]
    mass = reproducing_sum(h * area[None], scale=GV.rho0)

    # KE: 0.5 * rho0 * h_face * u^2 * area (velocities at faces, h to faces)
    h_u = 0.5 * (h + np.roll(h, -1, axis=-1))
    h_v = 0.5 * (h + np.roll(h, -1, axis=-2))
    mu = np.asarray(G.mask2dCu, np.float64)
    mv = np.asarray(G.mask2dCv, np.float64)
    ke_terms = 0.5 * GV.rho0 * area[None] * (
        (h_u * u * u * mu[None]) + (h_v * v * v * mv[None]))
    ke = reproducing_sum(ke_terms)

    # APE of the layered stack: sum_k 0.5 * rho0 * g'_k * (e_k - e_k,rest)^2
    gp = np.asarray(GV.g_prime, np.float64)
    csum_below = np.cumsum(h[::-1], axis=0)[::-1]
    e = csum_below - depth[None]
    # resting interfaces: horizontal mean of e per layer over wet area
    wet = area.sum()
    e_rest = (e * area[None]).sum(axis=(1, 2), keepdims=True) / max(wet, 1e-30)
    ape_terms = 0.5 * GV.rho0 * gp[:, None, None] * (e - e_rest) ** 2 * area[None]
    ape = reproducing_sum(ape_terms * np.asarray(G.mask2dT)[None])

    # max CFL
    idx = np.asarray(G.IdxT, np.float64)
    idy = np.asarray(G.IdyT, np.float64)
    cfl = max(float(np.max(np.abs(u) * dt * idx[None])),
              float(np.max(np.abs(v) * dt * idy[None])))

    return {"mass": mass, "KE": ke, "APE": ape, "energy": ke + ape,
            "max_CFL": cfl}


def format_stats_line(step: int, time_days: float, s: Dict[str, float]) -> str:
    return (f"{step:8d}, {time_days:12.3f} days: En {s['energy']: .12e} "
            f"(KE {s['KE']: .6e}, APE {s['APE']: .6e}), "
            f"Mass {s['mass']: .12e}, maxCFL {s['max_CFL']:.5f}")


class StatsWriter:
    """Appends ocean.stats-style lines to a file (ENERGYFILE analogue)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "w") as f:
            f.write("# step, time, energy, KE, APE, mass, max_CFL\n")

    def write(self, step: int, time_days: float, s: Dict[str, float]) -> None:
        with open(self.path, "a") as f:
            f.write(format_stats_line(step, time_days, s) + "\n")
