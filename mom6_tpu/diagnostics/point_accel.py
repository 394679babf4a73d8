"""Truncation-point dossiers.

Analogue of MOM6's MOM_PointAccel.F90 ("truncation dossiers"): when the
CFL limiter clips velocities, report where and print the full column
state at the worst point so the blowup mechanism can be diagnosed.
Host-side (called at the diagnostics cadence, not in the hot loop).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["worst_cfl_dossier", "format_dossier"]


def worst_cfl_dossier(state, G, dt: float) -> Dict:
    """Locate the worst advective-CFL velocity point and collect its
    column state."""
    u = np.asarray(state.u, np.float64)
    v = np.asarray(state.v, np.float64)
    cfl_u = np.abs(u) * dt * np.asarray(G.IdxCu, np.float64)
    cfl_v = np.abs(v) * dt * np.asarray(G.IdyCv, np.float64)
    if cfl_u.max() >= cfl_v.max():
        comp, cfl = "u", cfl_u
        vel = u
    else:
        comp, cfl = "v", cfl_v
        vel = v
    k, j, i = np.unravel_index(np.argmax(cfl), cfl.shape)
    h = np.asarray(state.h, np.float64)
    out = {
        "component": comp, "k": int(k), "j": int(j), "i": int(i),
        "cfl": float(cfl[k, j, i]), "vel": float(vel[k, j, i]),
        "depth": float(np.asarray(G.bathyT)[j, i]),
        "h_column": h[:, j, i].tolist(),
        "u_column": u[:, j, i].tolist(),
        "v_column": v[:, j, i].tolist(),
    }
    if state.T is not None:
        out["T_column"] = np.asarray(state.T, np.float64)[:, j, i].tolist()
    return out


def format_dossier(d: Dict) -> str:
    lines = [f"worst CFL: {d['cfl']:.4f} ({d['component']} = "
             f"{d['vel']:.3f} m/s) at (k={d['k']}, j={d['j']}, i={d['i']}), "
             f"depth {d['depth']:.0f} m",
             "  h: " + " ".join(f"{x:9.2f}" for x in d["h_column"]),
             "  u: " + " ".join(f"{x:9.4f}" for x in d["u_column"]),
             "  v: " + " ".join(f"{x:9.4f}" for x in d["v_column"])]
    if "T_column" in d:
        lines.append("  T: " + " ".join(f"{x:9.3f}" for x in d["T_column"]))
    return "\n".join(lines)
