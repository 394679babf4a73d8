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

__all__ = ["compute_stats", "compute_stats_jit", "tracer_stocks",
           "format_stats_line", "StatsWriter", "BudgetAudit"]

_CP_DEFAULT = 3991.87          # MOM6 C_P default [J kg-1 K-1]


def compute_stats(state, G, GV, dt: float,
                  cp: float = _CP_DEFAULT) -> Dict[str, float]:
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

    out = {"mass": mass, "KE": ke, "APE": ape, "energy": ke + ape,
           "max_CFL": cfl}
    # Total Salt [kg] and Total Heat [J] — the conservation-audit half of
    # write_energy (MOM_sum_output.F90:321-1100: Total Salt / Total Heat
    # statements; salinity is g salt per kg seawater, hence the 1e-3)
    if getattr(state, "T", None) is not None:
        T = np.asarray(state.T, np.float64)
        S = np.asarray(state.S, np.float64)
        out["salt"] = reproducing_sum(S * h * area[None],
                                      scale=GV.rho0 * 1e-3)
        out["heat"] = reproducing_sum(T * h * area[None],
                                      scale=GV.rho0 * cp)
    return out


def compute_stats_jit(state, G, GV, dt: float,
                      cp: float = _CP_DEFAULT) -> Dict[str, "object"]:
    """ocean.stats reductions inside jit via :func:`fixed_point_sum` —
    bitwise invariant to the device-mesh layout / sharding of the state
    (the in-compiled-code analogue of MOM6's EFP reproducing sums,
    src/framework/MOM_coms.F90:30-70; round-2 verdict item 7).

    Same formulas as :func:`compute_stats`; every global sum is an exact
    fixed-point reduction with a static magnitude bound derived from the
    grid, so for identical local data the result bits are identical on a
    1-device or an N-device mesh.  Stays on device — no host pull of the
    3-D fields at stats cadence.
    """
    import jax.numpy as jnp

    from mom6_tpu.framework.repro_sum import fixed_point_sum

    h, u, v = state.h, state.u, state.v
    area = G.areaT * G.mask2dT
    # static bounds (G is a closure constant under jit, not a tracer)
    max_area = float(np.max(np.asarray(G.areaT)))
    max_depth = float(np.max(np.asarray(G.bathyT)))
    h_bound = 4.0 * max(max_depth, 1.0)
    u_bound = 20.0                          # CFL-truncated long before this

    # mass [kg]
    mass = GV.rho0 * fixed_point_sum(h * area[None],
                                     max_mag=h_bound * max_area)

    # KE with face thicknesses (same roll convention as compute_stats)
    h_u = 0.5 * (h + jnp.roll(h, -1, axis=-1))
    h_v = 0.5 * (h + jnp.roll(h, -1, axis=-2))
    ke_terms = 0.5 * GV.rho0 * area[None] * (
        h_u * u * u * G.mask2dCu[None] + h_v * v * v * G.mask2dCv[None])
    ke = fixed_point_sum(
        ke_terms, max_mag=GV.rho0 * max_area * h_bound * u_bound ** 2)

    # APE: per-layer resting interfaces need their own layout-invariant
    # means (one fixed-point sum per layer; nz is static and small)
    gp = jnp.asarray(np.asarray(GV.g_prime), h.dtype)
    csum_below = jnp.cumsum(h[::-1], axis=0)[::-1]
    e = csum_below - G.bathyT[None]
    wet = fixed_point_sum(area, max_mag=max_area)
    e_bound = 2.0 * h_bound
    e_rest = jnp.stack([
        fixed_point_sum(e[k] * area, max_mag=e_bound * max_area)
        for k in range(e.shape[0])]) / jnp.maximum(wet, 1e-30)
    dev = (e - e_rest[:, None, None]) * G.mask2dT[None]
    gp_max = float(np.max(np.asarray(GV.g_prime)))
    ape_terms = 0.5 * GV.rho0 * gp[:, None, None] * dev * dev * area[None]
    ape = fixed_point_sum(
        ape_terms,
        max_mag=0.5 * GV.rho0 * gp_max * e_bound ** 2 * max_area)

    cfl = jnp.maximum(jnp.max(jnp.abs(u) * dt * G.IdxT[None]),
                      jnp.max(jnp.abs(v) * dt * G.IdyT[None]))
    out = {"mass": mass, "KE": ke, "APE": ape, "energy": ke + ape,
           "max_CFL": cfl}
    if getattr(state, "T", None) is not None:
        ts_bound = 64.0          # |T| [degC], S [ppt] stay far below this
        out["salt"] = GV.rho0 * 1e-3 * fixed_point_sum(
            state.S * h * area[None],
            max_mag=ts_bound * h_bound * max_area)
        out["heat"] = GV.rho0 * cp * fixed_point_sum(
            state.T * h * area[None],
            max_mag=ts_bound * h_bound * max_area)
    return out


def tracer_stocks(tr: Dict[str, "object"], h, G,
                  names=None) -> Dict[str, float]:
    """Global stock of each registered passive tracer,
    sum(c h area) [conc m3] — the Tracer_stocks report of
    MOM_sum_output.F90 (via call_tracer_stocks,
    MOM_tracer_flow_control.F90:955).  Host-side f64 EFP sums."""
    area = np.asarray(G.areaT * G.mask2dT, np.float64)
    h64 = np.asarray(h, np.float64)
    out: Dict[str, float] = {}
    for name in (names if names is not None else tr):
        if name.startswith("_"):
            continue
        c = np.asarray(tr[name], np.float64)
        out[name] = float(reproducing_sum(c * h64 * area[None]))
    return out


class BudgetAudit:
    """Accumulated net surface inputs of mass, salt and heat, and the
    conservation drift against them — the net-input half of write_energy
    (MOM_sum_output.F90:321-1100: the 'Mass Chg Error' / salt & heat
    anomaly statements).

    ``accumulate(forcing, state, G, GV, interval)`` integrates the
    forcing that drove the last ``interval`` seconds (restoring fluxes
    are evaluated against the CURRENT top-layer T/S — exact for fixed
    fluxes, segment-endpoint approximate for restoring).  Frazil heat is
    read from ``state.frazil`` (already an accumulation since start).
    ``drift(stats)`` then returns (change since start) - (net input):
    zero to rounding for a conservative model."""

    def __init__(self, stats0: Dict[str, float], cp: float = _CP_DEFAULT,
                 state0=None, G=None):
        self.m0 = stats0.get("mass")
        self.s0 = stats0.get("salt")
        self.h0 = stats0.get("heat")
        self.cp = cp
        self.mass_in = 0.0
        self.salt_in = 0.0
        self.heat_in = 0.0
        # frazil baseline must be captured at segment START (restarts
        # carry a nonzero accumulation); taking it lazily at the first
        # drift() call silently absorbs all frazil heating before the
        # first stats line into the baseline
        self.frazil0 = 0.0
        if state0 is not None and G is not None \
                and getattr(state0, "frazil", None) is not None:
            area = np.asarray(G.areaT, np.float64) \
                * np.asarray(G.mask2dT, np.float64)
            self.frazil0 = reproducing_sum(
                np.asarray(state0.frazil, np.float64) * area)

    def accumulate(self, forcing, state, G, GV, interval: float) -> None:
        area = np.asarray(G.areaT, np.float64) \
            * np.asarray(G.mask2dT, np.float64)
        buoy = getattr(forcing, "buoy", None)
        if buoy is None:
            return

        def tot(field):
            return reproducing_sum(
                np.asarray(field, np.float64) * area)

        q = 0.0
        if buoy.heat_flux is not None:
            q += tot(buoy.heat_flux)
        if buoy.sw_flux is not None:
            q += tot(buoy.sw_flux)
        sf = 0.0
        if buoy.salt_flux is not None:
            sf += tot(buoy.salt_flux)
        if buoy.salt_left_behind is not None:
            sf += tot(buoy.salt_left_behind)
        self.heat_in += q * interval
        self.salt_in += GV.rho0 * 1e-3 * sf * interval
        if buoy.fw_flux is not None:
            # this framework applies fresh water as a VIRTUAL salt flux
            # (volume-conserving surface boundary); it moves salt, not
            # mass — account it against the salt total
            vsf = -np.asarray(state.S[0], np.float64) \
                * np.asarray(buoy.fw_flux, np.float64)
            self.salt_in += GV.rho0 * 1e-3 * reproducing_sum(
                vsf * area) * interval
        if buoy.t_restore is not None:
            sst = np.asarray(state.T[0], np.float64)
            rt = buoy.restore_rate * (
                np.asarray(buoy.t_restore, np.float64) - sst)
            self.heat_in += GV.rho0 * self.cp * reproducing_sum(
                rt * area) * interval
        if buoy.s_restore is not None:
            sss = np.asarray(state.S[0], np.float64)
            rs = buoy.restore_rate * (
                np.asarray(buoy.s_restore, np.float64) - sss)
            self.salt_in += GV.rho0 * 1e-3 * reproducing_sum(
                rs * area) * interval

    def drift(self, s: Dict[str, float], state=None, G=None
              ) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if self.m0 is not None and "mass" in s:
            out["mass_drift"] = (s["mass"] - self.m0) - self.mass_in
        if self.s0 is not None and "salt" in s:
            out["salt_drift"] = (s["salt"] - self.s0) - self.salt_in
        if self.h0 is not None and "heat" in s:
            heat_in = self.heat_in
            if state is not None and G is not None \
                    and getattr(state, "frazil", None) is not None:
                # frazil heating raised T to the freezing point; the
                # deficit the ice model owes is accumulated in
                # state.frazil [J m-2] since start
                area = np.asarray(G.areaT, np.float64) \
                    * np.asarray(G.mask2dT, np.float64)
                fz = reproducing_sum(
                    np.asarray(state.frazil, np.float64) * area)
                heat_in = heat_in + (fz - self.frazil0)
            out["heat_drift"] = (s["heat"] - self.h0) - heat_in
        return out


def format_stats_line(step: int, time_days: float, s: Dict[str, float]) -> str:
    line = (f"{step:8d}, {time_days:12.3f} days: En {s['energy']: .12e} "
            f"(KE {s['KE']: .6e}, APE {s['APE']: .6e}), "
            f"Mass {s['mass']: .12e}, maxCFL {s['max_CFL']:.5f}")
    if "salt" in s:
        line += f", Salt {s['salt']: .12e}"
    if "heat" in s:
        line += f", Heat {s['heat']: .12e}"
    for k, tag in (("mass_drift", "dM_net"), ("salt_drift", "dS_net"),
                   ("heat_drift", "dH_net")):
        if k in s:
            line += f", {tag} {s[k]: .3e}"
    extras = [k for k in s
              if k not in ("energy", "KE", "APE", "mass", "max_CFL",
                           "salt", "heat", "mass_drift", "salt_drift",
                           "heat_drift")]
    if extras:
        line += ", Tr: " + " ".join(f"{k}={s[k]: .8e}" for k in extras)
    return line


class StatsWriter:
    """Appends ocean.stats-style lines to a file (ENERGYFILE analogue)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "w") as f:
            f.write("# step, time, energy, KE, APE, mass, max_CFL\n")

    def write(self, step: int, time_days: float, s: Dict[str, float]) -> None:
        with open(self.path, "a") as f:
            f.write(format_stats_line(step, time_days, s) + "\n")
