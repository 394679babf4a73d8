"""Golden-file regression gate — the tc-config answer-checking role of the
reference's .testing suite (SURVEY.md §4): short runs of the shipped
configurations must reproduce stored ocean.stats-level numbers.

Regenerate intentionally with:
    UPDATE_GOLDEN=1 python -m pytest tests/test_regression_golden.py
(and commit the new tests/golden.json with an explanation of the physics
change that moved the answers).
"""

import json
import os

import numpy as np
import jax

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.drivers.config_driver import build_model_from_params
from mom6_tpu.core.mom import step_mom
from mom6_tpu.diagnostics.sum_output import compute_stats

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden.json")

CASES = {
    # tc-style ladder: adiabatic layered, full-physics over topography, rho
    "double_gyre": ("configs/double_gyre", 6),
    "benchmark": ("configs/benchmark", 4),
    "rho_basin": ("configs/rho_basin", 4),
}


def run_case(rundir, n_cycles):
    pf = ParamFile([os.path.join(REPO, rundir, "MOM_input")])
    st = build_model_from_params(pf)
    cyc = jax.jit(lambda s: step_mom(s, st.forcing, st.grid, st.vgrid,
                                     st.params))
    s = st.state
    for _ in range(n_cycles):
        s = cyc(s)
    stats = compute_stats(s, st.grid, st.vgrid, st.params.dyn.dt)
    return {k: float(v) for k, v in stats.items()}


def test_golden_regression():
    results = {name: run_case(rd, n) for name, (rd, n) in CASES.items()}
    if os.environ.get("UPDATE_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        return
    with open(GOLDEN) as f:
        golden = json.load(f)
    for name, got in results.items():
        want = golden[name]
        # mass to near machine precision; energies to a loose f32-run
        # tolerance (reassociation under compiler changes)
        assert abs(got["mass"] - want["mass"]) <= 1e-6 * abs(want["mass"]), \
            (name, "mass", got["mass"], want["mass"])
        for key in ("KE", "APE"):
            scale = max(abs(want[key]), 1e-3)
            assert abs(got[key] - want[key]) <= 5e-3 * scale, \
                (name, key, got[key], want[key])
