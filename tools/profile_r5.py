"""Round-5 perf attribution on the real TPU chip.

Two measurements in ONE process (the tunnel warmup costs ~4 min):

1. raw tridiag micro-bench: lax.scan Thomas vs the Pallas kernel at the
   bench shapes, REP-chained inside one jit so dispatch amortizes;
2. ablation attribution of the full-physics thermo cycle: time step_mom
   with one subsystem disabled at a time; baseline minus ablated =
   that subsystem's cost including its fusion context (more honest than
   separate jits, which lose cross-phase fusion).

Usage: python tools/profile_r5.py [--case full|global] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, state, n_warm=1, n_calls=3):
    """Feedback timing: each call consumes the previous call's output.
    CRITICAL on the axon tunnel — repeated executions with identical
    inputs are deduplicated/cached, so same-args timing measures only
    the RPC overhead (sanity check: 42,000 "TFLOP/s" on a v5e)."""
    for _ in range(n_warm):
        state = fn(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = fn(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    return (time.perf_counter() - t0) / n_calls


def bench_tridiag():
    from mom6_tpu.framework.pallas_tridiag import tridiag_solve_opt
    from mom6_tpu.framework.solvers import tridiag_solve
    import numpy as np
    rng = np.random.default_rng(0)
    for (nz, ny, nx) in [(32, 400, 720), (75, 270, 360), (33, 280, 360),
                         (8, 280, 360)]:
        a = jnp.asarray(-rng.uniform(0.1, 1, (nz, ny, nx)), jnp.float32)
        c = jnp.asarray(-rng.uniform(0.1, 1, (nz, ny, nx)), jnp.float32)
        b = 2.5 - a - c
        d0 = jnp.asarray(rng.normal(size=(nz, ny, nx)), jnp.float32)
        REP = 10

        def chain(solver):
            @jax.jit
            def f(d):
                def body(dd, _):
                    # + 0.1*d0 keeps the iterate O(1) so the chain can't
                    # decay to zeros; each iterate (and each outer call's
                    # input) is distinct => no tunnel-side dedup
                    return solver(a, b, c, dd) + 0.1 * d0, None
                out, _ = jax.lax.scan(body, d, None, length=REP)
                return out
            return f

        t_scan = timeit(chain(tridiag_solve), d0, n_calls=4) / REP
        t_pal = timeit(chain(tridiag_solve_opt), d0, n_calls=4) / REP
        print(f"tridiag ({nz:3d},{ny},{nx}): scan {1e6*t_scan:8.1f} us"
              f"  pallas {1e6*t_pal:8.1f} us  speedup "
              f"{t_scan/t_pal:5.2f}x", flush=True)


def _build_full(nx=360, ny=280, nz=32, dt=1200.0):
    import bench
    return bench._full_physics_setup(nx, ny, nz, dt, n_dyn_per_thermo=2)


def _build_global():
    import os
    import sys
    from mom6_tpu.drivers.config_driver import build_model_from_params
    from mom6_tpu.framework.config import ParamFile
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rundir = os.path.join(repo, "configs", "global_half_deg")
    if not os.path.exists(os.path.join(rundir, "ocean_hgrid.nc")):
        sys.path.insert(0, rundir)
        import make_inputs
        make_inputs.main(rundir)
    cfg = os.path.join(rundir, "MOM_input")
    cwd = os.getcwd()
    os.chdir(rundir)
    try:
        ms = build_model_from_params(ParamFile([cfg]))
    finally:
        os.chdir(cwd)
    return (ms.grid, ms.vgrid, ms.state, ms.params, ms.forcing)


def bench_ablations(case="full", n_calls=4):
    import numpy as np
    from mom6_tpu.ale.ale import ALEParams, LAYER
    from mom6_tpu.core.mom import step_mom

    if case == "global":
        G, GV, state, params, forcing = _build_global()
    else:
        G, GV, state, params, forcing = _build_full()
    # host template: each variant gets a FRESH device copy (a donating
    # stepper invalidates the previous variant's buffers)
    host0 = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), state)
    SCAN = 4

    def run(p, tag):
        def many(s):
            def body(ss, _):
                return step_mom(ss, forcing, G, GV, p), None
            s, _ = jax.lax.scan(body, s, None, length=SCAN)
            return s
        step = jax.jit(many, donate_argnums=0)
        best = None
        for _ in range(2):
            st = jax.tree_util.tree_map(jnp.asarray, host0)
            t = timeit(step, st, n_warm=1, n_calls=n_calls) / SCAN
            best = t if best is None else min(best, t)
        print(f"{case}/{tag:14s}: {1e3*best:9.2f} ms/cycle", flush=True)
        return best

    base = run(params, "baseline")
    variants = {
        "no_bl": params._replace(
            diabatic=params.diabatic._replace(boundary_layer_scheme="NONE")),
        "no_shear": params._replace(
            diabatic=params.diabatic._replace(use_shear_mixing=False)),
        "no_gm": params._replace(gm=None, meke=None),
        "no_ale": params._replace(ale=ALEParams(mode=LAYER)),
        "no_khtr": params._replace(khtr=0.0),
        "no_horvisc": params._replace(hor_visc=None),
    }
    out = {"baseline": base}
    for tag, p in variants.items():
        try:
            t = run(p, tag)
            out[tag] = t
            print(f"  -> {tag} share: {1e3*(base-t):8.2f} ms "
                  f"({100*(base-t)/base:5.1f}%)", flush=True)
        except Exception as e:             # noqa: BLE001
            print(f"{case}/{tag}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="both",
                    choices=["full", "global", "both"])
    ap.add_argument("--skip-tridiag", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if not args.skip_tridiag:
        bench_tridiag()
    if args.case in ("full", "both"):
        bench_ablations("full")
    if args.case in ("global", "both"):
        bench_ablations("global")


if __name__ == "__main__":
    main()
