"""Context A/B of the Pallas dispatch env knobs on the full model cycle.

Kernels that win in isolation can lose inside the jitted step: a
pallas_call is a fusion barrier (operands materialize to HBM), so the
honest metric is the full global_half_deg cycle, per knob, one process
per combo (the knobs are read at trace time):

    for T in scan pallas; do for C in xla pallas; do
        MOM6_TPU_TRIDIAG=$T MOM6_TPU_CONTINUITY=$C \
            python tools/ab_dispatch.py; done; done
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import numpy as np
    from mom6_tpu.core.mom import step_mom
    from tools.profile_r5 import _build_global
    print("tridiag:", os.environ.get("MOM6_TPU_TRIDIAG", "auto"),
          "continuity:", os.environ.get("MOM6_TPU_CONTINUITY", "auto"),
          flush=True)
    G, GV, state, params, forcing = _build_global()
    host0 = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), state)
    SCAN = 4

    def many(s):
        def body(ss, _):
            return step_mom(ss, forcing, G, GV, params), None
        s, _ = jax.lax.scan(body, s, None, length=SCAN)
        return s

    step = jax.jit(many, donate_argnums=0)
    best = None
    for _ in range(2):
        st = jax.tree_util.tree_map(jnp.asarray, host0)
        st = step(st)
        jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        t0 = time.perf_counter()
        for _ in range(3):
            st = step(st)
        jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        t = (time.perf_counter() - t0) / (3 * SCAN)
        best = t if best is None else min(best, t)
    print(f"cycle: {1e3*best:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
