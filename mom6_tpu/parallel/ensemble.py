"""Ensemble parallelism.

Analogue of MOM6's ensemble manager (reference:
src/framework/MOM_ensemble_manager.F90; solo driver ensembles at
MOM_driver.F90:685; used by the ODA subsystem, SURVEY.md §2.11/§2.14.6):
N model replicas advanced together.

TPU-native design: the ensemble is a leading axis of the state pytree,
stepped with ``jax.vmap`` — one compiled program advances every member —
and optionally sharded over its own mesh axis ('e') so members scale
across chips independently of the spatial decomposition.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["stack_ensemble", "ensemble_step", "member", "ensemble_mean"]


def stack_ensemble(states: Sequence) -> object:
    """Stack per-member state pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def member(ens_state, i: int):
    return jax.tree_util.tree_map(lambda x: x[i], ens_state)


def ensemble_mean(ens_state):
    return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), ens_state)


def ensemble_step(step_fn: Callable) -> Callable:
    """Vectorize a ``state -> state`` step over the ensemble axis."""
    return jax.vmap(step_fn)
