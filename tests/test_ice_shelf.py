"""Ice shelf 3-equation melt tests."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.physics.ice_shelf import IceShelfParams, three_equation_melt


def test_warm_water_melts_more():
    S = jnp.full((4, 4), 34.5)
    p_base = jnp.full((4, 4), 5e6)  # ~500 m draft
    m_cold, q_cold, _ = three_equation_melt(jnp.full((4, 4), -1.8), S, p_base)
    m_warm, q_warm, _ = three_equation_melt(jnp.full((4, 4), 1.0), S, p_base)
    assert float(m_warm.mean()) > float(m_cold.mean())
    assert float(q_warm.mean()) < float(q_cold.mean())  # more ocean cooling


def test_magnitudes_plausible():
    # warm-cavity conditions (Amundsen-like): ~1C thermal driving
    m, q, fs = three_equation_melt(jnp.asarray(0.5), jnp.asarray(34.5),
                                   jnp.asarray(5e6))
    m_per_yr = float(m) * 365 * 86400
    assert 0.5 < m_per_yr < 100.0          # m/yr of ice
    assert float(q) < 0.0                  # ocean loses heat
    assert float(fs) < 0.0                 # ocean freshens


def test_supercooled_refreezes():
    # water colder than the local freezing point: marine ice forms
    m, q, fs = three_equation_melt(jnp.asarray(-2.6), jnp.asarray(34.5),
                                   jnp.asarray(5e6))
    assert float(m) < 0.0
