"""Tidal mixing (St Laurent 02 / Polzin 09) property tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mom6_tpu.eos import get_eos
from mom6_tpu.grid.grid import build_cartesian_grid
from mom6_tpu.grid.vertical import build_layered_vgrid
from mom6_tpu.physics.vertical.tidal_mixing import (
    TidalMixingParams, _deposit_fractions, _layer_n2, int_tide_input_tke,
    tidal_mixing_kd)

NZ, NY, NX = 16, 4, 4


@pytest.fixture(scope="module")
def setup():
    G = build_cartesian_grid(NX, NY, 40.0, 40.0, max_depth=2000.0)
    GV = build_layered_vgrid(NZ)
    h = jnp.full((NZ, NY, NX), 2000.0 / NZ, jnp.float32)
    # stably stratified column
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    T = 20.0 - 15.0 * z / 2000.0
    S = jnp.full_like(T, 35.0)
    eos = get_eos("LINEAR")
    return G, GV, h, T, S, eos


def test_deposit_fraction_sums_to_one(setup):
    """Both profile normalizations deposit exactly the bottom TKE flux
    over the column (the Inv_int construction)."""
    G, GV, h, T, S, eos = setup
    n2 = _layer_n2(h, T, S, G, GV, eos)
    nb = jnp.sqrt(jnp.maximum(n2[-1], 0.0))
    for profile in ("STLAURENT_02", "POLZIN_09"):
        p = TidalMixingParams(profile=profile, utide=0.1)
        frac = _deposit_fractions(h, n2, nb, p, p.h2, p.utide)
        tot = np.asarray(jnp.sum(frac, axis=0))
        assert np.allclose(tot, 1.0, atol=1e-4), (profile, tot)
        assert np.all(np.asarray(frac) >= -1e-6), profile


def test_stlaurent_decays_upward(setup):
    """Exponential profile: more energy near the bottom."""
    G, GV, h, T, S, eos = setup
    p = TidalMixingParams(utide=0.1)
    n2 = _layer_n2(h, T, S, G, GV, eos)
    frac = np.asarray(_deposit_fractions(h, n2, n2[-1] ** 0.5, p,
                                         p.h2, p.utide))
    col = frac[:, 0, 0]
    assert np.all(np.diff(col) > 0)   # increasing toward the bottom (k down)


def test_tke_input_formula(setup):
    """E = 0.5 * kappa_h2_factor * rho0 * kappa_itides * h2 * U^2 * Nb
    (MOM_internal_tide_input.F90:563)."""
    G, GV, h, T, S, eos = setup
    p = TidalMixingParams(utide=0.05, h2=150.0, tke_itide_max=1e9)
    tke, nb = int_tide_input_tke(h, T, S, G, GV, eos, p)
    expect = (0.5 * p.kappa_h2_factor * GV.rho0 * p.kappa_itides
              * 150.0 * 0.05 ** 2 * np.asarray(nb))
    assert np.allclose(np.asarray(tke), expect, rtol=1e-5)
    # cap engages
    p2 = p._replace(tke_itide_max=1e-6)
    tke2, _ = int_tide_input_tke(h, T, S, G, GV, eos, p2)
    assert np.all(np.asarray(tke2) <= 1e-6 + 1e-12)


def test_kd_energy_conservation(setup):
    """With no kd cap, sum(Kd*(N^2+Om^2)*dz) == mu*gamma*E/rho0."""
    G, GV, h, T, S, eos = setup
    p = TidalMixingParams(utide=0.1, kd_max=1e9)
    n2 = _layer_n2(h, T, S, G, GV, eos)
    tke, _ = int_tide_input_tke(h, T, S, G, GV, eos, p)
    kd = tidal_mixing_kd(h, T, S, G, GV, eos, p)
    kd_lay = 0.5 * (kd[:-1] + kd[1:])
    om2 = 7.2921e-5 ** 2
    # interface->layer halving loses the two boundary halves; reconstruct
    # the layer kd directly for the budget
    power = jnp.sum(2.0 * kd_lay * (n2 + om2) * h, axis=0)
    # the at[0]/at[-1] zeroing drops half of the top/bottom layer deposit;
    # tolerate a few percent
    expect = p.mu_itides * p.gamma_itides * np.asarray(tke) / GV.rho0
    assert np.allclose(np.asarray(power), expect, rtol=0.25)


def test_kd_cap_and_mask(setup):
    G, GV, h, T, S, eos = setup
    p = TidalMixingParams(utide=0.5, kd_max=1e-4)
    kd = np.asarray(tidal_mixing_kd(h, T, S, G, GV, eos, p))
    assert kd.max() <= 1e-4 + 1e-10
    assert kd.min() >= 0.0
    assert np.all(kd[0] == 0.0) and np.all(kd[-1] == 0.0)


def test_polzin_reaches_higher(setup):
    """The Polzin algebraic tail puts more energy far above the bottom
    than the exponential for the same decay parameters."""
    G, GV, h, T, S, eos = setup
    n2 = _layer_n2(h, T, S, G, GV, eos)
    nb = jnp.sqrt(jnp.maximum(n2[-1], 0.0))
    f_exp = _deposit_fractions(h, n2, nb, TidalMixingParams(utide=0.1),
                               100.0, 0.1)
    f_pol = _deposit_fractions(
        h, n2, nb, TidalMixingParams(profile="POLZIN_09", utide=0.1),
        100.0, 0.1)
    # top-half share of the column
    top_exp = float(jnp.sum(f_exp[:NZ // 2, 0, 0]))
    top_pol = float(jnp.sum(f_pol[:NZ // 2, 0, 0]))
    assert top_pol > top_exp


def test_set_diffusivity_integration(setup):
    """tidal params thread through set_diffusivity when T/S/eos given."""
    from mom6_tpu.physics.vertical.set_diffusivity import (
        DiffusivityParams, set_diffusivity)
    G, GV, h, T, S, eos = setup
    p = DiffusivityParams(kd=1e-5, tidal=TidalMixingParams(utide=0.1))
    kd = set_diffusivity(h, G, GV, p, T=T, S=S, eos=eos)
    kd0 = set_diffusivity(h, G, GV, DiffusivityParams(kd=1e-5),
                          T=T, S=S, eos=eos)
    assert float(jnp.max(kd - kd0)) > 1e-7   # tidal mixing added something
