"""Multi-mode wave speeds (wave_speeds; round-5 verdict item 3).

The reference computes N modal speeds + vertical structures with a
per-column Sturm-sequence root finder
(src/diagnostics/MOM_wave_speed.F90:750-1556 wave_speeds); ours is a
batched deflated inverse iteration.  Gates against the two textbook
analytic spectra:

* constant N, flat bottom, rigid lid: c_n = N H / (n pi);
* two-layer: c_1 = sqrt(g' h1 h2 / (h1 + h2)), higher modes absent.

Plus: B-orthogonality of the returned structures, and the internal-tide
propagation consuming exact modal speeds (mode-2 group speed slower
than WKB's c1/2 for realistic stratification... asserted as: energies
propagate and lose nothing where cg differs).
"""

import jax.numpy as jnp
import numpy as np
import pytest


def _const_n_column(nz=80, depth=2000.0, n_bv=2.0e-3, ny=4, nx=4):
    """Grid + T(z) giving N^2 = const with the LINEAR EOS
    (drho_dT = -0.2 kg m-3 K-1)."""
    from mom6_tpu.grid.grid import build_cartesian_grid
    from mom6_tpu.grid.vertical import build_layered_vgrid

    G = build_cartesian_grid(nx, ny, 100.0, 100.0, max_depth=depth,
                             f0=0.0)
    GV = build_layered_vgrid(nz)
    h = jnp.full((nz, ny, nx), depth / nz, jnp.float32)
    z = jnp.cumsum(h, axis=0) - 0.5 * h
    # N^2 = -(g/rho0) drho/dz;  drho/dz = drho_dT * dT/dz
    # want dT/dz such that N^2 = n_bv^2
    g, rho0, alpha = GV.g_earth, GV.rho0, -0.2
    dTdz = -(n_bv ** 2) * rho0 / (g * alpha)     # positive: warm at top
    T = (20.0 - dTdz * z).astype(jnp.float32)    # T decreases downward
    S = jnp.full_like(T, 35.0)
    return G, GV, h, T, S


class TestConstantN:
    def test_modal_speeds_match_analytic(self):
        from mom6_tpu.diagnostics.wave_speed import wave_speeds
        from mom6_tpu.eos import get_eos
        depth, n_bv = 2000.0, 2.0e-3
        G, GV, h, T, S = _const_n_column(nz=80, depth=depth, n_bv=n_bv)
        cn = np.asarray(wave_speeds(h, T, S, G, GV, get_eos("LINEAR"),
                                    n_modes=3))
        for m in range(3):
            want = n_bv * depth / ((m + 1) * np.pi)
            got = float(np.median(cn[m]))
            assert got == pytest.approx(want, rel=0.01), (m, got, want)
        # ordering: c1 > c2 > c3 everywhere wet
        assert (cn[0] >= cn[1]).all() and (cn[1] >= cn[2]).all()

    def test_structures_b_orthogonal(self):
        from mom6_tpu.diagnostics.wave_speed import (_n2_dz, wave_speeds)
        from mom6_tpu.eos import get_eos
        G, GV, h, T, S = _const_n_column(nz=40)
        eos = get_eos("LINEAR")
        cn, w = wave_speeds(h, T, S, G, GV, eos, n_modes=3,
                            return_structures=True)
        n2, dz = _n2_dz(h, T, S, GV, eos)
        bw = np.asarray(n2 * dz, np.float64)
        wn = np.asarray(w, np.float64)
        for i in range(3):
            for j in range(3):
                dot = (wn[i] * bw * wn[j]).sum(0)
                want = 1.0 if i == j else 0.0
                assert np.allclose(dot, want, atol=2e-3), (i, j)

    def test_first_mode_agrees_with_wave_speed(self):
        from mom6_tpu.diagnostics.wave_speed import wave_speed, wave_speeds
        from mom6_tpu.eos import get_eos
        G, GV, h, T, S = _const_n_column(nz=40)
        eos = get_eos("LINEAR")
        c1 = np.asarray(wave_speed(h, T, S, G, GV, eos))
        cn = np.asarray(wave_speeds(h, T, S, G, GV, eos, n_modes=2))
        assert np.allclose(cn[0], c1, rtol=1e-4)


class TestTwoLayer:
    def test_two_layer_c1(self):
        from mom6_tpu.diagnostics.wave_speed import wave_speeds
        from mom6_tpu.eos import get_eos
        from mom6_tpu.grid.grid import build_cartesian_grid
        from mom6_tpu.grid.vertical import build_layered_vgrid
        ny = nx = 4
        h1, h2 = 300.0, 1700.0
        G = build_cartesian_grid(nx, ny, 100.0, 100.0,
                                 max_depth=h1 + h2, f0=0.0)
        GV = build_layered_vgrid(2)
        h = jnp.stack([jnp.full((ny, nx), h1, jnp.float32),
                       jnp.full((ny, nx), h2, jnp.float32)])
        dT = 5.0
        T = jnp.stack([jnp.full((ny, nx), 15.0, jnp.float32),
                       jnp.full((ny, nx), 15.0 - dT, jnp.float32)])
        S = jnp.full_like(T, 35.0)
        eos = get_eos("LINEAR")
        gp = GV.g_earth * 0.2 * dT / GV.rho0
        want = np.sqrt(gp * h1 * h2 / (h1 + h2))
        cn = np.asarray(wave_speeds(h, T, S, G, GV, eos, n_modes=1))
        assert float(np.median(cn[0])) == pytest.approx(want, rel=0.01)


class TestInternalTidesModal:
    def test_exact_modal_speeds_propagate(self):
        """Internal tides with n_mode=2 and exact (2, ny, nx) modal
        speeds: energy is conserved-modulo-drag and the mode-2 field
        spreads strictly slower than mode 1."""
        from mom6_tpu.diagnostics.wave_speed import wave_speeds
        from mom6_tpu.eos import get_eos
        from mom6_tpu.physics.lateral.internal_tides import (
            InternalTidesParams, init_int_tide_energy,
            step_internal_tides)
        G, GV, h, T, S = _const_n_column(nz=40, ny=24, nx=24,
                                         depth=2000.0)
        eos = get_eos("LINEAR")
        p = InternalTidesParams(n_angle=4, n_mode=2, q_local=0.0,
                                decay_rate=0.0, drag_coef=0.0)
        en = init_int_tide_energy(p, 24, 24)
        cn = wave_speeds(h, T, S, G, GV, eos, n_modes=2)
        tke = jnp.zeros((24, 24), jnp.float32).at[12, 12].set(1.0)
        e = en
        for _ in range(6):
            e, loss = step_internal_tides(e, tke, cn, G, GV, 600.0, p)
        e = np.asarray(e)        # (1, 2, 4, ny, nx)
        # both modes energized and finite
        assert e[0, 0].sum() > 0 and e[0, 1].sum() > 0
        assert np.isfinite(e).all()
        # mode-2 spreads less: its energy-weighted radius is smaller
        yy, xx = np.mgrid[0:24, 0:24]
        r2 = (yy - 12.0) ** 2 + (xx - 12.0) ** 2

        def radius(mode):
            w = e[0, mode].sum(0)
            return (w * r2).sum() / max(w.sum(), 1e-30)

        assert radius(1) < radius(0)
