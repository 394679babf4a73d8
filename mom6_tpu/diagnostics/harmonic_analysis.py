"""Online harmonic analysis of sea surface height.

Analogue of MOM6's MOM_harmonic_analysis.F90: accumulate the normal
equations of a least-squares fit of SSH to the tidal constituents
  eta(t) ~ m + sum_c [A_c cos(w_c t) + B_c sin(w_c t)]
online (no storage of the time series), then solve at the end.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mom6_tpu.physics.lateral.tidal_forcing import CONSTITUENTS

__all__ = ["HarmonicAnalysis"]


class HarmonicAnalysis:
    def __init__(self, names: Tuple[str, ...], shape: Tuple[int, int]):
        self.names = list(names)
        self.freqs = np.array([CONSTITUENTS[n].freq for n in self.names])
        n = 1 + 2 * len(self.names)
        self._ata = np.zeros((n, n))
        self._atb = np.zeros((n,) + shape)
        self._n = n

    def _basis(self, t: float) -> np.ndarray:
        row = [1.0]
        for w in self.freqs:
            row += [np.cos(w * t), np.sin(w * t)]
        return np.array(row)

    def accumulate(self, t_seconds: float, ssh) -> None:
        a = self._basis(t_seconds)
        self._ata += np.outer(a, a)
        self._atb += a[:, None, None] * np.asarray(ssh, np.float64)[None]

    def solve(self):
        """Returns {name: (amplitude, phase_rad)} maps plus the mean."""
        coef = np.linalg.solve(
            self._ata + 1e-12 * np.eye(self._n),
            self._atb.reshape(self._n, -1)).reshape(self._atb.shape)
        out = {"mean": coef[0]}
        for i, name in enumerate(self.names):
            a, b = coef[1 + 2 * i], coef[2 + 2 * i]
            out[name] = (np.hypot(a, b), np.arctan2(b, a))
        return out
