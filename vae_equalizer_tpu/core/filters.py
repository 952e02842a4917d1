"""Pulse-shaping filter design (raised-cosine / root-raised-cosine).

Setup-time NumPy code: filters are tiny static arrays computed once per
experiment and closed over by the jitted channel simulators.

Behavioral parity target: ``rcfir``/``rrcfir`` in the reference
(AWGN_channel/func_VAELE_MQAM_shaping.py:18-37 and
optical_DP_channel/shared_funcs.py:17-36) — same time grid
``t = arange(-T*sps/2, T*sps/2, 1/sps)``, same singularity handling, unit-norm
output.
"""

from __future__ import annotations

import numpy as np


def _time_grid(T: int, sps: int) -> np.ndarray:
    return np.arange(-T * sps / 2, T * sps / 2, 1 / sps, dtype=np.float32)


def rcfir(T: int, sps: int, beta: float) -> np.ndarray:
    """Raised-cosine FIR taps, unit L2 norm.

    Args:
      T: pulse duration in symbols.
      sps: samples per symbol.
      beta: roll-off factor in (0, 1].
    """
    t = _time_grid(T, sps)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.sinc(t) * np.cos(np.pi * beta * t) / (1 - (2 * beta * t) ** 2)
    # singularity at |t| = 1/(2 beta)
    h[np.abs(t) == 1 / 2 / beta] = np.pi / 4 * np.sinc(1 / (2 * beta))
    return (h / np.linalg.norm(h)).astype(np.float32)


def rrcfir(T: int, sps: int, beta: float) -> np.ndarray:
    """Root-raised-cosine FIR taps, unit L2 norm."""
    t = _time_grid(T, sps)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = (np.sin(np.pi * t * (1 - beta)) + 4 * beta * t * np.cos(np.pi * t * (1 + beta))) / (
            np.pi * t * (1 - (4 * beta * t) ** 2)
        )
    # singularity at |t| = 1/(4 beta)
    h[np.abs(t) == 1 / 4 / beta] = (
        beta
        / np.sqrt(2)
        * ((1 + 2 / np.pi) * np.sin(np.pi / 4 / beta) + (1 - 2 / np.pi) * np.cos(np.pi / 4 / beta))
    )
    # singularity at t = 0
    h[t == 0] = 1 + beta * (4 / np.pi - 1)
    return (h / np.linalg.norm(h)).astype(np.float32)
