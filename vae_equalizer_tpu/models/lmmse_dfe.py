"""Closed-form LMMSE (Wiener) equalizer and decision-feedback equalizer.

Filter design is tiny setup-time linear algebra (NumPy, complex128); the
decision-feedback loop is a ``lax.scan`` over symbols with the feedback taps
applied to the last K2 hard decisions.

Parity: compute_lmmse / compute_feedforward / compute_feedback_filter / dfe /
nearest_neighbor / compl_conv (AWGN_channel/DFE_MQAM_shaping.py:154-241).
Note the reference builds the normal equations with the plain transpose
H @ H^T (not conjugate) — reproduced as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_lmmse",
    "compute_feedforward",
    "compute_feedback",
    "complex_fir",
    "nearest_neighbor",
    "dfe_equalize",
]


def compute_lmmse(channel: np.ndarray, snr_db: float, order: int, n1: int) -> np.ndarray:
    """MMSE filter taps from known channel taps. Returns (order,) complex."""
    sigma_w = 1 / 2 / 10 ** (snr_db / 10)
    L = len(channel) - 1
    H = np.zeros((order, order + L), np.complex128)
    flipped = channel[::-1]
    for i in range(order):
        H[i, i : i + L + 1] = flipped
    w = np.linalg.inv(sigma_w * np.eye(order) + H @ H.T) @ H[:, -(n1 + 1)]
    return w[::-1].astype(np.complex64)


def compute_feedforward(channel: np.ndarray, snr_db: float, order: int) -> np.ndarray:
    """Causal MMSE feedforward section of the DFE. Returns (order,) complex."""
    sigma_w = 1 / 2 / 10 ** (snr_db / 10)
    L = len(channel) - 1
    H = np.zeros((order, order), np.complex128)
    for i in range(order - L):
        H[i, i : i + L + 1] = channel
    for i in range(L):
        H[order - L + i, order - L + i :] = channel[: L - i]
    rhs = np.concatenate([np.zeros(order - L - 1, np.complex128), channel[::-1]])
    w = np.linalg.inv(sigma_w * np.eye(order) + H @ H.T) @ rhs
    return w.astype(np.complex64)


def compute_feedback(channel: np.ndarray, feedforward: np.ndarray) -> np.ndarray:
    """Feedback taps from the feedforward taps and the channel. (L,) complex."""
    L = len(channel) - 1
    fb = np.zeros(L, np.complex128)
    for k in range(L):
        fb[k] = -np.dot(feedforward[-(L - k) :], channel[k + 1 :][::-1])
    return fb.astype(np.complex64)


def complex_fir(rx: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Complex 'same'-ish FIR: true convolution with pad K//2 (length L-K+1+2*(K//2)).

    rx, h: stacked planes (2, L), (2, K). Matches compl_conv
    (DFE_MQAM_shaping.py:236-241).
    """
    k = h.shape[-1]
    pad = k // 2
    rxp = jnp.pad(rx, ((0, 0), (pad, pad)))
    hr, hi = h[0], h[1]
    rr = jnp.convolve(rxp[0], hr, mode="valid")
    ii = jnp.convolve(rxp[1], hi, mode="valid")
    ri = jnp.convolve(rxp[0], hi, mode="valid")
    ir = jnp.convolve(rxp[1], hr, mode="valid")
    return jnp.stack([rr - ii, ir + ri])


def nearest_neighbor(sym: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Hard decision to nearest constellation point.

    sym: (2, N) planes; points: (2, M) planes. Returns (N,) int32 indices.
    """
    d_re = sym[0][None, :] - points[0][:, None]
    d_im = sym[1][None, :] - points[1][:, None]
    return jnp.argmin(d_re * d_re + d_im * d_im, axis=0).astype(jnp.int32)


def dfe_equalize(
    ff_out: jnp.ndarray,
    feedback: jnp.ndarray,
    points: jnp.ndarray,
    init_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Decision-feedback loop.

    ff_out: (2, N) feedforward-filtered signal (planes); feedback: (2, K2)
    feedback taps; points: (2, M) constellation; init_idx: (N,) initial hard
    decisions (the first K2 seed the feedback state). Returns (N,) indices.
    """
    k2 = feedback.shape[-1]
    n = ff_out.shape[-1]
    state0 = points[:, init_idx[:k2]]  # (2, K2) oldest-first

    fb_flip = feedback[:, ::-1]  # so correction = sum fb[j] * state[K2-1-j]

    def step(state, v):
        # correction = sum_j fb[j] * flip(state)[j] = sum_j fb_flip[j]*state[j]
        c_re = jnp.dot(fb_flip[0], state[0]) - jnp.dot(fb_flip[1], state[1])
        c_im = jnp.dot(fb_flip[0], state[1]) + jnp.dot(fb_flip[1], state[0])
        ik = v + jnp.array([c_re, c_im])
        d_re = ik[0] - points[0]
        d_im = ik[1] - points[1]
        idx = jnp.argmin(d_re * d_re + d_im * d_im).astype(jnp.int32)
        new = points[:, idx]
        state = jnp.concatenate([state[:, 1:], new[:, None]], axis=1)
        return state, idx

    _, dec = jax.lax.scan(step, state0, ff_out[:, k2:].T)
    return jnp.concatenate([init_idx[:k2].astype(jnp.int32), dec])
