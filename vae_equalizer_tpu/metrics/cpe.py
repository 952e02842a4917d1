"""Viterbi-Viterbi carrier-phase estimation (CPE).

Raise the signal to the 4th power to strip the (square-QAM) modulation,
moving-average filter, phi = atan2(Im, -Re)/4, unwrap the pi/2 jumps, and
de-rotate. The reference's Python unwrap loops (shared_funcs.py:165-178)
become a cumulative sum over jump indicators — identical result, fully
vectorized and jittable.

Parity: CPE (shared_funcs.py:140-186) for DP (with unwrap) and CPE
(func_CMA_MQAM_shaping.py:170-196) for SISO (no unwrap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cpe_dp", "cpe_siso"]

M_MA = 501  # moving-average filter length


def _pow4(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a + jb)^4 in real arithmetic."""
    a2, b2 = a * a, b * b
    re = a2 * a2 - 6.0 * a2 * b2 + b2 * b2
    im = 4.0 * (a2 * a * b - a * b2 * b)
    return re, im


def _moving_average(x: jnp.ndarray, m: int = M_MA) -> jnp.ndarray:
    """'same' moving average along the last axis (zero padded), kernel 1/m.

    One grouped 'same' convolution over the row axis (each row is its own
    channel group) — a single fused XLA op instead of a per-row correlate.
    """
    rows = x.shape[0]
    kern = jnp.full((rows, 1, m), 1.0 / m, x.dtype)  # (out_ch, in_ch/group, K)
    pad = m // 2
    return jax.lax.conv_general_dilated(
        x[None], kern, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=rows,
    )[0]


def _unwrap_quarter(phi: jnp.ndarray) -> jnp.ndarray:
    """Remove +-pi/2 jumps: cumulative correction over jump indicators."""
    diff = phi[1:] - phi[:-1]
    jumps = (diff > jnp.pi / 4).astype(phi.dtype) - (diff < -jnp.pi / 4).astype(phi.dtype)
    corr = jnp.concatenate([jnp.zeros((1,), phi.dtype), jnp.cumsum(jumps)])
    return phi - (jnp.pi / 2) * corr


def _derotate(a: jnp.ndarray, b: jnp.ndarray, phi: jnp.ndarray):
    c, s = jnp.cos(phi), jnp.sin(phi)
    return a * c - b * s, b * c + a * s


def cpe_siso(y: jnp.ndarray) -> jnp.ndarray:
    """SISO Viterbi-Viterbi CPE (no unwrapping). y: (2, N) -> (2, N)."""
    a, b = y[0], y[1]
    re4, im4 = _pow4(a, b)
    ma = _moving_average(jnp.stack([re4, im4]))
    phi = jnp.arctan2(ma[1], -ma[0]) / 4
    ar, br = _derotate(a, b, phi)
    return jnp.stack([ar, br])


def cpe_dp(y: jnp.ndarray) -> jnp.ndarray:
    """DP Viterbi-Viterbi CPE with pi/2 unwrapping. y: (2, 2, N) -> (2, 2, N)."""
    ax, bx, ay, by = y[0, 0], y[0, 1], y[1, 0], y[1, 1]
    rx4 = jnp.stack([*_pow4(ax, bx), *_pow4(ay, by)])  # (4, N)
    ma = _moving_average(rx4)
    phi_x = _unwrap_quarter(jnp.arctan2(ma[1], -ma[0]) / 4)
    phi_y = _unwrap_quarter(jnp.arctan2(ma[3], -ma[2]) / 4)
    axr, bxr = _derotate(ax, bx, phi_x)
    ayr, byr = _derotate(ay, by, phi_y)
    return jnp.stack([jnp.stack([axr, bxr]), jnp.stack([ayr, byr])])
