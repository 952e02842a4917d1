"""Mutual-information (achievable-rate) estimation from demapper posteriors.

New capability vs. the reference (which only measures SER; constellation
entropy appears commented out at shared_funcs.py:578): the standard
mismatched-decoding MI estimate

    MI ≈ H(P) - (1/N) sum_k [-log2 q_k(x_k)]
       = (1/N) sum_k log2( q_k(x_k) / P(x_k) )

evaluated at the transmitted symbols, summed over the two independent ASK
dimensions of a square QAM. This lower-bounds the achievable information rate
of the (blind) receiver and is the BASELINE.json "MI curve" metric.

TPU note: selecting q at the transmitted level is a gather along the level
axis; XLA's TPU gather is slow (measured ~0.4 ms per 40k-element lookup on
v5e), so the selections run as one-hot masked reductions over the small level
axis instead. The 8 blind-ambiguity variants are linear combinations of just
8 such reductions (level reversal moves onto the one-hot, the I/Q swap
exchanges which posterior block a component reads), and the prior term is
variant-invariant because the MB pmf is symmetric under level reversal.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ser import _decode_levels

__all__ = ["mutual_information", "mutual_information_ambiguity"]


def _onehot_levels(tx: jnp.ndarray, num_lev: int) -> jnp.ndarray:
    """tx (..., 2, N) amplitude levels -> one-hot (..., 2, num_lev, N)."""
    idx = _decode_levels(tx, num_lev)  # shared exact inverse level map
    lev = jnp.arange(num_lev, dtype=jnp.int32)
    return (idx[..., None, :] == lev[(None,) * (idx.ndim - 1) + (slice(None), None)]).astype(
        jnp.float32
    )


def _wnorm(x: jnp.ndarray, weight: jnp.ndarray | None, n: int):
    if weight is None:
        return x / n
    return x / jnp.sum(jnp.broadcast_to(weight.astype(jnp.float32), (n,)))


def mutual_information(
    q: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Per-symbol MI estimate in bits from posteriors and the PCS prior.

    Args:
      q: (..., 2*num_lev, N) posteriors (I levels then Q levels).
      tx: (..., 2, N) transmitted amplitude levels.
      amps: (num_lev,) amplitude levels; P: (num_lev,) prior pmf.
      weight: optional (N,)/broadcastable mask of symbols to include.

    Returns:
      MI in bits/QAM-symbol (sum of the two ASK dimensions), shape = batch
      dims of q (e.g. per polarization for DP input).
    """
    n = amps.shape[0]
    s = _onehot_levels(tx, n)  # (..., 2, n, N)
    if weight is not None:
        s = s * weight.astype(jnp.float32)
    lq = jnp.log2(q + eps)  # (..., 2n, N)
    lp = jnp.log2(P)[(None,) * (q.ndim - 2) + (slice(None), None)]
    t_i = jnp.sum(s[..., 0, :, :] * (lq[..., :n, :] - lp), axis=(-2, -1))
    t_q = jnp.sum(s[..., 1, :, :] * (lq[..., n:, :] - lp), axis=(-2, -1))
    return _wnorm(t_i + t_q, weight, tx.shape[-1])


def mutual_information_ambiguity(
    q: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """MI maximized over the 8 blind phase/IQ ambiguities.

    A blind equalizer may converge to any of the 4 quadrant rotations x
    IQ-flip; each maps to a permutation of the posterior level axes, under
    which the achievable rate is unchanged — so the best hypothesis is the
    meaningful rate estimate (mirrors the min-over-ambiguities SER).

    Variant table (I-posterior block, Q-posterior block), with r = level
    reversal and the IQ-flip b = reversed Q block:
      no flip: (qi, qq), (qi_r, qq_r), (qq_r, qi), (qq, qi_r)
      flip:    (qi, qq_r), (qi_r, qq), (qq, qi), (qq_r, qi_r)
    Since sum_n s[lev,n] A_r[lev,n] = sum_n s_r[lev,n] A[lev,n], every variant
    is a sum of two of the 8 reductions {sI,sIr}x{qi,qq} / {sQ,sQr}x{qq,qi},
    and the prior term is shared (P is reversal-symmetric).
    """
    n = amps.shape[0]
    s = _onehot_levels(tx, n)  # (..., 2, n, N)
    if weight is not None:
        s = s * weight.astype(jnp.float32)
    s_i, s_q = s[..., 0, :, :], s[..., 1, :, :]
    s_ir, s_qr = s_i[..., ::-1, :], s_q[..., ::-1, :]
    lqi = jnp.log2(q[..., :n, :] + eps)
    lqq = jnp.log2(q[..., n:, :] + eps)
    lp = jnp.log2(P)[(None,) * (q.ndim - 2) + (slice(None), None)]

    red = lambda sel, lq: jnp.sum(sel * lq, axis=(-2, -1))
    a1, a2 = red(s_i, lqi), red(s_ir, lqi)
    a3, a4 = red(s_i, lqq), red(s_ir, lqq)
    b1, b2 = red(s_q, lqq), red(s_qr, lqq)
    b3, b4 = red(s_q, lqi), red(s_qr, lqi)
    prior = red(s_i, jnp.broadcast_to(lp, lqi.shape)) + red(
        s_q, jnp.broadcast_to(lp, lqq.shape)
    )
    best = jnp.max(
        jnp.stack(
            [a1 + b1, a2 + b2, a4 + b3, a3 + b4, a1 + b2, a2 + b1, a3 + b3, a4 + b4]
        ),
        axis=0,
    )
    return _wnorm(best - prior, weight, tx.shape[-1])
