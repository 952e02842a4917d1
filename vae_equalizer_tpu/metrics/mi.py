"""Mutual-information (achievable-rate) estimation from demapper posteriors.

New capability vs. the reference (which only measures SER; constellation
entropy appears commented out at shared_funcs.py:578): the standard
mismatched-decoding MI estimate

    MI ≈ H(P) - (1/N) sum_k [-log2 q_k(x_k)]
       = (1/N) sum_k log2( q_k(x_k) / P(x_k) )

evaluated at the transmitted symbols, summed over the two independent ASK
dimensions of a square QAM. This lower-bounds the achievable information rate
of the (blind) receiver and is the BASELINE.json "MI curve" metric.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mutual_information", "mutual_information_ambiguity"]


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
    num_lev = amps.shape[0]
    scale = (num_lev - 1) / 2
    idx = jnp.round(scale * tx.astype(jnp.float32) + scale).astype(jnp.int32)  # (..., 2, N)
    q_i = jnp.take_along_axis(q[..., :num_lev, :], idx[..., 0:1, :], axis=-2)[..., 0, :]
    q_q = jnp.take_along_axis(q[..., num_lev:, :], idx[..., 1:2, :], axis=-2)[..., 0, :]
    p_i = P[idx[..., 0, :]]
    p_q = P[idx[..., 1, :]]
    info = (jnp.log2(q_i + eps) - jnp.log2(p_i)) + (jnp.log2(q_q + eps) - jnp.log2(p_q))
    if weight is None:
        return jnp.mean(info, axis=-1)
    w = jnp.broadcast_to(weight.astype(jnp.float32), info.shape)
    return jnp.sum(info * w, axis=-1) / jnp.sum(w, axis=-1)


def mutual_information_ambiguity(
    q: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MI maximized over the 8 blind phase/IQ ambiguities.

    A blind equalizer may converge to any of the 4 quadrant rotations x
    IQ-flip; each maps to a permutation of the posterior level axes, under
    which the achievable rate is unchanged — so the best hypothesis is the
    meaningful rate estimate (mirrors the min-over-ambiguities SER).
    """
    n = amps.shape[0]
    qi, qq = q[..., :n, :], q[..., n:, :]
    rev = slice(None, None, -1)
    variants = []
    for flip in (False, True):
        b = qq[..., rev, :] if flip else qq  # IQ-flip reverses the Q levels
        variants += [
            jnp.concatenate([qi, b], axis=-2),  # 0
            jnp.concatenate([qi[..., rev, :], b[..., rev, :]], axis=-2),  # pi
            jnp.concatenate([b[..., rev, :], qi], axis=-2),  # pi/4
            jnp.concatenate([b, qi[..., rev, :]], axis=-2),  # 3pi/4
        ]
    mis = jnp.stack([mutual_information(v, tx, amps, P, weight) for v in variants])
    return jnp.max(mis, axis=0)
