"""Time-shift and polarization-assignment search by correlation.

Blind equalizers introduce an unknown integer symbol delay (and for dual-pol
a possible X/Y swap); these routines find it by correlating the equalizer
output — either E_q[x^I] computed from the posteriors, or the raw in-phase
constellation output — against the known transmitted symbols over a window of
``n_shift`` cyclic shifts.

Everything is branch-free / static-shape: the reference's threshold fallbacks
(func_VAELE_MQAM_shaping.py:197-204) become ``jnp.where`` selections and the
roll matrix is built with a vmapped ``jnp.roll``.

Parity: find_shift (shared_funcs.py:290-314), find_shift_symb_full
(shared_funcs.py:316-338), find_shift (func_VAELE_MQAM_shaping.py:188-204),
find_shift_symb (func_CMA_MQAM_shaping.py:127-140).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "find_shift_siso",
    "find_shift_symb_siso",
    "find_shift_dp",
    "find_shift_dp_mb",
    "find_shift_symb_dp",
    "expectation_i",
]


def expectation_i(q: jnp.ndarray, amps: jnp.ndarray) -> jnp.ndarray:
    """E_q[x^I]: posterior mean of the in-phase component.

    q: (..., 2*num_lev, N) -> (..., N).
    """
    num_lev = amps.shape[0]
    qi = q[..., :num_lev, :]
    return jnp.sum(qi * amps[(None,) * (qi.ndim - 2) + (slice(None), None)], axis=-2)


def _roll_stack(e: jnp.ndarray, n_shift: int) -> jnp.ndarray:
    """(..., L) -> (n_shift, ..., L) where [i] = roll(e, i - n_shift//2).

    The shifts are compile-time constants, so each roll is two static slices
    + concat (a vmap over traced shifts would lower every roll to dynamic
    slicing machinery).

    The lag axis stays LEADING: time must remain the minormost (lane) dim.
    The previous (..., L, n_shift) layout padded the trailing 21-lag axis to
    128 lanes, so the runs-batched eval streamed a (128, 2, 10000, 128)-padded
    roll tensor (~1.3 GB/frame at 6x useful density) — measured 3.96 ms/frame
    of the 13.6 ms eval stage (artifacts/r4_eval_breakdown.log)."""
    return jnp.stack(
        [jnp.roll(e, s, axis=-1) for s in range(-(n_shift // 2), n_shift - n_shift // 2)]
    )


def find_shift_siso(
    q: jnp.ndarray, tx: jnp.ndarray, n_shift: int, amps: jnp.ndarray, corr_len: int = 1000
) -> jnp.ndarray:
    """Time shift between SISO posteriors q (2n, L) and tx (2, L).

    Correlates E_q[x^I] over the first ``corr_len`` symbols; falls back to the
    Q component if the I correlation peak is weak (below 0.02*L) — selected
    with where(), no branches.
    """
    e = expectation_i(q, amps)[:corr_len]
    e_mat = _roll_stack(e, n_shift)  # (n_shift, corr_len)
    corr_i = jnp.abs(e_mat @ tx[0, :corr_len].astype(jnp.float32))
    corr_q = jnp.abs(e_mat @ tx[1, :corr_len].astype(jnp.float32))
    s_i = n_shift // 2 - jnp.argmax(corr_i)
    s_q = n_shift // 2 - jnp.argmax(corr_q)
    use_i = jnp.max(corr_i) >= 0.02 * q.shape[-1]
    use_q = jnp.max(corr_q) >= jnp.max(corr_i)
    return jnp.where(use_i, s_i, jnp.where(use_q, s_q, s_i)).astype(jnp.int32)


def find_shift_symb_siso(rx: jnp.ndarray, tx: jnp.ndarray, n_shift: int, corr_len: int = 1000) -> jnp.ndarray:
    """Time shift from raw SISO constellation output rx (2, L) vs tx (2, L).

    Mirrors find_shift_symb (func_CMA_MQAM_shaping.py:127-140): correlates
    rx^I windows [i : corr_len - n_shift//2 + i] against
    tx[:, n_shift//2 : corr_len]; positive result means rx lags tx.
    """
    m = corr_len - n_shift // 2
    idx = jnp.arange(m)[:, None] + jnp.arange(n_shift)[None, :]
    mat = rx[0][idx]  # (m, n_shift)
    corr_i = jnp.abs(tx[0, n_shift // 2 : corr_len].astype(jnp.float32) @ mat)
    corr_q = jnp.abs(tx[1, n_shift // 2 : corr_len].astype(jnp.float32) @ mat)
    s_i = jnp.argmax(corr_i) - n_shift // 2
    s_q = jnp.argmax(corr_q) - n_shift // 2
    use_i = jnp.max(corr_i) >= 0.02 * rx.shape[-1]
    use_q = jnp.max(corr_q) >= jnp.max(corr_i)
    return jnp.where(use_i, s_i, jnp.where(use_q, s_q, s_i)).astype(jnp.int32)


def _dp_shift_core(e: jnp.ndarray, tx: jnp.ndarray, n_shift: int, stride: int = 1,
                   corr_len: int | None = None):
    """Shared DP shift/pol search.

    e: (2, L) correlation signal per equalizer output pol;
    tx: (2, 2, L) ground truth (pol, I/Q, time).
    Returns (shift (2,), r) with r=0 for XY assignment, r=1 for YX.

    ``stride`` > 1 subsamples the correlation SUM (not the lag grid): the
    lag resolution stays 1 symbol — corr[s] = sum over every stride-th k of
    tx[k]*e[k+s] — only the number of accumulated terms drops. The peak
    detection margin scales as sqrt(terms), so stride 4 keeps ~50:1 peak
    margin at L=10000; but lane-strided slices relayout expensively on TPU
    (measured +9.5 ms/frame at R=128) — use ``corr_len`` instead.

    ``corr_len`` bounds the correlation to the first ``corr_len`` symbols —
    a CONTIGUOUS slice (free on TPU, unlike the strided subsample), same
    sqrt(terms) margin argument, and it shrinks the dominant cost of the
    stage: the (n_shift, 2, L) roll-stack traffic. Mirrors the reference's
    own SISO convention (corr_len=1000, func_CMA_MQAM_shaping.py:127-140);
    the DP reference correlates the full length (shared_funcs.py:297), so
    parity of the found shifts is statistical, covered by the SER band
    tests. The delay being searched is global, so any window finds it; the
    cyclic wrap inside the window touches <= n_shift//2 of corr_len terms.
    """
    if corr_len is not None and corr_len < e.shape[-1]:
        e = e[..., :corr_len]
        tx = tx[..., :corr_len]
    L = e.shape[-1]
    e_mat = _roll_stack(e, n_shift)  # (n_shift, 2, L): lag leading, time in lanes
    if stride > 1:
        e_mat = e_mat[..., ::stride]
    txs = tx[:, :, :L:stride].astype(jnp.float32)  # (2, 2, Lsub)
    # corr[comp, b, i, s] = sum_k tx[i, comp, k] * e_mat[s, b, k], as ONE
    # batched dot over flattened (i,c) x (s,b) row blocks (an einsum with
    # two free dims per side lowered to a transposing contraction here)
    ls = txs.shape[-1]
    corr2 = jax.lax.dot_general(
        txs.reshape(4, ls), e_mat.reshape(n_shift * 2, ls),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (ic, sb)
    corr = jnp.abs(
        jnp.transpose(corr2.reshape(2, 2, n_shift, 2), (1, 3, 0, 2))
    )  # (c, b, i, s)
    corr_max_c = jnp.max(corr, axis=-1)  # (comp, b, i)
    corr_ind_c = jnp.argmax(corr, axis=-1)  # (comp, b, i)
    ind_max = jnp.argmax(corr_max_c, axis=0)  # (b, i) best component
    corr_max = jnp.max(corr_max_c, axis=0)  # (b, i)

    def pick(b, i):
        return corr_ind_c[ind_max[b, i], b, i]

    ind_xy = jnp.stack([pick(0, 0), pick(1, 1)])
    ind_yx = jnp.stack([pick(0, 1), pick(1, 0)])
    use_xy = corr_max[0, 0] + corr_max[1, 1] >= corr_max[0, 1] + corr_max[1, 0]
    shift = jnp.where(use_xy, n_shift // 2 - ind_xy, n_shift // 2 - ind_yx).astype(jnp.int32)
    r = jnp.where(use_xy, 0, 1).astype(jnp.int32)
    return shift, r


def find_shift_dp(q: jnp.ndarray, tx: jnp.ndarray, n_shift: int, amps: jnp.ndarray,
                  stride: int = 1, corr_len: int | None = None):
    """Pol assignment + per-pol time shift from DP posteriors q (2, 2n, L)."""
    e = expectation_i(q, amps)  # (2, L)
    return _dp_shift_core(e, tx, n_shift, stride, corr_len)


def find_shift_dp_mb(q_mb: jnp.ndarray, tx: jnp.ndarray, n_shift: int, amps: jnp.ndarray,
                     stride: int = 1, corr_len: int | None = None):
    """``find_shift_dp`` on minibatch-layout posteriors (n_mb, 2, 2n, bl).

    The E_q[x^I] reduction runs in the training kernel's native output
    layout; only the small (2, n_mb*bl) correlation signal is packed
    time-major — the full posterior tensor is never transposed (the eval
    stage of the aggregate DP pipeline is HBM-bound, PARITY_RESULTS round 3).
    """
    num_lev = amps.shape[0]
    qi = q_mb[:, :, :num_lev, :]  # (n_mb, 2, n, bl)
    e_mb = jnp.sum(qi * amps[None, None, :, None], axis=2)  # (n_mb, 2, bl)
    e = jnp.moveaxis(e_mb, 0, 1).reshape(2, -1)
    return _dp_shift_core(e, tx, n_shift, stride, corr_len)


def find_shift_symb_dp(rx: jnp.ndarray, tx: jnp.ndarray, n_shift: int,
                       stride: int = 1, corr_len: int | None = None):
    """Pol assignment + time shift from DP constellation output rx (2, 2, L)."""
    return _dp_shift_core(rx[:, 0, :], tx, n_shift, stride, corr_len)
