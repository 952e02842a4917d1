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
v5e), so the selections run gather-free over the small level axis. The
ambiguity estimator uses fused compare-select traces (``_level_select`` —
no materialized one-hot tensors; the eval stage of the aggregate DP pipeline
is HBM-bound, PARITY_RESULTS round 3), and the 8 blind-ambiguity variants
are linear combinations of just 8 such traces (level reversal moves onto the
tx index, the I/Q swap exchanges which posterior block a component reads);
the prior term is variant-invariant because the MB pmf is symmetric under
level reversal.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ser import _decode_levels

__all__ = [
    "mutual_information",
    "mutual_information_ambiguity",
    "mutual_information_ambiguity_mb",
    "mutual_information_ambiguity_mb_stats",
]


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


def _level_select(lq: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """lq (..., n, N) picked at level indices idx (..., N) -> (..., N).

    Gather-free: an unrolled compare-accumulate over the (small) level axis
    that XLA fuses into a single pass — unlike ``_onehot_levels`` it never
    materializes an (..., n, N) f32 selection tensor."""
    out = jnp.zeros(jnp.broadcast_shapes(lq.shape[:-2] + lq.shape[-1:], idx.shape), lq.dtype)
    for lev in range(lq.shape[-2]):
        out = out + jnp.where(idx == lev, lq[..., lev, :], 0.0)
    return out


def _level_select_vec(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vec (n,) picked at level indices idx (..., N) -> (..., N)."""
    out = jnp.zeros(idx.shape, vec.dtype)
    for lev in range(vec.shape[0]):
        out = out + jnp.where(idx == lev, vec[lev], 0.0)
    return out


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
    Every variant is a sum of two of the 8 selected traces
    {lqi, lqq} x {idx_I, idx_Ir, idx_Q, idx_Qr}: level reversal moves onto
    the tx index ((n-1) - idx), the I/Q swap exchanges which posterior block
    a component reads, and the prior term is variant-invariant because the
    MB pmf is symmetric under level reversal. The traces are compare-select
    accumulations over the small level axis (see ``_level_select``) — the
    round-3 HBM-lean form of the round-2 one-hot reductions (the eval stage
    of the aggregate pipeline is bandwidth-bound; PARITY_RESULTS round 3).

    ``weight`` may be (N,) or per-polarization (..., N) — e.g. the rolled
    per-pol masks of ``train.eval_utils.align_tx_dp``; normalization is per
    output batch element either way.
    """
    n = amps.shape[0]
    idx = _decode_levels(tx, n)  # (..., 2, N)
    idx_i, idx_q = idx[..., 0, :], idx[..., 1, :]
    idx_ir, idx_qr = (n - 1) - idx_i, (n - 1) - idx_q
    lqi = jnp.log2(q[..., :n, :] + eps)
    lqq = jnp.log2(q[..., n:, :] + eps)
    lp = jnp.log2(P.astype(jnp.float32))  # (n,)

    if weight is None:
        red = lambda trace: jnp.sum(trace, axis=-1)
    else:
        w = weight.astype(jnp.float32)
        red = lambda trace: jnp.sum(trace * jnp.broadcast_to(w, trace.shape), axis=-1)
    a1, a2 = red(_level_select(lqi, idx_i)), red(_level_select(lqi, idx_ir))
    a3, a4 = red(_level_select(lqq, idx_i)), red(_level_select(lqq, idx_ir))
    b1, b2 = red(_level_select(lqq, idx_q)), red(_level_select(lqq, idx_qr))
    b3, b4 = red(_level_select(lqi, idx_q)), red(_level_select(lqi, idx_qr))
    prior = red(_level_select_vec(lp, idx_i) + _level_select_vec(lp, idx_q))
    best = jnp.max(
        jnp.stack(
            [a1 + b1, a2 + b2, a4 + b3, a3 + b4, a1 + b2, a2 + b1, a3 + b3, a4 + b4]
        ),
        axis=0,
    )
    if weight is None:
        return (best - prior) / tx.shape[-1]
    wsum = jnp.sum(
        jnp.broadcast_to(weight.astype(jnp.float32), best.shape + (tx.shape[-1],)),
        axis=-1,
    )
    return (best - prior) / wsum


def mutual_information_ambiguity_mb_sp(
    q_mb: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """``mutual_information_ambiguity_mb`` with a single-read level sweep.

    Same 8-variant trace algebra, reorganized so the LEVEL loop is outermost
    and every posterior row q[..., lev, :] is loaded exactly once: the trace
    identity sel(lq, idx) = sum_lev [idx == lev] * lq[lev] turns each of the
    8 selected traces into per-level masked reductions, and all 8 share the
    two rows (qi[lev], qq[lev]) read in that iteration. The ``_mb`` form's 8
    ``_level_select`` calls each rescan their q block (qi and qq are swept
    4x each); here the full posterior stream is read once — the eval stage
    of the runs-batched aggregate pipeline is HBM-bound (PARITY_RESULTS
    round 3/4). Selection commutes with log2 exactly (one level picked per
    symbol), so results match ``_mb`` up to sum order.
    """
    n = amps.shape[0]
    n_mb, _, _, bl = q_mb.shape

    def to_mb(a):  # (..., N) time-major -> (n_mb, ..., bl)
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (n_mb, bl)), -2, 0)

    idx = _decode_levels(tx, n)  # (2, 2, N)
    # int8 indices (fits any level count < 128, incl. 256-QAM's n=16): the
    # masks re-read idx every level iteration,
    # so the index stream is 4x cheaper than int32 — this loop is HBM-bound
    idx_i = to_mb(idx[:, 0, :]).astype(jnp.int8)  # (n_mb, 2, bl)
    idx_q = to_mb(idx[:, 1, :]).astype(jnp.int8)
    lp = jnp.log2(P.astype(jnp.float32))  # (n,)

    if weight is None:
        w = None
    else:
        w = to_mb(jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)))

    def msk(idx_t, lev):
        m = (idx_t == lev).astype(jnp.float32)
        return m if w is None else m * w

    def lrow(lev):
        return jnp.log2(q_mb[:, :, lev, :].astype(jnp.float32) + eps)

    red = lambda t: jnp.sum(t, axis=(0, -1))  # (n_mb, 2, bl) -> (2,)
    acc = [jnp.zeros((2,), jnp.float32) for _ in range(8)]  # a1..a4, b1..b4
    # mirror-pair sweep: levels (lev, n-1-lev) share the same four masks —
    # a2 = sum_lev lqi[lev]*m(idx_i, n-1-lev) regroups over pairs as
    # lqi_l*mi_r + lqi_r*mi_l — so each mask (and its weight multiply) is
    # built once per PAIR instead of once per level: half the idx/w traffic
    # of the per-level sweep at identical q-row reads (each row still read
    # exactly once)
    for lev in range(n // 2):
        mir = n - 1 - lev
        lqi_l, lqi_r = lrow(lev), lrow(mir)
        lqq_l, lqq_r = lrow(n + lev), lrow(n + mir)
        mi_l, mi_r = msk(idx_i, lev), msk(idx_i, mir)
        mq_l, mq_r = msk(idx_q, lev), msk(idx_q, mir)
        acc[0] = acc[0] + red(lqi_l * mi_l + lqi_r * mi_r)  # a1 = sel(lqi, idx_i)
        acc[1] = acc[1] + red(lqi_l * mi_r + lqi_r * mi_l)  # a2 = sel(lqi, idx_ir)
        acc[2] = acc[2] + red(lqq_l * mi_l + lqq_r * mi_r)  # a3 = sel(lqq, idx_i)
        acc[3] = acc[3] + red(lqq_l * mi_r + lqq_r * mi_l)  # a4 = sel(lqq, idx_ir)
        acc[4] = acc[4] + red(lqq_l * mq_l + lqq_r * mq_r)  # b1 = sel(lqq, idx_q)
        acc[5] = acc[5] + red(lqq_l * mq_r + lqq_r * mq_l)  # b2 = sel(lqq, idx_qr)
        acc[6] = acc[6] + red(lqi_l * mq_l + lqi_r * mq_r)  # b3 = sel(lqi, idx_q)
        acc[7] = acc[7] + red(lqi_l * mq_r + lqi_r * mq_l)  # b4 = sel(lqi, idx_qr)
    if n % 2:  # middle level is its own mirror
        lev = n // 2
        lqi_m, lqq_m = lrow(lev), lrow(n + lev)
        mi_m, mq_m = msk(idx_i, lev), msk(idx_q, lev)
        for k, t in enumerate((lqi_m * mi_m, lqi_m * mi_m, lqq_m * mi_m,
                               lqq_m * mi_m, lqq_m * mq_m, lqq_m * mq_m,
                               lqi_m * mq_m, lqi_m * mq_m)):
            acc[k] = acc[k] + red(t)
    a1, a2, a3, a4, b1, b2, b3, b4 = acc
    pr = _level_select_vec(lp, idx_i) + _level_select_vec(lp, idx_q)
    prior = red(pr if w is None else pr * w)
    best = jnp.max(
        jnp.stack(
            [a1 + b1, a2 + b2, a4 + b3, a3 + b4, a1 + b2, a2 + b1, a3 + b3, a4 + b4]
        ),
        axis=0,
    )
    if weight is None:
        return (best - prior) / (n_mb * bl)
    wsum = jnp.sum(
        jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)), axis=-1
    )
    return (best - prior) / wsum


def mutual_information_ambiguity_mb_stats(
    out_mb: jnp.ndarray,
    mm_mb: jnp.ndarray,
    s1_mb: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    nu_sc,
    var: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-12,
    tx_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``mutual_information_ambiguity_mb`` from demapper SUFFICIENT STATISTICS
    instead of the posterior stream (round 5, VERDICT r4 item 5).

    The PCS softmin demapper (models/vae_le.py soft_dec /
    ops/frame_kernel.py) computes q[l] = exp(mm - met_l) / s1 with
    met_l = (out - a_l)^2 / (2 var) + nu_sc a_l^2, mm = min_l met_l and
    s1 = sum_l exp(mm - met_l). Given per-symbol (out, mm, s1) — 3 rows per
    I/Q component instead of the n_lev posterior rows — the log-posterior at
    ANY level reconstructs exactly: the 8 ambiguity traces each need q at
    ONE tx-derived level, so the whole MI selection reads 12 rows/symbol
    instead of 2*n_lev (= 32 for 64-QAM) and the training kernel never has
    to write its largest output stream at all. Matches the ``_mb`` form to
    float rounding (same formula the kernel itself evaluated).

    Args:
      out_mb/mm_mb/s1_mb: (n_mb, 2 pol, 2 comp, bl) equalizer output /
        per-component met minimum / softmin normalizer streams.
      tx: (2, 2, N) ALIGNED transmitted levels; var: (2,) or per-run scalar
        pair of demapper noise variances (pol x, y).
    """
    n = amps.shape[0]
    n_mb, _, _, bl = out_mb.shape

    def to_mb(a):  # (..., N) time-major -> (n_mb, ..., bl)
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (n_mb, bl)), -2, 0)

    amps_f = amps.astype(jnp.float32)
    # tx_idx: precomputed (2, 2, N) level indices (the round-5 align lever
    # rolls index planes instead of amplitudes); decoded from tx otherwise
    idx = _decode_levels(tx, n) if tx_idx is None else tx_idx  # (2, 2, N)
    idx_i = to_mb(idx[:, 0, :]).astype(jnp.int8)  # (n_mb, 2, bl)
    idx_q = to_mb(idx[:, 1, :]).astype(jnp.int8)
    lp = jnp.log2(P.astype(jnp.float32))  # (n,)

    if weight is None:
        red = lambda t: jnp.sum(t, axis=(0, -1))  # (n_mb, 2, bl) -> (2,)
        w = None
    else:
        w = to_mb(jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)))
        red = lambda t: jnp.sum(t * w, axis=(0, -1))

    # half-precision streams upcast once; var enters via 0.5/var per pol
    inv2v = (0.5 / var.astype(jnp.float32))[None, :, None]  # (1, 2, 1)
    o32 = out_mb.astype(jnp.float32)
    mm32 = mm_mb.astype(jnp.float32)
    s132 = s1_mb.astype(jnp.float32)
    nu = jnp.float32(nu_sc)

    # amp selections once per index stream (gather-free level sweep); the
    # level-reversal variants reuse them: amps[(n-1) - idx] = rev-amps[idx]
    a_i = _level_select_vec(amps_f, idx_i)  # (n_mb, 2, bl)
    a_ir = _level_select_vec(amps_f[::-1], idx_i)
    a_q = _level_select_vec(amps_f, idx_q)
    a_qr = _level_select_vec(amps_f[::-1], idx_q)

    def trace(comp, a_sel):
        # selected log2-posterior of component comp (0=I, 1=Q) at levels
        # a_sel: met -> exp(mm - met)/s1 -> log2(. + eps), all (n_mb, 2, bl)
        d2 = (o32[:, :, comp, :] - a_sel) ** 2 * inv2v
        met = d2 + nu * a_sel * a_sel
        q_sel = jnp.exp(mm32[:, :, comp, :] - met) / s132[:, :, comp, :]
        return red(jnp.log2(q_sel + eps))

    a1, a2 = trace(0, a_i), trace(0, a_ir)
    a3, a4 = trace(1, a_i), trace(1, a_ir)
    b1, b2 = trace(1, a_q), trace(1, a_qr)
    b3, b4 = trace(0, a_q), trace(0, a_qr)
    pr = _level_select_vec(lp, idx_i) + _level_select_vec(lp, idx_q)
    prior = red(pr)
    best = jnp.max(
        jnp.stack(
            [a1 + b1, a2 + b2, a4 + b3, a3 + b4, a1 + b2, a2 + b1, a3 + b3, a4 + b4]
        ),
        axis=0,
    )
    if weight is None:
        return (best - prior) / (n_mb * bl)
    wsum = jnp.sum(
        jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)), axis=-1
    )
    return (best - prior) / wsum


def mutual_information_ambiguity_mb(
    q_mb: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    P: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """``mutual_information_ambiguity`` on minibatch-layout DP posteriors.

    q_mb: (n_mb, 2, 2*num_lev, bl) — the training kernel's native output
    layout, time index t = mb*bl + tau; tx: (2, 2, n_mb*bl) aligned levels;
    weight: (N,) or per-pol (2, N). Same 8-variant trace algebra as the
    time-major form, but every selection runs directly on the minibatch
    tensor, so the full posterior stream is read once, fused, with no
    transpose — the eval stage of the aggregate DP pipeline is HBM-bound
    (PARITY_RESULTS round 3).
    """
    n = amps.shape[0]
    n_mb, _, _, bl = q_mb.shape

    def to_mb(a):  # (..., N) time-major -> (n_mb, ..., bl)
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (n_mb, bl)), -2, 0)

    idx = _decode_levels(tx, n)  # (2, 2, N)
    idx_i, idx_q = to_mb(idx[:, 0, :]), to_mb(idx[:, 1, :])  # (n_mb, 2, bl)
    idx_ir, idx_qr = (n - 1) - idx_i, (n - 1) - idx_q
    # SELECT-then-log (round 4): each trace picks exactly one level's q per
    # symbol, so log2(select(q) + eps) == select(log2(q + eps)) exactly —
    # the transcendental runs on the 8 selected (n_mb, 2, bl) traces instead
    # of the full (n_mb, 2, 2n, bl) posterior (8x less log volume; the f32
    # upcast for bf16 streams fuses into the selection pass)
    qi = q_mb[:, :, :n, :].astype(jnp.float32)  # (n_mb, 2, n, bl)
    qq = q_mb[:, :, n:, :].astype(jnp.float32)
    lp = jnp.log2(P.astype(jnp.float32))  # (n,)

    if weight is None:
        red = lambda trace: jnp.sum(trace, axis=(0, -1))  # (2,)
    else:
        w = to_mb(jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)))
        red = lambda trace: jnp.sum(trace * w, axis=(0, -1))
    sel = lambda q, idx: red(jnp.log2(_level_select(q, idx) + eps))
    a1, a2 = sel(qi, idx_i), sel(qi, idx_ir)
    a3, a4 = sel(qq, idx_i), sel(qq, idx_ir)
    b1, b2 = sel(qq, idx_q), sel(qq, idx_qr)
    b3, b4 = sel(qi, idx_q), sel(qi, idx_qr)
    prior = red(_level_select_vec(lp, idx_i) + _level_select_vec(lp, idx_q))
    best = jnp.max(
        jnp.stack(
            [a1 + b1, a2 + b2, a4 + b3, a3 + b4, a1 + b2, a2 + b1, a3 + b3, a4 + b4]
        ),
        axis=0,
    )
    if weight is None:
        return (best - prior) / (n_mb * bl)
    wsum = jnp.sum(
        jnp.broadcast_to(weight.astype(jnp.float32), (2, n_mb * bl)), axis=-1
    )
    return (best - prior) / wsum
