"""Static-shape helpers for the reference's data-dependent eval slicing.

The reference slices eval tensors with traced quantities
(``q[:, 11+shift:-11]``, ``[..., :batch_len-shift-N_cut]``) which would force
dynamic shapes under jit. Here every such slice becomes roll + boolean weight
over the full static array; the weighted SER over exactly the same symbol set
reproduces the reference numbers bit-for-bit (see
tests/test_metrics.py::test_ser_weighted_mask_matches_slice).
"""

from __future__ import annotations

import jax.numpy as jnp

MARGIN = 11  # the reference's fixed edge trim (func_VAELE_MQAM_shaping.py:318)


def roll_bits(x: jnp.ndarray, shift, max_abs: int = 16) -> jnp.ndarray:
    """``jnp.roll(x, shift, axis=-1)`` for a traced |shift| <= max_abs,
    gather-free.

    A vmapped traced-shift ``jnp.roll`` lowers to a GATHER (the per-run
    dynamic-slice start turns into per-element indices), which on TPU costs
    ~1.3 ms/frame for the aggregate eval's align step at R=128 (measured,
    artifacts/r4_eval_fine.log). Binary decomposition instead: one static
    roll by -max_abs, then log2(2*max_abs) conditional static rolls selected
    by the bits of shift + max_abs — every step is slices + concat + select,
    all dense vector ops that batch cleanly under vmap.
    """
    k = (shift + max_abs).astype(jnp.int32)  # in [0, 2*max_abs]
    x = jnp.roll(x, -max_abs, axis=-1)  # static
    b = max_abs
    while b >= 1:
        x = jnp.where(k & b != 0, jnp.roll(x, b, axis=-1), x)
        b //= 2
    return x


def roll_time(x: jnp.ndarray, shift) -> jnp.ndarray:
    """roll by -shift along time: x'[t] = x[t + shift] (no wrap inside mask)."""
    return jnp.roll(x, -shift, axis=-1)


def roll_dp(x: jnp.ndarray, shift, r) -> jnp.ndarray:
    """Compensate DP pol assignment r and per-pol time shift (2,)."""
    x = jnp.roll(x, r, axis=0)
    x0 = jnp.roll(x[0], -shift[0], axis=-1)
    x1 = jnp.roll(x[1], -shift[1], axis=-1)
    return jnp.stack([x0, x1])


def align_tx_dp(tx: jnp.ndarray, shift, r, weight: jnp.ndarray):
    """Inverse alignment: roll tx + weight into the equalizer's frame.

    ``roll_dp`` moves the (large) equalizer tensors into tx's frame; for a
    weighted per-symbol metric the equivalent cheap move is rolling tx and
    the weight the other way. For any elementwise metric f,

        sum_t w[t] * f(roll_dp(x, shift, r)[i, ..., t], tx[i, ..., t])
      = sum_u w_al[j, u] * f(x[j, ..., u], tx_al[j, ..., u])

    with j = (i - r) mod 2 and u = (t + shift[i]) mod N — the same
    (pair, weight) multiset visited in a different order (the masks built by
    the weight_fn helpers exclude every wrapped position by construction).
    Rolling tx (2, 2, N) + weight (N,) moves ~16x less data than rolling DP
    posteriors (2, 2*num_lev, N) — the eval stage of the aggregate frame
    pipeline is HBM-bound (PARITY_RESULTS round-3 saturation analysis).

    Returns (tx_al (2, 2, N), w_al (2, N)); w_al broadcasts against error
    tensors shaped (..., 2 pol, N).
    """
    swap = r != 0
    tx_p = jnp.where(swap, tx[::-1], tx)  # tx_p[j] = tx[(j + r) % 2]
    s_p = jnp.where(swap, shift[::-1], shift)  # s_p[j] = shift[(j + r) % 2]
    # gather-free traced rolls (a vmapped jnp.roll lowers to a gather)
    tx_al = jnp.stack(
        [roll_bits(tx_p[0], s_p[0]), roll_bits(tx_p[1], s_p[1])]
    )
    w_al = jnp.stack(
        [roll_bits(weight, s_p[0]), roll_bits(weight, s_p[1])]
    )
    return tx_al, w_al


def align_idx_dp(idx, shift, r, weight_fn_t):
    """``align_tx_dp`` in the LEVEL-INDEX domain (round-5 align lever).

    idx: (2, 2, N) int8 tx level indices (pre-alignment); weight_fn_t(t) ->
    (N,) builds the eval mask at traced positions t. Rolls only the int8
    index planes (4x less traffic than the f32 tx amplitudes) and builds
    each pol's rolled weight DIRECTLY by evaluating the mask at
    t = (arange(N) + s) % N — one pass, no roll (the weight/tx rolls were
    the largest eval sub-stage at R=128, artifacts/r5_eval_syncfine.log).
    Returns (idx_al (2, 2, N) int8, w_al (2, N) f32) — the same
    (pair, weight) multiset as align_tx_dp on the decoded tx.
    """
    n = idx.shape[-1]
    swap = r != 0
    idx_p = jnp.where(swap, idx[::-1], idx)
    s_p = jnp.where(swap, shift[::-1], shift)
    idx_al = jnp.stack([roll_bits(idx_p[0], s_p[0]),
                        roll_bits(idx_p[1], s_p[1])])
    u = jnp.arange(n)
    # roll_bits(w, s)[u] = w[(u - s) mod n]: evaluate the mask there
    w_al = jnp.stack([
        weight_fn_t((u - s_p[0]) % n),
        weight_fn_t((u - s_p[1]) % n),
    ])
    return idx_al, w_al


def margin_weight(n: int, shift, margin: int = MARGIN) -> jnp.ndarray:
    """Weight for the reference's ``x[margin+shift:-margin]`` vs
    ``tx[margin:-margin-shift]`` comparison after roll_time(x, shift):
    positions t in [margin, n - margin - shift)."""
    t = jnp.arange(n)
    return ((t >= margin) & (t < n - margin - shift)).astype(jnp.float32)


def margin_weight_maxshift(n: int, max_shift, margin: int = MARGIN,
                           t=None) -> jnp.ndarray:
    """Weight for the DP eval trim ``[..., margin : -margin - max|shift|]``.

    ``t``: optional traced position array — evaluating the mask at shifted
    positions t = (arange(n) + s) % n IS the rolled mask, built in one pass
    with no roll (the round-5 align lever: the data-dependent weight rolls
    were the largest eval sub-stage, artifacts/r5_eval_syncfine.log)."""
    if t is None:
        t = jnp.arange(n)
    return ((t >= margin) & (t < n - margin - max_shift)).astype(jnp.float32)


def batch_cut_weight(
    m_max: int, batch_len: int, shift0, max_shift, n_cut: int,
    margin: int = MARGIN, t=None
) -> jnp.ndarray:
    """Weight reproducing the DP VAE eval bookkeeping
    (func_VAELE_DP_MQAM_shaping.py:73-79):

    reshape to (m_max, batch_len), keep the first batch_len - shift0 - n_cut
    symbols of each batch, flatten, then trim [margin : -margin - max_shift].
    Returned flat over the original (m_max * batch_len,) symbol order.

    ``t``: optional traced flat position array (see margin_weight_maxshift)
    — the mask evaluated at t = (arange(N) + s) % N equals
    roll_bits(mask, s) with zero roll passes.
    """
    if t is None:
        j = jnp.arange(batch_len)[None, :]
        m = jnp.arange(m_max)[:, None]
    else:
        tt = t.reshape(m_max, batch_len)
        j = tt % batch_len
        m = tt // batch_len
    keep_len = batch_len - shift0 - n_cut
    kept = j < keep_len
    pos = m * keep_len + j  # flat index within the kept sequence
    total = m_max * keep_len
    w = kept & (pos >= margin) & (pos < total - margin - max_shift)
    return w.astype(jnp.float32).reshape(-1)
