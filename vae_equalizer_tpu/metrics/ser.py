"""Symbol-error-rate estimators robust to blind-equalization ambiguities.

Blind equalizers recover the constellation only up to a phase rotation from
{0, pi/4, pi/2 (as IQ-flip), pi, 3pi/4, ...} and (for dual-pol) a polarization
permutation; the SER estimators therefore evaluate every ambiguity hypothesis
and return the minimum, exactly like the reference
(optical_DP_channel/shared_funcs.py:188-287,
AWGN_channel/func_VAELE_MQAM_shaping.py:97-186).

TPU-first design choices vs. the reference:
  * the 4 rotations x 2 IQ-flips are evaluated as one stacked tensor reduced
    with ``min`` — no Python branching;
  * every estimator takes an optional ``weight`` mask so callers can emulate
    the reference's data-dependent slicing (``[11+shift:-11]``) with static
    shapes (roll + mask) — the weighted mean over exactly the same symbol set
    reproduces the reference numbers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "ser_q_siso",
    "ser_const_siso",
    "ser_symb_siso",
    "ser_iqflip",
    "ser_iqflip_from_dec",
    "iqflip_decisions_mb",
    "ser_constell_shaping",
]


def _wmean(err: jnp.ndarray, weight: jnp.ndarray | None, axis) -> jnp.ndarray:
    err = err.astype(jnp.float32)
    if weight is None:
        return jnp.mean(err, axis=axis)
    w = jnp.broadcast_to(weight.astype(jnp.float32), err.shape)
    return jnp.sum(err * w, axis=axis) / jnp.sum(w, axis=axis)


def _decode_levels(tx: jnp.ndarray, num_lev: int) -> jnp.ndarray:
    """Map normalized amplitude levels to integer indices 0..num_lev-1.

    Levels are the odd integers +-1..+-(L-1) scaled to unit 2D power, so
    level i sits at (2i - (L-1)) / sqrt(2(L^2-1)/3) exactly — the
    inverse map is exact for every L (a plain (L-1)/2 * tx + (L-1)/2 only
    rounds correctly up to L = 8 / 64-QAM)."""
    half = (num_lev - 1) / 2
    inv_step = math.sqrt((num_lev**2 - 1) / 6)  # 1 / level spacing / 2
    return jnp.round(inv_step * tx.astype(jnp.float32) + half).astype(jnp.int32)


def _phase_variants(dec: jnp.ndarray, num_lev: int, comp_axis: int) -> jnp.ndarray:
    """Stack the 4 phase-rotation hypotheses of an integer decision tensor.

    dec has a size-2 I/Q axis at ``comp_axis``. Returns (4, *dec.shape).
    Hypotheses: 0, pi, pi/4, 3pi/4 (pi/2 is covered by the IQ-flip of tx in
    the DP metrics / by pi/4+flip combinations).
    """
    full = 2 * ((num_lev - 1) / 2)
    inv = (full - dec.astype(jnp.float32)).astype(jnp.int32)
    d_i = jnp.take(dec, 0, axis=comp_axis)
    d_q = jnp.take(dec, 1, axis=comp_axis)
    i_i = jnp.take(inv, 0, axis=comp_axis)
    i_q = jnp.take(inv, 1, axis=comp_axis)
    rot0 = dec
    rot_pi = inv
    rot_pi4 = jnp.stack([i_q, d_i], axis=comp_axis)
    rot_3pi4 = jnp.stack([d_q, i_i], axis=comp_axis)
    return jnp.stack([rot0, rot_pi, rot_pi4, rot_3pi4])


def ser_q_siso(
    q: jnp.ndarray,
    tx: jnp.ndarray,
    num_lev: int,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SER from soft-demapper posteriors, SISO.

    q: (2*num_lev, N) per-component posteriors; tx: (2, N) amplitude levels.
    Parity: func_VAELE_MQAM_shaping.py:97-123 (SER_q).
    """
    data = _decode_levels(tx, num_lev)
    dec = jnp.stack([jnp.argmax(q[:num_lev], axis=0), jnp.argmax(q[num_lev:], axis=0)]).astype(
        jnp.int32
    )
    variants = _phase_variants(dec, num_lev, comp_axis=0)  # (4, 2, N)
    err = jnp.any(variants != data[None], axis=1)  # (4, N)
    return jnp.min(_wmean(err, weight, axis=-1))


def ser_const_siso(
    rx: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SER from (normalized) constellation output, SISO.

    rx: (2, N) equalized symbols; tx: (2, N) amplitude levels.
    Parity: func_CMA_MQAM_shaping.py:63-93 (SER_CMA) /
    func_VAELE_MQAM_shaping.py:156-186 (SER_const).
    """
    num_lev = amps.shape[0]
    data = _decode_levels(tx, num_lev)
    txf = tx.astype(jnp.float32)
    mag_tx = _wmean(jnp.sqrt(txf[0] ** 2 + txf[1] ** 2), weight, axis=-1)
    mag_rx = _wmean(jnp.sqrt(rx[0] ** 2 + rx[1] ** 2), weight, axis=-1)
    rx = rx * (mag_tx / mag_rx)
    dec = jnp.argmin(jnp.abs(rx[:, None, :] - amps[None, :, None]), axis=1).astype(jnp.int32)
    variants = _phase_variants(dec, num_lev, comp_axis=0)
    err = jnp.any(variants != data[None], axis=1)
    return jnp.min(_wmean(err, weight, axis=-1))


def ser_symb_siso(
    rx: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    sps: int,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SER of raw (unequalized) oversampled symbols, SISO.

    rx: (2, sps*N) raw channel output; tx: (2, N) levels. Each component is
    normalized by sqrt(2*E[rx_c^2]) before the nearest-level decision — the
    reference's "unprocessed SER" diagnostic (func_VAELE_MQAM_shaping.py:125-154).
    """
    num_lev = amps.shape[0]
    n = tx.shape[-1]
    data = _decode_levels(tx, num_lev)
    sig = rx[:, : n * sps : sps]
    sig = sig / jnp.sqrt(2 * jnp.mean(sig**2, axis=-1, keepdims=True))
    dec = jnp.argmin(jnp.abs(sig[:, None, :] - amps[None, :, None]), axis=1).astype(jnp.int32)
    variants = _phase_variants(dec, num_lev, comp_axis=0)
    err = jnp.any(variants != data[None], axis=1)
    return jnp.min(_wmean(err, weight, axis=-1))


def ser_iqflip_from_dec(
    dec: jnp.ndarray,
    tx: jnp.ndarray,
    num_lev: int,
    weight: jnp.ndarray | None = None,
    tx_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``ser_iqflip`` ambiguity search from precomputed integer decisions.

    dec: (2, 2, N) int32 level decisions (pol, I/Q, time); tx: (2, 2, N)
    amplitude levels. Split out so callers holding posteriors in the
    minibatch layout can run the (heavy) argmax there and only pack the
    (cheap) integer decisions (``iqflip_decisions_mb``), or take the
    decisions straight from the training kernel's in-kernel argmax stream.

    The 4 rotations x 2 IQ-flips run as a fused hypothesis loop of
    compare-or-reduce passes over the (2, N) decision planes — the former
    stacked formulation materialized a (4, 2, 2, N) int tensor per run
    (~160 MB/frame at 128 runs), which dominated the eval stage's soft-SER
    cost (artifacts/r4_eval_fine2.log). Same minimum over the same error
    sets, bit for bit."""
    full = 2 * ((num_lev - 1) / 2)
    dec = dec.astype(jnp.int32)
    # tx_idx: precomputed (2, 2, N) level indices (any int dtype) — the
    # round-5 align lever rolls the int8 index planes instead of the f32
    # amplitudes, so aligned callers pass indices directly
    data = (_decode_levels(tx, num_lev) if tx_idx is None
            else tx_idx.astype(jnp.int32))  # (2, 2, N)
    d_i, d_q = dec[:, 0], dec[:, 1]
    inv = lambda a: (full - a.astype(jnp.float32)).astype(jnp.int32)
    i_i, i_q = inv(d_i), inv(d_q)
    # rotation hypotheses as (I, Q) component pairs (see _phase_variants)
    variants = ((d_i, d_q), (i_i, i_q), (i_q, d_i), (d_q, i_i))
    data_q = (data[:, 1], inv(data[:, 1]))  # flip = reversed Q levels
    sers = []
    for vi, vq in variants:
        for dq in data_q:
            err = (vi != data[:, 0]) | (vq != dq)  # (2pol, N)
            sers.append(_wmean(err, weight, axis=-1))
    return jnp.min(jnp.stack(sers), axis=0)


def iqflip_decisions_mb(q_mb: jnp.ndarray) -> jnp.ndarray:
    """Per-component argmax decisions from minibatch-layout DP posteriors.

    q_mb: (n_mb, 2, 2*num_lev, bl) -> (2, 2, n_mb*bl) int32, the ``dec``
    input of ``ser_iqflip_from_dec``. The argmax reduction runs in the
    training kernel's native output layout — no transpose of the full
    posterior tensor is ever materialized (the eval stage of the aggregate
    DP pipeline is HBM-bound, PARITY_RESULTS round 3)."""
    num_lev = q_mb.shape[2] // 2
    dec_i = jnp.argmax(q_mb[:, :, :num_lev, :], axis=2)  # (n_mb, 2, bl)
    dec_q = jnp.argmax(q_mb[:, :, num_lev:, :], axis=2)
    pack = lambda d: jnp.moveaxis(d, 0, 1).reshape(d.shape[1], -1)
    return jnp.stack([pack(dec_i), pack(dec_q)], axis=1).astype(jnp.int32)


def ser_iqflip(
    q: jnp.ndarray,
    tx: jnp.ndarray,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-pol SER from posteriors, min over IQ-flip x 4 rotations. DP.

    q: (2, 2*num_lev, N); tx: (2, 2, N) amplitude levels.
    Returns (2,) per-polarization SER.
    Parity: shared_funcs.py:188-222 (SER_IQflip).
    """
    num_lev = q.shape[1] // 2
    dec = jnp.stack(
        [jnp.argmax(q[:, :num_lev], axis=1), jnp.argmax(q[:, num_lev:], axis=1)], axis=1
    ).astype(jnp.int32)
    return ser_iqflip_from_dec(dec, tx, num_lev, weight)


def ser_constell_shaping(
    rx: jnp.ndarray,
    tx: jnp.ndarray,
    amps: jnp.ndarray,
    nu_sc: float,
    var: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    tx_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-pol SER from constellation output with PCS decision boundaries. DP.

    rx: (2, 2, N) equalized symbols; tx: (2, 2, N) amplitude levels;
    var: (2,) demapper noise variance. Returns (2,) per-pol SER.

    The MAP decision boundary between shaped neighbor levels a_i, a_{i+1}
    moves inward by the prior ratio: d = (1 + 2*nu_sc*var) * (a_i+a_{i+1})/2.
    Parity: shared_funcs.py:225-287 (SER_constell_shaping + dec_on_bound).
    """
    num_lev = amps.shape[0]
    full = 2 * ((num_lev - 1) / 2)
    if tx_idx is None:
        data = _decode_levels(tx, num_lev)
        txf = tx.astype(jnp.float32)
        tx_i, tx_q = txf[:, 0], txf[:, 1]
    else:
        # precomputed level indices (round-5 align lever): the amplitude
        # planes reconstruct gather-free for the magnitude normalization
        data = tx_idx.astype(jnp.int32)

        def _sel(idxc):
            out = jnp.zeros(idxc.shape, jnp.float32)
            for lev in range(num_lev):
                out = out + jnp.where(idxc == lev, amps[lev], 0.0)
            return out

        tx_i, tx_q = _sel(data[:, 0]), _sel(data[:, 1])
    data_i, data_q = data[:, 0], data[:, 1]
    data_q_inv = (full - data_q.astype(jnp.float32)).astype(jnp.int32)

    d_vec = (1 + 2 * nu_sc * var[0]) * (amps[:-1] + amps[1:]) / 2

    mag_tx = _wmean(jnp.sqrt(tx_i ** 2 + tx_q ** 2), weight, axis=(0, -1))
    mag_rx = _wmean(jnp.sqrt(rx[:, 0] ** 2 + rx[:, 1] ** 2), weight, axis=(0, -1))
    rx = rx * (mag_tx / mag_rx)

    # Decision = the boundary bin: bin(x) = #(x >= d_vec[l]), which is
    # exactly "d_lo[i] <= x < d_hi[i]" for i = bin(x). Per-level compares
    # instead of a boundary-table gather (XLA's TPU gather costs ~0.4 ms per
    # 40k lookups; 7 vector compares are ~free). The four pi/2 rotations'
    # decisions all derive from TWO compare sweeps over the base (2, 2, N)
    # stream — bin(-x) = #(x <= -d_vec[l]) exactly (incl. boundary ties,
    # no symmetry assumption on d_vec) — instead of a materialized
    # (4, 2, 2, N) rotation stack; the const stage of the runs-batched
    # aggregate eval is HBM-bound (PARITY_RESULTS round 4).
    dec_pos = jnp.zeros(rx.shape, jnp.int32)  # (2, 2, N): bin(+rx)
    dec_neg = jnp.zeros(rx.shape, jnp.int32)  # (2, 2, N): bin(-rx)
    for lev in range(num_lev - 1):
        dec_pos = dec_pos + (rx >= d_vec[lev]).astype(jnp.int32)
        dec_neg = dec_neg + (rx <= -d_vec[lev]).astype(jnp.int32)

    # variant (I-comp, Q-comp) sources: rx -> (p0, p1), -rx -> (n0, n1),
    # rx_pi4 = (-rx_Q, rx_I) -> (n1, p0), -rx_pi4 = (rx_Q, -rx_I) -> (p1, n0)
    p0, p1 = dec_pos[:, 0], dec_pos[:, 1]
    n0, n1 = dec_neg[:, 0], dec_neg[:, 1]
    i_src = (p0, n0, n1, p1)
    q_src = (p1, n1, p0, n0)
    # non-finite equalizer output must always count as an error (compares
    # against boundaries are all False for NaN, which would otherwise decode
    # it as the lowest level — a diverged run must report SER ~= 1, like the
    # reference's in-bounds check). Finiteness is negation-invariant, so the
    # per-variant "any component bad" mask is the same for all 8 hypotheses.
    bad = jnp.any(~jnp.isfinite(rx), axis=1)  # (2, N)
    err = jnp.stack(
        [(i_src[v] != data_i) | (q_src[v] != data_q) | bad for v in range(4)]
        + [(i_src[v] != data_i) | (q_src[v] != data_q_inv) | bad for v in range(4)]
    )  # (4rot x 2flip, 2pol, N)
    ser = _wmean(err, weight, axis=-1)
    return jnp.min(ser, axis=0)
