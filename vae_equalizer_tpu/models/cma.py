"""CMA (constant modulus algorithm) equalizers as lax.scan recurrences.

Three update granularities, mirroring the reference family
(shared_funcs.py:341-488, func_CMA_MQAM_shaping.py:142-168):

  * ``cma_siso`` / ``cma_dp`` — per-symbol LMS updates. Inherently sequential
    (taps feed back into the next output), so the exact-parity path is a
    ``lax.scan`` with one symbol per step.
  * ``cma_batch_dp`` — taps update only every ``batch_len`` symbols, so each
    inter-update chunk is computed as one windowed matmul (MXU) and the scan
    runs over chunks: ~batch_len x fewer sequential steps at identical
    numerics.
  * ``cma_flex_dp`` — updates every ``symb_step`` symbols over a sliding
    window of the last ``batch_len`` increments; same chunked engine with a
    ring buffer of increments in the scan carry.

Numerics note: following the reference, updates accumulate raw increments and
multiply by the error at update time; the input normalization for DP divides
by the mean power of the *padded* signal.

Reference index convention: outputs are stored at ``k = i//sps - mh`` which
is *negative* for the first ``offset = mh - mh//sps`` symbols, i.e. the
output/error arrays are cyclically rolled by ``-offset`` relative to symbol
order (shared_funcs.py:355-357) — and for CMAbatch/CMAflex the ``k % B``
update condition therefore fires ``offset`` symbols late. Both quirks are
reproduced exactly (the downstream sync search absorbs the roll).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dirac_taps_siso",
    "dirac_taps_dp",
    "cma_siso",
    "cma_dp",
    "cma_batch_dp",
    "cma_flex_dp",
]


def dirac_taps_siso(m_est: int) -> jnp.ndarray:
    h = np.zeros((2, m_est), np.float32)
    h[0, m_est // 2] = 1.0
    return jnp.asarray(h)


def dirac_taps_dp(m_est: int) -> jnp.ndarray:
    h = np.zeros((2, 2, 2, m_est), np.float32)
    h[0, 0, 0, m_est // 2] = 1.0
    h[1, 1, 0, m_est // 2] = 1.0
    return jnp.asarray(h)


# ------------------------------------------------------------------ SISO


@functools.partial(jax.jit, static_argnames=("sps", "update"))
def cma_siso(rx: jnp.ndarray, R: float, h: jnp.ndarray, lr, sps: int, update: bool = True):
    """Per-symbol CMA, single polarization.

    rx: (2, N) at sps samples/symbol; h: (2, M) complex taps as planes.
    Returns (out (2, N//sps), h, e (N//sps,)).
    """
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    y = jnp.pad(rx, ((0, 0), (mh, mh)))
    n_sym = n // sps

    def step(h, k):
        w = jax.lax.dynamic_slice(y, (0, k * sps), (2, m))  # (2, M)
        o_re = jnp.dot(w[0], h[0]) - jnp.dot(w[1], h[1])
        o_im = jnp.dot(w[0], h[1]) + jnp.dot(w[1], h[0])
        e = R - o_re * o_re - o_im * o_im
        if update:
            h = h.at[0].add(2 * lr * e * (o_re * w[0] + o_im * w[1]))
            h = h.at[1].add(2 * lr * e * (o_im * w[0] - o_re * w[1]))
        return h, (jnp.stack([o_re, o_im]), e)

    h, (out, e) = jax.lax.scan(step, h, jnp.arange(n_sym))
    offset = mh - mh // sps  # reference storage roll (see module docstring)
    return jnp.roll(out.T, -offset, axis=-1), h, jnp.roll(e, -offset)


# ------------------------------------------------------------------ DP helpers


def _normalize_dp(rx: jnp.ndarray, mh: int) -> jnp.ndarray:
    y = jnp.pad(rx, ((0, 0), (0, 0), (mh, mh)))
    return y / jnp.mean(y[:, 0, :] ** 2 + y[:, 1, :] ** 2)


def _butterfly_out(w: jnp.ndarray, h: jnp.ndarray):
    """w: (..., nu, c, M) windows; h: (chi, nu, c, M). Returns (out_re, out_im) (..., chi)."""
    o_re = jnp.einsum("...vk,xvk->...x", w[..., 0, :], h[:, :, 0, :]) - jnp.einsum(
        "...vk,xvk->...x", w[..., 1, :], h[:, :, 1, :]
    )
    o_im = jnp.einsum("...vk,xvk->...x", w[..., 0, :], h[:, :, 1, :]) + jnp.einsum(
        "...vk,xvk->...x", w[..., 1, :], h[:, :, 0, :]
    )
    return o_re, o_im


def _increments(w, o_re, o_im):
    """CMA tap-update increments (unscaled by lr/e).

    w: (..., nu, c, M); o_re/o_im: (..., chi). Returns (..., chi, nu, c, M).
    """
    w0 = w[..., None, :, 0, :]  # (..., 1, nu, M)
    w1 = w[..., None, :, 1, :]
    ore = o_re[..., :, None, None]
    oim = o_im[..., :, None, None]
    inc_re = ore * w0 + oim * w1  # d/dh[...,0,:]
    inc_im = oim * w0 - ore * w1  # d/dh[...,1,:]
    return jnp.stack([inc_re, inc_im], axis=-2)


def _window(y: jnp.ndarray, k, m: int, sps: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice(y, (0, 0, k * sps), (2, 2, m))


@functools.partial(jax.jit, static_argnames=("sps", "update"))
def cma_dp(rx: jnp.ndarray, R: float, h: jnp.ndarray, lr, sps: int, update: bool = True):
    """Per-symbol 2x2 butterfly CMA. rx: (2, 2, N); h: (2, 2, 2, M).

    Returns (out (2, 2, N//sps), h, e (N//sps, 2)).
    """
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    y = _normalize_dp(rx, mh)
    n_sym = n // sps

    def step(h, k):
        w = _window(y, k, m, sps)  # (nu, c, M)
        o_re, o_im = _butterfly_out(w, h)  # (chi,)
        e = R - o_re * o_re - o_im * o_im
        if update:
            inc = _increments(w, o_re, o_im)  # (chi, nu, c, M)
            h = h + 2 * lr * e[:, None, None, None] * inc
        return h, (jnp.stack([o_re, o_im], axis=1), e)

    h, (out, e) = jax.lax.scan(step, h, jnp.arange(n_sym))
    offset = mh - mh // sps
    return jnp.roll(out.transpose(1, 2, 0), -offset, axis=-1), h, jnp.roll(e, -offset, axis=0)


# ------------------------------------------------------------------ chunked engine


def _all_windows(y: jnp.ndarray, ks: jnp.ndarray, m: int, sps: int) -> jnp.ndarray:
    idx = ks[:, None] * sps + jnp.arange(m)[None, :]  # (T, M)
    return y[:, :, idx].transpose(2, 0, 1, 3)  # (T, nu, c, M)


def _cma_chunked(rx, R, h, lr, batch_len: int, symb_step: int, sps: int, update: bool):
    """Shared engine for CMAbatch (symb_step == batch_len) and CMAflex.

    In the reference's (rolled) storage index k, updates fire at multiples of
    S that are >= B, use the increments of indices [k-B, k), and the output
    at k is computed *before* the update (shared_funcs.py:398-433 / 453-487).
    In symbol order that means update points j0 + c*S with
    j0 = ceil(B/S)*S + offset, offset = mh - mh//sps.

    Between updates the taps are constant, so each chunk is one windowed
    matmul; the scan runs over chunks with a ring buffer of the last B
    increments in the carry.
    """
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    n_sym = n // sps
    B, S = batch_len, symb_step
    offset = mh - mh // sps
    y = _normalize_dp(rx, mh)

    def run_const(ks, h):
        w = _all_windows(y, ks, m, sps)
        o_re, o_im = _butterfly_out(w, h)
        e = R - o_re**2 - o_im**2
        return o_re, o_im, e, _increments(w, o_re, o_im)

    if not update:
        o_re, o_im, e, _ = run_const(jnp.arange(n_sym), h)
        out = jnp.stack([o_re, o_im], axis=1).transpose(2, 1, 0)
        return jnp.roll(out, -offset, axis=-1), h, jnp.roll(e, -offset, axis=0)

    j0 = -(-B // S) * S + offset  # first update point, symbol order
    if n_sym <= j0:
        raise ValueError(f"frame too short for chunked CMA: N_sym={n_sym} <= j0={j0}")
    n_full = (n_sym - j0 - 1) // S  # full S-chunks in the scan
    tail = n_sym - j0 - n_full * S  # 1 <= tail <= S, processed outside

    # ---- prefix [0, j0): constant taps
    o_re_p, o_im_p, e_pre, inc_pre = run_const(jnp.arange(j0), h)
    ring_inc = inc_pre[j0 - B :]  # increments [j0-B, j0)
    ring_e = e_pre[j0 - B :]

    def chunk(carry, c):
        h, ring_inc, ring_e = carry
        k_start = j0 + c * S
        # symbol k_start: pre-update taps
        w0 = _window(y, k_start, m, sps)
        o_re0, o_im0 = _butterfly_out(w0, h)
        e0 = R - o_re0**2 - o_im0**2
        inc0 = _increments(w0, o_re0, o_im0)
        # update uses increments [k_start-B, k_start)
        h = h + 2 * lr * jnp.einsum("tx,txvck->xvck", ring_e, ring_inc)
        # symbols (k_start, k_start+S): post-update taps
        o_re_r, o_im_r, e_r, inc_r = run_const(k_start + 1 + jnp.arange(S - 1), h)
        new_inc = jnp.concatenate([inc0[None], inc_r])
        new_e = jnp.concatenate([e0[None], e_r])
        ring_inc = jnp.concatenate([ring_inc[S:], new_inc])
        ring_e = jnp.concatenate([ring_e[S:], new_e])
        out_re = jnp.concatenate([o_re0[None], o_re_r])
        out_im = jnp.concatenate([o_im0[None], o_im_r])
        return (h, ring_inc, ring_e), (out_re, out_im, new_e)

    if n_full > 0:
        (h, ring_inc, ring_e), (o_re_c, o_im_c, e_c) = jax.lax.scan(
            chunk, (h, ring_inc, ring_e), jnp.arange(n_full)
        )
        o_re_c, o_im_c, e_c = (a.reshape(-1, 2) for a in (o_re_c, o_im_c, e_c))
    else:
        o_re_c = o_im_c = e_c = jnp.zeros((0, 2), jnp.float32)

    # ---- tail chunk: one last update, then `tail` outputs
    k_start = j0 + n_full * S
    w0 = _window(y, k_start, m, sps)
    o_re0, o_im0 = _butterfly_out(w0, h)
    e0 = R - o_re0**2 - o_im0**2
    h = h + 2 * lr * jnp.einsum("tx,txvck->xvck", ring_e, ring_inc)
    o_re_t, o_im_t, e_t, _ = run_const(k_start + 1 + jnp.arange(tail - 1), h)

    o_re = jnp.concatenate([o_re_p, o_re_c, o_re0[None], o_re_t])
    o_im = jnp.concatenate([o_im_p, o_im_c, o_im0[None], o_im_t])
    e = jnp.concatenate([e_pre, e_c, e0[None], e_t])
    out = jnp.stack([o_re, o_im], axis=1).transpose(2, 1, 0)
    return jnp.roll(out, -offset, axis=-1), h, jnp.roll(e, -offset, axis=0)


@functools.partial(jax.jit, static_argnames=("batch_len", "sps", "update"))
def cma_batch_dp(rx, R, h, lr, batch_len: int, sps: int, update: bool = True):
    """Butterfly CMA with batched tap updates every ``batch_len`` symbols."""
    return _cma_chunked(rx, R, h, lr, batch_len, batch_len, sps, update)


@functools.partial(jax.jit, static_argnames=("batch_len", "symb_step", "sps", "update"))
def cma_flex_dp(rx, R, h, lr, batch_len: int, symb_step: int, sps: int, update: bool = True):
    """Butterfly CMA, sliding-window updates every ``symb_step`` symbols."""
    return _cma_chunked(rx, R, h, lr, batch_len, symb_step, sps, update)
