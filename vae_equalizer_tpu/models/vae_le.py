"""VAE-LE linear equalizers: complex FIR (SISO) and 2x2 MIMO butterfly (DP).

A complex FIR / butterfly filter on stacked real/imag planes is one strided
cross-correlation: XLA lowers it straight onto the MXU as an implicit GEMM.
Parameters are plain pytrees (no flax) so the train step is a pure function.

Behavioral parity:
  * DP butterfly = reference twoXtwoFIR (shared_funcs.py:490-527): Conv1d
    cross-correlation with 4->2 channels where the I path consumes
    (x_I^x, x_I^y, -x_Q^x, -x_Q^y) and the Q path (x_Q^x, x_Q^y, x_I^x,
    x_I^y), stride sps, padding M//2, Dirac init; Gaussian soft demapper
    softmin((out-a)^2 / (2 var_pol) + nu_sc a^2) with the PCS correction term
    (Cho & Winzer, "Probabilistic Constellation Shaping for Optical Fiber
    Communications").
  * SISO = reference twoFIR (func_VAELE_MQAM_shaping.py:206-231): 2->1
    channels applied to (x_I, x_Q) and (x_Q, -x_I), padding (M-1)//2, output
    mean-|.|-normalized to amp_mean, demapper softmin((out-a)^2 / var).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "butterfly_init",
    "butterfly_apply",
    "soft_demap_dp",
    "vae_le_dp_forward",
    "siso_fir_init",
    "vae_le_siso_forward",
]


def _xcorr1d(x: jnp.ndarray, w: jnp.ndarray, stride: int, pad: int) -> jnp.ndarray:
    """Strided 1-D cross-correlation: x (C_in, L), w (C_out, C_in, K) -> (C_out, N)."""
    out = jax.lax.conv_general_dilated(
        x[None],
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0]


# --------------------------------------------------------------------- DP


def butterfly_init(m_est: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dirac-initialized butterfly kernel (2, 4, M): w[o, o, M//2] = 1."""
    w = np.zeros((2, 4, m_est), np.float32)
    w[0, 0, m_est // 2] = 1.0
    w[1, 1, m_est // 2] = 1.0
    return jnp.asarray(w, dtype)


def butterfly_apply(w: jnp.ndarray, x: jnp.ndarray, sps: int) -> jnp.ndarray:
    """Complex 2x2 butterfly FIR. x: (2 pol, 2 I/Q, L) -> out (2 pol, 2, N)."""
    m_est = w.shape[-1]
    x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])  # (4, L)
    x_q = jnp.concatenate([x[:, 1, :], x[:, 0, :]])
    out_i = _xcorr1d(x_i, w, sps, m_est // 2)  # (2, N)
    out_q = _xcorr1d(x_q, w, sps, m_est // 2)
    return jnp.stack([out_i, out_q], axis=1)


def soft_demap_dp(
    out: jnp.ndarray, amps: jnp.ndarray, var: jnp.ndarray, nu_sc: float
) -> jnp.ndarray:
    """PCS-aware Gaussian soft demapper.

    out: (2 pol, 2, N) -> q (2 pol, 2*num_lev, N); q[:, :n] are I-level
    posteriors, q[:, n:] Q-level posteriors.
    """
    # metric[p, c, lev, t] = (out[p,c,t] - a_lev)^2 / (2 var_p) + nu_sc a_lev^2
    d = out[:, :, None, :] - amps[None, None, :, None]
    metric = d * d / (2.0 * var[:, None, None, None]) + nu_sc * (amps**2)[None, None, :, None]
    q = jax.nn.softmax(-metric, axis=2)  # softmin over levels
    pol, _, n_lev, N = q.shape
    return q.reshape(pol, 2 * n_lev, N)  # (comp, lev) flatten: I levels then Q


def vae_le_dp_forward(
    w: jnp.ndarray,
    x: jnp.ndarray,
    amps: jnp.ndarray,
    var: jnp.ndarray,
    nu_sc: float,
    sps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Butterfly equalizer + soft demapper. Returns (q (2, 2n, N), out (2, 2, N))."""
    out = butterfly_apply(w, x, sps)
    return soft_demap_dp(out, amps, var, nu_sc), out


# --------------------------------------------------------------------- SISO


def vae_le_siso_forward_runs(
    w_r: jnp.ndarray,
    x_r: jnp.ndarray,
    amps: jnp.ndarray,
    amp_mean: float,
    var,
    sps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``vae_le_siso_forward`` batched over a leading runs axis.

    w_r: (R, 1, 2, M); x_r: (R, 2, L) -> (q (R, 2n, N), out (R, 2, N)).
    A ``jax.vmap`` of the conv form batches over the FILTER operand, which
    this backend lowers through a copy that puts the size-2 I/Q dim in
    lanes — a 256x-padded layout that cost ~7.4 s of a 7.7 s 20-run AWGN
    aggregate (round-5 probe, artifacts/r5_awgn_bench_rb.log). Here the
    strided correlation is an im2col batched matmul instead: col k of the
    stride-2 im2col is the contiguous parity-(k%2) slice starting at lane
    k//2 (the polyphase identity of ops/siso_frame_kernel.py), and the
    per-run contraction is ONE batched dot_general.
    """
    assert sps == 2, "runs-batched eval forward is sps=2 only"
    r_n, _, L = x_r.shape
    m_est = w_r.shape[-1]
    pad = (m_est - 1) // 2
    n_out = (L + 2 * pad - m_est) // sps + 1

    def corr(xc):  # (R, 2, L) signed component arrangement -> (R, N)
        xp = jnp.pad(xc, ((0, 0), (0, 0), (pad, pad + m_est)))
        half = xp.shape[-1] // 2
        xph = xp[..., : 2 * half].reshape(r_n, 2, half, 2)
        xe, xo = xph[..., 0], xph[..., 1]  # (R, 2, half)
        rows = [
            (xe if k % 2 == 0 else xo)[:, :, k // 2 : k // 2 + n_out]
            for k in range(m_est)
        ]
        cols = jnp.stack(rows, axis=2).reshape(r_n, 2 * m_est, n_out)
        out = jax.lax.dot_general(
            w_r.reshape(r_n, 1, 2 * m_est), cols,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # (R, 1, N)
        return out[:, 0]

    x_i = jnp.stack([x_r[:, 0], x_r[:, 1]], axis=1)
    x_q = jnp.stack([x_r[:, 1], -x_r[:, 0]], axis=1)
    out_i = corr(x_i)
    out_q = corr(x_q)
    out = jnp.stack([out_i, out_q], axis=1)  # (R, 2, N)
    norm_i = out_i / jnp.mean(jnp.abs(out_i), axis=-1, keepdims=True) * amp_mean
    norm_q = out_q / jnp.mean(jnp.abs(out_q), axis=-1, keepdims=True) * amp_mean
    d_i = norm_i[:, None, :] - amps[None, :, None]
    d_q = norm_q[:, None, :] - amps[None, :, None]
    q_i = jax.nn.softmax(-(d_i * d_i) / var, axis=1)
    q_q = jax.nn.softmax(-(d_q * d_q) / var, axis=1)
    return jnp.concatenate([q_i, q_q], axis=1), out


def siso_fir_init(m_est: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dirac-initialized SISO kernel (1, 2, M): w[0, 0, M//2] = 1."""
    w = np.zeros((1, 2, m_est), np.float32)
    w[0, 0, m_est // 2] = 1.0
    return jnp.asarray(w, dtype)


def vae_le_siso_forward(
    w: jnp.ndarray,
    x: jnp.ndarray,
    amps: jnp.ndarray,
    amp_mean: float,
    var: float,
    sps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex FIR equalizer + soft demapper, SISO.

    x: (2, L) -> (q (2*num_lev, N), out (2, N)). The demapper input is
    per-component normalized to mean magnitude ``amp_mean``; the returned
    ``out`` is the unnormalized filter output (as in the reference).
    """
    m_est = w.shape[-1]
    pad = (m_est - 1) // 2
    x_i = jnp.stack([x[0], x[1]])
    x_q = jnp.stack([x[1], -x[0]])
    out_i = _xcorr1d(x_i, w, sps, pad)[0]
    out_q = _xcorr1d(x_q, w, sps, pad)[0]
    out = jnp.stack([out_i, out_q])
    norm_i = out_i / jnp.mean(jnp.abs(out_i)) * amp_mean
    norm_q = out_q / jnp.mean(jnp.abs(out_q)) * amp_mean
    d_i = norm_i[None, :] - amps[:, None]
    d_q = norm_q[None, :] - amps[:, None]
    q_i = jax.nn.softmax(-(d_i * d_i) / var, axis=0)
    q_q = jax.nn.softmax(-(d_q * d_q) / var, axis=0)
    return jnp.concatenate([q_i, q_q]), out
