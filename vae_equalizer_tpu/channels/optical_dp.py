"""Linear optical dual-polarization (2x2 MIMO) channel simulator.

TX per-pol PCS symbol streams -> upsampling -> RRC pulse + optional extra ISI
IR (time domain) -> frequency-domain impairments: residual chromatic
dispersion (CD), polarization-mode dispersion (PMD), polarization rotation
theta with static IQ phase shift -> AWGN.

Physics parity with the reference (optical_DP_channel/shared_funcs.py:38-90):
  * CD: exp(+1j * 2 * (pi f)^2 * tau_cd)
  * PMD: diag(exp(+1j pi tau_pmd f), exp(-1j pi tau_pmd f)) in the rotated
    polarization frame
  * rotation: H = R(theta)^T @ D_pmd @ R(theta) with per-row IQ phase
    exp(-1j phiIQ)
  * noise sigma = sqrt(mean|rx|^2 * sps / 2 / 10^(SNR/10))

Everything is jittable; ``theta`` stays a traced argument because the sweep
drivers advance it every frame (time-varying channel,
func_VAELE_DP_MQAM_shaping.py:51).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constellation import Constellation
from ..core.filters import rrcfir

PULSE_T = 8
PULSE_BETA = 0.1


def make_dp_simulator(
    const: Constellation,
    snr_db: float,
    h_channel_up: np.ndarray,
    N: int,
    sps: int,
    symb_rate: float,
    tau_cd: float,
    tau_pmd: float,
    phi_iq: np.ndarray,
) -> Callable[[jax.Array, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Build a jittable ``fn(key, theta) -> (rx, tx, sigma_n)`` DP generator.

    Returns:
      fn(key, theta) ->
        rx (2 pol, 2 I/Q, sps*N) float32,
        tx (2 pol, 2 I/Q, N) float32 ground-truth amplitude levels,
        sigma_n () float32 noise std actually applied.
    """
    pol = 2
    h_pulse = jnp.asarray(rrcfir(PULSE_T, sps, PULSE_BETA))  # real taps
    h_chan = jnp.asarray(h_channel_up.astype(np.complex64))

    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, dtype=jnp.float32)
    m_up = h_channel_up.shape[-1]
    n_conv = N + m_up + 4 * PULSE_T
    up_len = sps * (n_conv - 1) + 1
    sig_len = up_len - h_pulse.shape[-1] - m_up + 2  # after two 'valid' convs
    offset = PULSE_T + m_up - 1
    snr_lin = 10 ** (snr_db / 10)

    freq = jnp.asarray(np.fft.fftfreq(sig_len, 1 / symb_rate / sps).astype(np.float32))
    exp_cd = jnp.exp(1j * 2 * (jnp.pi * freq) ** 2 * tau_cd).astype(jnp.complex64)
    exp_pmd = jnp.exp(1j * jnp.pi * tau_pmd * freq).astype(jnp.complex64)
    exp_phi = jnp.asarray(np.exp(-1j * phi_iq).astype(np.complex64))  # (2,)

    def generate(key: jax.Array, theta: jnp.ndarray):
        k_sym, k_nre, k_nim = jax.random.split(key, 3)
        # 4 independent amplitude streams: (pol*2, n_conv) like the reference's
        # rng.choice(amps, (pol*2, N_conv), p=P)
        data = jax.random.choice(k_sym, amps, (pol * 2, n_conv), p=P)
        tx_sym = (data[0::pol] + 1j * data[1::pol]).astype(jnp.complex64)  # (pol, n_conv)
        tx_up = jnp.zeros((pol, up_len), jnp.complex64).at[:, ::sps].set(tx_sym)

        # per-pol pulse shaping + extra ISI IR ('valid' convolutions)
        def conv_pol(x):
            y = jnp.convolve(x, h_pulse, mode="valid")
            return jnp.convolve(y, h_chan, mode="valid")

        sig = jax.vmap(conv_pol)(tx_up)  # (pol, sig_len) complex64

        # frequency-domain CD + PMD + rotation + IQ shift
        sig_f = jnp.fft.fft(sig, axis=-1)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # R and R^T with per-output-row IQ phase (shared_funcs.py:47-50)
        r00, r01 = ct * exp_phi[0], st * exp_phi[0]
        r10, r11 = -st * exp_phi[1], ct * exp_phi[1]
        rt00, rt01 = ct * exp_phi[0], -st * exp_phi[0]
        rt10, rt11 = st * exp_phi[1], ct * exp_phi[1]
        # H = R^T @ diag(exp_pmd, 1/exp_pmd) @ R, per frequency bin
        d0, d1 = exp_pmd, 1.0 / exp_pmd
        h00 = rt00 * d0 * r00 + rt01 * d1 * r10
        h01 = rt00 * d0 * r01 + rt01 * d1 * r11
        h10 = rt10 * d0 * r00 + rt11 * d1 * r10
        h11 = rt10 * d0 * r01 + rt11 * d1 * r11
        out0 = (h00 * sig_f[0] + h01 * sig_f[1]) * exp_cd
        out1 = (h10 * sig_f[0] + h11 * sig_f[1]) * exp_cd
        sig = jnp.fft.ifft(jnp.stack([out0, out1]), axis=-1)

        sigma = jnp.sqrt(jnp.mean(jnp.abs(sig) ** 2) * sps / 2 / snr_lin).astype(jnp.float32)
        noise = jax.random.normal(k_nre, sig.shape) + 1j * jax.random.normal(k_nim, sig.shape)
        sig = sig + sigma * noise

        rx = jnp.stack([jnp.real(sig[:, : sps * N]), jnp.imag(sig[:, : sps * N])], axis=1)
        tx_win = jax.lax.dynamic_slice_in_dim(data, offset, N, axis=1)  # (pol*2, N)
        tx = jnp.stack([tx_win[0::pol], tx_win[1::pol]], axis=1)  # (pol, 2, N)
        return rx.astype(jnp.float32), tx, sigma

    return generate
