"""Single-polarization AWGN channel with static complex ISI.

TX symbols (uniform or PCS-shaped) -> zero-insertion upsampling -> RRC (or RC)
pulse shaping -> complex channel IR -> AWGN at a target SNR.

Fully jittable end-to-end: one call builds the whole frame on-device from a
PRNG key (the reference regenerates data in NumPy on the host every epoch —
AWGN_channel/func_VAELE_MQAM_shaping.py:39-61 — which on TPU would serialize
on host<->device transfers).

Semantics parity notes (vs. reference ``generate_data``):
  * pulse length T=8 symbols, roll-off beta=0.1,
  * N_conv = N + len(h_up) + 4*T extra symbols so the 'valid' convolutions
    leave >= sps*N samples,
  * noise sigma = sqrt(sps * mean|rx|^2 / 2 / 10^(SNR/10)) (power-measured) or
    sqrt(1/2)/10^(SNR/20) (fixed, the VAE-NN convention,
    func_VAENN_MQAM.py:53),
  * ground-truth symbols aligned at offset T + M_orig - 1.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cplx
from ..core.constellation import Constellation, sample_levels
from ..core.filters import rcfir, rrcfir

PULSE_T = 8
PULSE_BETA = 0.1


def make_awgn_simulator(
    const: Constellation,
    snr_db: float,
    h_channel_up: np.ndarray,
    m_orig: int,
    N: int,
    sps: int,
    *,
    pulse: str = "rrc",
    fixed_noise: bool = False,
) -> Callable[[jax.Array], tuple[jnp.ndarray, jnp.ndarray]]:
    """Build a jittable ``fn(key) -> (rx, tx)`` AWGN-ISI frame generator.

    Args:
      const: constellation/PCS spec (amps + pmf used per I/Q dimension).
      snr_db: target SNR in dB.
      h_channel_up: sps-upsampled, unit-norm complex channel IR.
      m_orig: number of original (symbol-rate) channel taps — sets the
        ground-truth alignment offset T + m_orig - 1.
      N: number of output symbols per frame.
      sps: samples per symbol.
      pulse: "rrc" (default) or "rc" (the 1-sps DFE path uses RC).
      fixed_noise: if True use sigma = sqrt(1/2)/10^(SNR/20) instead of
        measuring the signal power.

    Returns:
      fn(key) -> (rx (2, sps*N) float32, tx (2, N) float32).
    """
    pulse_fn = rrcfir if pulse == "rrc" else rcfir
    h_pulse_re = pulse_fn(PULSE_T, sps, PULSE_BETA)
    # pulse and channel IR fused into one kernel (conv associativity):
    # (x * h_pulse) * h_chan == x * (h_pulse * h_chan) — halves the conv work
    h_comb_c = np.convolve(h_pulse_re.astype(np.complex64), h_channel_up)
    h_comb = jnp.asarray(np.stack([h_comb_c.real, h_comb_c.imag]).astype(np.float32))

    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, dtype=jnp.float32)
    n_conv = N + h_channel_up.shape[-1] + 4 * PULSE_T
    up_len = sps * (n_conv - 1) + 1
    offset = PULSE_T + m_orig - 1
    snr_lin = 10 ** (snr_db / 10)

    def generate(key: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
        k_sym, k_noise = jax.random.split(key)
        # (2, n_conv) independent I/Q amplitude draws from the MB pmf
        data = sample_levels(k_sym, amps, P, (2, n_conv))
        # zero-insertion upsample as interleave+reshape (a strided scatter
        # costs ~0.1 ms/frame on TPU)
        tx_up = jnp.concatenate(
            [data[..., None], jnp.zeros((2, n_conv, sps - 1), jnp.float32)], -1
        ).reshape(2, n_conv * sps)[:, :up_len]
        rx = cplx.conv_valid(tx_up, h_comb)
        if fixed_noise:
            sigma = jnp.float32(np.sqrt(1 / 2) / 10 ** (snr_db / 20))
        else:
            sigma = jnp.sqrt(sps * jnp.mean(cplx.cabs2(rx)) / 2 / snr_lin)
        rx = rx + sigma * jax.random.normal(k_noise, rx.shape, rx.dtype)
        tx = jax.lax.dynamic_slice_in_dim(data, offset, N, axis=1)
        return rx[:, : sps * N], tx

    return generate
