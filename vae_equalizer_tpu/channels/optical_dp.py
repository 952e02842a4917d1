"""Linear optical dual-polarization (2x2 MIMO) channel simulator.

TX per-pol PCS symbol streams -> upsampling -> one frequency-domain pass
applying the RRC pulse + optional extra ISI IR (their DFT folded into the
scalar dispersion response — exact 'valid' linear convolution, see
``make_dp_simulator``) together with the impairments: residual chromatic
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

Dtype discipline: the jit boundary is complex-free — all constants, inputs
and outputs are real (stacked I/Q planes); complex64 exists only as
device-internal FFT temporaries. (The axon TPU transport does not support
host<->device transfers of complex arrays: H2D may fail Unimplemented and a
complex D2H wedges the tunnel.)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constellation import Constellation, sample_levels
from ..core.filters import rrcfir

PULSE_T = 8
PULSE_BETA = 0.1


def _fast_fft_len(n: int) -> int:
    """Smallest L >= n with L = 2^a * 3^b * 5^c * 7^d and a >= 5.

    TPU FFT throughput collapses on lengths with large odd factors (Bluestein
    path): measured ~95 ms vs ~1 ms per (2, 20k) fft+ifft pair on v5e for
    20034 = 2*3^3*7*53 vs 20160 = 2^6*3^2*5*7. The dispersion filtering is a
    continuous-frequency all-pass sampled on the FFT grid, so padding the
    signal and using the padded grid is an equally valid discretization.
    """
    def ok(m):
        a = 0
        while m % 2 == 0:
            m //= 2
            a += 1
        for p in (3, 5, 7):
            while m % p == 0:
                m //= p
        return m == 1 and a >= 5

    L = n
    while not ok(L):
        L += 1
    return L


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
    h_pulse_re = rrcfir(PULSE_T, sps, PULSE_BETA)
    # pulse and extra ISI IR fused into one kernel (conv associativity):
    # (x * h_pulse) * h_chan == x * (h_pulse * h_chan) — halves the conv work
    h_comb_c = np.convolve(h_pulse_re.astype(np.complex128), h_channel_up)

    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, dtype=jnp.float32)
    m_up = h_channel_up.shape[-1]
    n_conv = N + m_up + 4 * PULSE_T
    up_len = sps * (n_conv - 1) + 1
    h_len = h_comb_c.shape[-1]
    sig_len = up_len - h_pulse_re.shape[-1] - m_up + 2  # after two 'valid' convs
    offset = PULSE_T + m_up - 1
    snr_lin = 10 ** (snr_db / 10)

    # frequency-domain constants, precomputed in float64 on the host and
    # shipped as real planes; the FFT runs at a 2^a-rich padded length.
    # The fused pulse+ISI FIR rides the SAME fft pass (round 4): fft_len >=
    # up_len keeps the slice [h_len-1, h_len-1+sig_len) free of circular
    # wrap, so multiplying h_comb's DFT into the scalar CD response applies
    # the 'valid' time-domain convolution exactly (LTI filters commute) —
    # the explicit jnp.convolve stage (4 real 1-D convs per pol, ~2.8
    # ms/frame at R=128 on v5e, artifacts/r4_gen_breakdown.log) disappears
    # for zero extra FFT cost (default config: both need fft_len 20160).
    fft_len = _fast_fft_len(up_len)
    freq = np.fft.fftfreq(fft_len, 1 / symb_rate / sps)
    cd_phase = 2 * (np.pi * freq) ** 2 * tau_cd  # exp(+1j*cd_phase)
    pmd_phase = np.pi * tau_pmd * freq  # exp(+1j*pmd_phase) / conj
    h_f = np.fft.fft(np.pad(h_comb_c, (0, fft_len - h_len)))
    cd_c = np.exp(1j * cd_phase) * h_f  # scalar response: CD x pulse/ISI FIR
    cd = jnp.asarray(
        np.stack([cd_c.real, cd_c.imag]).astype(np.float32)
    )
    pmd = jnp.asarray(
        np.stack([np.cos(pmd_phase), np.sin(pmd_phase)]).astype(np.float32)
    )
    # exp(-1j*phiIQ) per pol
    e_phi = jnp.asarray(
        np.stack([np.cos(phi_iq), -np.sin(phi_iq)]).astype(np.float32)
    )  # (2 re/im, 2 pol)

    def generate(key: jax.Array, theta: jnp.ndarray, snr_lin_r=None,
                 P_r=None):
        # snr_lin_r: optional traced per-call SNR override (linear), so runs
        # at different SNRs can share one vmapped generator program (the
        # sweep snr-axis batching); None keeps the closure's static value.
        # P_r: optional traced per-call PCS pmf override (the sweep nu-axis
        # batching — nu enters the generator only through the sampling pmf;
        # the level grid ``amps`` is normalized over the uniform grid and is
        # nu-INDEPENDENT, constellation.py:103).
        snr = snr_lin if snr_lin_r is None else snr_lin_r
        k_sym, k_noise = jax.random.split(key)
        # 4 independent amplitude streams: (pol*2, n_conv) like the reference's
        # rng.choice(amps, (pol*2, N_conv), p=P)
        data = sample_levels(k_sym, amps, P if P_r is None else P_r,
                             (pol * 2, n_conv))
        # (pol, 2, up_len) zero-inserted upsampling as interleave+reshape
        # (a strided scatter costs ~0.1 ms/frame on TPU); data row = pol*2+c
        d4 = data.reshape(pol, 2, n_conv)
        tx_up = jnp.concatenate(
            [d4[..., None], jnp.zeros((pol, 2, n_conv, sps - 1), jnp.float32)], -1
        ).reshape(pol, 2, n_conv * sps)[..., :up_len]

        # frequency-domain pulse/ISI shaping (folded into the CD response)
        # + CD + PMD + rotation + IQ shift; complex64 exists only inside
        # this block (device-internal)
        z = tx_up[:, 0, :] + 1j * tx_up[:, 1, :]
        z = jnp.pad(z, ((0, 0), (0, fft_len - up_len)))
        zf = jnp.fft.fft(z, axis=-1)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        e0 = e_phi[0, 0] + 1j * e_phi[1, 0]
        e1 = e_phi[0, 1] + 1j * e_phi[1, 1]
        d0 = pmd[0] + 1j * pmd[1]
        d1 = pmd[0] - 1j * pmd[1]  # 1/exp = conj for unit modulus
        cdz = cd[0] + 1j * cd[1]
        # H = R^T @ diag(d0, d1) @ R with R = [[ct*e0, st*e0], [-st*e1, ct*e1]]
        h00 = ct * e0 * d0 * ct * e0 + (-st * e0) * d1 * (-st * e1)
        h01 = ct * e0 * d0 * st * e0 + (-st * e0) * d1 * ct * e1
        h10 = st * e1 * d0 * ct * e0 + ct * e1 * d1 * (-st * e1)
        h11 = st * e1 * d0 * st * e0 + ct * e1 * d1 * ct * e1
        out0 = (h00 * zf[0] + h01 * zf[1]) * cdz
        out1 = (h10 * zf[0] + h11 * zf[1]) * cdz
        z = jnp.fft.ifft(jnp.stack([out0, out1]), axis=-1)[
            :, h_len - 1 : h_len - 1 + sig_len
        ]  # the 'valid' window of the folded FIR (linear conv: fft_len >= up_len)
        sig = jnp.stack([jnp.real(z), jnp.imag(z)], axis=1).astype(jnp.float32)

        sigma = jnp.sqrt(jnp.mean(sig**2) * 2 * sps / 2 / snr).astype(jnp.float32)
        noise = jax.random.normal(k_noise, sig.shape, jnp.float32)
        sig = sig + sigma * noise

        rx = sig[:, :, : sps * N]
        tx_win = jax.lax.dynamic_slice_in_dim(data, offset, N, axis=1)  # (pol*2, N)
        tx = jnp.stack([tx_win[0::pol], tx_win[1::pol]], axis=1)  # (pol, 2, N)
        return rx, tx, sigma

    return generate
