"""L1 tests: AWGN-ISI and optical DP channel simulators (statistical parity).

The reference uses unseeded NumPy RNG, so parity is distributional: output
power, noise variance scaling, alignment of ground truth, and unitarity of
the DP impairment operator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.channels import channel_ir, make_awgn_simulator, make_dp_simulator


@pytest.fixture(scope="module")
def const64():
    return make_constellation("64-QAM", 0.0)


def test_awgn_shapes_and_alignment(const64):
    h_up, m_orig = channel_ir("h1", 2)
    N = 2000
    gen = jax.jit(make_awgn_simulator(const64, 24.0, h_up, m_orig, N, 2))
    rx, tx = gen(jax.random.PRNGKey(0))
    assert rx.shape == (2, 2 * N)
    assert tx.shape == (2, N)
    # tx entries are exact amplitude levels
    assert np.all(np.isin(np.round(np.asarray(tx), 5), np.round(const64.amps, 5)))
    # alignment: the symbol at rx[.., sps*k] correlates with tx[k] after the
    # matched filter; check gross cross-correlation peak lands near zero lag
    sym = np.asarray(rx)[0, ::2][: N]
    t = np.asarray(tx)[0]
    lags = range(-8, 9)
    corr = [np.abs(np.dot(np.roll(sym, -l), t)) for l in lags]
    # residual group delay of pulse+channel; the pipeline's find_shift
    # compensates within +-10 symbols, so only require a nearby peak
    assert abs(list(lags)[int(np.argmax(corr))]) <= 5


def test_awgn_noise_scaling(const64):
    """sigma^2*2/sps relative to signal power must follow 10^(-SNR/10)."""
    h_up, m_orig = channel_ir("h1", 2)
    N = 30000
    for snr in (10.0, 24.0):
        gen = jax.jit(make_awgn_simulator(const64, snr, h_up, m_orig, N, 2))
        gen_clean = jax.jit(make_awgn_simulator(const64, 200.0, h_up, m_orig, N, 2))
        rx, _ = gen(jax.random.PRNGKey(1))
        rxc, _ = gen_clean(jax.random.PRNGKey(1))
        p_noise = np.mean((np.asarray(rx) - np.asarray(rxc)) ** 2) * 2  # I+Q
        p_sig = np.mean(np.asarray(rxc) ** 2) * 2
        snr_meas = 10 * np.log10(p_sig / p_noise * 2 / 2)  # sigma had sps*.../2
        # sigma_n^2 = sps * Psig/2 / snr_lin per component; noise power (I+Q)
        # = 2 sigma_n^2 = sps * Psig / snr_lin
        snr_meas = 10 * np.log10(2 * p_sig / p_noise)
        assert abs(snr_meas - snr) < 0.15


def test_dp_unitary_impairments(const64):
    """CD/PMD/rotation must preserve signal power (unitary per-frequency op)."""
    h_up, _ = channel_ir("h0", 2)
    N = 4000
    gen = jax.jit(
        make_dp_simulator(
            const64, 200.0, h_up, N, 2, 90e9, -26e-24, 0.1e-12 * np.sqrt(1000),
            np.array([0.0314, 0.0314]),
        )
    )
    rx, tx, sigma = gen(jax.random.PRNGKey(2), jnp.float32(np.pi / 10))
    assert rx.shape == (2, 2, 2 * N)
    assert tx.shape == (2, 2, N)
    # compare against theta=0, no pmd/cd: power preserved
    gen0 = jax.jit(
        make_dp_simulator(const64, 200.0, h_up, N, 2, 90e9, 0.0, 0.0, np.zeros(2))
    )
    rx0, _, _ = gen0(jax.random.PRNGKey(2), jnp.float32(0.0))
    p1 = np.mean(np.sum(np.asarray(rx) ** 2, axis=1))
    p0 = np.mean(np.sum(np.asarray(rx0) ** 2, axis=1))
    np.testing.assert_allclose(p1, p0, rtol=1e-3)


def test_dp_identity_channel_recovers_tx(const64):
    """No impairments + huge SNR: strided rx strongly correlates with tx.

    RRC alone is not Nyquist (only RRC*RRC is), so there is residual self-ISI
    — the equalizer's job — but the symbol-rate samples must correlate
    strongly with the transmitted levels at zero-ish lag.
    """
    h_up, _ = channel_ir("h0", 2)
    N = 1000
    gen = jax.jit(make_dp_simulator(const64, 200.0, h_up, N, 2, 90e9, 0.0, 0.0, np.zeros(2)))
    rx, tx, sigma = gen(jax.random.PRNGKey(3), jnp.float32(0.0))
    sym = np.asarray(rx)[:, :, ::2]
    tx = np.asarray(tx, np.float32)
    best = max(
        abs(np.mean(np.roll(sym, -lag, axis=-1) * tx))
        / (np.std(sym) * np.std(tx))
        for lag in range(-4, 5)
    )
    assert best > 0.6
    assert float(sigma) < 1e-4


def test_dp_noise_sigma_matches_formula(const64):
    h_up, _ = channel_ir("h0", 2)
    N = 8000
    snr = 23.0
    gen = jax.jit(
        make_dp_simulator(const64, snr, h_up, N, 2, 90e9, -26e-24, 0.1e-12 * np.sqrt(1000),
                          np.array([0.0314, 0.0314]))
    )
    _, _, sigma = gen(jax.random.PRNGKey(4), jnp.float32(np.pi / 10))
    # signal is unit-power constellation upsampled by 2 -> mean|sig|^2 ~ 0.5
    want = np.sqrt(0.5 * 2 / 2 / 10 ** (snr / 10))
    np.testing.assert_allclose(float(sigma), want, rtol=0.05)


def test_pcs_sampling_distribution():
    const = make_constellation("64-QAM", 0.1222578)
    h_up, m_orig = channel_ir("h1", 2)
    N = 60000
    gen = jax.jit(make_awgn_simulator(const, 24.0, h_up, m_orig, N, 2))
    _, tx = gen(jax.random.PRNGKey(5))
    tx = np.asarray(tx).ravel()
    counts = np.array([(np.abs(tx - a) < 1e-4).mean() for a in const.amps])
    np.testing.assert_allclose(counts, const.P, atol=0.01)


def test_dp_fft_folded_fir_equals_direct_conv(const64):
    """With all impairments off (tau_cd = tau_pmd = theta = phi_iq = 0, huge
    SNR), the frequency-domain pulse/ISI application (h_comb's DFT folded
    into the scalar CD response, round 4) must equal the direct 'valid'
    time-domain convolution of the upsampled levels with the fused
    pulse+ISI FIR — the fold is an exact linear-conv factorization, not an
    approximation (fft_len >= up_len keeps the kept window wrap-free)."""
    from vae_equalizer_tpu.channels.optical_dp import PULSE_BETA, PULSE_T
    from vae_equalizer_tpu.core.filters import rrcfir

    h_up, _ = channel_ir("h1", 2)
    N, sps = 500, 2
    gen = jax.jit(make_dp_simulator(const64, 300.0, h_up, N, sps, 90e9, 0.0, 0.0, np.zeros(2)))
    key = jax.random.PRNGKey(7)
    rx, tx, sigma = gen(key, jnp.float32(0.0))
    assert float(sigma) < 1e-9

    # rebuild the transmitted upsampled stream exactly as the simulator does
    from vae_equalizer_tpu.core.constellation import sample_levels

    amps = jnp.asarray(const64.amps)
    P = jnp.asarray(const64.P, jnp.float32)
    m_up = h_up.shape[-1]
    n_conv = N + m_up + 4 * PULSE_T
    k_sym, _ = jax.random.split(key)
    data = np.asarray(sample_levels(k_sym, amps, P, (4, n_conv)))
    h_pulse = rrcfir(PULSE_T, sps, PULSE_BETA)
    h_comb = np.convolve(h_pulse.astype(np.complex128), h_up)
    up_len = sps * (n_conv - 1) + 1
    for pol in range(2):
        z = np.zeros(up_len, np.complex128)
        z[::sps] = data[2 * pol] + 1j * data[2 * pol + 1]
        want = np.convolve(z, h_comb, mode="valid")[: sps * N]
        got = np.asarray(rx)[pol, 0] + 1j * np.asarray(rx)[pol, 1]
        np.testing.assert_allclose(got, want, atol=2e-4)
