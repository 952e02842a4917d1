"""Streaming receiver: seamless block processing + online convergence; 256-QAM."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.core.constellation import demapper_noise_var
from vae_equalizer_tpu.channels import channel_ir, make_dp_simulator
from vae_equalizer_tpu.metrics import find_shift_dp, ser_iqflip
from vae_equalizer_tpu.models.streaming import StreamingReceiver
from vae_equalizer_tpu.train.eval_utils import margin_weight_maxshift, roll_dp


def test_streaming_receiver_converges_online():
    const = make_constellation("4-QAM", 0.0)
    h_up, _ = channel_ir("h0", 2)
    n_total = 24000
    gen = jax.jit(make_dp_simulator(const, 20.0, h_up, n_total, 2, 90e9, -26e-24,
                                    0.1e-12 * np.sqrt(1000), np.array([0.0314, 0.0314])))
    rx, tx, _ = gen(jax.random.PRNGKey(0), jnp.float32(np.pi / 10))

    block = 2000
    rxr = StreamingReceiver(
        amps=jnp.asarray(const.amps), P=jnp.asarray(const.P, jnp.float32),
        var=jnp.full((2,), demapper_noise_var(const, 20.0), jnp.float32),
        nu_sc=const.nu_sc, block_len=block, lr=2.5e-3,
    )
    state = rxr.init()
    sers = []
    for b in range(n_total // block):
        blk = rx[:, :, b * block * 2 : (b + 1) * block * 2]
        state, q, out = rxr.step(state, blk)
        txb = tx[:, :, b * block : (b + 1) * block]
        shift, r = find_shift_dp(q, txb, 21, jnp.asarray(const.amps))
        q_r = roll_dp(q, shift, r)
        w = margin_weight_maxshift(block, jnp.max(jnp.abs(shift)))
        sers.append(float(np.mean(np.asarray(ser_iqflip(q_r, txb, weight=w)))))
    assert sers[-1] < 0.02  # converged online
    assert sers[0] > sers[-1]


def test_256qam_supported():
    """Constellation generalizes beyond the reference's 4/16/64-QAM."""
    const = make_constellation("256-QAM", 0.0270955)
    assert const.num_lev == 16
    np.testing.assert_allclose(np.mean(np.abs(const.points) ** 2), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.sum(const.P), 1.0, rtol=1e-9)
    # channel sim + demapper chain runs
    h_up, m_orig = channel_ir("h1", 2)
    from vae_equalizer_tpu.channels import make_awgn_simulator

    gen = jax.jit(make_awgn_simulator(const, 30.0, h_up, m_orig, 500, 2))
    rx, tx = gen(jax.random.PRNGKey(1))
    assert rx.shape == (2, 1000) and tx.shape == (2, 500)


def test_streaming_pallas_matches_xla_interpret(monkeypatch):
    """use_pallas output pass equals the XLA pass (interpret mode on CPU)."""
    import vae_equalizer_tpu.ops as ops_mod

    orig = ops_mod.vae_le_dp_forward_pallas
    monkeypatch.setattr(
        ops_mod, "vae_le_dp_forward_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    const = make_constellation("4-QAM", 0.0)
    var = jnp.full((2,), demapper_noise_var(const, 20.0), jnp.float32)
    kwargs = dict(
        amps=jnp.asarray(const.amps), P=jnp.asarray(const.P, jnp.float32),
        var=var, nu_sc=const.nu_sc, block_len=500, lr=2.5e-3, adapt=False,
    )
    rx = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 1000)).astype(np.float32))
    a = StreamingReceiver(**kwargs)
    b = StreamingReceiver(**kwargs, use_pallas=True)
    sa, qa, oa = a.step(a.init(), rx)
    sb, qb, ob = b.step(b.init(), rx)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(oa), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qa), rtol=5e-4, atol=2e-6)
