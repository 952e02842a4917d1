"""Whole-experiment VAE-NN frame kernel vs jax autodiff + optax.amsgrad.

ops/nn_frame_kernel.py must reproduce, in one pallas_call, the trajectory of
the XLA path used by train/awgn.py: vae_nn_forward + elbo_siso (uniform
prior) under jax.value_and_grad, followed by optax.amsgrad updates; its eval
slots must hold the parameters after epochs (i*epe + 1). Interpret mode on
CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.models import dirac_taps_siso, vae_nn_forward, vae_nn_init
from vae_equalizer_tpu.models.losses import elbo_siso
from vae_equalizer_tpu.ops.nn_frame_kernel import (
    flatten_nn_params,
    nn_frame_opt_init,
    unflatten_nn_params,
    vae_nn_experiment_train_pallas,
)
from vae_equalizer_tpu.ops.nn_frame_kernel import _to_parity_major

M = 9
K1 = 7
BL = 48  # symbols per minibatch
NB = 2  # minibatches per epoch
EPOCHS = 4
EPE = 2
LR = 2e-3


def _setup():
    const = make_constellation("16-QAM", 0.0)
    amps = jnp.asarray(const.amps)
    rng = np.random.default_rng(23)
    net0, _ = vae_nn_init(jax.random.PRNGKey(5), K1, 3, const.num_lev)
    h0 = dirac_taps_siso(M) + 0.01 * jnp.asarray(
        rng.normal(size=(2, M)).astype(np.float32)
    )
    rx = jnp.asarray(rng.normal(size=(EPOCHS, 2, NB * 2 * BL)).astype(np.float32) * 0.5)
    return const, amps, net0, h0, rx


def _amsgrad_reference(amps, net0, h0, rx):
    opt = optax.amsgrad(LR)
    params = {"net": net0, "h": h0}
    s = opt.init(params)

    def loss_fn(p, x):
        q = vae_nn_forward(p["net"], x, 2)
        return elbo_siso(q, x, p["h"], amps, None)

    losses, snapshots = [], []
    for e in range(EPOCHS):
        for b in range(NB):
            x = rx[e, :, b * 2 * BL : (b + 1) * 2 * BL]
            loss, g = jax.value_and_grad(loss_fn)(params, x)
            updates, s = opt.update(g, s, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        snapshots.append(jax.tree.map(np.asarray, params))
    return params, losses, snapshots


def test_nn_experiment_kernel_matches_autodiff_loop():
    const, amps, net0, h0, rx = _setup()
    w1f, w2f = flatten_nn_params(net0)
    opt0 = nn_frame_opt_init(w1f, w2f, _to_parity_major(h0))
    (w1f1, w2f1, h1, _, _, opt1, losses, w1_ev, w2_ev, h_ev, _, _) = (
        vae_nn_experiment_train_pallas(
            w1f, w2f, h0, opt0, rx, amps, jnp.float32(LR),
            bl_sym=BL, n_batches=NB, epe=EPE, k1=K1, interpret=True,
        )
    )
    params_ref, losses_ref, snaps = _amsgrad_reference(amps, net0, h0, rx)

    assert losses.shape == (EPOCHS * NB,)
    np.testing.assert_allclose(losses, np.asarray(losses_ref), rtol=3e-5)
    net1 = unflatten_nn_params(w1f1, w2f1, K1)
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_allclose(
            net1[k], params_ref["net"][k], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(h1, params_ref["h"], rtol=5e-3, atol=1e-5)
    # eval slots: slot i == params after epoch i*epe (0-based end of epoch)
    n_evals = EPOCHS // EPE
    assert w1_ev.shape == (n_evals + 1,) + w1f.shape
    for i in range(n_evals):
        net_i = unflatten_nn_params(w1_ev[i], w2_ev[i], K1)
        for k in ("w1", "b1", "w2", "b2"):
            np.testing.assert_allclose(
                net_i[k], snaps[i * EPE]["net"][k], rtol=5e-3, atol=1e-5)
        np.testing.assert_allclose(
            h_ev[i], snaps[i * EPE]["h"], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(w1_ev[-1], np.asarray(w1f1), rtol=1e-6)
    assert all(np.all(np.isfinite(v)) for v in jax.tree.leaves(opt1))


def test_nn_frame_path_statistically_matches_loop(monkeypatch):
    """use_pallas="frame" through train_vae_nn_awgn: correct shapes and SER
    statistically consistent with the per-epoch loop."""
    import vae_equalizer_tpu.ops.nn_frame_kernel as nfk
    from vae_equalizer_tpu.train.awgn import train_vae_nn_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeNnConfig

    orig = nfk.vae_nn_experiment_train_pallas
    monkeypatch.setattr(
        nfk, "vae_nn_experiment_train_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    cfg = AwgnVaeNnConfig(
        mod="16-QAM", snr_db=20.0, num_epochs=16, epe=4, n_train=400,
        batch_len=100, n_valid=2000, m_est=9, kernel_1=7,
    )
    key = jax.random.PRNGKey(1)
    rf = train_vae_nn_awgn(cfg, key, use_pallas="frame")
    rl = train_vae_nn_awgn(cfg, key)
    assert rf["ser"].shape == rl["ser"].shape == (4,)
    assert np.all(np.isfinite(rf["ser"])) and np.all(np.isfinite(rf["mi"]))
    np.testing.assert_allclose(rf["ser"], rl["ser"], atol=0.15)
    assert rf["params"]["net"]["w1"].shape == (8, 2, 7)


def test_nn_frame_path_rejects_unsupported():
    import pytest

    from vae_equalizer_tpu.train.awgn import train_vae_nn_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeNnConfig

    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="kernel_2"):
        train_vae_nn_awgn(
            AwgnVaeNnConfig(kernel_2=5), key, use_pallas="frame")
    with pytest.raises(ValueError, match="no per-step kernel"):
        train_vae_nn_awgn(AwgnVaeNnConfig(), key, use_pallas=True)


def test_nn_experiment_kernel_batchnorm_matches_autodiff_loop():
    """Net_BN: the in-kernel functional BatchNorm (batch stats + VJP +
    running-average update + trained gamma/beta) matches the XLA path."""
    const, amps, _, h0, rx = _setup()
    net0, bn_state = vae_nn_init(jax.random.PRNGKey(5), K1, 3, const.num_lev,
                                 batchnorm=True)
    # non-trivial gamma/beta so the VJP terms are exercised
    rng = np.random.default_rng(31)
    net0 = dict(net0)
    net0["bn_scale"] = jnp.asarray(
        1.0 + 0.2 * rng.normal(size=net0["bn_scale"].shape).astype(np.float32))
    net0["bn_bias"] = jnp.asarray(
        0.1 * rng.normal(size=net0["bn_bias"].shape).astype(np.float32))

    # reference: autodiff loop with functional BN (mirrors train_vae_nn_awgn)
    opt = optax.multi_transform(
        {"train": optax.amsgrad(LR), "frozen": optax.set_to_zero()},
        {"net": "train", "h": "train", "bn": "frozen"},
    )
    params = {"net": net0, "h": h0, "bn": bn_state}
    s = opt.init(params)

    def loss_fn(p, x):
        q, bn = vae_nn_forward(p["net"], x, 2, state=p["bn"], train=True)
        return elbo_siso(q, x, p["h"], amps, None), bn

    losses_ref = []
    for e in range(EPOCHS):
        for b in range(NB):
            x = rx[e, :, b * 2 * BL : (b + 1) * 2 * BL]
            (loss, bn), g = jax.value_and_grad(loss_fn, has_aux=True)(params, x)
            updates, s = opt.update(g, s, params)
            params = optax.apply_updates(params, updates)
            params = {**params, "bn": jax.tree.map(jax.lax.stop_gradient, bn)}
            losses_ref.append(float(loss))

    w1f, w2f = flatten_nn_params(net0)
    bn0 = (jnp.stack([net0["bn_scale"], net0["bn_bias"]], axis=1),
           jnp.stack([bn_state["mean"], bn_state["var"]], axis=1))
    opt0 = nn_frame_opt_init(w1f, w2f, _to_parity_major(h0), bn0[0])
    (w1f1, w2f1, h1, bnp1, rs1, opt1, losses, _, _, _, bnp_ev, rs_ev) = (
        vae_nn_experiment_train_pallas(
            w1f, w2f, h0, opt0, rx, amps, jnp.float32(LR),
            bn=bn0, momentum=bn_state["momentum"],
            bl_sym=BL, n_batches=NB, epe=EPE, k1=K1, interpret=True,
        )
    )
    np.testing.assert_allclose(losses, np.asarray(losses_ref), rtol=3e-5)
    net1 = unflatten_nn_params(w1f1, w2f1, K1)
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_allclose(
            net1[k], params["net"][k], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(h1, params["h"], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        bnp1[:, 0], params["net"]["bn_scale"], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        bnp1[:, 1], params["net"]["bn_bias"], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        rs1[:, 0], params["bn"]["mean"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        rs1[:, 1], params["bn"]["var"], rtol=1e-4, atol=1e-6)
