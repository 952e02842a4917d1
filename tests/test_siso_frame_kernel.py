"""Whole-experiment SISO frame kernel vs the step kernel + optax.amsgrad loop.

ops/siso_frame_kernel.py must reproduce, in one pallas_call, the trajectory
of the per-minibatch path used by train/awgn.py with use_pallas=True:
ops/elbo_siso_kernel.py loss+grads followed by optax.amsgrad updates, and
its eval slots must hold the parameters after epochs (i*epe + 1).
Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.models import siso_fir_init, dirac_taps_siso
from vae_equalizer_tpu.ops.elbo_siso_kernel import vae_siso_loss_and_grad_pallas
from vae_equalizer_tpu.ops.siso_frame_kernel import (
    siso_frame_opt_init,
    vae_siso_experiment_train_pallas,
)

M = 25
BL = 64  # symbols per minibatch
NB = 3  # minibatches per epoch
EPOCHS = 4
EPE = 2
LR = 5e-3


def _setup():
    const = make_constellation("16-QAM", 0.0270955)
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var = jnp.float32(10 ** (-20.0 / 10))
    rng = np.random.default_rng(17)
    w = siso_fir_init(M) + 0.01 * jnp.asarray(rng.normal(size=(1, 2, M)).astype(np.float32))
    h = dirac_taps_siso(M) + 0.01 * jnp.asarray(rng.normal(size=(2, M)).astype(np.float32))
    rx = jnp.asarray(rng.normal(size=(EPOCHS, 2, NB * 2 * BL)).astype(np.float32) * 0.5)
    return const, amps, P, var, w, h, rx


def _amsgrad_reference(const, amps, P, var, w, h, rx):
    opt = optax.amsgrad(LR)
    params = {"w": w, "h": h}
    s = opt.init(params)
    losses, snapshots = [], []
    for e in range(EPOCHS):
        for b in range(NB):
            x = rx[e, :, b * 2 * BL : (b + 1) * 2 * BL]
            loss, gw, gh, q, out = vae_siso_loss_and_grad_pallas(
                params["w"], params["h"], x, amps, const.amp_mean, var, P,
                interpret=True,
            )
            updates, s = opt.update({"w": gw, "h": gh}, s, params)
            params = optax.apply_updates(params, updates)
            losses.append(loss)
        snapshots.append((np.asarray(params["w"]), np.asarray(params["h"])))
    return params, losses, snapshots


def test_experiment_kernel_matches_step_loop():
    const, amps, P, var, w, h, rx = _setup()
    opt0 = siso_frame_opt_init({"w": w, "h": h})
    w1, h1, opt1, losses, w_ev, h_ev = vae_siso_experiment_train_pallas(
        w, h, opt0, rx, amps, const.amp_mean, var, P, jnp.float32(LR),
        bl_sym=BL, n_batches=NB, epe=EPE, interpret=True,
    )
    params_ref, losses_ref, snaps = _amsgrad_reference(const, amps, P, var, w, h, rx)

    assert losses.shape == (EPOCHS * NB,)
    np.testing.assert_allclose(losses, np.stack(losses_ref), rtol=3e-5)
    # final params: chaos-bounded tolerance (12 AMSGrad steps of
    # reduction-order drift between the matmul and VPU formulations)
    np.testing.assert_allclose(w1, params_ref["w"], rtol=5e-3, atol=5e-6)
    np.testing.assert_allclose(h1, params_ref["h"], rtol=5e-3, atol=5e-6)
    # eval slots: slot i == params after epoch i*epe (0-based end of epoch)
    n_evals = EPOCHS // EPE
    assert w_ev.shape == (n_evals + 1, 1, 2, M)
    for i in range(n_evals):
        np.testing.assert_allclose(w_ev[i], snaps[i * EPE][0], rtol=5e-3, atol=5e-6)
        np.testing.assert_allclose(h_ev[i], snaps[i * EPE][1], rtol=5e-3, atol=5e-6)
    # last slot = final params
    np.testing.assert_allclose(w_ev[-1], np.asarray(w1), rtol=1e-6)
    assert all(np.all(np.isfinite(v)) for v in jax.tree.leaves(opt1))


def test_experiment_path_statistically_matches_loop(monkeypatch):
    """use_pallas="frame" through train_vae_le_awgn: correct shapes and SER
    statistically consistent with the per-epoch loop (the frame path uses
    the compiled-mode key streams, so only distribution-level equality
    holds)."""
    import vae_equalizer_tpu.ops.elbo_siso_kernel as sek
    import vae_equalizer_tpu.ops.siso_frame_kernel as sfk
    from vae_equalizer_tpu.train.awgn import train_vae_le_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeLeConfig

    for mod, name in ((sfk, "vae_siso_experiment_train_pallas"),
                      (sek, "vae_siso_loss_and_grad_pallas")):
        orig = getattr(mod, name)
        monkeypatch.setattr(
            mod, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}),
        )

    cfg = AwgnVaeLeConfig(
        mod="16-QAM", snr_db=20.0, num_epochs=20, epe=5, n_train=600,
        batch_len=200, n_valid=2000, m_est=25,
    )
    key = jax.random.PRNGKey(0)
    rf = train_vae_le_awgn(cfg, key, use_pallas="frame")
    rl = train_vae_le_awgn(cfg, key, use_pallas=True)
    assert rf["ser"].shape == rl["ser"].shape == (4,)
    assert np.all(np.isfinite(rf["ser"])) and np.all(np.isfinite(rf["mi"]))
    # same config, independent key streams: SER within the run-to-run band
    np.testing.assert_allclose(rf["ser"], rl["ser"], atol=0.1)
    assert rf["params"]["w"].shape == (1, 2, M)


@pytest.mark.parametrize("mod", ["16-QAM", "64-QAM"])
def test_siso_rb_kernel_matches_single_run_stack(mod):
    """Runs-batched SISO experiment kernel == a stack of single-run calls.

    Parametrized over num_lev (16- and 64-QAM): the rb body's selection /
    stacked-sum layouts (k_st rows, pair/oneslev matrices) are
    n_lev-dependent. The in-kernel im2col must also reproduce the host-side
    arrangement exactly.
    """
    from vae_equalizer_tpu.ops.siso_frame_kernel import (
        vae_siso_experiment_train_pallas_rb,
    )

    R = 3
    const = make_constellation(mod, 0.0270955)
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var = jnp.float32(10 ** (-20.0 / 10))
    rng = np.random.default_rng(29)
    w = siso_fir_init(M)[None] + 0.01 * jnp.asarray(
        rng.normal(size=(R, 1, 2, M)).astype(np.float32)
    )
    h = dirac_taps_siso(M)[None] + 0.01 * jnp.asarray(
        rng.normal(size=(R, 2, M)).astype(np.float32)
    )
    rx = jnp.asarray(
        rng.normal(size=(R, EPOCHS, 2, NB * 2 * BL)).astype(np.float32) * 0.5
    )

    singles = []
    for r in range(R):
        opt0 = siso_frame_opt_init({"w": w[r], "h": h[r]})
        singles.append(
            vae_siso_experiment_train_pallas(
                w[r], h[r], opt0, rx[r], amps, const.amp_mean, var, P,
                jnp.float32(LR), bl_sym=BL, n_batches=NB, epe=EPE,
                interpret=True,
            )
        )

    opt0_rb = siso_frame_opt_init({"w": w, "h": h})
    w1, h1, opt1, losses, w_ev, h_ev = vae_siso_experiment_train_pallas_rb(
        w, h, opt0_rb, rx, amps, const.amp_mean, var, P, jnp.float32(LR),
        bl_sym=BL, n_batches=NB, epe=EPE, interpret=True,
    )

    n_evals = EPOCHS // EPE
    assert losses.shape == (EPOCHS * NB, R)
    assert w_ev.shape == (n_evals + 1, R, 1, 2, M)
    assert h_ev.shape == (n_evals + 1, R, 2, M)
    for r in range(R):
        w1_s, h1_s, opt1_s, losses_s, w_ev_s, h_ev_s = singles[r]
        np.testing.assert_allclose(losses[:, r], losses_s, rtol=3e-5)
        # 12 AMSGrad steps of reduction-order drift between the two
        # bodies, further amplified by the normalization VJP (sign/mean-|.|)
        np.testing.assert_allclose(w1[r], w1_s, rtol=2e-2, atol=3e-5)
        np.testing.assert_allclose(h1[r], h1_s, rtol=2e-2, atol=3e-5)
        np.testing.assert_allclose(w_ev[:, r], w_ev_s, rtol=2e-2, atol=3e-5)
        np.testing.assert_allclose(h_ev[:, r], h_ev_s, rtol=2e-2, atol=3e-5)
        for k in opt1:
            np.testing.assert_allclose(
                opt1[k][r], opt1_s[k], rtol=2e-2, atol=3e-5,
            )


def test_siso_frame_experiment_runs_batched(monkeypatch):
    """runs with use_pallas="frame" ride the runs-batched experiment kernel:
    run 0 folds the same key stream as the run-less path, so its SER must
    match up to the rb-vs-single-body reduction drift; runs are distinct."""
    import vae_equalizer_tpu.ops.siso_frame_kernel as sfk
    from vae_equalizer_tpu.train.awgn import train_vae_le_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeLeConfig

    for name in ("vae_siso_experiment_train_pallas",
                 "vae_siso_experiment_train_pallas_rb"):
        orig = getattr(sfk, name)
        monkeypatch.setattr(
            sfk, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}),
        )

    cfg = AwgnVaeLeConfig(
        mod="16-QAM", snr_db=20.0, num_epochs=8, epe=4, n_train=384,
        batch_len=128, n_valid=1500, m_est=25,
    )
    key = jax.random.PRNGKey(3)
    r1 = train_vae_le_awgn(cfg, key, use_pallas="frame")
    r2 = train_vae_le_awgn(cfg, key, runs=2, use_pallas="frame", runs_batch=2)
    assert r1["ser"].shape == (2,)
    assert r2["ser"].shape == (2, 2)
    assert r2["params"]["w"].shape == (2, 1, 2, M)
    assert np.all(np.isfinite(r2["ser"])) and np.all(np.isfinite(r2["mi"]))
    np.testing.assert_allclose(r2["ser"][0], r1["ser"], atol=0.01)
    # independent per-run channel draws -> distinct trajectories
    assert not np.allclose(r2["ser"][0], r2["ser"][1])
