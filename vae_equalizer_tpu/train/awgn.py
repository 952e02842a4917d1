"""AWGN-channel processing loops: VAE-LE, VAE-NN (gradient) and CMA (no-grad).

One jitted device call per epoch (data generation + minibatch scan + optax
updates fused into a single XLA program) and one per evaluation — versus the
reference's per-minibatch Python dispatch
(func_VAELE_MQAM_shaping.py:291-322, func_VAENN_MQAM.py:265-295,
func_CMA_MQAM_shaping.py:240-256).

Every loop takes ``runs``/``mesh``: independent repeats (the reference's
``iter`` axis) are vmapped into one SPMD program and sharded over the device
mesh (see train/batching.py). With ``runs=None`` histories are scalars per
eval; with ``runs=k`` they gain a leading runs axis.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..channels import channel_ir, make_awgn_simulator
from ..core import make_constellation
from ..metrics import find_shift_siso, find_shift_symb_siso, ser_q_siso, ser_const_siso, cpe_siso
from ..metrics.mi import mutual_information_ambiguity
from ..models import (
    cma_siso,
    dirac_taps_siso,
    siso_fir_init,
    vae_le_siso_forward,
    vae_nn_init,
    vae_nn_forward,
)
from ..models.losses import elbo_siso
from ..utils.config import AwgnCmaConfig, AwgnVaeLeConfig, AwgnVaeNnConfig
from .batching import broadcast_runs, shard_runs
from .eval_utils import margin_weight, roll_time

Progress = Callable[[int, dict], None] | None


def _prepare(params, opt, runs, mesh):
    """(params, opt_state, per-call jit/vmap wrapper, key splitter)."""
    if runs is None:
        return params, opt.init(params), jax.jit, (lambda k: k)
    params = shard_runs(broadcast_runs(params, runs), mesh)
    opt_state = jax.vmap(opt.init)(params)

    def wrap(fn):
        return jax.jit(jax.vmap(fn))

    return params, opt_state, wrap, (lambda k: jax.random.split(k, runs))


def _hist(shape_prefix, num_epochs, epe):
    return np.zeros(shape_prefix + (num_epochs // epe,), np.float32)


def _run_compiled(params, opt_state, epoch_step, eval_step, key, num_epochs, epe, runs, splitk):
    """Whole-experiment lax.scan: (epe train epochs + eval) supersteps in one
    jitted call; one packed D2H transfer at the end. Reference eval ordering:
    train epoch k*epe, evaluate, train the remaining epe-1 epochs."""
    n_evals = num_epochs // epe
    train_keys = jax.random.split(key, num_epochs)
    eval_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), n_evals)
    estep = epoch_step if runs is None else jax.vmap(epoch_step)
    evstep = eval_step if runs is None else jax.vmap(eval_step)

    def super_step(carry, inp):
        p, s = carry
        tks, ek = inp  # (epe, 2) train keys + one eval key
        p, s, _ = estep(p, s, splitk(tks[0]))
        packed = evstep(p, splitk(ek))
        for i in range(1, epe):
            p, s, _ = estep(p, s, splitk(tks[i]))
        return (p, s), packed

    @jax.jit
    def run_all(params, opt_state):
        tk = train_keys[: n_evals * epe].reshape(n_evals, epe, 2)
        return jax.lax.scan(super_step, (params, opt_state), (tk, eval_keys))

    (params, opt_state), packed = run_all(params, opt_state)
    return params, np.moveaxis(np.asarray(packed), 0, -2)



def train_vae_le_awgn(
    cfg: AwgnVaeLeConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    params_init=None,
    compiled: bool = False,
):
    """VAE-LE training on the AWGN ISI channel.

    Returns dict with per-eval SER and MI histories and final params.
    Parity: processing (func_VAELE_MQAM_shaping.py:235-324). With
    ``compiled=True`` the whole experiment runs as one lax.scan inside a
    single jitted call (eval every ``epe`` epochs stays inside the scan).
    """
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, m_orig = channel_ir(cfg.channel, cfg.sps)
    gen_train = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_train, cfg.sps)
    gen_valid = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_valid, cfg.sps)
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var = 10 ** (-cfg.snr_db / 10)  # demapper variance convention of the SISO path
    amp_mean = const.amp_mean
    n_batches = cfg.n_train // cfg.batch_len
    mb_len = cfg.batch_len * cfg.sps

    params0 = params_init or {"w": siso_fir_init(cfg.m_est), "h": dirac_taps_siso(cfg.m_est)}
    opt = optax.amsgrad(cfg.lr)

    def loss_fn(p, rx_mb):
        q, _ = vae_le_siso_forward(p["w"], rx_mb, amps, amp_mean, var, cfg.sps)
        return elbo_siso(q, rx_mb, p["h"], amps, P)

    def epoch_step(params, opt_state, key):
        rx, _ = gen_train(key)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 1)
            loss, g = jax.value_and_grad(loss_fn)(p, rx_mb)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(mb, (params, opt_state), jnp.arange(n_batches))
        return params, opt_state, losses[-1]

    def eval_step(params, key):
        rx, tx = gen_valid(key)
        q, _ = vae_le_siso_forward(params["w"], rx, amps, amp_mean, var, cfg.sps)
        shift = find_shift_siso(q, tx, 21, amps)
        q_r = roll_time(q, shift)
        w = margin_weight(cfg.n_valid, shift)
        ser = ser_q_siso(q_r, tx, const.num_lev, weight=w)
        mi = mutual_information_ambiguity(q_r, tx, amps, P, weight=w)
        # one packed D2H transfer per eval (tunnel fetches cost ~10-25 ms each)
        return jnp.stack([ser, mi, shift.astype(jnp.float32)])

    params, opt_state, wrap, splitk = _prepare(params0, opt, runs, mesh)

    if compiled:
        params, packed = _run_compiled(
            params, opt_state, epoch_step, eval_step, key, cfg.num_epochs, cfg.epe, runs, splitk
        )
        return {"ser": packed[..., 0], "mi": packed[..., 1], "params": params}

    epoch_step, eval_step = wrap(epoch_step), wrap(eval_step)
    prefix = () if runs is None else (runs,)
    ser_hist, mi_hist = _hist(prefix, cfg.num_epochs, cfg.epe), _hist(prefix, cfg.num_epochs, cfg.epe)
    key_loop = key
    for epoch in range(cfg.num_epochs):
        key_loop, k1 = jax.random.split(key_loop)
        params, opt_state, loss = epoch_step(params, opt_state, splitk(k1))
        if epoch % cfg.epe == 0:
            key_loop, k2 = jax.random.split(key_loop)
            packed = np.asarray(eval_step(params, splitk(k2)))
            ser, mi, shift = packed[..., 0], packed[..., 1], packed[..., 2]
            i = epoch // cfg.epe
            ser_hist[..., i], mi_hist[..., i] = ser, mi
            if progress:
                progress(epoch, {"loss": np.asarray(loss), "ser": ser, "mi": mi, "shift": shift})
    return {"ser": ser_hist, "mi": mi_hist, "params": params}


def train_vae_nn_awgn(
    cfg: AwgnVaeNnConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    compiled: bool = False,
):
    """VAE-NN (CNN) training on the AWGN ISI channel, uniform constellation.

    Parity: processing (func_VAENN_MQAM.py:215-297) — uniform symbols, fixed
    noise convention, uniform-prior ELBO.
    """
    const = make_constellation(cfg.mod, 0.0)
    h_up, m_orig = channel_ir(cfg.channel, cfg.sps)
    gen_train = make_awgn_simulator(
        const, cfg.snr_db, h_up, m_orig, cfg.n_train, cfg.sps, fixed_noise=True
    )
    gen_valid = make_awgn_simulator(
        const, cfg.snr_db, h_up, m_orig, cfg.n_valid, cfg.sps, fixed_noise=True
    )
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    n_batches = cfg.n_train // cfg.batch_len
    mb_len = cfg.batch_len * cfg.sps

    key, k_init = jax.random.split(key)
    net_params, bn_state = vae_nn_init(
        k_init, cfg.kernel_1, cfg.kernel_2, const.num_lev, batchnorm=cfg.batchnorm
    )
    params0 = {"net": net_params, "h": dirac_taps_siso(cfg.m_est)}
    if cfg.batchnorm:
        # running BN stats ride the params pytree for uniform runs/mesh
        # handling but are frozen w.r.t. the optimizer
        params0["bn"] = bn_state
        opt = optax.multi_transform(
            {"train": optax.amsgrad(cfg.lr), "frozen": optax.set_to_zero()},
            {"net": "train", "h": "train", "bn": "frozen"},
        )
    else:
        opt = optax.amsgrad(cfg.lr)

    def loss_fn(p, rx_mb):
        if cfg.batchnorm:
            q, bn = vae_nn_forward(p["net"], rx_mb, cfg.sps, state=p["bn"], train=True)
        else:
            q, bn = vae_nn_forward(p["net"], rx_mb, cfg.sps), None
        return elbo_siso(q, rx_mb, p["h"], amps, None), bn

    def epoch_step(params, opt_state, key):
        rx, _ = gen_train(key)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 1)
            (loss, bn), g = jax.value_and_grad(loss_fn, has_aux=True)(p, rx_mb)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            if cfg.batchnorm:
                p = {**p, "bn": jax.lax.stop_gradient(bn)}
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(mb, (params, opt_state), jnp.arange(n_batches))
        return params, opt_state, losses[-1]

    def eval_step(params, key):
        rx, tx = gen_valid(key)
        if cfg.batchnorm:
            q, _ = vae_nn_forward(params["net"], rx, cfg.sps, state=params["bn"], train=False)
        else:
            q = vae_nn_forward(params["net"], rx, cfg.sps)
        shift = find_shift_siso(q, tx, 21, amps)
        q_r = roll_time(q, shift)
        w = margin_weight(cfg.n_valid, shift)
        ser = ser_q_siso(q_r, tx, const.num_lev, weight=w)
        mi = mutual_information_ambiguity(q_r, tx, amps, P, weight=w)
        # one packed D2H transfer per eval (tunnel fetches cost ~10-25 ms each)
        return jnp.stack([ser, mi, shift.astype(jnp.float32)])

    params, opt_state, wrap, splitk = _prepare(params0, opt, runs, mesh)

    if compiled:
        params, packed = _run_compiled(
            params, opt_state, epoch_step, eval_step, key, cfg.num_epochs, cfg.epe, runs, splitk
        )
        return {"ser": packed[..., 0], "mi": packed[..., 1], "params": params}

    epoch_step, eval_step = wrap(epoch_step), wrap(eval_step)
    prefix = () if runs is None else (runs,)
    ser_hist, mi_hist = _hist(prefix, cfg.num_epochs, cfg.epe), _hist(prefix, cfg.num_epochs, cfg.epe)
    key_loop = key
    for epoch in range(cfg.num_epochs):
        key_loop, k1 = jax.random.split(key_loop)
        params, opt_state, loss = epoch_step(params, opt_state, splitk(k1))
        if epoch % cfg.epe == 0:
            key_loop, k2 = jax.random.split(key_loop)
            packed = np.asarray(eval_step(params, splitk(k2)))
            ser, mi, shift = packed[..., 0], packed[..., 1], packed[..., 2]
            i = epoch // cfg.epe
            ser_hist[..., i], mi_hist[..., i] = ser, mi
            if progress:
                progress(epoch, {"loss": np.asarray(loss), "ser": ser, "mi": mi, "shift": shift})
    return {"ser": ser_hist, "mi": mi_hist, "params": params}


def run_cma_awgn(
    cfg: AwgnCmaConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
):
    """CMA baseline on the AWGN ISI channel (no autograd).

    Parity: processing (func_CMA_MQAM_shaping.py:201-256) — per-epoch tap
    adaptation on fresh data; eval on frozen taps + Viterbi-Viterbi CPE.
    """
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, m_orig = channel_ir(cfg.channel, cfg.sps)
    gen_train = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_train, cfg.sps)
    gen_valid = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_valid, cfg.sps)
    amps = jnp.asarray(const.amps)

    def train_step(h, key):
        rx, _ = gen_train(key)
        out, h, e = cma_siso(rx, cfg.R, h, cfg.lr, cfg.sps, True)
        return h, jnp.mean(jnp.abs(e))

    def eval_step(h, key):
        rx, tx = gen_valid(key)
        out, _, _ = cma_siso(rx, cfg.R, h, cfg.lr, cfg.sps, False)
        out = cpe_siso(out)
        shift = find_shift_symb_siso(out, tx, 21)
        out_r = roll_time(out, shift)
        w = margin_weight(cfg.n_valid, shift)
        ser = ser_const_siso(out_r, tx, amps, weight=w)
        return jnp.stack([ser, shift.astype(jnp.float32)])

    h = dirac_taps_siso(cfg.m_est)
    if runs is None:
        wrap, splitk = jax.jit, (lambda k: k)
    else:
        h = shard_runs(broadcast_runs(h, runs), mesh)
        wrap, splitk = (lambda f: jax.jit(jax.vmap(f))), (lambda k: jax.random.split(k, runs))
    train_step, eval_step = wrap(train_step), wrap(eval_step)

    prefix = () if runs is None else (runs,)
    ser_hist = _hist(prefix, cfg.num_epochs, cfg.epe)
    key_loop = key
    for epoch in range(cfg.num_epochs):
        key_loop, k1 = jax.random.split(key_loop)
        h, loss = train_step(h, splitk(k1))
        if epoch % cfg.epe == 0:
            key_loop, k2 = jax.random.split(key_loop)
            packed = np.asarray(eval_step(h, splitk(k2)))
            ser_hist[..., epoch // cfg.epe] = packed[..., 0]
            if progress:
                progress(epoch, {"loss": np.asarray(loss), "ser": packed[..., 0], "shift": packed[..., 1]})
    return {"ser": ser_hist, "taps": h}
