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

All three experiments share one transport (``_run_epochs``): a jitted
``epoch_step(carry, key) -> (carry, loss)`` and ``eval_step(carry, key) ->
packed`` driven either from a Python loop or as one whole-experiment
lax.scan (``compiled=True``; eval ordering matches the reference — train
epoch k*epe, evaluate, train the remaining epe-1 epochs).
"""

from __future__ import annotations

import pathlib

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
    soft_demap_dp,
    vae_le_siso_forward,
    vae_nn_init,
    vae_nn_forward,
)
from ..models.losses import elbo_siso
from ..utils.config import AwgnCmaConfig, AwgnVaeLeConfig, AwgnVaeNnConfig
from .batching import broadcast_runs, shard_runs
from .eval_utils import margin_weight, roll_time
from .harness import Progress, _load_state, _save_state, init_carry

# eval_step packs these into ONE float32 vector -> ONE D2H transfer per eval
# (tunnel fetches cost ~10-25 ms each)
_EVAL_NAMES = ("ser", "mi", "shift")


def _run_epochs(
    epoch_step,
    eval_step,
    carry,
    key: jax.Array,
    num_epochs: int,
    epe: int,
    runs: int | None,
    progress: Progress,
    compiled: bool,
    names=_EVAL_NAMES,
    checkpoint=None,
    checkpoint_every: int = 0,
    timings: dict | None = None,
):
    """Drive (epoch_step, eval_step) over an experiment; eval every ``epe``.

    Returns (carry, hist) with hist[name] of shape (*runs_prefix, n_evals).
    When ``epe`` does not divide ``num_epochs`` the trailing partial block
    trains without an eval slot (both modes record exactly n_evals evals).

    ``checkpoint``/``checkpoint_every``: loop-mode epoch counterpart of
    run_frame_loop's mid-experiment resume — (epoch index, carry, key chain,
    histories) persist every K epochs and a killed run restarts from the
    last snapshot bit-identically. Ignored in compiled mode.
    """
    n_evals = num_epochs // epe
    if runs is None:
        estep, evstep = epoch_step, eval_step
        splitk = lambda k: k
    else:
        estep, evstep = jax.vmap(epoch_step), jax.vmap(eval_step)
        splitk = lambda k: jax.random.split(k, runs)

    if compiled:
        # whole-experiment lax.scan: (epe train epochs + eval) supersteps in
        # one jitted call; one packed D2H transfer at the end
        train_keys = jax.random.split(key, num_epochs)
        eval_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), n_evals)

        def super_step(c, inp):
            tks, ek = inp  # (epe, 2) train keys + one eval key
            c, _ = estep(c, splitk(tks[0]))
            packed = evstep(c, splitk(ek))
            for i in range(1, epe):
                c, _ = estep(c, splitk(tks[i]))
            return c, packed

        @jax.jit
        def run_all(c):
            tk = train_keys[: n_evals * epe].reshape(n_evals, epe, 2)
            return jax.lax.scan(super_step, c, (tk, eval_keys))

        if timings is None:
            carry, packed = run_all(carry)
        else:
            # profiling hook: AOT-compile, then best-of-3 pure executions
            # (same protocol as harness.run_frame_loop)
            import time

            t0 = time.perf_counter()
            run_all_c = run_all.lower(carry).compile()
            timings["compile_s"] = time.perf_counter() - t0
            best, out = None, None
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(run_all_c(carry))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings["run_s"] = best
            carry, packed = out
        packed = np.moveaxis(np.asarray(packed), 0, -2)  # (..., n_evals, k)
        return carry, {n: packed[..., j] for j, n in enumerate(names)}

    estep, evstep = jax.jit(estep), jax.jit(evstep)
    prefix = () if runs is None else (runs,)
    hist = {n: np.zeros(prefix + (n_evals,), np.float32) for n in names}
    key_loop = key
    start = 0
    ckpt = pathlib.Path(checkpoint) if checkpoint else None
    if ckpt and ckpt.exists():
        start, (carry, key_loop) = _load_state(ckpt, (carry, key_loop), hist)
    for epoch in range(start, num_epochs):
        key_loop, k1 = jax.random.split(key_loop)
        carry, loss = estep(carry, splitk(k1))
        if epoch % epe == 0 and epoch // epe < n_evals:
            key_loop, k2 = jax.random.split(key_loop)
            packed = np.asarray(evstep(carry, splitk(k2)))
            i = epoch // epe
            for j, n in enumerate(names):
                hist[n][..., i] = packed[..., j]
            if progress:
                progress(epoch, {"loss": np.asarray(loss),
                                 **{n: packed[..., j] for j, n in enumerate(names)}})
        if (ckpt and checkpoint_every and (epoch + 1) % checkpoint_every == 0
                and epoch + 1 < num_epochs):
            _save_state(ckpt, epoch + 1, (carry, key_loop), hist)
    return carry, hist


def _siso_eval_pack(q, tx, n_valid, const, amps, P):
    """Shared posterior eval: sync -> roll -> masked SER + MI, packed."""
    shift = find_shift_siso(q, tx, 21, amps)
    q_r = roll_time(q, shift)
    w = margin_weight(n_valid, shift)
    ser = ser_q_siso(q_r, tx, const.num_lev, weight=w)
    mi = mutual_information_ambiguity(q_r, tx, amps, P, weight=w)
    return jnp.stack([ser, mi, shift.astype(jnp.float32)])


def _run_siso_frame_experiment(
    cfg, key, gen_train, gen_valid, const, amps, P, var, amp_mean,
    n_batches, params0, runs, mesh, timings=None, runs_batch=None,
):
    """use_pallas="frame" driver: whole-experiment kernel + batched eval.

    All channel data is generated in one vmapped call, the kernel trains
    every epoch in one grid, and the n_evals evaluations run as ONE batched
    program over the parameter snapshots the kernel streamed out — the
    reference's serial eval-every-epe-epochs loop has no data dependence
    between evals, so this is semantics-preserving up to key streams.

    With ``runs`` set, repeats execute in kernel-level batches of
    ``runs_batch`` (default: largest divisor of runs <= 8) through the
    runs-batched experiment kernel — one grid step trains one minibatch of
    all rb runs; remaining runs/rb groups ride a vmap of the kernel call
    ONLY (a vmapped pallas_call serializes its grid steps; channel
    generation and the evals batch over ALL runs as plain XLA).
    """
    from ..ops.siso_frame_kernel import (
        siso_frame_opt_init,
        vae_siso_experiment_train_pallas,
        vae_siso_experiment_train_pallas_rb,
    )
    from .batching import shard_runs
    from .dp import _default_runs_batch

    n_evals = cfg.num_epochs // cfg.epe
    train_keys = jax.random.split(key, cfg.num_epochs)
    eval_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), n_evals)

    def one_run(key_run):
        tks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(train_keys, key_run[0])
        eks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(eval_keys, key_run[0])
        rx_all, _ = jax.vmap(gen_train)(tks)  # (E, 2, n_samp)
        opt0 = siso_frame_opt_init(params0)
        w1, h1, opt1, losses, w_ev, h_ev = vae_siso_experiment_train_pallas(
            params0["w"], params0["h"], opt0, rx_all, amps, amp_mean, var, P,
            jnp.float32(cfg.lr), bl_sym=cfg.batch_len, n_batches=n_batches,
            epe=cfg.epe,
        )

        def one_eval(w_e, ek):
            rx_v, tx_v = gen_valid(ek)
            q, _ = vae_le_siso_forward(w_e, rx_v, amps, amp_mean, var, cfg.sps)
            return _siso_eval_pack(q, tx_v, cfg.n_valid, const, amps, P)

        # lax.map (sequential scan), not vmap: batching all n_evals
        # validation forwards at once materializes a (n_evals, 2, n_samp)
        # operand whose bf16 copy this backend lays out with the size-2 pol
        # dim in lanes — a 256x padding blowup that exceeded HBM at the
        # compile step for the rb case (round-5 awgn_tpu_bench log)
        packed = jax.lax.map(lambda p_: one_eval(*p_), (w_ev[:n_evals], eks))
        return packed, {"w": w1, "h": h1}

    def _timed(fn):
        if timings is None:
            return fn()
        import time

        t0 = time.perf_counter()
        fn_c = fn.lower().compile()
        timings["compile_s"] = time.perf_counter() - t0
        best, out = None, None
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn_c())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings["run_s"] = best
        return out

    if runs is None:
        packed, params = _timed(
            jax.jit(lambda: one_run(jnp.zeros((1,), jnp.uint32)))
        )
        packed = np.asarray(packed)
    else:
        rb = runs_batch or _default_runs_batch(runs)
        if runs % rb != 0:
            raise ValueError(f"runs_batch={rb} must divide runs={runs}")
        groups = runs // rb
        run_ids = jnp.arange(runs, dtype=jnp.uint32).reshape(runs, 1)
        run_ids = shard_runs(run_ids, mesh)

        def gen_run(key_run):
            tks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                train_keys, key_run[0]
            )
            rx_all, _ = jax.vmap(gen_train)(tks)  # (E, 2, n_samp)
            return rx_all

        def eval_all(w_ev_r):
            # (runs, n_evals) eval grid, sequential over EVALS (lax.map)
            # with all runs batched per step. The per-run forward is the
            # im2col batched dot (vae_le_siso_forward_runs): a vmapped conv
            # with per-run filters lowered through a 256x-padded copy on
            # this backend — it was 7.4 s of the 7.7 s 20-run aggregate
            # (round-5 probe) — and the kernel+gen are 0.13 s without it.
            from ..models import vae_le_siso_forward_runs

            eks_r = jax.vmap(
                lambda rid: jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                    eval_keys, rid[0]
                )
            )(run_ids)  # (runs, n_evals, 2)

            def one_eval_all(inp):
                w_e, eks = inp  # (runs, 1, 2, M), (runs, 2)
                rx_v, tx_v = jax.vmap(gen_valid)(eks)
                q, _ = vae_le_siso_forward_runs(
                    w_e, rx_v, amps, amp_mean, var, cfg.sps
                )
                return jax.vmap(
                    lambda qq, tt: _siso_eval_pack(
                        qq, tt, cfg.n_valid, const, amps, P
                    )
                )(q, tx_v)

            w_ev_t = jnp.moveaxis(w_ev_r[:, :n_evals], 0, 1)
            eks_t = jnp.moveaxis(eks_r, 0, 1)  # (n_evals, runs, 2)
            packed = jax.lax.map(one_eval_all, (w_ev_t, eks_t))
            return jnp.moveaxis(packed, 0, 1)  # (runs, n_evals, 3)

        def agg():
            rx_r = jax.vmap(gen_run)(run_ids)  # (runs, E, 2, n_samp)
            rx_g = rx_r.reshape((groups, rb) + rx_r.shape[1:])
            w0 = jnp.broadcast_to(
                params0["w"], (groups, rb) + params0["w"].shape
            )
            h0 = jnp.broadcast_to(
                params0["h"], (groups, rb) + params0["h"].shape
            )
            opt0 = siso_frame_opt_init({"w": w0, "h": h0})

            def kgroup(wg, hg, og, rxg):
                return vae_siso_experiment_train_pallas_rb(
                    wg, hg, og, rxg, amps, amp_mean, var, P,
                    jnp.float32(cfg.lr), bl_sym=cfg.batch_len,
                    n_batches=n_batches, epe=cfg.epe,
                )

            w1, h1, _, _, w_ev, _ = jax.vmap(kgroup)(w0, h0, opt0, rx_g)
            # (groups, n_evals+1, rb, ...) -> per-run (runs, n_evals+1, ...)
            w_ev_r = jnp.moveaxis(w_ev, 2, 1).reshape(
                (runs, n_evals + 1) + w_ev.shape[3:]
            )
            packed = eval_all(w_ev_r)  # (runs, n_evals, 3)
            flat = lambda a: a.reshape((runs,) + a.shape[2:])
            return packed, {"w": flat(w1), "h": flat(h1)}

        packed, params = _timed(jax.jit(agg))
        packed = np.asarray(packed)
    hist = {n: packed[..., j] for j, n in enumerate(_EVAL_NAMES)}
    return {"ser": hist["ser"], "mi": hist["mi"], "params": params}


def train_vae_le_awgn(
    cfg: AwgnVaeLeConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    params_init=None,
    compiled: bool = False,
    use_pallas: bool = False,
    checkpoint=None,
    checkpoint_every: int = 0,
    timings: dict | None = None,
    runs_batch: int | None = None,
):
    """VAE-LE training on the AWGN ISI channel.

    Returns dict with per-eval SER and MI histories and final params.
    Parity: processing (func_VAELE_MQAM_shaping.py:235-324). With
    ``compiled=True`` the whole experiment runs as one lax.scan inside a
    single jitted call (eval every ``epe`` epochs stays inside the scan).
    ``use_pallas=True`` computes each minibatch's loss and gradients with
    the fused in-VMEM SISO kernel (ops/elbo_siso_kernel.py) — exact f32 on a
    backend whose XLA matmuls are bf16; requires sps=2 and odd M.
    ``use_pallas="frame"`` runs ALL epochs' minibatch steps + AMSGrad as ONE
    MXU-based pallas_call (ops/siso_frame_kernel.py) and the per-eval-epoch
    evaluations VECTORIZED afterwards (parameters stream out of the kernel
    at the reference's eval points); its key streams are the compiled
    mode's, so trajectories are statistically (not bitwise) comparable to
    the loop mode, and ``checkpoint``/``progress`` are unavailable. With
    ``runs`` set the frame path trains ``runs_batch`` repeats per grid step
    through the runs-batched experiment kernel (see
    _run_siso_frame_experiment).
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

    if use_pallas == "frame":
        if cfg.sps != 2 or cfg.m_est % 2 == 0:
            raise ValueError("use_pallas requires sps=2 and odd M_est")
        if checkpoint:
            raise ValueError('use_pallas="frame" runs the whole experiment '
                             "in one call; checkpointing is unavailable")
        return _run_siso_frame_experiment(
            cfg, key, gen_train, gen_valid, const, amps, P,
            jnp.float32(var), amp_mean, n_batches, params0, runs, mesh,
            timings=timings, runs_batch=runs_batch,
        )

    opt = optax.amsgrad(cfg.lr)

    def loss_fn(p, rx_mb):
        q, _ = vae_le_siso_forward(p["w"], rx_mb, amps, amp_mean, var, cfg.sps)
        return elbo_siso(q, rx_mb, p["h"], amps, P)

    if use_pallas:
        if cfg.sps != 2 or cfg.m_est % 2 == 0:
            raise ValueError("use_pallas requires sps=2 and odd M_est")
        from ..ops.elbo_siso_kernel import vae_siso_loss_and_grad_pallas

    def epoch_step(carry, key):
        params, opt_state = carry
        rx, _ = gen_train(key)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 1)
            if use_pallas:
                loss, gw, gh, _, _ = vae_siso_loss_and_grad_pallas(
                    p["w"], p["h"], rx_mb, amps, amp_mean, var, P
                )
                g = {"w": gw, "h": gh}
            else:
                loss, g = jax.value_and_grad(loss_fn)(p, rx_mb)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(mb, (params, opt_state), jnp.arange(n_batches))
        return (params, opt_state), losses[-1]

    def eval_step(carry, key):
        rx, tx = gen_valid(key)
        q, _ = vae_le_siso_forward(carry[0]["w"], rx, amps, amp_mean, var, cfg.sps)
        return _siso_eval_pack(q, tx, cfg.n_valid, const, amps, P)

    carry = init_carry(params0, opt, runs, mesh)
    (params, _), hist = _run_epochs(
        epoch_step, eval_step, carry, key, cfg.num_epochs, cfg.epe, runs, progress, compiled,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    return {"ser": hist["ser"], "mi": hist["mi"], "params": params}


def _run_nn_frame_experiment(
    cfg, key, gen_train, gen_valid, const, amps, P,
    n_batches, params0, bn_state, runs, mesh, timings=None,
):
    """use_pallas="frame" driver for VAE-NN: whole-experiment kernel +
    batched eval (the CNN analog of _run_siso_frame_experiment). With
    ``bn_state`` (Net_BN) gamma/beta train and the running stats update
    in-kernel; evals use the streamed running stats (train=False)."""
    from ..ops.nn_frame_kernel import (
        flatten_nn_params,
        nn_frame_opt_init,
        unflatten_nn_params,
        vae_nn_experiment_train_pallas,
    )
    from ..ops.nn_frame_kernel import _to_parity_major as _h_pm
    from .batching import shard_runs

    n_evals = cfg.num_epochs // cfg.epe
    train_keys = jax.random.split(key, cfg.num_epochs)
    eval_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), n_evals)
    w1f0, w2f0 = flatten_nn_params(params0["net"])
    h_pm0 = _h_pm(params0["h"])
    if cfg.batchnorm:
        bn0 = (
            jnp.stack([params0["net"]["bn_scale"],
                       params0["net"]["bn_bias"]], axis=1),
            jnp.stack([bn_state["mean"], bn_state["var"]], axis=1),
        )
        momentum = bn_state["momentum"]
    else:
        bn0, momentum = None, 0.1

    def one_run(key_run):
        tks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(train_keys, key_run[0])
        eks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(eval_keys, key_run[0])
        rx_all, _ = jax.vmap(gen_train)(tks)  # (E, 2, n_samp)
        opt0 = nn_frame_opt_init(w1f0, w2f0, h_pm0)
        (w1f, w2f, h1, bnp1, rs1, opt1, losses,
         w1_ev, w2_ev, h_ev, bnp_ev, rs_ev) = vae_nn_experiment_train_pallas(
            w1f0, w2f0, params0["h"], opt0, rx_all, amps,
            jnp.float32(cfg.lr), bn=bn0, momentum=momentum,
            bl_sym=cfg.batch_len, n_batches=n_batches, epe=cfg.epe,
            k1=cfg.kernel_1,
        )

        def net_of(w1_e, w2_e, bnp_e):
            net = unflatten_nn_params(w1_e, w2_e, cfg.kernel_1)
            if cfg.batchnorm:
                net["bn_scale"] = bnp_e[:, 0]
                net["bn_bias"] = bnp_e[:, 1]
            return net

        def one_eval(w1_e, w2_e, bnp_e, rs_e, ek):
            rx_v, tx_v = gen_valid(ek)
            net = net_of(w1_e, w2_e, bnp_e)
            if cfg.batchnorm:
                state = {"mean": rs_e[:, 0], "var": rs_e[:, 1],
                         "momentum": momentum}
                q, _ = vae_nn_forward(net, rx_v, cfg.sps, state=state,
                                      train=False)
            else:
                q = vae_nn_forward(net, rx_v, cfg.sps)
            return _siso_eval_pack(q, tx_v, cfg.n_valid, const, amps, P)

        packed = jax.vmap(one_eval)(
            w1_ev[:n_evals], w2_ev[:n_evals], bnp_ev[:n_evals],
            rs_ev[:n_evals], eks)
        return packed, {"net": net_of(w1f, w2f, bnp1), "h": h1}

    if runs is None:
        fn = jax.jit(lambda: one_run(jnp.zeros((1,), jnp.uint32)))
        if timings is None:
            packed, params = fn()
        else:
            import time

            t0 = time.perf_counter()
            fn_c = fn.lower().compile()
            timings["compile_s"] = time.perf_counter() - t0
            best, out = None, None
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn_c())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings["run_s"] = best
            packed, params = out
        packed = np.asarray(packed)
    else:
        run_ids = jnp.arange(runs, dtype=jnp.uint32).reshape(runs, 1)
        run_ids = shard_runs(run_ids, mesh)
        packed, params = jax.jit(jax.vmap(one_run))(run_ids)
        packed = np.asarray(packed)
    hist = {n: packed[..., j] for j, n in enumerate(_EVAL_NAMES)}
    return {"ser": hist["ser"], "mi": hist["mi"], "params": params}


def train_vae_nn_awgn(
    cfg: AwgnVaeNnConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    compiled: bool = False,
    use_pallas: bool | str = False,
    checkpoint=None,
    checkpoint_every: int = 0,
    timings: dict | None = None,
):
    """VAE-NN (CNN) training on the AWGN ISI channel, uniform constellation.

    Parity: processing (func_VAENN_MQAM.py:215-297) — uniform symbols, fixed
    noise convention, uniform-prior ELBO. ``use_pallas="frame"`` runs ALL
    epochs' minibatch steps + AMSGrad as ONE MXU pallas_call
    (ops/nn_frame_kernel.py: conv1/conv2 as single matmuls with biases
    folded through ones rows, stride-2 phases via selection matmuls) and
    the evaluations vectorized over the streamed parameter snapshots —
    requires sps=2, odd m_est and kernel_2=3. Net_BN is supported: gamma/
    beta train and the running stats update in-kernel; evals use the
    streamed running stats. (There is no per-step NN kernel mode.)
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
    if use_pallas == "frame":
        if cfg.sps != 2 or cfg.m_est % 2 == 0 or cfg.kernel_2 != 3:
            raise ValueError(
                'use_pallas="frame" requires sps=2, odd m_est and kernel_2=3')
        if checkpoint:
            raise ValueError('use_pallas="frame" runs the whole experiment '
                             "in one call; checkpointing is unavailable")
        return _run_nn_frame_experiment(
            cfg, key, gen_train, gen_valid, const, amps, P, n_batches,
            params0, bn_state, runs, mesh, timings=timings,
        )
    elif use_pallas:
        raise ValueError(
            "VAE-NN has no per-step kernel mode; use use_pallas='frame'")
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

    def epoch_step(carry, key):
        params, opt_state = carry
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
        return (params, opt_state), losses[-1]

    def eval_step(carry, key):
        params = carry[0]
        rx, tx = gen_valid(key)
        if cfg.batchnorm:
            q, _ = vae_nn_forward(params["net"], rx, cfg.sps, state=params["bn"], train=False)
        else:
            q = vae_nn_forward(params["net"], rx, cfg.sps)
        return _siso_eval_pack(q, tx, cfg.n_valid, const, amps, P)

    carry = init_carry(params0, opt, runs, mesh)
    (params, _), hist = _run_epochs(
        epoch_step, eval_step, carry, key, cfg.num_epochs, cfg.epe, runs, progress, compiled,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    return {"ser": hist["ser"], "mi": hist["mi"], "params": params}


def run_cma_awgn(
    cfg: AwgnCmaConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    compiled: bool = False,
    checkpoint=None,
    checkpoint_every: int = 0,
    timings: dict | None = None,
):
    """CMA baseline on the AWGN ISI channel (no autograd).

    Parity: processing (func_CMA_MQAM_shaping.py:201-256) — per-epoch tap
    adaptation on fresh data; eval on frozen taps + Viterbi-Viterbi CPE.
    The MI history (soft_dec posteriors on the CPE output, matching the DP
    CMA path's convention) is a capability the reference lacks for SISO CMA.
    """
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, m_orig = channel_ir(cfg.channel, cfg.sps)
    gen_train = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_train, cfg.sps)
    gen_valid = make_awgn_simulator(const, cfg.snr_db, h_up, m_orig, cfg.n_valid, cfg.sps)
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var_q = jnp.full((1,), 10 ** (-cfg.snr_db / 10), jnp.float32)

    def epoch_step(h, key):
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
        # soft posteriors on the synchronized output (1-pol soft_dec) -> MI
        q = soft_demap_dp(out_r[None], amps, var_q, const.nu_sc)[0]
        mi = mutual_information_ambiguity(q, tx, amps, P, weight=w)
        return jnp.stack([ser, mi, shift.astype(jnp.float32)])

    h = dirac_taps_siso(cfg.m_est)
    if runs is not None:
        h = shard_runs(broadcast_runs(h, runs), mesh)
    h, hist = _run_epochs(
        epoch_step, eval_step, h, key, cfg.num_epochs, cfg.epe, runs, progress, compiled,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    return {"ser": hist["ser"], "mi": hist["mi"], "taps": h}
