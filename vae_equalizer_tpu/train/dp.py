"""Optical dual-pol processing loops: VAE / VAEflex (online training) and the
CMA / CMAbatch / CMAflex baselines.

Frame semantics follow the reference exactly
(func_VAELE_DP_MQAM_shaping.py:17-95, func_VAEflex_DP_MQAM_shaping.py:16-90,
func_CMA*_DP_MQAM_shaping.py): every frame draws fresh channel data with the
polarization angle advanced by theta_diff (time-varying channel), trains/
adapts online, and measures SER on the training outputs themselves — there is
no held-out set in the online setting. One jitted device call per frame.

SER_valid layout matches the reference: rows 0:2 = per-pol SER from the
constellation output (PCS decision boundaries), rows 2:4 = per-pol SER from
the soft-demapper posteriors (IQ-flip family).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..channels import channel_ir, make_dp_simulator
from ..core import make_constellation
from ..core.constellation import demapper_noise_var
from ..metrics import (
    cpe_dp,
    find_shift_dp,
    find_shift_symb_dp,
    ser_constell_shaping,
    ser_iqflip,
)
from ..metrics.mi import mutual_information_ambiguity
from ..models import (
    butterfly_init,
    cma_batch_dp,
    cma_dp,
    cma_flex_dp,
    dirac_taps_dp,
    soft_demap_dp,
    vae_le_dp_forward,
)
from ..models.losses import elbo_dp
from ..utils.config import DpConfig
from .batching import broadcast_runs, shard_runs
from .eval_utils import batch_cut_weight, margin_weight_maxshift, roll_dp

Progress = Callable[[int, dict], None] | None


def _setup(cfg: DpConfig):
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, _ = channel_ir(cfg.channel, cfg.sps)
    var = jnp.full((2,), demapper_noise_var(const, cfg.snr_db), jnp.float32)
    return const, h_up, var



def _dp_frame_eval(q_train, out_const, tx, amps, P, nu_sc, var, weight_fn):
    """Shared per-frame evaluation: sync -> roll -> masked SER (+MI).

    weight_fn(shift0, max_shift) builds the static-shape eval mask for the
    experiment's trim convention (per-batch edge cut for the VAE frame loop,
    plain margins for flex/CMA).
    """
    shift, r = find_shift_dp(q_train, tx, 21, amps)
    q_r = roll_dp(q_train, shift, r)
    w_q = weight_fn(shift[0], jnp.max(jnp.abs(shift)))
    ser_soft = ser_iqflip(q_r, tx, weight=w_q)
    mi = mutual_information_ambiguity(q_r, tx, amps, P, weight=w_q)

    shift_c, r_c = find_shift_symb_dp(out_const, tx, 21)
    out_r = roll_dp(out_const, shift_c, r_c)
    w_c = weight_fn(shift_c[0], jnp.max(jnp.abs(shift_c)))
    ser_const = ser_constell_shaping(out_r, tx, amps, nu_sc, var, weight=w_c)
    return ser_const, ser_soft, mi, shift, r


# Per-frame metric transport: everything is packed into ONE float32 vector on
# device and fetched with a single D2H transfer per frame. On the axon TPU
# transport each host fetch costs ~10-25 ms of tunnel latency; fetching the
# ~13 metric leaves individually dominated the frame time (measured 250 ms vs
# 14 ms of actual device compute per 10000-symbol frame).
_VAE_FIELDS = (("loss", 1), ("ser_const", 2), ("ser_soft", 2), ("mi", 2),
               ("var_est", 2), ("snr_est_db", 1), ("shift", 2), ("r", 1), ("sigma_n", 1))
_CMA_FIELDS = (("loss", 1), ("ser_const", 2), ("ser_soft", 2), ("mi", 2),
               ("shift", 2), ("r", 1), ("sigma_n", 1))


def _pack_metrics(m: dict, fields) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.atleast_1d(m[k]).astype(jnp.float32).reshape(-1) for k, _ in fields]
    )


def _unpack_metrics(v: np.ndarray, fields) -> dict:
    out, i = {}, 0
    for k, n in fields:
        out[k] = v[..., i] if n == 1 else v[..., i : i + n]
        i += n
    return out



def train_vae_dp(
    cfg: DpConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    params_init=None,
    compiled: bool = False,
    use_pallas: bool = False,
):
    """VAE-LE butterfly, online frame training on the optical DP channel.

    With ``compiled=True`` the whole experiment (all frames) runs as one
    lax.scan inside a single jitted call — no per-frame host round trips;
    ``progress`` is then unavailable. ``use_pallas=True`` computes each
    minibatch's loss and gradients with the fused in-VMEM kernel
    (ops/elbo_kernel.py) — exact f32 on a backend whose XLA matmuls are bf16;
    requires sps=2 and odd M.
    """
    const, h_up, var = _setup(cfg)
    m_max = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max * cfg.batch_len
    gen = make_dp_simulator(
        const, cfg.snr_db, h_up, n_frame, cfg.sps, cfg.symb_rate, cfg.tau_cd, cfg.tau_pmd,
        np.asarray(cfg.phi_iq),
    )
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    mb_len = cfg.batch_len * cfg.sps

    params = params_init or {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    # the reference halves only the net param group's lr after N_lrhalf frames
    # (sets it to lr*0.5 once); h_est keeps the base lr
    # (func_VAELE_DP_MQAM_shaping.py:28-31,45-46)
    thresh = cfg.n_lrhalf * m_max

    def lr_w(step):
        # float compare: thresh can exceed int32 when the scheduler is disabled
        return cfg.lr * jnp.where(step.astype(jnp.float32) >= float(thresh), 0.5, 1.0)

    opt = optax.multi_transform(
        {"w": optax.adam(lr_w), "h": optax.adam(cfg.lr)}, {"w": "w", "h": "h"}
    )
    if runs is None:
        opt_state = opt.init(params)
    else:
        params = shard_runs(broadcast_runs(params, runs), mesh)
        opt_state = jax.vmap(opt.init)(params)

    def loss_fn(p, rx_mb):
        q, out = vae_le_dp_forward(p["w"], rx_mb, amps, var, const.nu_sc, cfg.sps)
        loss, var_est = elbo_dp(q, rx_mb, p["h"], amps, P)
        return loss, (q, out, var_est)

    if use_pallas:
        if cfg.sps != 2 or cfg.m_est % 2 == 0:
            raise ValueError("use_pallas requires sps=2 and odd M_est")
        from ..ops.elbo_kernel import vae_dp_loss_and_grad_pallas

    def frame_step(params, opt_state, key, theta):
        rx, tx, sigma = gen(key, theta)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 2)
            if use_pallas:
                loss, var_est, gw, gh, q, out = vae_dp_loss_and_grad_pallas(
                    p["w"], p["h"], rx_mb, amps, var, const.nu_sc, P
                )
                g = {"w": gw, "h": gh}
            else:
                (loss, (q, out, var_est)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, rx_mb
                )
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), (loss, q, out, var_est)

        (params, opt_state), (losses, q_mb, out_mb, var_est) = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(m_max)
        )
        # (m_max, 2, C, bl) -> (2, C, m_max*bl)
        q_train = jnp.moveaxis(q_mb, 0, 2).reshape(2, 2 * const.num_lev, n_frame)
        out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_frame)

        ser_const, ser_soft, mi, shift, r = _dp_frame_eval(
            q_train, out_const, tx, amps, P, const.nu_sc, var,
            lambda s0, ms: batch_cut_weight(m_max, cfg.batch_len, s0, ms, cfg.n_cut),
        )

        var_frame = jnp.mean(var_est, axis=0)  # (2,)
        snr_est = const.pow_mean / jnp.mean(var_est)
        metrics = {
            "loss": losses[-1],
            "ser_const": ser_const,
            "ser_soft": ser_soft,
            "mi": mi,
            "var_est": var_frame,
            "snr_est_db": 10 * jnp.log10(snr_est),
            "shift": shift.astype(jnp.float32),
            "r": r,
            "sigma_n": sigma,
        }
        return params, opt_state, _pack_metrics(metrics, _VAE_FIELDS)

    # per-frame keys/thetas are precomputed so the python-loop and the
    # compiled (lax.scan over frames) modes see identical inputs
    frame_keys = jax.random.split(key, cfg.num_frames)
    thetas = jnp.float32(cfg.theta) + jnp.float32(cfg.theta_diff) * jnp.arange(
        cfg.num_frames, dtype=jnp.float32
    )
    prefix = () if runs is None else (runs,)

    if compiled:

        def scan_body(carry, inp):
            p, s = carry
            k, th = inp
            if runs is None:
                p, s, packed = frame_step(p, s, k, th)
            else:
                p, s, packed = jax.vmap(frame_step, in_axes=(0, 0, 0, None))(
                    p, s, jax.random.split(k, runs), th
                )
            return (p, s), packed

        @jax.jit
        def run_all(params, opt_state):
            return jax.lax.scan(scan_body, (params, opt_state), (frame_keys, thetas))

        (params, opt_state), packed = run_all(params, opt_state)
        hist = _unpack_metrics(np.asarray(packed), _VAE_FIELDS)  # one D2H transfer

        def tail(name):  # stacked (frames, ..., k) -> (..., k, frames)
            return np.moveaxis(np.asarray(hist[name]), 0, -1)

        ser_valid = np.concatenate([tail("ser_const"), tail("ser_soft")], axis=-2)
        return {
            "ser": ser_valid,
            "var_est": tail("var_est"),
            "mi": tail("mi"),
            "var": np.asarray(var),
            "params": params,
        }

    if runs is None:
        frame_step = jax.jit(frame_step)
        splitk = lambda k: k
    else:
        frame_step = jax.jit(jax.vmap(frame_step, in_axes=(0, 0, 0, None)))
        splitk = lambda k: jax.random.split(k, runs)
    ser_valid = np.zeros(prefix + (4, cfg.num_frames), np.float32)
    var_hist = np.zeros(prefix + (2, cfg.num_frames), np.float32)
    mi_hist = np.zeros(prefix + (2, cfg.num_frames), np.float32)
    for frame in range(cfg.num_frames):
        params, opt_state, packed = frame_step(
            params, opt_state, splitk(frame_keys[frame]), thetas[frame]
        )
        m = _unpack_metrics(np.asarray(packed), _VAE_FIELDS)  # one D2H transfer
        ser_valid[..., :2, frame] = m["ser_const"]
        ser_valid[..., 2:, frame] = m["ser_soft"]
        var_hist[..., :, frame] = m["var_est"]
        mi_hist[..., :, frame] = m["mi"]
        if progress:
            progress(frame, m)
    return {"ser": ser_valid, "var_est": var_hist, "mi": mi_hist, "var": np.asarray(var), "params": params}


def train_vae_flex_dp(
    cfg: DpConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    params_init=None,
    compiled: bool = False,
):
    """VAEflex: overlapping sliding-window minibatches with central crop."""
    const, h_up, var = _setup(cfg)
    m_max0 = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max0 * cfg.batch_len
    m_max = (n_frame - cfg.batch_len) // cfg.flex_step * cfg.flex_step
    m_step = cfg.flex_step
    n_windows = m_max // m_step
    gen = make_dp_simulator(
        const, cfg.snr_db, h_up, n_frame, cfg.sps, cfg.symb_rate, cfg.tau_cd, cfg.tau_pmd,
        np.asarray(cfg.phi_iq),
    )
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    mb_len = cfg.batch_len * cfg.sps
    crop0 = (cfg.batch_len - m_step) // 2

    params = params_init or {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    thresh = cfg.n_lrhalf * n_windows

    def lr_w(step):
        # float compare: thresh can exceed int32 when the scheduler is disabled
        return cfg.lr * jnp.where(step.astype(jnp.float32) >= float(thresh), 0.5, 1.0)

    opt = optax.multi_transform(
        {"w": optax.adam(lr_w), "h": optax.adam(cfg.lr)}, {"w": "w", "h": "h"}
    )
    if runs is None:
        opt_state = opt.init(params)
    else:
        params = shard_runs(broadcast_runs(params, runs), mesh)
        opt_state = jax.vmap(opt.init)(params)

    def loss_fn(p, rx_mb):
        q, out = vae_le_dp_forward(p["w"], rx_mb, amps, var, const.nu_sc, cfg.sps)
        loss, var_est = elbo_dp(q, rx_mb, p["h"], amps, P)
        return loss, (q, out, var_est)

    def frame_step(params, opt_state, key, theta):
        rx, tx_full, sigma = gen(key, theta)
        # ground truth for the recorded (central-crop) stream
        tx = jax.lax.dynamic_slice_in_dim(tx_full, cfg.batch_len // 2, m_max, 2)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * m_step * cfg.sps, mb_len, 2)
            (loss, (q, out, var_est)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, rx_mb)
            updates, s = opt.update(g, s, p)
            q_c = jax.lax.dynamic_slice_in_dim(q, crop0, m_step, 2)
            out_c = jax.lax.dynamic_slice_in_dim(out, crop0, m_step, 2)
            return (optax.apply_updates(p, updates), s), (loss, q_c, out_c, var_est)

        (params, opt_state), (losses, q_mb, out_mb, var_est) = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(n_windows)
        )
        q_train = jnp.moveaxis(q_mb, 0, 2).reshape(2, 2 * const.num_lev, m_max)
        out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, m_max)

        ser_const, ser_soft, mi, shift, r = _dp_frame_eval(
            q_train, out_const, tx, amps, P, const.nu_sc, var,
            lambda s0, ms: margin_weight_maxshift(m_max, ms),
        )

        var_frame = jnp.mean(var_est, axis=0)
        snr_est = const.pow_mean / jnp.mean(var_est)
        metrics = {
            "loss": losses[-1],
            "ser_const": ser_const,
            "ser_soft": ser_soft,
            "mi": mi,
            "var_est": var_frame,
            "snr_est_db": 10 * jnp.log10(snr_est),
            "shift": shift.astype(jnp.float32),
            "r": r,
            "sigma_n": sigma,
        }
        return params, opt_state, _pack_metrics(metrics, _VAE_FIELDS)

    frame_keys = jax.random.split(key, cfg.num_frames)
    thetas = jnp.float32(cfg.theta) + jnp.float32(cfg.theta_diff) * jnp.arange(
        cfg.num_frames, dtype=jnp.float32
    )
    prefix = () if runs is None else (runs,)

    if compiled:
        def scan_body(carry, inp):
            p, s = carry
            k, th = inp
            if runs is None:
                p, s, packed = frame_step(p, s, k, th)
            else:
                p, s, packed = jax.vmap(frame_step, in_axes=(0, 0, 0, None))(
                    p, s, jax.random.split(k, runs), th
                )
            return (p, s), packed

        @jax.jit
        def run_all(params, opt_state):
            return jax.lax.scan(scan_body, (params, opt_state), (frame_keys, thetas))

        (params, opt_state), packed = run_all(params, opt_state)
        hist = _unpack_metrics(np.asarray(packed), _VAE_FIELDS)

        def tail(name):
            return np.moveaxis(np.asarray(hist[name]), 0, -1)

        ser_valid = np.concatenate([tail("ser_const"), tail("ser_soft")], axis=-2)
        return {
            "ser": ser_valid,
            "var_est": tail("var_est"),
            "mi": tail("mi"),
            "var": np.asarray(var),
            "params": params,
        }

    if runs is None:
        frame_step = jax.jit(frame_step)
        splitk = lambda k: k
    else:
        frame_step = jax.jit(jax.vmap(frame_step, in_axes=(0, 0, 0, None)))
        splitk = lambda k: jax.random.split(k, runs)
    ser_valid = np.zeros(prefix + (4, cfg.num_frames), np.float32)
    var_hist = np.zeros(prefix + (2, cfg.num_frames), np.float32)
    mi_hist = np.zeros(prefix + (2, cfg.num_frames), np.float32)
    for frame in range(cfg.num_frames):
        params, opt_state, packed = frame_step(
            params, opt_state, splitk(frame_keys[frame]), thetas[frame]
        )
        m = _unpack_metrics(np.asarray(packed), _VAE_FIELDS)  # one D2H transfer
        ser_valid[..., :2, frame] = m["ser_const"]
        ser_valid[..., 2:, frame] = m["ser_soft"]
        var_hist[..., :, frame] = m["var_est"]
        mi_hist[..., :, frame] = m["mi"]
        if progress:
            progress(frame, m)
    return {"ser": ser_valid, "var_est": var_hist, "mi": mi_hist, "var": np.asarray(var), "params": params}


def run_cma_dp(
    cfg: DpConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    taps_init=None,
    use_pallas: bool = False,
    compiled: bool = False,
):
    """CMA / CMAbatch / CMAflex baseline on the optical DP channel.

    ``use_pallas=True`` runs the per-symbol CMA recurrence as the in-VMEM
    Pallas kernel (ops/cma_kernel.py, ~1.5x the lax.scan path on TPU; only
    for loss_type="CMA").

    Per frame: adapt taps online -> CPE -> sync -> constellation SER; then
    soft demapper -> sync -> posterior SER. The lr halves every n_lrhalf
    frames (multiplicatively, unlike the VAE path's one-time halving).
    """
    const, h_up, var = _setup(cfg)
    n_frame = cfg.n_frame_max
    gen = make_dp_simulator(
        const, cfg.snr_db, h_up, n_frame, cfg.sps, cfg.symb_rate, cfg.tau_cd, cfg.tau_pmd,
        np.asarray(cfg.phi_iq),
    )
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    n_sym = n_frame  # symbols per frame after downsampling
    n_eval = n_sym - 2 * cfg.n_cut

    if cfg.loss_type == "CMA":
        if use_pallas:
            from ..ops import cma_dp_pallas

            equalize = lambda rx, h, lr: cma_dp_pallas(rx, cfg.R, h, lr, cfg.sps, True)
        else:
            equalize = lambda rx, h, lr: cma_dp(rx, cfg.R, h, lr, cfg.sps, True)
    elif cfg.loss_type == "CMAbatch":
        equalize = lambda rx, h, lr: cma_batch_dp(rx, cfg.R, h, lr, cfg.batch_len, cfg.sps, True)
    elif cfg.loss_type == "CMAflex":
        equalize = lambda rx, h, lr: cma_flex_dp(
            rx, cfg.R, h, lr, cfg.batch_len, cfg.flex_step, cfg.sps, True
        )
    else:
        raise ValueError(f"unknown CMA variant {cfg.loss_type!r}")

    def frame_step(h, key, theta, lr):
        rx, tx, sigma = gen(key, theta)
        out, h, e = equalize(rx, h, lr)
        out = cpe_dp(out[:, :, cfg.n_cut : -cfg.n_cut])
        tx_c = tx[:, :, cfg.n_cut : -cfg.n_cut]

        q = soft_demap_dp(out, amps, var, const.nu_sc)
        ser_const, ser_soft, mi, _, _ = _dp_frame_eval(
            q, out, tx_c, amps, P, const.nu_sc, var,
            lambda s0, ms: margin_weight_maxshift(n_eval, ms),
        )
        shift_c, r_c = find_shift_symb_dp(out, tx_c, 21)

        metrics = {
            "loss": jnp.sum(e),
            "ser_const": ser_const,
            "ser_soft": ser_soft,
            "mi": mi,
            "shift": shift_c.astype(jnp.float32),
            "r": r_c,
            "sigma_n": sigma,
        }
        return h, _pack_metrics(metrics, _CMA_FIELDS)

    h = taps_init if taps_init is not None else dirac_taps_dp(cfg.m_est)
    frame_keys = jax.random.split(key, cfg.num_frames)
    thetas = jnp.float32(cfg.theta) + jnp.float32(cfg.theta_diff) * jnp.arange(
        cfg.num_frames, dtype=jnp.float32
    )
    lrs = jnp.float32(cfg.lr) * 0.5 ** (jnp.arange(cfg.num_frames) // cfg.n_lrhalf)
    prefix = () if runs is None else (runs,)
    if runs is not None:
        h = shard_runs(broadcast_runs(h, runs), mesh)

    if compiled:
        def scan_body(hh, inp):
            k, th, lr = inp
            if runs is None:
                hh, packed = frame_step(hh, k, th, lr)
            else:
                hh, packed = jax.vmap(frame_step, in_axes=(0, 0, None, None))(
                    hh, jax.random.split(k, runs), th, lr
                )
            return hh, packed

        @jax.jit
        def run_all(h):
            return jax.lax.scan(scan_body, h, (frame_keys, thetas, lrs))

        h, packed = run_all(h)
        hist = _unpack_metrics(np.asarray(packed), _CMA_FIELDS)

        def tail(name):
            return np.moveaxis(np.asarray(hist[name]), 0, -1)

        ser_valid = np.concatenate([tail("ser_const"), tail("ser_soft")], axis=-2)
        return {
            "ser": ser_valid,
            "var_est": np.zeros(prefix + (2, cfg.num_frames), np.float32),
            "mi": tail("mi"),
            "var": np.asarray(var),
            "taps": h,
        }

    if runs is None:
        frame_step = jax.jit(frame_step)
        splitk = lambda k: k
    else:
        frame_step = jax.jit(jax.vmap(frame_step, in_axes=(0, 0, None, None)))
        splitk = lambda k: jax.random.split(k, runs)
    ser_valid = np.zeros(prefix + (4, cfg.num_frames), np.float32)
    mi_hist = np.zeros(prefix + (2, cfg.num_frames), np.float32)
    for frame in range(cfg.num_frames):
        h, packed = frame_step(h, splitk(frame_keys[frame]), thetas[frame], lrs[frame])
        m = _unpack_metrics(np.asarray(packed), _CMA_FIELDS)  # one D2H transfer
        ser_valid[..., :2, frame] = m["ser_const"]
        ser_valid[..., 2:, frame] = m["ser_soft"]
        mi_hist[..., :, frame] = m["mi"]
        if progress:
            progress(frame, m)
    return {
        "ser": ser_valid,
        "var_est": np.zeros(prefix + (2, cfg.num_frames), np.float32),
        "mi": mi_hist,
        "var": np.asarray(var),
        "taps": h,
    }
