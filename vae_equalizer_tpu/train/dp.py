"""Optical dual-pol processing loops: VAE / VAEflex (online training) and the
CMA / CMAbatch / CMAflex baselines.

Frame semantics follow the reference exactly
(func_VAELE_DP_MQAM_shaping.py:17-95, func_VAEflex_DP_MQAM_shaping.py:16-90,
func_CMA*_DP_MQAM_shaping.py): every frame draws fresh channel data with the
polarization angle advanced by theta_diff (time-varying channel), trains/
adapts online, and measures SER on the training outputs themselves — there is
no held-out set in the online setting. One jitted device call per frame (or
one for the whole experiment with ``compiled=True``); frame transport lives
in train/harness.py.

SER_valid layout matches the reference: rows 0:2 = per-pol SER from the
constellation output (PCS decision boundaries), rows 2:4 = per-pol SER from
the soft-demapper posteriors (IQ-flip family).
"""

from __future__ import annotations

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
    find_shift_dp_mb,
    find_shift_symb_dp,
    iqflip_decisions_mb,
    ser_constell_shaping,
    ser_iqflip,
    ser_iqflip_from_dec,
)
from ..metrics.ser import _decode_levels
from ..metrics.mi import (
    mutual_information_ambiguity,
    mutual_information_ambiguity_mb_sp,
    mutual_information_ambiguity_mb_stats,
)
from ..metrics.sync import _dp_shift_core
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
from .eval_utils import (
    align_idx_dp,
    align_tx_dp,
    batch_cut_weight,
    margin_weight_maxshift,
)
from .harness import Progress, init_carry, pack_metrics, run_frame_loop
from .modes import check_pallas_mode


# Correlation window for the per-frame sync searches (both the E_q and the
# constellation-output sync). A contiguous prefix window: the blind delay is
# global, so 2000 symbols give a ~sqrt(2000) ≈ 45:1 peak margin while cutting
# the (21, 2, N) roll-stack HBM traffic 5x at N=10000 — the sync stages of the
# runs-batched aggregate eval are bandwidth-bound (PARITY_RESULTS round 4).
# The reference's own SISO sync uses a 1000-symbol window
# (func_CMA_MQAM_shaping.py:127-140); its DP sync correlates the full frame
# (shared_funcs.py:297) — shift parity is statistical, SER-band tested.
_SYNC_CORR_LEN = 2000


def _setup(cfg: DpConfig, n_frame: int):
    """Constellation, demapper variance and the jitted channel generator."""
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, _ = channel_ir(cfg.channel, cfg.sps)
    var = jnp.full((2,), demapper_noise_var(const, cfg.snr_db), jnp.float32)
    gen = make_dp_simulator(
        const, cfg.snr_db, h_up, n_frame, cfg.sps, cfg.symb_rate, cfg.tau_cd,
        cfg.tau_pmd, np.asarray(cfg.phi_iq),
    )
    return const, var, gen, jnp.asarray(const.amps), jnp.asarray(const.P, jnp.float32)


def _frame_inputs(cfg: DpConfig, key: jax.Array):
    """Per-frame keys + polarization angles (theta drift), precomputed so the
    python-loop and compiled (lax.scan) modes see identical inputs."""
    frame_keys = jax.random.split(key, cfg.num_frames)
    thetas = jnp.float32(cfg.theta) + jnp.float32(cfg.theta_diff) * jnp.arange(
        cfg.num_frames, dtype=jnp.float32
    )
    return frame_keys, thetas


def _vae_optimizer(cfg: DpConfig, steps_per_frame: int):
    """Adam with the reference's one-time lr halving on the net group only:
    after n_lrhalf frames w's lr is set to lr*0.5 once; h_est keeps the base
    lr (func_VAELE_DP_MQAM_shaping.py:28-31,45-46)."""
    thresh = cfg.n_lrhalf * steps_per_frame

    def lr_w(step):
        # float compare: thresh can exceed int32 when the scheduler is disabled
        return cfg.lr * jnp.where(step.astype(jnp.float32) >= float(thresh), 0.5, 1.0)

    return optax.multi_transform(
        {"w": optax.adam(lr_w), "h": optax.adam(cfg.lr)}, {"w": "w", "h": "h"}
    )


def _dp_frame_eval(q_train, out_const, tx, amps, P, nu_sc, var, weight_fn):
    """Shared per-frame evaluation: sync -> align tx -> masked SER (+MI).

    weight_fn(shift0, max_shift) builds the static-shape eval mask for the
    experiment's trim convention (per-batch edge cut for the VAE frame loop,
    plain margins for flex/CMA).

    The sync compensation rolls tx + weight into the equalizer's frame
    (``align_tx_dp``) instead of rolling the equalizer tensors into tx's
    (``roll_dp``): the same (pair, weight) multiset, but the rolled arrays
    are (2, 2, N) instead of the (2, 2*num_lev, N) posteriors — the eval
    stage of the runs-batched aggregate pipeline is HBM-bandwidth-bound
    (PARITY_RESULTS round-3 saturation analysis).
    """
    shift, r = find_shift_dp(q_train, tx, 21, amps, corr_len=_SYNC_CORR_LEN)
    w_q = weight_fn(shift[0], jnp.max(jnp.abs(shift)))
    tx_al, w_al = align_tx_dp(tx, shift, r, w_q)
    # aligned metrics are per EQUALIZER pol j; report per tx pol i=(j+r)%2
    ser_soft = jnp.roll(ser_iqflip(q_train, tx_al, weight=w_al), r)
    mi = jnp.roll(
        mutual_information_ambiguity(q_train, tx_al, amps, P, weight=w_al), r
    )

    shift_c, r_c = find_shift_symb_dp(out_const, tx, 21, corr_len=_SYNC_CORR_LEN)
    w_c = weight_fn(shift_c[0], jnp.max(jnp.abs(shift_c)))
    tx_al_c, w_al_c = align_tx_dp(tx, shift_c, r_c, w_c)
    ser_const = jnp.roll(
        ser_constell_shaping(out_const, tx_al_c, amps, nu_sc, var, weight=w_al_c),
        r_c,
    )
    return ser_const, ser_soft, mi, shift, r


def _dp_frame_eval_mb(q_mb, out_const, tx, amps, P, nu_sc, var, weight_fn,
                      dec_mb=None, eq_mb=None, out_mb=None, mm_mb=None,
                      s1_mb=None):
    """``_dp_frame_eval`` with the posteriors kept in MINIBATCH layout.

    q_mb: (n_mb, 2, 2*num_lev, bl), the training kernel's native output
    (time index t = mb*bl + tau); out_const: (2, 2, N) packed constellation
    stream (16x smaller than q — packing it is cheap). Numerically the same
    metrics as ``_dp_frame_eval`` on the packed q: the heavy posterior
    reductions (E_q[x^I], argmax decisions, log2-selections) run in the mb
    layout as single fused passes, so the (2, 2n, N) posterior tensor is
    never materialized or transposed — the eval stage of the runs-batched
    aggregate pipeline is HBM-bandwidth-bound (PARITY_RESULTS round 3).

    With the kernel's in-kernel eval streams (round 4) — dec_mb
    (n_mb, 2, 2, bl) argmax level indices, eq_mb (n_mb, 2, bl) E_q[x^I] —
    the sync and the soft-SER never read the posterior stream at all; with
    the round-5 demapper sufficient statistics (mm_mb/s1_mb + out_mb, 12
    rows/symbol) the MI selection doesn't either (q_mb may then be None —
    the kernel skips writing its largest stream entirely, emit_q=False).
    """
    num_lev = amps.shape[0]
    use_stats_mi = mm_mb is not None
    if use_stats_mi and (s1_mb is None or out_mb is None or dec_mb is None
                         or eq_mb is None):
        raise ValueError("stats MI needs out_mb, mm_mb, s1_mb, dec_mb, eq_mb")
    if eq_mb is None:
        shift, r = find_shift_dp_mb(q_mb, tx, 21, amps, corr_len=_SYNC_CORR_LEN)
    else:
        e = jnp.moveaxis(eq_mb.astype(jnp.float32), 0, 1).reshape(2, -1)
        shift, r = _dp_shift_core(e, tx, 21, corr_len=_SYNC_CORR_LEN)
    if dec_mb is None:
        dec = iqflip_decisions_mb(q_mb)
    else:
        n_mb, _, _, bl = dec_mb.shape
        dec = jnp.moveaxis(dec_mb, 0, 2).reshape(2, 2, n_mb * bl)
        dec = dec.astype(jnp.int32)
    shift_c, r_c = find_shift_symb_dp(out_const, tx, 21, corr_len=_SYNC_CORR_LEN)
    if use_stats_mi:
        # round-5 align lever: both alignments roll the int8 LEVEL-INDEX
        # planes (4x less traffic than the f32 amplitudes) and build the
        # rolled eval masks directly at shifted positions (zero roll
        # passes) — the tx/weight align rolls were the largest eval
        # sub-stage at R=128 (artifacts/r5_eval_syncfine.log)
        idx = _decode_levels(tx, num_lev).astype(jnp.int8)
        ms = jnp.max(jnp.abs(shift))
        idx_al, w_al = align_idx_dp(
            idx, shift, r, lambda t: weight_fn(shift[0], ms, t=t))
        ser_soft = jnp.roll(
            ser_iqflip_from_dec(dec, None, num_lev, weight=w_al,
                                tx_idx=idx_al), r)
        mi = jnp.roll(
            mutual_information_ambiguity_mb_stats(
                out_mb, mm_mb, s1_mb, None, amps, P, nu_sc, var,
                weight=w_al, tx_idx=idx_al
            ), r
        )
        ms_c = jnp.max(jnp.abs(shift_c))
        idx_al_c, w_al_c = align_idx_dp(
            idx, shift_c, r_c, lambda t: weight_fn(shift_c[0], ms_c, t=t))
        ser_const = jnp.roll(
            ser_constell_shaping(out_const, None, amps, nu_sc, var,
                                 weight=w_al_c, tx_idx=idx_al_c),
            r_c,
        )
        return ser_const, ser_soft, mi, shift, r

    w_q = weight_fn(shift[0], jnp.max(jnp.abs(shift)))
    tx_al, w_al = align_tx_dp(tx, shift, r, w_q)
    ser_soft = jnp.roll(ser_iqflip_from_dec(dec, tx_al, num_lev, weight=w_al), r)
    # single-read level sweep: ~2.1 vs ~3.1 ms/frame at R=128/rb=16/bf16
    # on v5e (tools/profile_eval.py mb_mi_sp vs mb_mi)
    mi = jnp.roll(
        mutual_information_ambiguity_mb_sp(q_mb, tx_al, amps, P, weight=w_al), r
    )

    w_c = weight_fn(shift_c[0], jnp.max(jnp.abs(shift_c)))
    tx_al_c, w_al_c = align_tx_dp(tx, shift_c, r_c, w_c)
    ser_const = jnp.roll(
        ser_constell_shaping(out_const, tx_al_c, amps, nu_sc, var, weight=w_al_c),
        r_c,
    )
    return ser_const, ser_soft, mi, shift, r


_VAE_FIELDS = (("loss", 1), ("ser_const", 2), ("ser_soft", 2), ("mi", 2),
               ("var_est", 2), ("snr_est_db", 1), ("shift", 2), ("r", 1), ("sigma_n", 1))
_CMA_FIELDS = (("loss", 1), ("ser_const", 2), ("ser_soft", 2), ("mi", 2),
               ("shift", 2), ("r", 1), ("sigma_n", 1))


def _finish_vae_frame(losses, q_mb, out_mb, var_est, tx, const, amps, P, var,
                      weight_fn, sigma, dec_mb=None, eq_mb=None, mm_mb=None,
                      s1_mb=None, nu_sc=None, pow_mean=None):
    """Gather the minibatch scan outputs into frame streams, evaluate, and
    pack the frame's metric vector (shared by the VAE and VAEflex loops).

    With the kernel's sufficient-statistics streams (mm_mb/s1_mb, round 5)
    ``q_mb`` may be None — no eval stage reads the posterior stream."""
    n_out = out_mb.shape[0] * out_mb.shape[-1]
    # only the (2, 2, N) constellation stream is packed time-major; the 16x
    # larger posterior tensor stays in minibatch layout (_dp_frame_eval_mb)
    out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)

    # per-run shaping overrides (sweep nu-axis batching); scalars from the
    # group's base constellation otherwise
    nu_sc = const.nu_sc if nu_sc is None else nu_sc
    pow_mean = const.pow_mean if pow_mean is None else pow_mean
    ser_const, ser_soft, mi, shift, r = _dp_frame_eval_mb(
        q_mb, out_const, tx, amps, P, nu_sc, var, weight_fn,
        dec_mb=dec_mb, eq_mb=eq_mb, out_mb=out_mb, mm_mb=mm_mb, s1_mb=s1_mb
    )
    snr_est = pow_mean / jnp.mean(var_est)
    metrics = {
        "loss": losses[-1],
        "ser_const": ser_const,
        "ser_soft": ser_soft,
        "mi": mi,
        "var_est": jnp.mean(var_est, axis=0),  # (2,)
        "snr_est_db": 10 * jnp.log10(snr_est),
        "shift": shift.astype(jnp.float32),
        "r": r,
        "sigma_n": sigma,
    }
    return pack_metrics(metrics, _VAE_FIELDS)


def _dp_result(hist: dict, var, prefix: tuple, num_frames: int, **extra) -> dict:
    ser_valid = np.concatenate([hist["ser_const"], hist["ser_soft"]], axis=-2)
    return {
        "ser": ser_valid,
        "var_est": hist.get("var_est", np.zeros(prefix + (2, num_frames), np.float32)),
        "mi": hist["mi"],
        "var": np.asarray(var),
        **extra,
    }


def _default_runs_batch(runs: int, cap: int = 8) -> int:
    """Largest divisor of ``runs`` not exceeding ``cap`` (kernel batch size)."""
    return max(d for d in range(1, min(cap, runs) + 1) if runs % d == 0)


def _run_frame_kernel_experiment(
    cfg, key, gen, const, amps, P, var, *, steps_per_frame, stride_sym,
    tx_of, weight_fn, params, runs, mesh, progress, compiled, chunk_frames,
    checkpoint, checkpoint_every, timings, runs_batch=None,
    stream_bf16=False, lr_vec=None, snr_vec=None, nu_vec=None,
):
    """Shared use_pallas="frame" experiment driver for VAE and VAEflex.

    One fused MXU kernel call per frame (ops/frame_kernel.py); the carry is
    (params, Adam moments, global step count) so the lr schedule and bias
    correction continue across frames exactly like the optax paths.
    tx_of(tx_full) selects the ground truth for the recorded stream;
    weight_fn(shift0, max_shift) builds the eval mask.

    With ``runs`` set, repeats are executed in kernel-level batches of
    ``runs_batch`` (default: largest divisor of runs <= 8): one grid step
    trains one minibatch of all rb runs (ops/frame_kernel.py), and the
    remaining runs/rb groups ride a vmap of the kernel call ONLY — channel
    generation and evaluation are batched over ALL runs at once (they are
    plain XLA and batch with much better lane/sublane utilization than the
    kernel, measured 0.166 -> 0.092 ms/frame/run going 8 -> 16 on v5e,
    while a vmapped pallas_call serializes its grid steps).
    """
    from ..ops.frame_kernel import (
        frame_opt_init,
        vae_dp_frame_train_pallas,
        vae_dp_frame_train_pallas_rb,
    )

    thresh = float(cfg.n_lrhalf) * steps_per_frame

    if runs is None:
        if stream_bf16:
            raise ValueError(
                "stream_bf16 needs the runs-batched kernel (set runs)"
            )
        if lr_vec is not None or snr_vec is not None or nu_vec is not None:
            raise ValueError(
                "lr_vec/snr_vec/nu_vec need the runs-batched kernel (set runs)"
            )
        rb = None
        carry = (params, frame_opt_init(params), jnp.int32(0))
    else:
        rb = runs_batch or _default_runs_batch(runs)
        if runs % rb != 0:
            raise ValueError(f"runs_batch={rb} must divide runs={runs}")
        groups = runs // rb
        # (runs, ...) -> (groups, rb, ...): the kernel batches over rb, a
        # vmap covers the groups; the step count is one shared scalar
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (groups, rb) + x.shape),
            params,
        )
        carry = (params, frame_opt_init(params), jnp.int32(0))
        carry = shard_runs(carry, mesh)
        if lr_vec is None:
            # per-group scalar lr (the validated scalar-trace kernel path)
            lr_groups = jnp.broadcast_to(jnp.float32(cfg.lr), (groups,))
        else:
            # per-run lr: run r of the flat runs axis gets lr_vec[r] (sweep
            # lr-axis batching — runs differing only in lr share the kernel)
            lr_vec = jnp.asarray(lr_vec, jnp.float32)
            if lr_vec.shape != (runs,):
                raise ValueError(
                    f"lr_vec must have shape ({runs},), got {lr_vec.shape}"
                )
            lr_groups = lr_vec.reshape(groups, rb)
        if nu_vec is None:
            P_runs = None
            nu_groups = None  # kernel gets the scalar const.nu_sc
            pm_runs = np.full((runs,), const.pow_mean, np.float64)
            P_kernel_g = jnp.broadcast_to(P, (groups,) + P.shape)
            p_axis = None
        else:
            # per-run shaping (sweep nu-axis batching): nu enters through
            # the sampling pmf (generator), the kernel's met/KL constants,
            # and the eval's nu_sc/prior/variance — the level grid is
            # nu-independent (constellation.py:103), so runs at different
            # nu share every program shape
            nu_arr = np.asarray(nu_vec, np.float64).reshape(-1)
            if nu_arr.shape != (runs,):
                raise ValueError(
                    f"nu_vec must have shape ({runs},), got {nu_arr.shape}"
                )
            consts_r = [make_constellation(cfg.mod, float(v)) for v in nu_arr]
            P_runs = jnp.asarray(
                np.stack([np.asarray(c.P, np.float32) for c in consts_r])
            )  # (runs, n)
            nu_groups = jnp.asarray(
                np.asarray([c.nu_sc for c in consts_r], np.float32)
            ).reshape(groups, rb)
            pm_runs = np.asarray([c.pow_mean for c in consts_r], np.float64)
            P_kernel_g = P_runs.reshape(groups, rb, P_runs.shape[-1])
            p_axis = 0
        if snr_vec is None and nu_vec is None:
            snr_lin_runs = None
            var_groups = jnp.broadcast_to(var, (groups,) + var.shape)
            var_runs = jnp.broadcast_to(var, (groups, rb) + var.shape)
        else:
            # per-run demapper variance: var = pow_mean(nu) / snr_lin / 2
            # (constellation.demapper_noise_var) — per-run whenever either
            # axis is batched; per-run noise draw only when SNR varies
            if snr_vec is None:
                snr_db_runs = np.full((runs,), cfg.snr_db, np.float32)
                snr_lin_runs = None
            else:
                snr_vec = jnp.asarray(snr_vec, jnp.float32)
                if snr_vec.shape != (runs,):
                    raise ValueError(
                        f"snr_vec must have shape ({runs},), got {snr_vec.shape}"
                    )
                snr_db_runs = np.asarray(snr_vec)
                snr_lin_runs = 10.0 ** (snr_vec / 10.0)
            # float64 host arithmetic, like demapper_noise_var: the
            # constant-vector case must reproduce the scalar path's folded
            # variance bit-for-bit
            var_runs = jnp.asarray(
                ((pm_runs / 10.0 ** (np.float64(snr_db_runs) / 10.0) / 2.0)
                 [:, None] * np.ones((1, 2))).astype(np.float32)
            ).reshape(groups, rb, 2)
            var_groups = var_runs
        pm_groups = jnp.asarray(pm_runs, jnp.float32).reshape(groups, rb)

    def one_run_finish(losses, out_mb, dec_mb, eq_mb, mm_mb, s1_mb, var_est,
                       tx_full, sigma, var_r, nu_sc_r=None, P_r=None,
                       pm_r=None):
        return _finish_vae_frame(
            losses, None, out_mb, var_est, tx_of(tx_full), const, amps,
            P if P_r is None else P_r,
            var_r, weight_fn, sigma, dec_mb=dec_mb, eq_mb=eq_mb,
            mm_mb=mm_mb, s1_mb=s1_mb, nu_sc=nu_sc_r, pow_mean=pm_r,
        )

    def crop_flex(*streams):
        if stride_sym is None:  # VAEflex: central crop of each window
            return streams
        crop0 = (cfg.batch_len - stride_sym) // 2
        return tuple(a[..., crop0 : crop0 + stride_sym] for a in streams)

    def frame_step(carry, key, theta):
        params, opt, count = carry
        if rb is None:
            rx, tx_full, sigma = gen(key, theta)
            (w, h, opt, losses, var_est, _, out_mb, dec_mb, eq_mb, mm_mb,
             s1_mb) = vae_dp_frame_train_pallas(
                params["w"], params["h"], opt, rx, amps, var, const.nu_sc, P,
                jnp.float32(cfg.lr), count.astype(jnp.float32),
                jnp.float32(thresh), bl_sym=cfg.batch_len, stride_sym=stride_sym,
                emit_eval=True, emit_q=False,
            )
            out_mb, dec_mb, eq_mb, mm_mb, s1_mb = crop_flex(
                out_mb, dec_mb, eq_mb, mm_mb, s1_mb)
            packed = one_run_finish(
                losses, out_mb, dec_mb, eq_mb, mm_mb, s1_mb, var_est, tx_full,
                sigma, var
            )
            return ({"w": w, "h": h}, opt, count + steps_per_frame), packed

        keys = jax.random.split(key, runs)
        rx, tx_full, sigma = jax.vmap(
            gen,
            in_axes=(0, None, None if snr_lin_runs is None else 0, p_axis),
        )(keys, theta, snr_lin_runs, P_runs)
        rx_g = rx.reshape((groups, rb) + rx.shape[1:])

        def kernel_group(p, o, rxg, lrg, varg, nug, pg):
            res = vae_dp_frame_train_pallas_rb(
                p["w"], p["h"], o, rxg, amps, varg,
                const.nu_sc if nug is None else nug, pg,
                lrg, count.astype(jnp.float32),
                jnp.float32(thresh), bl_sym=cfg.batch_len, stride_sym=stride_sym,
                stream_bf16=stream_bf16, emit_eval=True, emit_q=False,
            )
            # drop the q slot (None when emit_q=False): vmap carries arrays
            return res[:5] + res[6:]

        (w, h, opt, losses, var_est, out_mb, dec_mb, eq_mb, mm_mb,
         s1_mb) = jax.vmap(
            kernel_group,
            in_axes=(0, 0, 0, 0, 0, None if nu_groups is None else 0, 0),
        )(params, opt, rx_g, lr_groups, var_groups, nu_groups, P_kernel_g)
        # batched eval via nested (groups, rb) vmaps — flattening the kernel
        # outputs to a runs axis first would transpose ~MB/run per frame
        out_mb, dec_mb, eq_mb, mm_mb, s1_mb = crop_flex(
            out_mb, dec_mb, eq_mb, mm_mb, s1_mb)
        tx_g = tx_full.reshape((groups, rb) + tx_full.shape[1:])
        sigma_g = sigma.reshape((groups, rb) + sigma.shape[1:])
        nu_ax = None if nu_groups is None else 0
        packed = jax.vmap(
            jax.vmap(one_run_finish,
                     in_axes=(1, 1, 1, 1, 1, 1, 1, 0, 0, 0, nu_ax, nu_ax, 0))
        )(losses, out_mb, dec_mb, eq_mb, mm_mb, s1_mb, var_est, tx_g, sigma_g,
          var_runs, nu_groups, P_kernel_g if nu_groups is not None else None,
          pm_groups)  # (groups, rb, n_tot)
        packed = packed.reshape((runs,) + packed.shape[2:])
        return ({"w": w, "h": h}, opt, count + steps_per_frame), packed

    (params, _, _), hist = run_frame_loop(
        frame_step, carry, _frame_inputs(cfg, key), _VAE_FIELDS,
        runs=runs, vmap_runs=rb is None,
        progress=progress, compiled=compiled, chunk_frames=chunk_frames,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    if rb is not None:
        params = jax.tree.map(lambda x: x.reshape((runs,) + x.shape[2:]), params)
    prefix = () if runs is None else (runs,)
    extra = {}
    if snr_vec is not None or nu_vec is not None:
        # per-run demapper variance (the sweep's per-point "var" under
        # snr-/nu-axis batching; the scalar "var" slot keeps cfg's value)
        extra["var_runs"] = np.asarray(var_runs.reshape(runs, 2))
    return _dp_result(hist, var, prefix, cfg.num_frames, params=params, **extra)


def train_vae_dp(
    cfg: DpConfig,
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
    chunk_frames: int = 1,
    runs_batch: int | None = None,
    stream_bf16: bool = False,
    lr_vec=None,
    snr_vec=None,
    nu_vec=None,
):
    """VAE-LE butterfly, online frame training on the optical DP channel.

    With ``compiled=True`` the whole experiment (all frames) runs as one
    lax.scan inside a single jitted call — no per-frame host round trips;
    ``progress`` is then unavailable. ``use_pallas=True`` computes each
    minibatch's loss and gradients with the fused in-VMEM kernel
    (ops/elbo_kernel.py) — exact f32 on a backend whose XLA matmuls are bf16;
    ``use_pallas="frame"`` runs ALL of a frame's minibatch steps (incl. the
    Adam updates) as ONE MXU-based kernel call (ops/frame_kernel.py) —
    measured 3.5x the per-step scan on v5e (15 vs 53 us/step; the scan's
    cost is its serial per-step instruction stream). Both require sps=2 and
    odd M. With ``use_pallas="frame"`` and ``runs``, repeats run in
    kernel-level batches of ``runs_batch`` (default: largest divisor of
    runs <= 8) so aggregate throughput scales instead of serializing under
    vmap.
    """
    m_max = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max * cfg.batch_len
    const, var, gen, amps, P = _setup(cfg, n_frame)
    mb_len = cfg.batch_len * cfg.sps

    params = params_init or {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    check_pallas_mode("VAE", use_pallas)
    if use_pallas and (cfg.sps != 2 or cfg.m_est % 2 == 0):
        raise ValueError("use_pallas requires sps=2 and odd M_est")

    if use_pallas == "frame":
        return _run_frame_kernel_experiment(
            cfg, key, gen, const, amps, P, var, steps_per_frame=m_max,
            stride_sym=None, tx_of=lambda tx: tx,
            weight_fn=lambda s0, ms, t=None: batch_cut_weight(
                m_max, cfg.batch_len, s0, ms, cfg.n_cut, t=t
            ),
            params=params, runs=runs, mesh=mesh, progress=progress,
            compiled=compiled, chunk_frames=chunk_frames, checkpoint=checkpoint,
            checkpoint_every=checkpoint_every, timings=timings,
            runs_batch=runs_batch, stream_bf16=stream_bf16,
            lr_vec=lr_vec, snr_vec=snr_vec, nu_vec=nu_vec,
        )

    if lr_vec is not None or snr_vec is not None or nu_vec is not None:
        raise ValueError('lr_vec/snr_vec/nu_vec need use_pallas="frame"')
    opt = _vae_optimizer(cfg, m_max)
    carry = init_carry(params, opt, runs, mesh)

    def loss_fn(p, rx_mb):
        q, out = vae_le_dp_forward(p["w"], rx_mb, amps, var, const.nu_sc, cfg.sps)
        loss, var_est = elbo_dp(q, rx_mb, p["h"], amps, P)
        return loss, (q, out, var_est)

    if use_pallas:
        from ..ops.elbo_kernel import vae_dp_loss_and_grad_pallas

    def frame_step(carry, key, theta):
        params, opt_state = carry
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
        packed = _finish_vae_frame(
            losses, q_mb, out_mb, var_est, tx, const, amps, P, var,
            lambda s0, ms: batch_cut_weight(m_max, cfg.batch_len, s0, ms, cfg.n_cut),
            sigma,
        )
        return (params, opt_state), packed

    (params, _), hist = run_frame_loop(
        frame_step, carry, _frame_inputs(cfg, key), _VAE_FIELDS,
        runs=runs, progress=progress, compiled=compiled, chunk_frames=chunk_frames,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    prefix = () if runs is None else (runs,)
    return _dp_result(hist, var, prefix, cfg.num_frames, params=params)


def train_vae_flex_dp(
    cfg: DpConfig,
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
    chunk_frames: int = 1,
    runs_batch: int | None = None,
    stream_bf16: bool = False,
    lr_vec=None,
    snr_vec=None,
    nu_vec=None,
):
    """VAEflex: overlapping sliding-window minibatches with central crop.

    Parity: func_VAEflex_DP_MQAM_shaping.py:16-90 — window m covers symbols
    [m*flex_step, m*flex_step + batch_len); its central flex_step symbols are
    the recorded output stream. ``use_pallas=True`` computes each window's
    loss and gradients with the same fused in-VMEM kernel as train_vae_dp
    (the flex window is the identical butterfly+ELBO at a different stride);
    ``use_pallas="frame"`` runs all windows + Adam as one MXU kernel call
    per frame (ops/frame_kernel.py with ``stride_sym=flex_step``). Both
    require sps=2 and odd M.
    """
    m_max0 = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max0 * cfg.batch_len
    m_max = (n_frame - cfg.batch_len) // cfg.flex_step * cfg.flex_step
    m_step = cfg.flex_step
    n_windows = m_max // m_step
    const, var, gen, amps, P = _setup(cfg, n_frame)
    mb_len = cfg.batch_len * cfg.sps
    crop0 = (cfg.batch_len - m_step) // 2

    params = params_init or {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    check_pallas_mode("VAEflex", use_pallas)
    if use_pallas and (cfg.sps != 2 or cfg.m_est % 2 == 0):
        raise ValueError("use_pallas requires sps=2 and odd M_est")

    if use_pallas == "frame":
        return _run_frame_kernel_experiment(
            cfg, key, gen, const, amps, P, var, steps_per_frame=n_windows,
            stride_sym=m_step,
            tx_of=lambda tx_full: jax.lax.dynamic_slice_in_dim(
                tx_full, cfg.batch_len // 2, m_max, 2
            ),
            weight_fn=lambda s0, ms, t=None: margin_weight_maxshift(
                m_max, ms, t=t),
            params=params, runs=runs, mesh=mesh, progress=progress,
            compiled=compiled, chunk_frames=chunk_frames, checkpoint=checkpoint,
            checkpoint_every=checkpoint_every, timings=timings,
            runs_batch=runs_batch, stream_bf16=stream_bf16,
            lr_vec=lr_vec, snr_vec=snr_vec, nu_vec=nu_vec,
        )

    if lr_vec is not None or snr_vec is not None or nu_vec is not None:
        raise ValueError('lr_vec/snr_vec/nu_vec need use_pallas="frame"')

    opt = _vae_optimizer(cfg, n_windows)
    carry = init_carry(params, opt, runs, mesh)

    def loss_fn(p, rx_mb):
        q, out = vae_le_dp_forward(p["w"], rx_mb, amps, var, const.nu_sc, cfg.sps)
        loss, var_est = elbo_dp(q, rx_mb, p["h"], amps, P)
        return loss, (q, out, var_est)

    if use_pallas:
        from ..ops.elbo_kernel import vae_dp_loss_and_grad_pallas

    def frame_step(carry, key, theta):
        params, opt_state = carry
        rx, tx_full, sigma = gen(key, theta)
        # ground truth for the recorded (central-crop) stream
        tx = jax.lax.dynamic_slice_in_dim(tx_full, cfg.batch_len // 2, m_max, 2)

        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * m_step * cfg.sps, mb_len, 2)
            if use_pallas:
                loss, var_est, gw, gh, q, out = vae_dp_loss_and_grad_pallas(
                    p["w"], p["h"], rx_mb, amps, var, const.nu_sc, P
                )
                g = {"w": gw, "h": gh}
            else:
                (loss, (q, out, var_est)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, rx_mb)
            updates, s = opt.update(g, s, p)
            q_c = jax.lax.dynamic_slice_in_dim(q, crop0, m_step, 2)
            out_c = jax.lax.dynamic_slice_in_dim(out, crop0, m_step, 2)
            return (optax.apply_updates(p, updates), s), (loss, q_c, out_c, var_est)

        (params, opt_state), (losses, q_mb, out_mb, var_est) = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(n_windows)
        )
        packed = _finish_vae_frame(
            losses, q_mb, out_mb, var_est, tx, const, amps, P, var,
            lambda s0, ms: margin_weight_maxshift(m_max, ms), sigma,
        )
        return (params, opt_state), packed

    (params, _), hist = run_frame_loop(
        frame_step, carry, _frame_inputs(cfg, key), _VAE_FIELDS,
        runs=runs, progress=progress, compiled=compiled, chunk_frames=chunk_frames,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    prefix = () if runs is None else (runs,)
    return _dp_result(hist, var, prefix, cfg.num_frames, params=params)


def run_cma_dp(
    cfg: DpConfig,
    key: jax.Array,
    progress: Progress = None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    taps_init=None,
    use_pallas: bool = False,
    compiled: bool = False,
    checkpoint=None,
    checkpoint_every: int = 0,
    chunk_frames: int = 1,
    timings: dict | None = None,
    runs_batch: int | None = None,
):
    """CMA / CMAbatch / CMAflex baseline on the optical DP channel.

    ``use_pallas=True`` runs the per-symbol CMA recurrence as the in-VMEM
    Pallas kernel (ops/cma_kernel.py, ~1.5x the lax.scan path on TPU; only
    for loss_type="CMA").

    Per frame: adapt taps online -> CPE -> sync -> constellation SER; then
    soft demapper -> sync -> posterior SER. The lr halves every n_lrhalf
    frames (multiplicatively, unlike the VAE path's one-time halving).

    With ``use_pallas="frame"`` and ``runs`` set, repeats execute in
    kernel-level batches of ``runs_batch`` (default: largest divisor of
    runs <= 8) through the runs-batched chunk kernel
    (ops/cma_frame_kernel.py) — a vmapped pallas_call would serialize its
    grid steps instead.
    """
    n_frame = cfg.n_frame_max
    const, var, gen, amps, P = _setup(cfg, n_frame)
    n_eval = n_frame - 2 * cfg.n_cut  # symbols per frame after downsampling

    check_pallas_mode(cfg.loss_type, use_pallas)
    if use_pallas == "frame":
        # whole-frame fused chunk engine (ops/cma_frame_kernel.py): all of a
        # frame's tap updates in ONE pallas_call (CMAbatch/CMAflex only —
        # the table above rejects it for per-symbol CMA)
        from ..ops.cma_frame_kernel import cma_chunked_frame_pallas

        step = cfg.batch_len if cfg.loss_type == "CMAbatch" else cfg.flex_step
        equalize = lambda rx, h, lr: cma_chunked_frame_pallas(
            rx, cfg.R, h, lr, cfg.batch_len, step, cfg.sps
        )
    elif cfg.loss_type == "CMA":
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

    def eval_frame(out, e, tx, sigma):
        out = cpe_dp(out[:, :, cfg.n_cut : -cfg.n_cut])
        tx_c = tx[:, :, cfg.n_cut : -cfg.n_cut]

        q = soft_demap_dp(out, amps, var, const.nu_sc)
        ser_const, ser_soft, mi, _, _ = _dp_frame_eval(
            q, out, tx_c, amps, P, const.nu_sc, var,
            lambda s0, ms: margin_weight_maxshift(n_eval, ms),
        )
        shift_c, r_c = find_shift_symb_dp(out, tx_c, 21, corr_len=_SYNC_CORR_LEN)

        metrics = {
            "loss": jnp.sum(e),
            "ser_const": ser_const,
            "ser_soft": ser_soft,
            "mi": mi,
            "shift": shift_c.astype(jnp.float32),
            "r": r_c,
            "sigma_n": sigma,
        }
        return pack_metrics(metrics, _CMA_FIELDS)

    def frame_step(h, key, theta, lr):
        rx, tx, sigma = gen(key, theta)
        out, h, e = equalize(rx, h, lr)
        return h, eval_frame(out, e, tx, sigma)

    rb = None
    h = taps_init if taps_init is not None else dirac_taps_dp(cfg.m_est)
    if runs is not None and use_pallas == "frame":
        # kernel-level runs batch (ops/cma_frame_kernel.py rb variant): one
        # grid step adapts one chunk of all rb runs; groups ride a vmap of
        # the kernel call only, generation + eval batch over ALL runs
        from ..ops.cma_frame_kernel import cma_chunked_frame_pallas_rb

        rb = runs_batch or _default_runs_batch(runs)
        if runs % rb != 0:
            raise ValueError(f"runs_batch={rb} must divide runs={runs}")
        groups = runs // rb
        step = cfg.batch_len if cfg.loss_type == "CMAbatch" else cfg.flex_step
        h = jnp.broadcast_to(h, (groups, rb) + h.shape)
        h = shard_runs(h, mesh)

        def frame_step_rb(h_g, key, theta, lr):
            keys = jax.random.split(key, runs)
            rx, tx, sigma = jax.vmap(gen, in_axes=(0, None))(keys, theta)
            rx_g = rx.reshape((groups, rb) + rx.shape[1:])
            out_g, h_g, e_g = jax.vmap(
                lambda rxg, hg: cma_chunked_frame_pallas_rb(
                    rxg, cfg.R, hg, lr, cfg.batch_len, step, cfg.sps
                )
            )(rx_g, h_g)
            flat = lambda a: a.reshape((runs,) + a.shape[2:])
            packed = jax.vmap(eval_frame)(flat(out_g), flat(e_g), tx, sigma)
            return h_g, packed

        frame_step = frame_step_rb
    elif runs is not None:
        h = shard_runs(broadcast_runs(h, runs), mesh)
    frame_keys, thetas = _frame_inputs(cfg, key)
    lrs = jnp.float32(cfg.lr) * 0.5 ** (jnp.arange(cfg.num_frames) // cfg.n_lrhalf)

    h, hist = run_frame_loop(
        frame_step, h, (frame_keys, thetas, lrs), _CMA_FIELDS,
        runs=runs, vmap_runs=rb is None,
        progress=progress, compiled=compiled, chunk_frames=chunk_frames,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every, timings=timings,
    )
    if rb is not None:
        h = h.reshape((runs,) + h.shape[2:])
    prefix = () if runs is None else (runs,)
    return _dp_result(hist, var, prefix, cfg.num_frames, taps=h)
