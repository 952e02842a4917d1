"""One-process TPU smoke run: stage-by-stage checks then a quick benchmark.

Run on the real chip (no platform override). Prints PASS/FAIL per stage and
finishes with bench-style numbers; exits nonzero if any stage failed.
Designed to never transfer complex arrays (axon transport constraint) and to
be safe to re-run.

The three Pallas kernels are checked ON-CHIP against exact-f32 references
computed on the in-process CPU backend at the shapes the real experiments
use (this backend's XLA silently runs f32 matmuls/convs at bf16, so the CPU
reference is the ground truth the kernels are supposed to preserve — the
interpret-mode CPU tests cannot see on-chip Mosaic/MXU quirks).

Usage: python tools/tpu_smoke.py [--full]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

FAILURES: list[str] = []


def stage(name, f):
    import jax

    t0 = time.perf_counter()
    try:
        r = jax.block_until_ready(f())
        print(f"PASS {name} ({time.perf_counter()-t0:.2f}s)", flush=True)
        return r
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        FAILURES.append(name)
        return None


def check(name, f_tpu, f_ref, pairs, ref_on_tpu=False):
    """Run f_tpu on the chip and f_ref on the in-process CPU backend; assert
    every output pair within (rtol, atol). pairs = [(idx, rtol, atol), ...]

    ref_on_tpu=True runs the reference on the chip too — for kernel-vs-kernel
    checks whose reference is itself a Pallas call (cannot lower on CPU)."""
    import jax

    t0 = time.perf_counter()
    try:
        got = jax.block_until_ready(f_tpu())
        if ref_on_tpu:
            ref = jax.block_until_ready(f_ref())
        else:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                ref = jax.block_until_ready(f_ref())
        if not isinstance(got, (tuple, list)):
            got, ref = (got,), (ref,)
        worst = 0.0
        for idx, rtol, atol in pairs:
            # f32 upcast: bf16 outputs (stream_bf16) land as ml_dtypes
            # arrays whose ufunc coverage is spotty in older numpy
            g = np.asarray(got[idx]).astype(np.float32)
            r = np.asarray(ref[idx]).astype(np.float32)
            np.testing.assert_allclose(g, r, rtol=rtol, atol=atol)
            denom = np.maximum(np.abs(r), atol)
            worst = max(worst, float(np.max(np.abs(g - r) / denom)))
        print(f"PASS {name} (worst rel err {worst:.2e}, {time.perf_counter()-t0:.2f}s)",
              flush=True)
        return got
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        FAILURES.append(name)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run the full-size bench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    stage("trivial op", lambda: jnp.sum(jnp.ones((128, 128))))

    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.channels import channel_ir, make_dp_simulator, make_awgn_simulator

    const = make_constellation("64-QAM", 0.0)
    h_up, m_orig = channel_ir("h1", 2)
    h0_up, _ = channel_ir("h0", 2)

    gen_awgn = jax.jit(make_awgn_simulator(const, 24.0, h_up, m_orig, 2000, 2))
    stage("awgn simulator", lambda: gen_awgn(jax.random.PRNGKey(0)))

    gen_dp = jax.jit(
        make_dp_simulator(const, 23.0, h0_up, 2000, 2, 90e9, -26e-24,
                          0.1e-12 * np.sqrt(1000), np.array([0.0314, 0.0314]))
    )
    stage("dp simulator (on-device fft)", lambda: gen_dp(jax.random.PRNGKey(1), jnp.float32(0.3)))

    from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp, vae_le_dp_forward, cma_dp
    from vae_equalizer_tpu.models.losses import elbo_dp
    from vae_equalizer_tpu.core.constellation import demapper_noise_var

    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var = jnp.full((2,), demapper_noise_var(const, 23.0), jnp.float32)
    rng = np.random.default_rng(0)
    rx = jnp.asarray(rng.normal(size=(2, 2, 400)).astype(np.float32) * 0.5)
    w, h = butterfly_init(25), dirac_taps_dp(25)

    stage("butterfly forward + demapper", lambda: vae_le_dp_forward(w, rx, amps, var, 0.0, 2))
    q, out = vae_le_dp_forward(w, rx, amps, var, 0.0, 2)
    stage("fused elbo", lambda: elbo_dp(q, rx, h, amps, P))
    stage("elbo grad", lambda: jax.grad(lambda hh: elbo_dp(q, rx, hh, amps, P)[0])(h))
    stage("cma scan", lambda: cma_dp(rx, 1.0, dirac_taps_dp(11), 1e-3, 2, True))

    # ---- on-chip Pallas kernels vs exact-f32 CPU references, experiment
    # shapes: CMA on a full 10000-symbol frame; butterfly/train-step on the
    # batch_len=100 minibatch (M=25, 64-QAM) they run at inside training
    from vae_equalizer_tpu.ops import cma_dp_pallas, vae_le_dp_forward_pallas
    from vae_equalizer_tpu.ops.elbo_kernel import vae_dp_loss_and_grad_pallas

    # np inputs: each lambda converts on ITS backend (committed jax arrays
    # would drag the CPU reference back onto the chip)
    amps_np = np.asarray(const.amps, np.float32)
    p_np = np.asarray(const.P, np.float32)
    var_np = np.asarray(var)
    rx_frame = rng.normal(size=(2, 2, 20000)).astype(np.float32) * 0.5
    h_cma = np.asarray(dirac_taps_dp(25)) + 0.01 * rng.normal(size=(2, 2, 2, 25)).astype(np.float32)
    check(
        "pallas cma kernel == scan (full frame)",
        lambda: cma_dp_pallas(rx_frame, 1.0, jnp.asarray(h_cma), 1e-4, 2, True),
        lambda: cma_dp(rx_frame, 1.0, jnp.asarray(h_cma), 1e-4, 2, True),
        # out, taps, error-history: the recurrence is exact-f32 in both
        pairs=[(0, 2e-4, 2e-5), (1, 2e-4, 2e-5), (2, 5e-4, 5e-5)],
    )

    rx_mb = rng.normal(size=(2, 2, 200)).astype(np.float32) * 0.5
    w_p = np.asarray(w) + 0.05 * rng.normal(size=(2, 4, 25)).astype(np.float32)
    h_p = np.asarray(h) + 0.05 * rng.normal(size=(2, 2, 2, 25)).astype(np.float32)
    check(
        "pallas butterfly+demap kernel (minibatch)",
        lambda: vae_le_dp_forward_pallas(w_p, rx_mb, amps_np, var_np, const.nu_sc, 2),
        lambda: vae_le_dp_forward(w_p, rx_mb, amps_np, var_np, const.nu_sc, 2),
        pairs=[(0, 5e-4, 2e-6), (1, 2e-4, 2e-6)],  # q, out
    )

    def ref_loss_grad():
        def loss_fn(w_, h_):
            q_, out_ = vae_le_dp_forward(w_, rx_mb, amps_np, var_np, const.nu_sc, 2)
            loss_, var_est_ = elbo_dp(q_, rx_mb, h_, amps_np, p_np)
            return loss_, (var_est_, q_, out_)

        (loss_, (var_est_, q_, out_)), (gw_, gh_) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(w_p, h_p)
        return loss_, var_est_, gw_, gh_, q_, out_

    check(
        "pallas fused train-step kernel (minibatch)",
        lambda: vae_dp_loss_and_grad_pallas(w_p, h_p, rx_mb, amps_np, var_np, const.nu_sc, p_np),
        ref_loss_grad,
        # loss, var_est, gw, gh exact-f32 (PARITY_RESULTS: XLA-on-TPU grads
        # are bf16-corrupted up to 8x; the kernel must stay within 0.5%)
        pairs=[(0, 1e-4, 0), (1, 1e-4, 0), (2, 5e-3, 1e-4), (3, 5e-3, 1e-4),
               (4, 5e-4, 2e-6), (5, 2e-4, 2e-6)],
    )

    from vae_equalizer_tpu.models import siso_fir_init, dirac_taps_siso, vae_le_siso_forward
    from vae_equalizer_tpu.models.losses import elbo_siso
    from vae_equalizer_tpu.ops.elbo_siso_kernel import vae_siso_loss_and_grad_pallas

    x_s = rng.normal(size=(2, 200)).astype(np.float32) * 0.6
    ws = np.asarray(siso_fir_init(25)) + 0.05 * rng.normal(size=(1, 2, 25)).astype(np.float32)
    hs = np.asarray(dirac_taps_siso(25)) + 0.05 * rng.normal(size=(2, 25)).astype(np.float32)
    var_s = float(10 ** (-24.0 / 10))  # SISO demapper convention
    amp_mean = const.amp_mean

    def ref_siso_loss_grad():
        def loss_fn(w_, h_):
            q_, _ = vae_le_siso_forward(w_, x_s, amps_np, amp_mean, var_s, 2)
            return elbo_siso(q_, x_s, h_, amps_np, p_np)

        loss_, (gw_, gh_) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, hs)
        q_, out_ = vae_le_siso_forward(ws, x_s, amps_np, amp_mean, var_s, 2)
        return loss_, gw_, gh_, q_, out_

    check(
        "pallas fused SISO train-step kernel (minibatch)",
        lambda: vae_siso_loss_and_grad_pallas(ws, hs, x_s, amps_np, amp_mean, var_s, p_np),
        ref_siso_loss_grad,
        # gradient atol 5e-3 against an O(100)-magnitude gradient: the
        # normalization VJP subtracts near-equal terms, so on-chip reduction
        # order can move near-zero entries by a few e-3 (14% of a 0.02
        # entry, measured) while every optimizer-relevant entry is exact
        pairs=[(0, 1e-4, 0), (1, 5e-3, 5e-3), (2, 5e-3, 5e-3),
               (3, 5e-4, 2e-6), (4, 2e-4, 2e-6)],  # loss, gw, gh, q, out
    )

    from vae_equalizer_tpu.ops.frame_kernel import frame_opt_init, vae_dp_frame_train_pallas

    rx_fr = rng.normal(size=(2, 2, 600)).astype(np.float32) * 0.5  # 3 minibatches
    opt0_np = {k: np.asarray(v) for k, v in frame_opt_init({"w": w_p, "h": h_p}).items()}

    def frame_kernel_run(interpret):
        return vae_dp_frame_train_pallas(
            w_p, h_p, {k: jnp.asarray(v) for k, v in opt0_np.items()}, rx_fr,
            amps_np, var_np, const.nu_sc, p_np,
            jnp.float32(2.5e-3), jnp.float32(0.0), jnp.float32(1e9),
            bl_sym=100, interpret=interpret,
        )

    check(
        "whole-frame MXU train kernel (3 steps + Adam)",
        lambda: frame_kernel_run(False),
        lambda: frame_kernel_run(True),  # interpret mode = exact-f32 reference
        # w', h', losses, var_est, q, out: on-chip MXU matmuls are multi-pass
        # bf16 — absolute error stays ~1e-5 on O(1) tensors (measured w
        # 1.7e-5, out 3.8e-5) but relative error on near-zero elements is
        # meaningless, so the bounds are atol-led
        pairs=[(0, 1e-3, 5e-5), (1, 1e-3, 2e-5), (3, 1e-4, 0), (4, 1e-4, 1e-5),
               (5, 5e-3, 2e-3), (6, 1e-3, 1e-4)],
    )

    # runs-batched frame kernel: R=2 of the same frame must match per-run
    from vae_equalizer_tpu.ops.frame_kernel import vae_dp_frame_train_pallas_rb

    w_rb = jnp.stack([w_p, w_p])
    h_rb = jnp.stack([h_p, h_p])
    rx_rb = jnp.stack([jnp.asarray(rx_fr), jnp.asarray(rx_fr)])
    opt_rb = {k: jnp.stack([jnp.asarray(v)] * 2) for k, v in opt0_np.items()}

    def frame_kernel_rb_run(interpret):
        return vae_dp_frame_train_pallas_rb(
            w_rb, h_rb, opt_rb, rx_rb, amps_np, var_np, const.nu_sc, p_np,
            jnp.float32(2.5e-3), jnp.float32(0.0), jnp.float32(1e9),
            bl_sym=100, interpret=interpret,
        )

    check(
        "runs-batched frame kernel (R=2)",
        lambda: frame_kernel_rb_run(False),
        lambda: frame_kernel_rb_run(True),
        pairs=[(0, 1e-3, 5e-5), (1, 1e-3, 2e-5), (3, 1e-4, 0), (4, 1e-4, 1e-5),
               (5, 5e-3, 2e-3), (6, 1e-3, 1e-4)],
    )

    # emit_eval streams (round 4): the in-kernel argmax decision + E_q[x^I]
    # outputs must lower on Mosaic and match interpret. eq gets the q-stream
    # tolerances; dec is an integer argmax that may flip on near-tie symbols
    # under bf16 matmul noise, so it gets a mismatch-rate budget instead.
    def frame_kernel_ee_run(interpret):
        return vae_dp_frame_train_pallas_rb(
            w_rb, h_rb, opt_rb, rx_rb, amps_np, var_np, const.nu_sc, p_np,
            jnp.float32(2.5e-3), jnp.float32(0.0), jnp.float32(1e9),
            bl_sym=100, interpret=interpret, emit_eval=True,
        )

    def _ee_stage():
        got = jax.block_until_ready(frame_kernel_ee_run(False))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ref = jax.block_until_ready(frame_kernel_ee_run(True))
        np.testing.assert_allclose(
            np.asarray(got[8]), np.asarray(ref[8]), rtol=5e-3, atol=2e-3)
        mism = float(np.mean(np.asarray(got[7]) != np.asarray(ref[7])))
        assert mism <= 0.01, f"dec mismatch rate {mism:.3%}"
        # round-5 sufficient statistics: mm (met minimum, index 9) and s1
        # (softmin normalizer, index 10) carry the q-stream tolerances
        np.testing.assert_allclose(
            np.asarray(got[9]), np.asarray(ref[9]), rtol=5e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(got[10]), np.asarray(ref[10]), rtol=5e-3, atol=2e-3)
        return f"dec flip rate {mism:.2%}"

    stage("emit_eval frame kernel (R=2, dec+eq+mm+s1 streams)", _ee_stage)

    # bf16 q/out streams: the ONLY new Mosaic pattern is the astype+store of
    # the two output blocks — params/losses keep their f32 tolerances, q/out
    # widen to ~1 bf16 ulp (both sides quantize, but on different rounding
    # of the f32 compute)
    def frame_kernel_bf16_run(interpret):
        return vae_dp_frame_train_pallas_rb(
            w_rb, h_rb, opt_rb, rx_rb, amps_np, var_np, const.nu_sc, p_np,
            jnp.float32(2.5e-3), jnp.float32(0.0), jnp.float32(1e9),
            bl_sym=100, interpret=interpret, stream_bf16=True,
        )

    check(
        "bf16-stream frame kernel (R=2, stream_bf16)",
        lambda: frame_kernel_bf16_run(False),
        lambda: frame_kernel_bf16_run(True),
        pairs=[(0, 1e-3, 5e-5), (1, 1e-3, 2e-5), (3, 1e-4, 0), (4, 1e-4, 1e-5),
               (5, 2e-2, 8e-3), (6, 1e-2, 2e-3)],
    )

    # whole-frame CMA chunk kernel vs the lax.scan chunked engine, on-chip
    from vae_equalizer_tpu.models import cma_batch_dp
    from vae_equalizer_tpu.ops.cma_frame_kernel import cma_chunked_frame_pallas

    rx_cma = jnp.asarray(rng.normal(size=(2, 2, 4000)).astype(np.float32))
    h0_cma = jnp.asarray(np.asarray(dirac_taps_dp(25)))

    def cma_engine_hi():
        # the engine's einsums run at default (bf16-pass) precision in
        # production; compare at HIGHEST so the check pins the kernel's math
        # rather than the backend's default-precision rounding (a 2026-08-17
        # compiler drift shifted default-precision results enough to trip
        # the old tolerance through the 40-step chunk recurrence)
        with jax.default_matmul_precision("highest"):
            return cma_batch_dp(rx_cma, 1.0, h0_cma, 1e-4, 100, 2, True)

    check(
        "whole-frame CMA chunk kernel (CMAbatch)",
        lambda: cma_chunked_frame_pallas(rx_cma, 1.0, h0_cma, 1e-4, 100, 100, 2),
        cma_engine_hi,
        # taps are the tight contract (measured 7e-6 max abs at matched
        # precision); per-symbol out/e deltas amplify chaotically through
        # the recurrence (measured 5e-3 worst-case, well under the 0.15
        # level half-spacing that would flip a decision)
        pairs=[(0, 1e-2, 1e-2), (1, 1e-3, 5e-5), (2, 1e-2, 5e-2)],  # out, h, e
    )

    # runs-batched CMA chunk kernel vs per-run single kernel calls, on-chip
    from vae_equalizer_tpu.ops.cma_frame_kernel import (
        cma_chunked_frame_pallas_rb,
    )

    rx_cma2 = jnp.stack([rx_cma, jnp.asarray(
        rng.normal(size=(2, 2, 4000)).astype(np.float32))])
    h0_cma2 = jnp.stack([h0_cma, h0_cma])

    def cma_rb_single_stack():
        outs = [cma_chunked_frame_pallas(rx_cma2[r], 1.0, h0_cma2[r],
                                         1e-4, 100, 20, 2) for r in range(2)]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))

    check(
        "runs-batched CMA chunk kernel (R=2, CMAflex)",
        lambda: cma_chunked_frame_pallas_rb(
            rx_cma2, 1.0, h0_cma2, 1e-4, 100, 20, 2),
        cma_rb_single_stack,
        # kernel-vs-kernel ON-CHIP (the reference is itself a pallas_call —
        # it cannot lower on the CPU backend): only batched-dot vs 2D-dot
        # rounding differs
        pairs=[(0, 1e-3, 1e-3), (1, 1e-4, 1e-5), (2, 1e-3, 5e-3)],  # out, h, e
        ref_on_tpu=True,
    )

    # whole-experiment SISO kernel: 2 epochs x 2 minibatches on-chip
    from vae_equalizer_tpu.ops.siso_frame_kernel import (
        siso_frame_opt_init,
        vae_siso_experiment_train_pallas,
    )

    rx_ep = jnp.asarray(rng.normal(size=(2, 2, 400)).astype(np.float32) * 0.5)
    sopt = siso_frame_opt_init({"w": ws, "h": hs})

    def siso_exp_run(interpret):
        return vae_siso_experiment_train_pallas(
            ws, hs, sopt, rx_ep, amps_np, amp_mean, var_s, p_np,
            jnp.float32(5e-3), bl_sym=100, n_batches=2, epe=2,
            interpret=interpret,
        )

    check(
        "whole-experiment SISO train kernel (2 epochs)",
        lambda: siso_exp_run(False),
        lambda: siso_exp_run(True),
        # w atol: Mosaic vs XLA rounding through 2 epochs of AMSGrad drifts
        # with compiler versions (7.4e-5 observed 2026-08-17 on O(0.03)
        # entries); 2e-4 still pins every optimizer step to ~0.7% while
        # tolerating codegen-level rounding changes
        pairs=[(0, 1e-3, 2e-4), (1, 1e-3, 2e-5), (3, 1e-4, 1e-3)],  # w, h, losses
    )

    # runs-batched whole-experiment SISO kernel: R=2 independent experiments
    from vae_equalizer_tpu.ops.siso_frame_kernel import (
        vae_siso_experiment_train_pallas_rb,
    )

    ws2 = jnp.stack([ws, jnp.asarray(
        np.asarray(ws) + 0.01 * rng.normal(size=ws.shape).astype(np.float32))])
    hs2 = jnp.stack([hs, jnp.asarray(
        np.asarray(hs) + 0.01 * rng.normal(size=hs.shape).astype(np.float32))])
    rx_ep2 = jnp.asarray(rng.normal(size=(2, 2, 2, 400)).astype(np.float32) * 0.5)
    sopt2 = siso_frame_opt_init({"w": ws2, "h": hs2})

    def siso_rb_run(interpret):
        return vae_siso_experiment_train_pallas_rb(
            ws2, hs2, sopt2, rx_ep2, amps_np, amp_mean, var_s, p_np,
            jnp.float32(5e-3), bl_sym=100, n_batches=2, epe=2,
            interpret=interpret,
        )

    check(
        "runs-batched SISO experiment kernel (R=2, 2 epochs)",
        lambda: siso_rb_run(False),
        lambda: siso_rb_run(True),
        # w atol 1e-3 (vs 2e-4 single-run): the rb body's batched dots round
        # differently from interpret's f64-ish numpy path, and AMSGrad chaos
        # amplifies it (observed 7.8e-4 max abs on 1/100 entries over 2
        # epochs, 2026-08-18, losses still within 1e-3) — still pins every
        # optimizer step to ~3% on O(0.03) entries
        pairs=[(0, 1e-3, 1e-3), (1, 1e-3, 2e-5), (3, 1e-4, 1e-3)],  # w, h, losses
    )

    # whole-experiment VAE-NN kernel: 2 epochs x 2 minibatches on-chip
    from vae_equalizer_tpu.models import vae_nn_init
    from vae_equalizer_tpu.ops.nn_frame_kernel import (
        _to_parity_major as _nn_pm,
        flatten_nn_params,
        nn_frame_opt_init,
        vae_nn_experiment_train_pallas,
    )

    nn_net, _ = vae_nn_init(jax.random.PRNGKey(9), 25, 3, 8)
    w1f_s, w2f_s = flatten_nn_params(nn_net)
    nopt = nn_frame_opt_init(w1f_s, w2f_s, _nn_pm(hs))

    def nn_exp_run(interpret):
        return vae_nn_experiment_train_pallas(
            w1f_s, w2f_s, hs, nopt, rx_ep, amps_np, jnp.float32(2e-3),
            bl_sym=100, n_batches=2, epe=2, k1=25, interpret=interpret,
        )

    check(
        "whole-experiment VAE-NN train kernel (2 epochs)",
        lambda: nn_exp_run(False),
        lambda: nn_exp_run(True),
        pairs=[(0, 1e-3, 2e-4), (1, 1e-3, 2e-4), (2, 1e-3, 2e-5),
               (6, 1e-4, 1e-3)],  # w1, w2, h, losses
    )

    from vae_equalizer_tpu.metrics import cpe_dp, find_shift_dp, ser_iqflip

    tx = jnp.asarray(const.amps[rng.integers(0, 8, size=(2, 2, 200))])
    stage("cpe", lambda: cpe_dp(out))
    stage("sync + ser", lambda: ser_iqflip(q, tx))

    import __graft_entry__ as ge

    fn, eargs = ge.entry()
    stage("graft entry forward", lambda: jax.jit(fn)(*eargs))

    print("--- bench (quick) ---", flush=True)
    from bench import measure_tpu, measure_tpu_compiled, get_baseline

    try:
        r = measure_tpu(3, 2000)
        print("quick:", r, flush=True)
        rc = measure_tpu_compiled(3, 2000)
        print("quick compiled:", rc, flush=True)
        r8 = measure_tpu(2, 2000, runs=8)
        print("quick aggregate 8 runs:", r8, flush=True)
        if args.full:
            rf = measure_tpu(10, 10000)
            print("FULL:", rf, flush=True)
            rfc = measure_tpu_compiled(10, 10000)
            print("FULL compiled:", rfc, flush=True)
            rf8 = measure_tpu(5, 10000, runs=8)
            print("FULL aggregate 8 runs:", rf8, flush=True)
            base = get_baseline(10000)
            print("vs baseline:", rf["symbols_per_sec"] / base["symbols_per_sec"], flush=True)
    except Exception as e:
        print("bench FAIL:", type(e).__name__, str(e)[:200], flush=True)
        FAILURES.append("bench")

    if FAILURES:
        print(f"SMOKE FAILED: {len(FAILURES)} stage(s): {FAILURES}", flush=True)
        sys.exit(1)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
