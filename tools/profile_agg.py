"""Per-stage device breakdown of the AGGREGATE (runs-batched) DP experiment.

Times, on the current backend, 170-frame scan VARIANTS of the flagship
Eval_run_DP workload at R kernel-batched runs (the macro-difference method of
PARITY_RESULTS: single dispatches through the tunnel are noise, differences
between whole-program variants are trustworthy):

  gen       — vmapped channel generation only
  gen+train — generation + the runs-batched whole-frame kernel
  full      — generation + kernel + synchronized eval (== the bench program)

Usage: python tools/profile_agg.py [--runs 8] [--frames 170] [--n-frame 10000]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, reps=3):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn())  # compile
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=8, help="total runs")
    ap.add_argument("--rb", type=int, default=None,
                    help="kernel batch size (default min(runs, 8))")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 q/out output streams (stream_bf16)")
    ap.add_argument("--frames", type=int, default=170)
    ap.add_argument("--n-frame", type=int, default=10000)
    args = ap.parse_args()

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp
    from vae_equalizer_tpu.ops.frame_kernel import (
        frame_opt_init,
        vae_dp_frame_train_pallas_rb,
    )
    from vae_equalizer_tpu.train.eval_utils import batch_cut_weight
    from vae_equalizer_tpu.train.dp import (
        _dp_frame_eval_mb,
        _frame_inputs,
        _setup,
    )
    from vae_equalizer_tpu.utils.config import DpConfig

    R = args.runs
    RB = args.rb or min(R, 8)
    assert R % RB == 0
    G = R // RB
    cfg = DpConfig(mod="64-QAM", n_frame_max=args.n_frame,
                   num_frames=args.frames, n_lrhalf=10**9)
    m_max = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max * cfg.batch_len
    const, var, gen, amps, P = _setup(cfg, n_frame)
    thresh = float(cfg.n_lrhalf) * m_max

    params = {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (G, RB) + x.shape), params)
    opt0 = frame_opt_init(params)
    keys, thetas = _frame_inputs(cfg, jax.random.PRNGKey(0))

    def gen_r(key, theta):
        ks = jax.random.split(key, R)
        return jax.vmap(gen, in_axes=(0, None))(ks, theta)

    def weight_fn(s0, ms):
        return batch_cut_weight(m_max, cfg.batch_len, s0, ms, cfg.n_cut)

    def eval_one(losses, q_mb, out_mb, var_est, tx, sigma):
        # Thread EVERY eval output into the result: returning only ser_soft
        # let XLA dead-code-eliminate MI, const-SER and the second sync, so
        # the "full" variant understated the real pipeline's eval stage by
        # ~2x (r4_eval_breakdown.log vs the 28.5M bench capture).  Use the
        # minibatch-layout eval — what _finish_vae_frame actually runs.
        n_out = out_mb.shape[0] * out_mb.shape[-1]
        out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)
        ser_const, ser_soft, mi, shift, r = _dp_frame_eval_mb(
            q_mb, out_const, tx, amps, P, const.nu_sc, var, weight_fn
        )
        return (ser_const.sum() + ser_soft.sum() + mi.sum()
                + shift.astype(jnp.float32).sum() + r.astype(jnp.float32))

    def body(carry, inp, *, do_train, do_eval):
        p, opt, count, acc = carry
        key, theta = inp
        rx, tx, sigma = gen_r(key, theta)
        if do_train:
            rx_g = rx.reshape((G, RB) + rx.shape[1:])

            def kernel_group(pg, og, rxg):
                return vae_dp_frame_train_pallas_rb(
                    pg["w"], pg["h"], og, rxg, amps, var, const.nu_sc, P,
                    jnp.float32(cfg.lr), count.astype(jnp.float32),
                    jnp.float32(thresh), bl_sym=cfg.batch_len,
                    stream_bf16=args.bf16,
                )

            w, h, opt, losses, var_est, q_mb, out_mb = jax.vmap(kernel_group)(
                p, opt, rx_g
            )
            p = {"w": w, "h": h}
            acc = acc + losses[:, -1].sum()
        else:
            acc = acc + rx.sum() * 1e-12
        if do_eval:
            tx_g = tx.reshape((G, RB) + tx.shape[1:])
            sg = sigma.reshape((G, RB) + sigma.shape[1:])
            sers = jax.vmap(jax.vmap(eval_one, in_axes=(1, 1, 1, 1, 0, 0)))(
                losses, q_mb, out_mb, var_est, tx_g, sg
            )
            acc = acc + sers.sum() * 0.0 + sers.mean()
        return (p, opt, count + m_max, acc), None

    import functools

    def program(do_train, do_eval):
        b = functools.partial(body, do_train=do_train, do_eval=do_eval)

        @jax.jit
        def run():
            carry0 = (params, opt0, jnp.int32(0), jnp.float32(0.0))
            (p, _, _, acc), _ = jax.lax.scan(b, carry0, (keys, thetas))
            return acc

        return run

    results = {}
    for name, dt, de in [("gen", False, False), ("gen+train", True, False),
                         ("full", True, True)]:
        best, comp = timed(program(dt, de))
        per_frame = best / args.frames * 1e3
        results[name] = per_frame
        print(f"{name:>10}: {per_frame:8.3f} ms/frame  "
              f"(total {best:.3f} s, compile {comp:.0f} s)", flush=True)
    print(f"\nR={R} (rb={RB}, bf16={args.bf16}): train stage = {results['gen+train']-results['gen']:.3f} "
          f"ms/frame, eval stage = {results['full']-results['gen+train']:.3f} "
          f"ms/frame, gen stage = {results['gen']:.3f} ms/frame", flush=True)
    agg = R * args.frames * n_frame / (results["full"] * args.frames * 1e-3)
    print(f"implied aggregate: {agg:,.0f} sym/s", flush=True)


if __name__ == "__main__":
    main()
