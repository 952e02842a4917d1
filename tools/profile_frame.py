"""Per-frame device-compute breakdown of the flagship DP VAE experiment.

Times, on the current backend (the real chip under axon), each stage of one
frame of the Eval_run_DP workload — channel generation, the 100-minibatch
training scan (XLA and fused-Pallas variants), and the synchronized
evaluation block. A single dispatch on this transport costs ~10-30 ms of
tunnel latency (train/harness.py), which would swamp the ~10 ms of actual
device work per frame, so every stage is repeated R times INSIDE one jitted
lax.scan (carry-threaded so nothing is dead-code-eliminated) and the
per-iteration time is reported: device compute, dispatch amortized away.

Usage: python tools/profile_frame.py [--n-frame 10000] [--inner 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def timed(fn, reps):
    import jax

    jax.block_until_ready(fn())  # warm-up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-frame", type=int, default=10000)
    ap.add_argument("--inner", type=int, default=20, help="in-program repetitions per stage")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp, vae_le_dp_forward
    from vae_equalizer_tpu.models.losses import elbo_dp
    from vae_equalizer_tpu.train.dp import _dp_frame_eval, _setup, _vae_optimizer
    from vae_equalizer_tpu.train.eval_utils import batch_cut_weight
    from vae_equalizer_tpu.utils.config import DpConfig

    cfg = DpConfig(mod="64-QAM", n_frame_max=args.n_frame, n_lrhalf=10**9)
    m_max = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max * cfg.batch_len
    const, var, gen, amps, P = _setup(cfg, n_frame)
    mb_len = cfg.batch_len * cfg.sps
    R = args.inner

    key = jax.random.PRNGKey(0)
    theta = jnp.float32(cfg.theta)
    params = {"w": butterfly_init(cfg.m_est), "h": dirac_taps_dp(cfg.m_est)}
    opt = _vae_optimizer(cfg, m_max)
    opt_state = opt.init(params)

    print(f"device={jax.devices()[0]}  n_frame={n_frame}  m_max={m_max}  inner={R}")

    # dispatch floor: an (almost) empty program, same transport
    @jax.jit
    def nop(x):
        return x + 1.0

    t_nop = timed(lambda: nop(jnp.float32(0.0)), args.reps)

    # ---- stage 1: channel generation, R frames inside one program
    keys = jax.random.split(key, R)

    @jax.jit
    def gen_r(keys):
        def body(acc, k):
            rx, tx, sigma = gen(k, theta)
            return acc + jnp.sum(rx[..., :8]) + sigma, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    t_gen = timed(lambda: gen_r(keys), args.reps) / R
    rx, tx, sigma = jax.block_until_ready(jax.jit(gen)(key, theta))

    def loss_fn(p, rx_mb):
        q, out = vae_le_dp_forward(p["w"], rx_mb, amps, var, const.nu_sc, cfg.sps)
        loss, var_est = elbo_dp(q, rx_mb, p["h"], amps, P)
        return loss, (q, out, var_est)

    # ---- stage 2: the minibatch training scan, R frame-scans per program
    def make_scan_r(step_fn):
        def mb(carry, m):
            p, s = carry
            rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 2)
            g, aux = step_fn(p, rx_mb)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), aux

        @jax.jit
        def run(p, s):
            def frame(carry, _):
                carry, aux = jax.lax.scan(mb, carry, jnp.arange(m_max))
                return carry, None

            (p, s), _ = jax.lax.scan(frame, (p, s), None, length=R)
            return p

        return run

    def xla_step(p, rx_mb):
        (loss, (q, out, var_est)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, rx_mb)
        return g, (loss, q, out, var_est)

    scan_xla = make_scan_r(xla_step)
    t_scan = timed(lambda: scan_xla(params, opt_state), args.reps) / R

    t_scan_pl = None
    try:
        from vae_equalizer_tpu.ops.elbo_kernel import vae_dp_loss_and_grad_pallas

        def pl_step(p, rx_mb):
            loss, var_est, gw, gh, q, out = vae_dp_loss_and_grad_pallas(
                p["w"], p["h"], rx_mb, amps, var, const.nu_sc, P
            )
            return {"w": gw, "h": gh}, (loss, q, out, var_est)

        scan_pl = make_scan_r(pl_step)
        t_scan_pl = timed(lambda: scan_pl(params, opt_state), args.reps) / R
    except Exception as e:  # CPU backend: Mosaic kernels don't lower
        print(f"# pallas scan skipped: {e}")

    # materialize one frame's outputs for the eval stage
    def mb1(carry, m):
        p, s = carry
        rx_mb = jax.lax.dynamic_slice_in_dim(rx, m * mb_len, mb_len, 2)
        g, aux = xla_step(p, rx_mb)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), aux

    (_, _), (losses, q_mb, out_mb, var_est) = jax.block_until_ready(
        jax.jit(lambda p, s: jax.lax.scan(mb1, (p, s), jnp.arange(m_max)))(
            params, opt_state
        )
    )

    # ---- stage 3: the evaluation block, R times per program
    n_out = q_mb.shape[0] * q_mb.shape[-1]
    q_train = jnp.moveaxis(q_mb, 0, 2).reshape(2, 2 * const.num_lev, n_out)
    out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)

    @jax.jit
    def eval_r(q_train, out_const, tx):
        def body(acc, i):
            ser_const, ser_soft, mi, shift, r = _dp_frame_eval(
                q_train + 0.0 * acc, out_const, tx, amps, P, const.nu_sc, var,
                lambda s0, ms: batch_cut_weight(m_max, cfg.batch_len, s0, ms, cfg.n_cut),
            )
            return acc + jnp.sum(ser_const) + jnp.sum(ser_soft) + jnp.sum(mi), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    t_eval = timed(lambda: eval_r(q_train, out_const, tx), args.reps) / R

    total = t_gen + t_scan + t_eval
    print(f"dispatch floor   : {t_nop * 1e3:8.2f} ms (empty program, not in sum)")
    print(f"channel gen      : {t_gen * 1e3:8.2f} ms")
    print(f"train scan (XLA) : {t_scan * 1e3:8.2f} ms   ({t_scan / m_max * 1e6:.0f} us/step)")
    if t_scan_pl is not None:
        print(f"train scan (PL)  : {t_scan_pl * 1e3:8.2f} ms   ({t_scan_pl / m_max * 1e6:.0f} us/step)")
    print(f"eval block       : {t_eval * 1e3:8.2f} ms")
    print(f"sum              : {total * 1e3:8.2f} ms/frame -> {n_frame / total / 1e3:.0f}k sym/s")


if __name__ == "__main__":
    main()
