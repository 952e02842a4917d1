"""Sub-stage breakdown of the aggregate DP EVAL stage (the post-train 25%).

Same macro-difference methodology as tools/profile_agg.py (170-frame scan
program VARIANTS, best-of-N): each variant runs gen + the runs-batched train
kernel plus a cumulative PREFIX of the eval pipeline, so adjacent
differences isolate one eval sub-stage each:

  none   — gen + train only (baseline; == profile_agg "gen+train")
  pack   — + the (n_mb, 2, C, bl) -> (2, C, N) moveaxis/reshape of q/out
  sync   — + find_shift_dp on the packed posteriors + align_tx_dp
  soft   — + ser_iqflip (masked soft SER)
  mi     — + mutual_information_ambiguity
  full   — + the second sync (find_shift_symb_dp) + ser_constell_shaping
           (== the complete packed-layout _dp_frame_eval)
  full_mb — the complete minibatch-layout _dp_frame_eval_mb instead (no
           posterior transpose; == what _finish_vae_frame runs)

Every variant threads its outputs into the scan carry so XLA cannot
dead-code-eliminate the stage under test.

Usage: python tools/profile_eval.py [--runs 128] [--frames 170]
"""

from __future__ import annotations

import argparse
import functools
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


PARTS = ["none", "pack", "sync", "soft", "mi", "full", "full_mb"]
MB_PARTS = ["none", "mb_sync", "mb_soft", "mb_mi", "mb_const"]
# finer sync-stage resolution (adjacent differences isolate the expectation
# reduction / the shift correlation core / the data-dependent align rolls /
# the const-stream sync vs its shaping SER)
MB_FINE_PARTS = ["none", "mb_e", "mb_corr", "v_corr_sub4", "mb_sync",
                 "mb_soft", "mb_mi", "mb_mi_sp", "mb_mi_st", "mb_csync",
                 "mb_const"]
# v_corr_sub4: the shift core with a stride-4 subsampled correlation sum
# (4x less roll-stack traffic; lag resolution unchanged) — measured as
# none + e + core, directly comparable to mb_corr.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=128)
    ap.add_argument("--rb", type=int, default=None)
    ap.add_argument("--frames", type=int, default=170)
    ap.add_argument("--n-frame", type=int, default=10000)
    ap.add_argument("--parts", nargs="*", default=PARTS)
    ap.add_argument("--mb", action="store_true",
                    help="profile the minibatch-layout eval prefixes instead")
    ap.add_argument("--fine", action="store_true",
                    help="with --mb: finer sync/const sub-stage prefixes")
    ap.add_argument("--ke", action="store_true",
                    help="with --mb: kernel emits the eval streams "
                         "(emit_eval=True) and the sync/soft prefixes consume "
                         "dec/eq instead of re-reading the posterior stream")
    ap.add_argument("--no-q", action="store_true",
                    help="with --ke: emit_q=False — the kernel skips writing "
                         "the posterior stream entirely (round-5 production "
                         "path; MI must come from the mm/s1 stats, so the "
                         "mb_mi/mb_mi_sp parts are unavailable)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 q/out output streams (stream_bf16)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU plumbing check (pallas interpret mode)")
    args = ap.parse_args()
    if args.mb and args.parts == PARTS:
        args.parts = MB_FINE_PARTS if args.fine else MB_PARTS
    if args.no_q:
        assert args.ke, "--no-q needs --ke"
        args.parts = [pt for pt in args.parts
                      if pt not in ("mb_mi", "mb_mi_sp", "pack", "mi",
                                    "full", "full_mb")]
    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vae_equalizer_tpu.metrics.mi import mutual_information_ambiguity
    from vae_equalizer_tpu.metrics.ser import ser_constell_shaping, ser_iqflip
    from vae_equalizer_tpu.metrics.sync import find_shift_dp, find_shift_symb_dp
    from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp
    from vae_equalizer_tpu.ops.frame_kernel import (
        frame_opt_init,
        vae_dp_frame_train_pallas_rb,
    )
    from vae_equalizer_tpu.train.eval_utils import align_tx_dp, batch_cut_weight
    from vae_equalizer_tpu.train.dp import _frame_inputs, _setup
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

    def eval_prefix(part, q_mb, out_mb, tx, dec_mb=None, eq_mb=None,
                    mm_mb=None, s1_mb=None):
        """Cumulative eval prefix; returns a scalar that depends on every
        computed piece."""
        acc = out_mb.sum() * 1e-12 if q_mb is None else q_mb.sum() * 1e-12
        if dec_mb is not None:
            # depend on the emitted streams so "none" pays their DMA too
            acc = acc + dec_mb[..., 0].sum() * 1e-12 + eq_mb[..., 0].sum() * 1e-12
        if mm_mb is not None:
            acc = acc + mm_mb[..., 0].sum() * 1e-12 + s1_mb[..., 0].sum() * 1e-12
        if part == "none":
            return acc
        n_out = out_mb.shape[0] * out_mb.shape[-1]
        if part.startswith("mb_"):
            # cumulative prefixes of the MINIBATCH-layout eval (the
            # production path, _dp_frame_eval_mb) — adjacent differences vs
            # "none" isolate sync / decisions+SER / MI / const sub-stages
            from vae_equalizer_tpu.metrics.mi import (
                mutual_information_ambiguity_mb,
                mutual_information_ambiguity_mb_sp,
            )
            from vae_equalizer_tpu.metrics.ser import (
                iqflip_decisions_mb,
                ser_iqflip_from_dec,
            )
            from vae_equalizer_tpu.metrics.sync import (
                _dp_shift_core,
                find_shift_dp_mb,
            )
            from vae_equalizer_tpu.train.dp import _SYNC_CORR_LEN

            if part in ("mb_e", "mb_corr", "v_corr_sub4"):
                # sync sub-stages: the E_q[x^I] posterior reduction alone,
                # then + the 21-lag correlation/argmax core (no align);
                # v_corr_sub4 = the core with a stride-4 correlation sum
                if eq_mb is not None:
                    e_mb = eq_mb.astype(jnp.float32)
                else:
                    num_lev = amps.shape[0]
                    qi = q_mb[:, :, :num_lev, :]
                    e_mb = jnp.sum(
                        qi.astype(jnp.float32) * amps[None, None, :, None],
                        axis=2)
                if part == "mb_e":
                    return acc + e_mb.sum()
                e = jnp.moveaxis(e_mb, 0, 1).reshape(2, -1)
                stride = 4 if part == "v_corr_sub4" else 1
                shift, r = _dp_shift_core(e, tx, 21, stride,
                                          corr_len=_SYNC_CORR_LEN)
                return acc + shift.sum() + r

            if eq_mb is not None:
                e = jnp.moveaxis(eq_mb.astype(jnp.float32), 0, 1).reshape(2, -1)
                shift, r = _dp_shift_core(e, tx, 21, corr_len=_SYNC_CORR_LEN)
            else:
                shift, r = find_shift_dp_mb(q_mb, tx, 21, amps,
                                            corr_len=_SYNC_CORR_LEN)
            w_q = weight_fn(shift[0], jnp.max(jnp.abs(shift)))
            tx_al, w_al = align_tx_dp(tx, shift, r, w_q)
            acc = acc + tx_al[0, 0, 0] + w_al[0, 0]
            if part == "mb_sync":
                return acc
            if dec_mb is not None:
                n_mb, _, _, bl = dec_mb.shape
                dec = jnp.moveaxis(dec_mb, 0, 2).reshape(2, 2, n_mb * bl)
                dec = dec.astype(jnp.int32)
            else:
                dec = iqflip_decisions_mb(q_mb)
            ser_soft = jnp.roll(
                ser_iqflip_from_dec(dec, tx_al, const.num_lev, weight=w_al), r)
            acc = acc + ser_soft.sum()
            if part == "mb_soft":
                return acc
            if part == "mb_mi_st" or (mm_mb is not None
                                      and part not in ("mb_mi", "mb_mi_sp")):
                # the production MI when stats are available (and always for
                # the mb_mi_st part); the q-form parts explicitly opt out
                from vae_equalizer_tpu.metrics.mi import (
                    mutual_information_ambiguity_mb_stats,
                )

                mi = jnp.roll(mutual_information_ambiguity_mb_stats(
                    out_mb, mm_mb, s1_mb, tx_al, amps, P, const.nu_sc, var,
                    weight=w_al), r)
            else:
                mi_fn = (mutual_information_ambiguity_mb_sp
                         if part == "mb_mi_sp"
                         else mutual_information_ambiguity_mb)
                mi = jnp.roll(mi_fn(q_mb, tx_al, amps, P, weight=w_al), r)
            acc = acc + mi.sum()
            if part in ("mb_mi", "mb_mi_sp", "mb_mi_st"):
                return acc
            out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)
            shift_c, r_c = find_shift_symb_dp(out_const, tx, 21,
                                              corr_len=_SYNC_CORR_LEN)
            w_c = weight_fn(shift_c[0], jnp.max(jnp.abs(shift_c)))
            tx_al_c, w_al_c = align_tx_dp(tx, shift_c, r_c, w_c)
            acc = acc + tx_al_c[0, 0, 0] + w_al_c[0, 0] + shift_c.sum()
            if part == "mb_csync":
                return acc
            ser_const = jnp.roll(ser_constell_shaping(
                out_const, tx_al_c, amps, const.nu_sc, var, weight=w_al_c),
                r_c)
            return acc + ser_const.sum()  # == full_mb ("mb_const")
        if part == "full_mb":
            from vae_equalizer_tpu.train.dp import _dp_frame_eval_mb

            out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)
            ser_const, ser_soft, mi, shift, r = _dp_frame_eval_mb(
                q_mb, out_const, tx, amps, P, const.nu_sc, var, weight_fn)
            return acc + ser_const.sum() + ser_soft.sum() + mi.sum()
        from vae_equalizer_tpu.train.dp import _SYNC_CORR_LEN

        q_train = jnp.moveaxis(q_mb, 0, 2).reshape(2, 2 * const.num_lev, n_out)
        out_const = jnp.moveaxis(out_mb, 0, 2).reshape(2, 2, n_out)
        acc = acc + q_train[0, 0, 0] + out_const[0, 0, 0]
        if part == "pack":
            return acc
        shift, r = find_shift_dp(q_train, tx, 21, amps, corr_len=_SYNC_CORR_LEN)
        w_q = weight_fn(shift[0], jnp.max(jnp.abs(shift)))
        tx_al, w_al = align_tx_dp(tx, shift, r, w_q)
        acc = acc + tx_al[0, 0, 0] + w_al[0, 0]
        if part == "sync":
            return acc
        ser_soft = ser_iqflip(q_train, tx_al, weight=w_al)
        acc = acc + ser_soft.sum()
        if part == "soft":
            return acc
        mi = mutual_information_ambiguity(q_train, tx_al, amps, P, weight=w_al)
        acc = acc + mi.sum()
        if part == "mi":
            return acc
        shift_c, r_c = find_shift_symb_dp(out_const, tx, 21,
                                          corr_len=_SYNC_CORR_LEN)
        w_c = weight_fn(shift_c[0], jnp.max(jnp.abs(shift_c)))
        tx_al_c, w_al_c = align_tx_dp(tx, shift_c, r_c, w_c)
        ser_const = ser_constell_shaping(
            out_const, tx_al_c, amps, const.nu_sc, var, weight=w_al_c)
        return acc + ser_const.sum()

    def body(carry, inp, *, part):
        p, opt, count, acc = carry
        key, theta = inp
        rx, tx, sigma = gen_r(key, theta)
        rx_g = rx.reshape((G, RB) + rx.shape[1:])

        def kernel_group(pg, og, rxg):
            res = vae_dp_frame_train_pallas_rb(
                pg["w"], pg["h"], og, rxg, amps, var, const.nu_sc, P,
                jnp.float32(cfg.lr), count.astype(jnp.float32),
                jnp.float32(thresh), bl_sym=cfg.batch_len,
                interpret=args.interpret, stream_bf16=args.bf16,
                emit_eval=args.ke, emit_q=not args.no_q,
            )
            return res[:5] + res[6:] if args.no_q else res

        (w, h, opt, losses, var_est, *streams) = jax.vmap(
            kernel_group)(p, opt, rx_g)
        q_mb = None if args.no_q else streams[0]
        out_mb, *ev = streams if args.no_q else streams[1:]
        p = {"w": w, "h": h}
        tx_g = tx.reshape((G, RB) + tx.shape[1:])
        if args.ke:
            evals = jax.vmap(jax.vmap(
                lambda q, o, t, d, e, mm, s1: eval_prefix(
                    part, q, o, t, d, e, mm, s1),
                in_axes=(1 if q_mb is not None else None, 1, 0, 1, 1, 1, 1)))(
                q_mb, out_mb, tx_g, ev[0], ev[1], ev[2], ev[3])
        else:
            evals = jax.vmap(jax.vmap(
                functools.partial(eval_prefix, part), in_axes=(1, 1, 0)))(
                q_mb, out_mb, tx_g)
        acc = acc + losses[:, -1].sum() + evals.sum()
        return (p, opt, count + m_max, acc), None

    def program(part):
        b = functools.partial(body, part=part)

        @jax.jit
        def run():
            carry0 = (params, opt0, jnp.int32(0), jnp.float32(0.0))
            (p, _, _, acc), _ = jax.lax.scan(b, carry0, (keys, thetas))
            return acc

        return run

    results = {}
    prev = None
    for part in args.parts:
        best, comp = timed(program(part))
        per_frame = best / args.frames * 1e3
        delta = "" if prev is None else f"  (+{per_frame - prev:6.3f} vs prev)"
        results[part] = per_frame
        prev = per_frame
        print(f"{part:>6}: {per_frame:8.3f} ms/frame{delta}  "
              f"(total {best:.3f} s, compile {comp:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
