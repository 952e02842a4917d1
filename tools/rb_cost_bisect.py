"""Per-stage cost bisect of the REAL runs-batched frame kernel body.

Times the production kernel (ops/frame_kernel.py) truncated after each of
its 13 checkpoints (the ``cut`` probe gate) on a realistic workload — one
rb-sized run group, m_max minibatch steps per frame, F frames chained in a
lax.scan with the parameter/moment carry. The increment between consecutive
cuts is that stage's real on-chip cost, with dispatch overhead cancelling
in the difference (every program pays the same single dispatch).

Motivated by the round-4 batch-1 result: removing ~90 assembly-store issues
measured NEUTRAL, and tools/mosaic_probe7.py priced stores at ~8 ns and
q-sized elementwise at ~27 ns — so the 35 us/step at rb=16 must sit in the
dots, but WHICH dots (22 of them, widely varying shapes) only a bisect of
the real body can say.

Checkpoints:
   1 forward (w dot + out4 + out stream)      7 stacked sums + stats
   2 demapper (d32/met/min/exp/norm + q out)  8 gfac + gd
   3 E_q moments (eqv dot + var)              9 ghm dots + gh assembly
   4 eqwin window stacks                     10 gdwin stacks + gEq dots
   5 ctd build + D dot pair                  11 gv + gev8 + gq32
   6 E term (vsum/scat/habsq)                12 softmin VJP + gout + gw
                                             13 (= full) Adam updates

Usage: python tools/rb_cost_bisect.py [--rb 16] [--frames 400] [--bl 100]
       [--n-frame 10000] [--bf16]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
from vae_equalizer_tpu.utils.profiling import (  # noqa: E402
    backend_preflight,
    enable_compilation_cache,
)

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rb", type=int, default=16)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--bl", type=int, default=100)
    ap.add_argument("--n-frame", type=int, default=10000)
    ap.add_argument("--m", type=int, default=25)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        backend_preflight()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_equalizer_tpu.ops.frame_kernel import (
        frame_opt_init,
        vae_dp_frame_train_pallas_rb,
    )

    R, m, bl = args.rb, args.m, args.bl
    n_samp = 2 * args.n_frame
    m_max = args.n_frame // bl
    key = jax.random.PRNGKey(0)
    kw, kh, kx = jax.random.split(key, 3)
    w0 = jax.random.normal(kw, (R, 2, 4, m), jnp.float32) * 0.05
    h0 = jax.random.normal(kh, (R, 2, 2, 2, m), jnp.float32) * 0.05
    rx = jax.random.normal(kx, (R, 2, 2, n_samp), jnp.float32)
    amps = jnp.asarray(np.linspace(-1.08, 1.08, 8), jnp.float32)
    P = jnp.full((8,), 0.125, jnp.float32)
    var = jnp.asarray([0.02, 0.02], jnp.float32)
    opt0 = frame_opt_init({"w": w0, "h": h0})

    def make(cut):
        def frame(carry, _):
            w, h, opt, step0 = carry
            w2, h2, opt2, losses, _, _, _ = vae_dp_frame_train_pallas_rb(
                w, h, opt, rx, amps, var, 0.0, P, 2.5e-3, step0, 1e9,
                bl_sym=bl, stream_bf16=args.bf16, cut=cut,
                interpret=args.interpret,
            )
            return (w2, h2, opt2, step0 + m_max), losses[-1].sum()

        def run():
            (_, _, _, _), ls = jax.lax.scan(
                frame, (w0, h0, opt0, jnp.float32(0.0)), None,
                length=args.frames,
            )
            return ls.sum()

        return jax.jit(run)

    print(f"rb={R} m_max={m_max} frames={args.frames} bf16={args.bf16}")
    prev = None
    for cut in list(range(1, 13)) + [None]:
        f = make(cut)
        t0 = time.perf_counter()
        float(f())  # compile + first run
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        us_step = best * 1e6 / (args.frames * m_max)
        inc = "" if prev is None else f"  (+{us_step - prev:6.2f})"
        name = "full" if cut is None else f"{cut:4d}"
        print(f"cut {name}: {us_step:7.2f} us/step{inc}  "
              f"[best {best:.3f}s, first {comp:.0f}s]", flush=True)
        prev = us_step


if __name__ == "__main__":
    main()
