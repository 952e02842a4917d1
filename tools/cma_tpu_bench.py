"""Measure the three CMA DP variants on the real chip (VERDICT item: record
on-TPU numbers for CMA / CMAbatch / CMAflex; port the chunked engine to a
Pallas kernel only if per-chunk dispatch dominates).

Each variant runs the full per-frame pipeline (channel gen -> adaptation ->
CPE -> sync -> SER/MI) at the reference's full frame size. Timing method:
progress-callback timestamps, frame 0 (compile) excluded — same protocol as
bench.py.

Usage: python tools/cma_tpu_bench.py [--frames N] [--n-frame N] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(loss_type: str, frames: int, n_frame: int, use_pallas=False,
            compiled: bool = False, runs: int | None = None,
            runs_batch: int | None = None) -> dict:
    import jax

    from vae_equalizer_tpu.train import run_cma_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    lr = {"CMA": 1e-3, "CMAbatch": 1e-4, "CMAflex": 5e-5}[loss_type]
    cfg = DpConfig(loss_type=loss_type, mod="64-QAM", n_frame_max=n_frame,
                   num_frames=frames + (0 if compiled else 1), lr=lr,
                   n_lrhalf=10**9)
    import numpy as np

    if compiled:
        # whole-experiment lax.scan, AOT-compiled, best-of-3 pure execution
        # via the harness timings hook — the device-compute ceiling (the
        # per-frame-dispatch mode below pays a 10-30 ms tunnel round trip
        # per frame, which dominates at these frame times; train/harness.py)
        timings: dict = {}
        kw = {} if runs is None else {
            "runs": runs,
            **({"runs_batch": runs_batch} if runs_batch else {}),
        }
        res = run_cma_dp(cfg, jax.random.PRNGKey(0), compiled=True,
                         use_pallas=use_pallas, timings=timings, **kw)
        n_runs = runs or 1
        return {
            "loss_type": loss_type
            + ("+frame-kernel" if use_pallas == "frame"
               else "+pallas" if use_pallas else "")
            + "+compiled"
            + (f"+rb{runs_batch or ''}x{runs}" if runs else ""),
            "symbols_per_sec": n_runs * frames * n_frame / timings["run_s"],
            "sec_per_frame": timings["run_s"] / frames,
            "compile_s": timings["compile_s"],
            "final_ser_const": np.asarray(res["ser"]).reshape(-1)[:2].tolist(),
        }

    times = []

    def progress(frame, m):
        times.append(time.perf_counter())

    res = run_cma_dp(cfg, jax.random.PRNGKey(0), progress=progress,
                     use_pallas=use_pallas)
    dt = times[-1] - times[0]

    return {
        "loss_type": loss_type + ("+pallas" if use_pallas else ""),
        "symbols_per_sec": frames * n_frame / dt,
        "sec_per_frame": dt / frames,
        "final_ser_const": np.asarray(res["ser"][:2, -1]).tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--n-frame", type=int, default=10000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print("device:", jax.devices()[0], flush=True)
    cases = [
        ("CMA", False, False), ("CMA", True, False),
        ("CMAbatch", False, False), ("CMAflex", False, False),
        # compiled mode: the honest device-compute numbers (VERDICT round-2:
        # the per-frame-dispatch rows above are tunnel-tax-dominated)
        ("CMA", False, True), ("CMA", True, True),
        ("CMAbatch", False, True), ("CMAflex", False, True),
        # whole-frame MXU chunk kernel (ops/cma_frame_kernel.py): all of a
        # frame's chunked tap updates in one pallas_call
        ("CMAbatch", "frame", True), ("CMAflex", "frame", True),
        # aggregate: the reference's 5-repeat workload (Eval_run_DP iter=5)
        # through the runs-batched chunk kernel vs the vmapped scan engine
        ("CMAbatch", "frame", True, 5, 5), ("CMAflex", "frame", True, 5, 5),
        ("CMAbatch", False, True, 5, None), ("CMAflex", False, True, 5, None),
    ]
    for lt, pallas, comp, *agg in cases:
        runs, rb = agg if agg else (None, None)
        try:
            r = measure(lt, args.frames, args.n_frame, use_pallas=pallas,
                        compiled=comp, runs=runs, runs_batch=rb)
            print(json.dumps(r), flush=True)
        except Exception as e:
            print(f"# {lt} pallas={pallas} compiled={comp} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
