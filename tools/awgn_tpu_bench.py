"""Measure the AWGN experiment family on the real chip.

Full reference-default experiments (500 epochs + every-epe evals), AOT-
compiled, best-of-3 pure executions via the runners' ``timings`` hooks:

  VAE-LE  compiled XLA scan  vs  whole-experiment kernel (siso_frame_kernel)
  VAE-NN  compiled XLA scan  vs  whole-experiment kernel (nn_frame_kernel)

The compiled rows use the harness ``compiled=True`` scan; the kernel rows
use ``use_pallas="frame"``. Trained symbols/sec counts the training stream
only (num_epochs * n_train), matching PARITY_RESULTS convention. For
VAE-LE a third row measures the reference's full 20-run repeat workload
(Eval_run_shaping_vaele.py) through the runs-batched experiment kernel
(--runs/--rb; sym/s scales by runs).

Usage: python tools/awgn_tpu_bench.py [--epochs N] [--runs R] [--rb B]
       [--cpu] [--runner vaele|vaenn]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(runner_name: str, epochs: int, runs: int, rb: int,
            which: tuple = ("compiled", "frame", "rb")) -> list[dict]:
    import jax
    import numpy as np

    from vae_equalizer_tpu.train.awgn import train_vae_le_awgn, train_vae_nn_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeLeConfig, AwgnVaeNnConfig

    rows = []
    if runner_name == "vaele":
        cfg = AwgnVaeLeConfig(num_epochs=epochs)
        runner = train_vae_le_awgn
    else:
        cfg = AwgnVaeNnConfig(num_epochs=epochs)
        runner = train_vae_nn_awgn
    n_train_total = cfg.num_epochs * cfg.n_train

    cases = []
    if "compiled" in which:
        cases.append(("compiled", {"compiled": True}, 1))
    if "frame" in which:
        cases.append(("frame-kernel", {"use_pallas": "frame"}, 1))
    if runner_name == "vaele" and runs and "rb" in which:
        cases.append((f"frame-kernel-rb{rb}x{runs}",
                      {"use_pallas": "frame", "runs": runs, "runs_batch": rb},
                      runs))
    for label, kw, n_runs in cases:
        timings: dict = {}
        out = runner(cfg, jax.random.PRNGKey(0), timings=timings, **kw)
        rows.append({
            "runner": f"{runner_name}+{label}",
            "trained_sym_per_sec": n_runs * n_train_total / timings["run_s"],
            "wall_best_s": timings["run_s"],
            "compile_s": timings["compile_s"],
            "final_ser": float(np.asarray(out["ser"]).reshape(-1)[-1]),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--runner", choices=["vaele", "vaenn", "all"], default="all")
    ap.add_argument("--runs", type=int, default=20,
                    help="aggregate repeat count for the vaele rb row (0 = off)")
    ap.add_argument("--rb", type=int, default=5,
                    help="kernel-level runs batch for the aggregate row")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cases", nargs="*", default=["compiled", "frame", "rb"],
                    help="which rows to measure (compiled/frame/rb) — the "
                         "compiled XLA-scan row OOMs the 16 GiB HBM at AOT "
                         "compile on this backend (it materializes the "
                         "full per-eval stream; round-5 log)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU plumbing check (pallas interpret mode)")
    args = ap.parse_args()

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu or args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.interpret:
        import vae_equalizer_tpu.ops.nn_frame_kernel as nfk
        import vae_equalizer_tpu.ops.siso_frame_kernel as sfk

        for mod, name in ((sfk, "vae_siso_experiment_train_pallas"),
                          (sfk, "vae_siso_experiment_train_pallas_rb"),
                          (nfk, "vae_nn_experiment_train_pallas")):
            orig = getattr(mod, name)
            setattr(mod, name,
                    lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))

    names = ["vaele", "vaenn"] if args.runner == "all" else [args.runner]
    for name in names:
        for row in measure(name, args.epochs, args.runs, args.rb,
                           which=tuple(args.cases)):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
