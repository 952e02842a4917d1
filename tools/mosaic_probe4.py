"""Probe: per-op cost of runs-batched (R-leading) vs 2D run-packed kernel ops.

Round-3 follow-up — the a-major store cut moved the train stage only 3%, so
stores are not the binding cost of the rb frame kernel. Measured here: a
batched expand-style dot at R=8 costs ~190 ns (vs ~25 ns at R=1), and the
step body contains ~90 such dots — the batched-dot ISSUE count is the cost.

Candidates measured against the incumbent formulations:
  - expand4 / sel_dot: 4 per-component (R,8,1)@(R,1,N) expands vs ONE
    (R,32,4)@(R,4,N) selection-matrix dot
  - conv_b / conv_2d: 8-pass batched (R,4,52)@(R,52,88) vs one 2D
    run-block-diagonal (32,448)@(448,88)
  - elem_b / elem_2d: (R,4,N) elementwise (quarter tiles) vs (R*4,N) 2D
    (full tiles)
Each variant runs a dependent chain inside a 20000-step sequential grid;
inputs are perturbed per execution; report best-of-5 total and per-op cost
over the baseline. (An earlier version of this file read ~0 for everything:
chains whose results only feed the scratch via a rank-broadcast add were
optimized out — every chain now feeds the scratch through the dot output.)

Usage: python tools/mosaic_probe4.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from vae_equalizer_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_HI = jax.lax.Precision.HIGHEST
N = 100
STEPS = 20000
R = 8


def _bdot(a, b, contract=((2,), (1,))):
    return jax.lax.dot_general(a, b, (contract, ((0,), (0,))),
                               preferred_element_type=jnp.float32, precision=_HI)


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32, precision=_HI)


def make_kernel(variant: str, reps: int, r: int):
    def kern(x_ref, ones_s_ref, sel_ref, conv_ref, conv2d_ref, o_ref, acc_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]

        acc = acc_sc[...]  # (r, 8, N) carried chain
        out = acc
        if variant == "expand4":
            # 4 per-component expands, like the demapper/backward loops
            row = acc[:, 0:1, :]
            for _ in range(reps):
                f0 = _bdot(ones_s_ref[...], row)  # (r, 8, N)
                f1 = _bdot(ones_s_ref[...], f0[:, 1:2, :])
                f2 = _bdot(ones_s_ref[...], f1[:, 2:3, :])
                f3 = _bdot(ones_s_ref[...], f2[:, 3:4, :])
                row = f3[:, 0:1, :] * (1.0 - 1e-6)
            out = f3
        elif variant == "sel_dot":
            # ONE (r,32,4)@(r,4,N) selection dot -> use 8 rows of the result
            a4 = acc[:, 0:4, :]
            for _ in range(reps):
                big = _bdot(sel_ref[...], a4)  # (r, 32, N)
                a4 = big[:, 0:4, :] * (1.0 - 1e-6)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, 0)))
        elif variant == "conv_b":
            a4 = acc[:, 0:4, :52]
            for _ in range(reps):
                d = _bdot(a4, conv_ref[...])  # (r, 4, 88)
                a4 = d[:, :, :52] * (1.0 - 1e-6)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, N - 52)))
        elif variant == "elem_b":
            a4 = acc[:, 0:4, :]
            for _ in range(reps):
                a4 = a4 * (1.0 - 1e-7) + 1e-9
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, 0)))
        elif variant == "baseline":
            out = acc * (1.0 - 1e-7)
        acc_sc[...] = out
        o_ref[...] = out

    return kern


def make_kernel_2d(variant: str, reps: int):
    def kern(x_ref, conv2d_ref, o_ref, acc_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]

        acc = acc_sc[...]  # (8R, W) run-packed rows
        out = acc
        if variant == "conv_2d":
            # ONE 2D dot with the full 8-run contraction reach:
            # (32, 448) @ (448, 88) — the run-block-diagonal formulation
            a32 = acc[: 4 * R, :]  # (32, W)
            for _ in range(reps):
                d = _dot(a32[:, : 56 * R], conv2d_ref[...])  # (32, 88)
                a32 = jnp.pad(d, ((0, 0), (0, acc.shape[1] - 88))) * (1.0 - 1e-6)
            out = jnp.pad(a32, ((0, 4 * R), (0, 0)))
        elif variant == "elem_2d":
            a32 = acc[: 4 * R, :]
            for _ in range(reps):
                a32 = a32 * (1.0 - 1e-7) + 1e-9
            out = jnp.pad(a32, ((0, 4 * R), (0, 0)))
        elif variant == "baseline2d":
            out = acc * (1.0 - 1e-7)
        acc_sc[...] = out
        o_ref[...] = out

    return kern


def timeit(g, args):
    """Best-of-3 with a TRUE D2H fetch: on the axon backend
    block_until_ready returns before execution (async tunnel futures), so
    only float(result) marks completion; and the fixed dispatch+fetch
    overhead is ~25-30 ms — callers must difference two grid lengths."""
    import numpy as _np

    rng = _np.random.default_rng(7)
    t0 = time.perf_counter()
    float(g(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=args[0].shape).astype(_np.float32) * 0.1)
        float(x.reshape(-1)[0])  # input resident before the clock starts
        t0 = time.perf_counter()
        float(g(x, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best, comp


def run(variant: str, reps: int, steps: int):
    x = jnp.full((R, 8, N), 0.5, jnp.float32)
    ones_s = jnp.ones((R, 8, 1), jnp.float32)
    sel = jnp.ones((R, 32, 4), jnp.float32) * 0.25
    conv = jnp.full((R, 52, 88), 1e-2, jnp.float32)
    conv2d = jnp.full((56, 88), 1e-2, jnp.float32)
    f = pl.pallas_call(
        make_kernel(variant, reps, R),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, 8, N), jnp.float32)],
    )
    g = jax.jit(lambda *a: f(*a).sum())
    return timeit(g, (x, ones_s, sel, conv, conv2d))


def run2d(variant: str, reps: int, steps: int):
    W = 56 * R  # lanes: enough for the (32, 448) block-diagonal contraction
    x = jnp.full((8 * R, W), 0.5, jnp.float32)
    conv2d = jnp.full((W, 88), 1e-2, jnp.float32)
    f = pl.pallas_call(
        make_kernel_2d(variant, reps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * R, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8 * R, W), jnp.float32)],
    )
    g = jax.jit(lambda *a: f(*a).sum())
    return timeit(g, (x, conv2d))


S_LO, S_HI = 5000, 40000


def main():
    print(f"grids {S_LO}/{S_HI} steps (per-op = delta / {S_HI - S_LO}), N={N}, R={R}")
    for variant, reps, runner, nops in [
        ("expand4", 8, run, 4), ("sel_dot", 8, run, 1),
        ("conv_b", 8, run, 1), ("elem_b", 32, run, 1),
        ("conv_2d", 8, run2d, 1), ("elem_2d", 32, run2d, 1),
    ]:
        t_lo, comp = runner(variant, reps, S_LO)
        t_hi, _ = runner(variant, reps, S_HI)
        per_step = (t_hi - t_lo) * 1e9 / (S_HI - S_LO)
        per_op = per_step / (reps * nops)
        print(f"{variant:10s} reps={reps:3d} lo={t_lo*1e3:7.2f} ms hi={t_hi*1e3:7.2f} ms "
              f"-> {per_step:8.1f} ns/step, {per_op:7.1f} ns/op (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
