"""Probe: where do the rb frame kernel's 35 us/step actually go?

The round-4 batch-1 rework (ctd/ct2/habsq/gev8 as dots, -90 store issues)
measured NEUTRAL (28.25 vs 27.94 ms/frame at R=128 rb=16) — falsifying the
"VPU tile-issue count" cost model for tiny stores. This probe measures the
per-op cost of every op CLASS the kernel body uses, at the production
batch (R=16), so the remaining optimization targets the real bill:

  mult32   — elementwise mult on the q-sized (16, 32, 100) tensor
  exp32    — jnp.exp on (16, 32, 100)          (transcendental pass)
  log32    — jnp.log on (16, 32, 100)
  div32    — reciprocal-div on (16, 32, 100)
  mult4    — elementwise mult on (16, 4, 100)  (eq4/gd-sized)
  mult8e   — elementwise mult on (16, 8, 88)   (d/gd-sized)
  minchain — the 28-op softmin row-chain on (16, 1, 100) ref slices
  store4   — 13 stores/step of (16, 4, 88) value slices at 4-row offsets
             (the win_stack pattern)
  store8   — 7 stores/step of (16, 8, 88) at ALIGNED 8-row offsets (the
             dual-row window candidate — also validates the Mosaic pattern)
  dot16    — conv-style batched dot (16, 8, 100) @ (16, 100, 88) cross-check

Methodology as probe4/5: dependent chains inside a sequential grid, two grid
lengths differenced, best-of-3 AOT with perturbed inputs and a D2H fetch.

Usage: python tools/mosaic_probe7.py            (on-chip)
       PROBE_INTERP=1 python tools/mosaic_probe7.py   (CPU plumbing check)
"""

from __future__ import annotations

import functools
import os
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
_INTERP = os.environ.get("PROBE_INTERP") == "1"
if _INTERP:
    jax.config.update("jax_platforms", "cpu")
R = 16
N = 100
NE = 88


def _bdot(a, b, contract=((2,), (1,))):
    return jax.lax.dot_general(a, b, (contract, ((0,), (0,))),
                               preferred_element_type=jnp.float32, precision=_HI)


def make_kernel(variant: str, reps: int):
    def kern(x_ref, conv_ref, o_ref, acc_sc, big_sc, row_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]
            big_sc[...] = jnp.zeros(big_sc.shape, jnp.float32)

        a = acc_sc[...]  # (R, 32, N) carried chain
        if variant == "mult32":
            for _ in range(reps):
                a = a * (1.0 - 1e-6)
        elif variant == "exp32":
            for _ in range(reps):
                a = jnp.exp(a * 1e-3) * 0.5
        elif variant == "log32":
            for _ in range(reps):
                a = jnp.log(a * a + 1.5) * 0.9
        elif variant == "div32":
            for _ in range(reps):
                a = 1.0 / (a * a + 1.5)
        elif variant == "mult4":
            a4 = a[:, 0:4, :]
            for _ in range(reps * 8):  # x8 so the delta is comparable
                a4 = a4 * (1.0 - 1e-6)
            a = a * (1.0 - 1e-6) + jnp.pad(a4 * 1e-9, ((0, 0), (0, 28), (0, 0)))
        elif variant == "mult8e":
            a8 = a[:, 0:8, :NE]
            for _ in range(reps * 4):
                a8 = a8 * (1.0 - 1e-6)
            a = a * (1.0 - 1e-6) + jnp.pad(a8 * 1e-9, ((0, 0), (0, 24), (0, N - NE)))
        elif variant == "minchain":
            # the softmin pattern: park, then per 8-row block a 7-min chain
            # over single-row REF slices (4 blocks = 28 mins + 4 stores)
            big_sc[:, 0:32, :N] = a
            for r in range(4):
                r0 = r * 8
                mm = big_sc[:, r0 : r0 + 1, :N]
                for l in range(1, 8):
                    mm = jnp.minimum(mm, big_sc[:, r0 + l : r0 + l + 1, :N])
                row_sc[:, r : r + 1, :N] = mm
            a = a * (1.0 - 1e-6) + row_sc[:, 0:1, :N] * 1e-9
        elif variant == "store4":
            a4 = a[:, 0:4, :NE]
            for k in range(13):
                big_sc[:, 4 * k : 4 * k + 4, :NE] = a4
            a = a * (1.0 - 1e-6) + big_sc[:, 17:18, :N] * 1e-9
        elif variant == "store8":
            big_sc[:, 96:104, :N] = a[:, 0:8, :]  # dual-row source park
            a8 = big_sc[:, 96:104, 0:NE]
            for k in range(7):
                big_sc[:, 8 * k : 8 * k + 8, :NE] = a8
            a = a * (1.0 - 1e-6) + big_sc[:, 17:18, :N] * 1e-9
        elif variant == "dot16":
            a8 = a[:, 0:8, :]
            for _ in range(reps):
                d = _bdot(a8, conv_ref[...])  # (R, 8, NE)
                a8 = jnp.pad(d * 1e-2, ((0, 0), (0, 0), (0, N - NE)))
            a = a * (1.0 - 1e-6) + jnp.pad(a8 * 1e-9, ((0, 0), (0, 24), (0, 0)))
        acc_sc[...] = a
        o_ref[...] = a

    return kern


def run(variant: str, reps: int, steps: int):
    x = jnp.full((R, 32, N), 0.5, jnp.float32)
    conv = jnp.full((R, N, NE), 1e-2, jnp.float32)
    f = pl.pallas_call(
        make_kernel(variant, reps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 32, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, 32, N), jnp.float32),
            pltpu.VMEM((R, 104, N), jnp.float32),
            pltpu.VMEM((R, 4, N), jnp.float32),
        ],
        interpret=_INTERP,
    )
    g = jax.jit(lambda *a: f(*a).sum())
    return timeit(g, (x, conv))


def timeit(g, args):
    import numpy as _np

    rng = _np.random.default_rng(7)
    t0 = time.perf_counter()
    float(g(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        x = jnp.asarray(
            0.5 + rng.normal(size=args[0].shape).astype(_np.float32) * 0.01
        )
        float(x.reshape(-1)[0])
        t0 = time.perf_counter()
        float(g(x, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best, comp


S_LO = int(os.environ.get("PROBE_S_LO", 5000))
S_HI = int(os.environ.get("PROBE_S_HI", 40000))
REPS = 8

# per-step op counts for the normalized report
_UNITS = {
    "mult32": REPS, "exp32": REPS, "log32": REPS, "div32": REPS,
    "mult4": REPS * 8, "mult8e": REPS * 4,
    "minchain": 1, "store4": 13, "store8": 7, "dot16": REPS,
}


def main():
    print(f"R={R}, grids {S_LO}/{S_HI} steps; per-op = delta/steps/units")
    for variant, units in _UNITS.items():
        try:
            t_lo, comp = run(variant, REPS, S_LO)
            t_hi, _ = run(variant, REPS, S_HI)
            per = (t_hi - t_lo) * 1e9 / (S_HI - S_LO) / units
            print(f"{variant:9s}: {per:8.1f} ns/op  (x{units}/step, "
                  f"compile {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — Mosaic may reject a pattern
            print(f"{variant:9s}: FAIL ({type(e).__name__}: {str(e)[:160]})",
                  flush=True)


if __name__ == "__main__":
    main()
