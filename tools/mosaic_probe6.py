"""Probe: per-pattern VPU/store costs of the rb frame-kernel step at R=16.

The round-4 roofline (PARITY_RESULTS "Roofline refresh") showed the rb body
is VPU-tile-issue bound: 22 dots cost ~18% of the step, the output DMA ~2%,
and ~80% is elementwise ops + assembly stores. This probe prices the actual
assembly patterns so the next body rework attacks the right ones:

1. ew4 / ew32   — one (R,4,N) / (R,32,N) elementwise multiply (unit costs).
2. st4 / st8 / st1n — one scratch store of a (R,4,N) / (R,8,N) value /
   a (R,1,13) narrow row slice (the ct_d/ct2 coefficient-build unit).
3. winstack     — the real eqwin/gdwin im2col pattern: 25 4-row block
   stores of lane-shifted slices (13 even + 12 odd shifts), per rep.
4. winstack8    — the candidate replacement: pre-stack 2 adjacent shifts
   into an (R,8,N) helper once, then 13 8-row block stores.
5. ctd32        — the ct_d/ct2 pattern: 32 (R,1,13) narrow stores of h-row
   slices into a coefficient scratch.
6. ctd_pair     — the candidate replacement: one sign-swap arrangement
   (one (R,8,M) elementwise multiply + 8 2-row stores... measured as
   2-row-store x 16 to bound the win).
7. chainmin     — the demapper stabilizer: 4 components x 7 sequential
   (R,1,N) jnp.minimum row-chain through a scratch ref.
8. treemin      — level-major tree alternative: minimum over 8 levels as
   3 tree steps on (R,16,N)/(R,8,N)/(R,4,N) ref slices (2 intermediate
   stores), all 4 components at once.
9. dot16        — anchor: one dependent (R,4,52)@(R,52,88) dot (probe5's
   dotR at R=16 measured 273 ns).

Methodology as probe4/5: dependent chains inside a sequential grid, two
grid lengths differenced, best-of-3, perturbed inputs.

Usage: python tools/mosaic_probe6.py            (on-chip)
       PROBE_INTERP=1 python tools/mosaic_probe6.py   (plumbing check)
"""

from __future__ import annotations

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
N = 100
R = int(os.environ.get("PROBE_R", 16))
MHE, MHO = 13, 12  # even/odd shift counts at M=25
M4 = 4 * (MHE + MHO)


def _bdot(a, b, contract=((2,), (1,))):
    return jax.lax.dot_general(a, b, (contract, ((0,), (0,))),
                               preferred_element_type=jnp.float32, precision=_HI)


def make_kernel(variant: str, reps: int):
    def kern(x_ref, conv_ref, o_ref, acc_sc, big_sc, q_sc, mm_sc, t16_sc, t8_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]
            big_sc[...] = jnp.zeros(big_sc.shape, jnp.float32)
            q_sc[...] = jnp.zeros(q_sc.shape, jnp.float32)

        acc = acc_sc[...]  # (R, 8, N) carried chain
        dep = acc[:, 0:1, 0:1] * 1e-9  # scalar dependence hook
        if variant == "ew4":
            a4 = acc[:, 0:4, :]
            for _ in range(reps):
                a4 = a4 * (1.0 - 1e-7)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, 0)))
        elif variant == "ew32":
            q_sc[:, 0:8, :] = acc
            a32 = q_sc[...]
            for _ in range(reps):
                a32 = a32 * (1.0 - 1e-7)
            q_sc[...] = a32
            out = acc * (1.0 - 1e-7) + q_sc[:, 0:8, :] * 1e-9
        elif variant == "st4":
            a4 = acc[:, 0:4, :]
            for k in range(reps):
                q_sc[:, 4 * (k % 3) : 4 * (k % 3) + 4, :] = a4 * (1.0 + k * 1e-9)
            out = jnp.pad(q_sc[:, 0:4, :] * 1e-9, ((0, 0), (0, 4), (0, 0))) + acc
        elif variant == "st8":
            a8 = acc
            for k in range(reps):
                q_sc[:, 8 * (k % 3) : 8 * (k % 3) + 8, :] = a8 * (1.0 + k * 1e-9)
            out = q_sc[:, 0:8, :] * 1e-9 + acc
        elif variant == "st1n":
            a1 = acc[:, 0:1, 0:13]
            for k in range(reps):
                big_sc[:, k % 8 : k % 8 + 1, 13 * (k % 4) : 13 * (k % 4) + 13] = (
                    a1 * (1.0 + k * 1e-9)
                )
            out = jnp.pad(
                big_sc[:, 0:1, 0:N] * 1e-9, ((0, 0), (0, 7), (0, 0))
            ) + acc
        elif variant == "winstack":
            # the real eqwin pattern: eq4 (R,4,N+MHE) source, 4-row block
            # stores of lane-shifted slices, shift-major within parity
            eq4 = jnp.pad(acc[:, 0:4, :], ((0, 0), (0, 0), (0, MHE)))
            for _ in range(reps):
                eq4 = eq4 * (1.0 - 1e-7)
                for a in range(MHE):
                    big_sc[:, 4 * a : 4 * a + 4, :] = eq4[:, :, a : a + N]
                for a in range(MHO):
                    big_sc[:, 4 * MHE + 4 * a : 4 * MHE + 4 * a + 4, :] = (
                        eq4[:, :, a + 1 : a + 1 + N]
                    )
            out = jnp.pad(
                big_sc[:, 0:8, 0:N] * 1e-9, ((0, 0), (0, 0), (0, 0))
            ) + acc
        elif variant == "winstack8":
            # candidate: one (R,8,N) helper holding [eq4; eq4<<1], then
            # ceil(25/2)=13 8-row block stores (covers 2 shifts each)
            eq4 = jnp.pad(acc[:, 0:4, :], ((0, 0), (0, 0), (0, MHE)))
            for _ in range(reps):
                eq4 = eq4 * (1.0 - 1e-7)
                t8_sc[:, 0:4, :] = eq4[:, :, 0:N]
                t8_sc[:, 4:8, :] = eq4[:, :, 1 : 1 + N]
                h8 = t8_sc[...]
                for k in range(13):
                    big_sc[:, 8 * k : 8 * k + 8, :] = h8 * (1.0 + k * 1e-9)
            out = big_sc[:, 0:8, 0:N] * 1e-9 + acc
        elif variant == "ctd32":
            # ct_d/ct2 pattern: 32 narrow (R,1,13) stores of h-row slices
            for _ in range(reps):
                for k in range(32):
                    r = k % 8
                    b = k % 4
                    big_sc[:, r : r + 1, 13 * b : 13 * b + 13] = (
                        acc[:, r : r + 1, 0:13] * (1.0 + k * 1e-9)
                    )
            out = jnp.pad(
                big_sc[:, 0:1, 0:N] * 1e-9, ((0, 0), (0, 7), (0, 0))
            ) + acc
        elif variant == "ctd_pair":
            # candidate: one sign-swap multiply + 16 2-row stores
            sw = jnp.ones((R, 8, N), jnp.float32)
            for _ in range(reps):
                hsw = acc * sw
                for k in range(16):
                    r = (2 * k) % 8
                    b = k % 4
                    src = acc if k % 2 == 0 else hsw
                    big_sc[:, r : r + 2, 13 * b : 13 * b + 13] = (
                        src[:, r : r + 2, 0:13] * (1.0 + k * 1e-9)
                    )
            out = jnp.pad(
                big_sc[:, 0:1, 0:N] * 1e-9, ((0, 0), (0, 7), (0, 0))
            ) + acc
        elif variant == "chainmin":
            # 4 comps x 7 sequential (R,1,N) minimum through a ref
            q_sc[:, 0:8, :] = acc
            q_sc[:, 8:16, :] = acc * 1.1
            q_sc[:, 16:24, :] = acc * 1.2
            q_sc[:, 24:32, :] = acc * 1.3
            for _ in range(reps):
                for c in range(4):
                    r0 = 8 * c
                    mm = q_sc[:, r0 : r0 + 1, :]
                    for l in range(1, 8):
                        mm = jnp.minimum(mm, q_sc[:, r0 + l : r0 + l + 1, :])
                    mm_sc[:, c : c + 1, :] = mm * (1.0 - 1e-9)
            out = jnp.pad(mm_sc[...] * 1e-9, ((0, 0), (0, 4), (0, 0))) + acc
        elif variant == "treemin":
            # level-major tree: (R,32,N) -> 16 -> 8 -> 4 via ref slices
            q_sc[:, 0:8, :] = acc
            q_sc[:, 8:16, :] = acc * 1.1
            q_sc[:, 16:24, :] = acc * 1.2
            q_sc[:, 24:32, :] = acc * 1.3
            for _ in range(reps):
                t16_sc[...] = jnp.minimum(q_sc[:, 0:16, :], q_sc[:, 16:32, :])
                t8_sc[...] = jnp.minimum(t16_sc[:, 0:8, :], t16_sc[:, 8:16, :])
                mm_sc[...] = jnp.minimum(
                    t8_sc[:, 0:4, :], t8_sc[:, 4:8, :]
                ) * (1.0 - 1e-9)
            out = jnp.pad(mm_sc[...] * 1e-9, ((0, 0), (0, 4), (0, 0))) + acc
        elif variant == "dot16":
            a4 = acc[:, 0:4, :52]
            for _ in range(reps):
                d = _bdot(a4, conv_ref[...])  # (R, 4, 88)
                a4 = d[:, :, :52] * (1.0 - 1e-6)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, N - 52)))
        else:
            raise ValueError(variant)
        acc_sc[...] = out * (1.0 - 1e-7) + dep
        o_ref[...] = acc_sc[...]

    return kern


def run(variant: str, reps: int, steps: int):
    x = jnp.full((R, 8, N), 0.5, jnp.float32)
    conv = jnp.full((R, 52, 88), 1e-2, jnp.float32)
    f = pl.pallas_call(
        make_kernel(variant, reps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, 8, N), jnp.float32),        # acc
            pltpu.VMEM((R, 104, N), jnp.float32),      # big (eqwin-sized)
            pltpu.VMEM((R, 32, N), jnp.float32),       # q
            pltpu.VMEM((R, 4, N), jnp.float32),        # mm
            pltpu.VMEM((R, 16, N), jnp.float32),       # t16
            pltpu.VMEM((R, 8, N), jnp.float32),        # t8
        ],
        interpret=_INTERP,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
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
        x = jnp.asarray(0.4 + rng.random(args[0].shape, _np.float32) * 0.2)
        float(x.reshape(-1)[0])
        t0 = time.perf_counter()
        float(g(x, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best, comp


S_LO = int(os.environ.get("PROBE_S_LO", 3000))
S_HI = int(os.environ.get("PROBE_S_HI", 20000))
REPS = {"ew4": 16, "ew32": 16, "st4": 16, "st8": 16, "st1n": 16,
        "winstack": 2, "winstack8": 2, "ctd32": 2, "ctd_pair": 2,
        "chainmin": 2, "treemin": 2, "dot16": 4}


def main():
    print(f"R={R}, grids {S_LO}/{S_HI} (per-op = delta/(steps*reps)), N={N}")
    for v, reps in REPS.items():
        lo, c_lo = run(v, reps, S_LO)
        hi, c_hi = run(v, reps, S_HI)
        per = (hi - lo) / (S_HI - S_LO) / reps * 1e9
        print(f"{v:>10}: {per:9.1f} ns/rep  (lo {lo*1e3:7.2f} ms, hi "
              f"{hi*1e3:7.2f} ms, compile {c_lo:.0f}/{c_hi:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
