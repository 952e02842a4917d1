"""Probe: the three open cost questions for the runs-batched frame kernel.

Follow-up to tools/mosaic_probe4.py (which established: a DEPENDENT batched
dot at R=8 costs ~110-270 ns regardless of operand size; elementwise ops and
stores are ~5-15 ns). Decides the next kernel move:

1. dotR — dependent conv-style batched dot at R in {1,2,4,8,16}.
   If the cost is flat in R, running rb=16 instead of 8 halves the per-run
   dot bill (VMEM permitting); if it scales with R, rb=8 is already optimal.
2. dep8 / ind8 — 8 dots per rep, serially dependent vs independent (disjoint
   sublane slices of the carried state, summed at the end). If independent
   dots pipeline, reordering the kernel body for ILP (hoisting the forward
   demapper dots ahead of the window assembly, etc.) is worth a pass.
3. base / dma_in / dma_out — per-grid-step cost of streamed HBM blocks at
   the real kernel's block sizes ((1,8,52,200) in, (1,8,32,100) out, cycled
   through a small HBM pool via an i%K index map). The difference over
   `base` is the double-buffered DMA tax per step — if it is large, the
   q/out streams (the eval interface) should shrink or move to bf16.

Methodology as probe4: dependent chains inside a sequential grid, two grid
lengths differenced (fixed dispatch+fetch is ~25-30 ms on the tunnel),
best-of-3 with a true D2H fetch, inputs perturbed per execution.

Usage: python tools/mosaic_probe5.py
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
    # env JAX_PLATFORMS=cpu does NOT stop the axon plugin from initializing
    # (and hanging when the tunnel is down); only the config does (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
N = 100
K_POOL = 50  # HBM pool blocks for the streamed-io probes


def _bdot(a, b, contract=((2,), (1,))):
    return jax.lax.dot_general(a, b, (contract, ((0,), (0,))),
                               preferred_element_type=jnp.float32, precision=_HI)


def make_dot_kernel(variant: str, reps: int):
    def kern(x_ref, conv_ref, o_ref, acc_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]

        acc = acc_sc[...]  # (r, 8, N) carried chain
        if variant == "dotR":
            a4 = acc[:, 0:4, :52]
            for _ in range(reps):
                d = _bdot(a4, conv_ref[...])  # (r, 4, 88)
                a4 = d[:, :, :52] * (1.0 - 1e-6)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, N - 52)))
        elif variant == "mix3d2d":
            # batched 3D operand against an UN-replicated 2D constant: if
            # Mosaic lowers this, every broadcast constant in the rb kernel
            # can drop its R dim (R-fold VMEM saving -> rb=16 headroom)
            a4 = acc[:, 0:4, :52]
            c2 = conv_ref[0]  # (52, 88) value
            for _ in range(reps):
                d = jax.lax.dot_general(
                    a4, c2, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )  # (r, 4, 88)
                a4 = d[:, :, :52] * (1.0 - 1e-6)
            out = jnp.pad(a4, ((0, 0), (0, 4), (0, N - 52)))
        elif variant == "dep8":
            # 8 serially-dependent dots per rep
            a1 = acc[:, 0:1, :52]
            for _ in range(reps):
                for _ in range(8):
                    a1 = _bdot(a1, conv_ref[...])[:, :, :52] * (1.0 - 1e-6)
            out = jnp.pad(a1, ((0, 0), (0, 7), (0, N - 52)))
        elif variant == "ind8":
            # 8 INDEPENDENT dots per rep (disjoint sublane rows), then a
            # pairwise add tree; only the dots can pipeline
            for _ in range(reps):
                ds = [
                    _bdot(acc[:, r : r + 1, :52], conv_ref[...])[:, :, :52]
                    for r in range(8)
                ]
                s01, s23 = ds[0] + ds[1], ds[2] + ds[3]
                s45, s67 = ds[4] + ds[5], ds[6] + ds[7]
                s = (s01 + s23) + (s45 + s67)
                acc = jnp.pad(s * 1e-3, ((0, 0), (0, 7), (0, N - 52))) + acc * (
                    1.0 - 1e-6
                )
            out = acc
        acc_sc[...] = out
        o_ref[...] = out

    return kern


def run_dot(variant: str, reps: int, steps: int, r: int):
    x = jnp.full((r, 8, N), 0.5, jnp.float32)
    conv = jnp.full((r, 52, 88), 1e-2, jnp.float32)
    f = pl.pallas_call(
        make_dot_kernel(variant, reps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 8, N), jnp.float32)],
        interpret=_INTERP,
    )
    g = jax.jit(lambda *a: f(*a).sum())
    return timeit(g, (x, conv))


def make_io_kernel(variant: str):
    def kern(x_ref, *rest):
        if variant == "dma_out":
            blk_ref, o_ref, out_ref, acc_sc = rest
        elif variant == "dma_in":
            (blk_ref, o_ref, acc_sc) = rest
        else:
            (o_ref, acc_sc) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_sc[...] = x_ref[...]

        acc = acc_sc[...]  # (8, 8, N)
        if variant == "dma_in":
            # consume the streamed block so it cannot be elided
            acc = acc * (1.0 - 1e-6) + blk_ref[0, :, 0:8, 0:N] * 1e-9
        else:
            acc = acc * (1.0 - 1e-6) + 1e-9
        acc_sc[...] = acc
        if variant == "dma_out":
            # depends on acc so the write cannot be hoisted out of the chain
            out_ref[0] = _bdot(
                jnp.full((8, 32, 8), 1e-3, jnp.float32), acc[:, :, :100]
            )
        o_ref[...] = acc

    return kern


def run_io(variant: str, steps: int):
    r = 8
    x = jnp.full((r, 8, N), 0.5, jnp.float32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = [x]
    if variant in ("dma_in", "dma_out"):
        pool = jnp.full((K_POOL, r, 52, 200), 0.25, jnp.float32)  # 16.6 MB HBM
        in_specs.append(
            pl.BlockSpec((1, r, 52, 200), lambda i: (jax.lax.rem(i, K_POOL), 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(pool)
    out_shape = [jax.ShapeDtypeStruct((r, 8, N), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if variant == "dma_out":
        out_shape.append(jax.ShapeDtypeStruct((K_POOL, r, 32, 100), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, r, 32, 100), lambda i: (jax.lax.rem(i, K_POOL), 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    f = pl.pallas_call(
        make_io_kernel(variant),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[pltpu.VMEM((r, 8, N), jnp.float32)],
        interpret=_INTERP,
    )
    if variant == "dma_out":
        g = jax.jit(lambda *a: f(*a)[0].sum())
    else:
        g = jax.jit(lambda *a: f(*a).sum())
    return timeit(g, tuple(args))


def timeit(g, args):
    import numpy as _np

    rng = _np.random.default_rng(7)
    t0 = time.perf_counter()
    float(g(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=args[0].shape).astype(_np.float32) * 0.1)
        float(x.reshape(-1)[0])
        t0 = time.perf_counter()
        float(g(x, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best, comp


S_LO = int(os.environ.get("PROBE_S_LO", 5000))
S_HI = int(os.environ.get("PROBE_S_HI", 40000))


def main():
    print(f"grids {S_LO}/{S_HI} steps (per-op = delta / {S_HI - S_LO}), N={N}")
    print("--- 1. dependent batched dot cost vs R")
    for r in (1, 2, 4, 8, 16):
        t_lo, comp = run_dot("dotR", 8, S_LO, r)
        t_hi, _ = run_dot("dotR", 8, S_HI, r)
        per = (t_hi - t_lo) * 1e9 / (S_HI - S_LO) / 8
        print(f"dotR R={r:2d}: {per:7.1f} ns/dot (compile {comp:.0f}s)", flush=True)
    print("--- 1b. batched 3D @ un-replicated 2D constant (R=8)")
    try:
        t_lo, comp = run_dot("mix3d2d", 8, S_LO, 8)
        t_hi, _ = run_dot("mix3d2d", 8, S_HI, 8)
        per = (t_hi - t_lo) * 1e9 / (S_HI - S_LO) / 8
        print(f"mix3d2d: {per:7.1f} ns/dot (compile {comp:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — Mosaic lowering may reject it
        print(f"mix3d2d: UNSUPPORTED ({type(e).__name__}: {str(e)[:200]})", flush=True)
    print("--- 2. dependent vs independent dots (R=8)")
    for variant, nops in (("dep8", 8), ("ind8", 8)):
        t_lo, comp = run_dot(variant, 4, S_LO, 8)
        t_hi, _ = run_dot(variant, 4, S_HI, 8)
        per = (t_hi - t_lo) * 1e9 / (S_HI - S_LO) / (4 * nops)
        print(f"{variant}: {per:7.1f} ns/dot (compile {comp:.0f}s)", flush=True)
    print("--- 3. streamed-block DMA tax per grid step (R=8, real block sizes)")
    base_lo, comp = run_io("base", S_LO)
    base_hi, _ = run_io("base", S_HI)
    base = (base_hi - base_lo) * 1e9 / (S_HI - S_LO)
    print(f"base   : {base:7.1f} ns/step (compile {comp:.0f}s)", flush=True)
    for variant in ("dma_in", "dma_out"):
        t_lo, comp = run_io(variant, S_LO)
        t_hi, _ = run_io(variant, S_HI)
        per = (t_hi - t_lo) * 1e9 / (S_HI - S_LO)
        print(f"{variant}: {per:7.1f} ns/step (+{per - base:7.1f} over base, "
              f"compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
