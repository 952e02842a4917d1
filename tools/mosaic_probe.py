"""Mosaic capability + vmap-grid probes for the runs-batched frame kernel.

Round-3 design questions, answered empirically on the real backend:
  1. Does jax.vmap over a pallas_call serialize the grid (extra leading grid
     dim) or batch block tiles?  -> timing: t(R runs) / t(1 run) on a kernel
     with a fixed-work sequential grid.
  2. Which relayout ops does Mosaic lower on this backend?  (sublane->lane
     reshape, 2D transpose, strided sublane read, lane roll)  Each probe
     compiles a one-op kernel and reports OK / the Mosaic error.

Usage: python tools/mosaic_probe.py [--quick]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from vae_equalizer_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

R, NA = 8, 13


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"  {name:34s} OK   {np.asarray(out).shape}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"  {name:34s} FAIL {msg}")
        return False


def one_op_kernel(body, in_shape, out_shape):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    x = jnp.arange(np.prod(in_shape), dtype=jnp.float32).reshape(in_shape)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    print("== Mosaic relayout probes ==")
    probe("reshape (R,na)->(1,R*na)",
          lambda: one_op_kernel(lambda x: x.reshape(1, R * NA), (R, NA), (1, R * NA)))
    probe("reshape (R,128)->(1,R*128)",
          lambda: one_op_kernel(lambda x: x.reshape(1, R * 128), (R, 128), (1, R * 128)))
    probe("reshape (1,R*na)->(R,na)",
          lambda: one_op_kernel(lambda x: x.reshape(R, NA), (1, R * NA), (R, NA)))
    probe("transpose 2D (R,na)->(na,R)",
          lambda: one_op_kernel(lambda x: x.T, (R, NA), (NA, R)))
    probe("transpose 2D (104,64)",
          lambda: one_op_kernel(lambda x: x.T, (104, 64), (64, 104)))
    probe("strided sublane read x[::2]",
          lambda: one_op_kernel(lambda x: x[::2, :], (16, 128), (8, 128)))
    probe("lane roll jnp.roll(x,5,axis=1)",
          lambda: one_op_kernel(lambda x: jnp.roll(x, 5, axis=1), (8, 128), (8, 128)))
    probe("repeat lanes jnp.tile(x,(1,4))",
          lambda: one_op_kernel(lambda x: jnp.tile(x, (1, 4)), (8, 32), (8, 128)))
    probe("repeat sublanes jnp.tile(x,(4,1))",
          lambda: one_op_kernel(lambda x: jnp.tile(x, (4, 1)), (2, 128), (8, 128)))
    probe("batched dot_general (R,4,na)@(R,na,88)",
          lambda: one_op_kernel(
              lambda x: jax.lax.dot_general(
                  x, jnp.ones((R, NA, 88), jnp.float32),
                  (((2,), (1,)), ((0,), (0,))),
                  preferred_element_type=jnp.float32),
              (R, 4, NA), (R, 4, 88)))

    print("== vmap-of-pallas_call grid behavior ==")
    # fixed-work kernel: G sequential grid steps each doing a small matmul
    # chain on its own block; carry in scratch to defeat any parallelization
    G, N = 64, 128

    def kern(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        a = x_ref[0]
        for _ in range(8):
            a = jax.lax.dot(a, a, preferred_element_type=jnp.float32) * 1e-6 + a
        acc[...] = acc[...] + a
        o_ref[0] = acc[...]

    run = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
    )

    x1 = jax.random.normal(jax.random.PRNGKey(0), (G, N, N), jnp.float32) * 0.01
    xr = jax.random.normal(jax.random.PRNGKey(1), (R, G, N, N), jnp.float32) * 0.01

    f1 = jax.jit(lambda x: run(x)).lower(x1).compile()
    fr = jax.jit(jax.vmap(run)).lower(xr).compile()

    def best(f, x, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    best(f1, x1); best(fr, xr)  # warm
    t1, tr = best(f1, x1), best(fr, xr)
    print(f"  1 run : {t1*1e3:8.3f} ms   ({G} grid steps)")
    print(f"  {R} runs: {tr*1e3:8.3f} ms   ratio {tr/t1:5.2f}x "
          f"(~{R}x => serialized grid, ~1x => batched tiles)")

    # what does the lowered HLO say?
    txt = jax.jit(jax.vmap(run)).lower(xr).as_text()
    for line in txt.splitlines():
        if "custom_call_target" in line or "grid" in line.lower():
            print("  HLO:", line.strip()[:140])
            break


if __name__ == "__main__":
    main()
