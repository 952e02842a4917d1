"""Mosaic cost-model probes (round 3): what does runs-batching cost in-kernel?

Measures, with dispatch-amortized methodology (large sequential grid, heavy
in-kernel repetition, best-of-N on AOT-compiled calls):

  1. elementwise op cost on (R, s, l) leading-batch tensors vs (s*R, l) 2D
  2. batched dot_general (R,m,k)@(R,k,n) vs Python loop of R 2D dots vs one
     block-diagonal 2D dot
  3. legality of (8R, M) <-> (R, 8, M) reshapes and 3D scratch stores

Every kernel threads data dependencies (out feeds next op) to defeat
hoisting/folding; reported numbers are ns per repeated unit.

Usage: python tools/mosaic_probe2.py
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

GRID = 8192  # sequential grid steps per call (adds no compile cost)
REPS = 64  # op repetitions per grid step (unrolled: adds compile cost)


def timed_kernel(body, shapes, label, units_per_rep=1, out_shape=None):
    """body(acc, *tensors) -> acc chain run REPS times per grid step.

    ``acc`` has ``out_shape`` (default shapes[0]); body must thread acc into
    its operands (data dependency) so Mosaic cannot hoist the repetition.
    """
    out_shape = out_shape or shapes[0]

    def kern(*refs):
        o_ref = refs[len(shapes)]
        xs = [r[...] for r in refs[: len(shapes)]]
        acc = jnp.zeros(out_shape, jnp.float32)
        for i in range(REPS):
            acc = body(acc, *xs)
            # cheap data-dependent nudge so no two reps are identical
            acc = acc * 1.000001
        o_ref[...] = acc

    x0 = [
        (jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32) * 0.01 + 0.5)
        for i, s in enumerate(shapes)
    ]
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    # reduce on device, fetch ONE scalar: a D2H of the result is the only
    # sync this backend honors (block_until_ready returns early on axon)
    f = jax.jit(lambda *a: jnp.sum(call(*a))).lower(*x0).compile()
    float(f(*x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(*x0))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    per = t / (GRID * REPS * units_per_rep)
    print(f"  {label:44s} {t*1e3:8.2f} ms total  {per*1e9:9.1f} ns/unit")
    return per


def main():
    R, NA, NE = 8, 52, 88  # contraction 4*13 per parity, ne=88

    print(f"== elementwise cost: leading-batch vs 2D (R={R}) ==")
    ew = lambda acc, a: acc * 1.5 + a
    timed_kernel(ew, [(4, NE)], "mul-add (4, 88) [1 run]")
    timed_kernel(ew, [(4 * R, NE)], f"mul-add (32, 88) [2D {R} runs]")
    timed_kernel(ew, [(R, 4, NE)], f"mul-add ({R}, 4, 88) [3D]")
    timed_kernel(ew, [(R, 32, 100)], f"mul-add ({R},32,100) [3D big]")
    timed_kernel(ew, [(32 * R, 100)], f"mul-add (256, 100) [2D big]")

    print("== dot cost: batched vs loop vs block-diag ==")
    hi = jax.lax.Precision.HIGHEST

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hi)

    def dot2(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)

    # acc has the OUT shape; feed acc back into operand a via a lane slice
    timed_kernel(lambda acc, a, b: acc * 0.5 + dot2(a + acc[:, :1] * 1e-9, b),
                 [(4, NA), (NA, NE)], "dot (4,52)@(52,88) [1 run]", 1,
                 out_shape=(4, NE))
    timed_kernel(lambda acc, a, b: acc * 0.5 + bdot(a + acc[:, :, :1] * 1e-9, b),
                 [(R, 4, NA), (R, NA, NE)], f"batched dot ({R},4,52)@({R},52,88)", 1,
                 out_shape=(R, 4, NE))

    def loopdots(a, b):
        outs = [dot2(a[r], b[r]) for r in range(R)]
        return jnp.stack(outs)

    timed_kernel(lambda acc, a, b: acc * 0.5 + loopdots(a + acc[:, :, :1] * 1e-9, b),
                 [(R, 4, NA), (R, NA, NE)], f"loop-of-{R} dots", 1,
                 out_shape=(R, 4, NE))
    timed_kernel(lambda acc, a, b: acc * 0.5 + dot2(a + acc[:, :1] * 1e-9, b),
                 [(4 * R, NA * R), (NA * R, NE)], "blockdiag dot (32,416)@(416,88)", 1,
                 out_shape=(4 * R, NE))
    # MXU-shaped batched: does batch dim pipeline on bigger tiles?
    timed_kernel(lambda acc, a, b: acc * 0.5 + bdot(a + acc[:, :, :1] * 1e-9, b),
                 [(R, 128, 128), (R, 128, 128)], f"batched dot ({R},128,128)@same", 1,
                 out_shape=(R, 128, 128))
    timed_kernel(lambda acc, a, b: acc * 0.5 + dot2(a + acc[:, :1] * 1e-9, b),
                 [(128, 128), (128, 128)], "dot (128,128)@(128,128) [1]", 1,
                 out_shape=(128, 128))

    print("== relayout legality ==")

    def legal(name, fn, shapes, out_shape):
        def kern(*refs):
            refs[-1][...] = fn(*[r[...] for r in refs[:-1]])

        xs = [jnp.ones(s, jnp.float32) for s in shapes]
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )(*xs)
            jax.block_until_ready(out)
            print(f"  {name:44s} OK")
        except Exception as e:
            print(f"  {name:44s} FAIL {str(e).splitlines()[0][:90]}")

    legal("reshape (8R,M)->(R,8,M)", lambda x: x.reshape(R, 8, 25), [(8 * R, 25)], (R, 8, 25))
    legal("reshape (R,8,M)->(8R,M)", lambda x: x.reshape(8 * R, 25), [(R, 8, 25)], (8 * R, 25))
    legal("reshape (4R,NE)->(R,4,NE)", lambda x: x.reshape(R, 4, NE), [(4 * R, NE)], (R, 4, NE))
    legal("concat 3D leading [(R,4,88)]*2 axis=1",
          lambda x: jnp.concatenate([x, x], axis=1), [(R, 4, NE)], (R, 8, NE))


def store_probe():
    R, NA = 8, 52

    def kern(x_ref, o_ref, sc):
        for g in range(4):
            sc[:, g : g + 1, :] = x_ref[:, g : g + 1, :] * 2.0
        o_ref[...] = sc[...]

    x = jnp.ones((R, 4, NA), jnp.float32)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 4, NA), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, 4, NA), jnp.float32)],
        )(x)
        jax.block_until_ready(out)
        print(f"  {'3D scratch store (R,1,na) slices':44s} OK")
    except Exception as e:
        print(f"  {'3D scratch store (R,1,na) slices':44s} FAIL {str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
    store_probe()
