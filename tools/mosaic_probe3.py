"""One-probe-per-process Mosaic R>1 pattern tests (round 3).

The R>1 frame-kernel compile SIGABRTs the remote compiler, and repeated
crashes wedge the tunnel — so each candidate pattern runs in its own
process (tools/run_probes3.sh drives the sequence with health checks).

Usage: python tools/mosaic_probe3.py <probe-name>
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from vae_equalizer_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

R, S, L = 2, 8, 100


def run(body, out_shape, n_in=1, scratch=()):
    def kern(*refs):
        xrs = refs[:n_in]
        o_ref = refs[n_in]
        scs = refs[n_in + 1 :]
        o_ref[...] = body(*xrs, *scs)

    xs = [jnp.arange(R * S * L, dtype=jnp.float32).reshape(R, S, L) / 1e4 + 1.0
          for _ in range(n_in)]
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=list(scratch),
    )
    out = jax.block_until_ready(f(*xs))
    return np.asarray(out)


def ld(xr):
    return xr[...]


PROBES = {
    "sum_ax2": lambda: run(lambda xr: jnp.sum(ld(xr), axis=2, keepdims=True), (R, S, 1)),
    "sum_ax1": lambda: run(lambda xr: jnp.sum(ld(xr), axis=1, keepdims=True), (R, 1, L)),
    "min_ax1": lambda: run(lambda xr: jnp.min(ld(xr), axis=1, keepdims=True), (R, 1, L)),
    "bcast_sublane": lambda: run(
        lambda xr: ld(xr) * jnp.sum(ld(xr), axis=1, keepdims=True), (R, S, L)),
    "bcast_lane": lambda: run(
        lambda xr: ld(xr) * jnp.sum(ld(xr), axis=2, keepdims=True), (R, S, L)),
    "bcast_lead": lambda: run(lambda xr: ld(xr) * ld(xr)[0:1], (R, S, L)),
    "bcast_rank2": lambda: run(
        lambda xr: ld(xr) * jnp.ones((S, L), jnp.float32), (R, S, L)),
    "vslice_off": lambda: run(
        lambda xr: jnp.concatenate([(ld(xr) + 1.0)[:, 3:5, :]] * 4, axis=1),
        (R, S, L)),
    "refslice_off": lambda: run(
        lambda xr: jnp.concatenate([xr[:, 3:5, :]] * 4, axis=1), (R, S, L)),
    "make_r11": lambda: run(
        lambda xr: jnp.sum(jnp.sum(ld(xr), axis=2, keepdims=True), axis=1,
                           keepdims=True), (R, 1, 1)),
    "use_r11": lambda: run(
        lambda xr: jnp.log(jnp.sum(jnp.sum(ld(xr), axis=2, keepdims=True),
                                   axis=1, keepdims=True)), (R, 1, 1)),
    "stats_row": lambda: run(
        lambda xr: jnp.pad(
            jnp.concatenate(
                [jnp.sum(jnp.sum(ld(xr), axis=2, keepdims=True), axis=1,
                         keepdims=True)] * 3, axis=2),
            ((0, 0), (0, 0), (0, 125))), (R, 1, 128)),
    "bcast_r11": lambda: run(
        lambda xr: ld(xr) + jnp.sum(jnp.sum(ld(xr), axis=2, keepdims=True),
                                    axis=1, keepdims=True), (R, S, L)),
    "out_sub2": lambda: run(lambda xr: ld(xr)[:, 0:2, :] * 2.0, (R, 2, L)),
    "iota3": lambda: run(
        lambda xr: ld(xr) * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
                             < 50).astype(jnp.float32), (R, S, L)),
    "pad3_lane": lambda: run(
        lambda xr: jnp.pad(ld(xr)[:, :, :60], ((0, 0), (0, 0), (20, 20))),
        (R, S, L)),
}

if __name__ == "__main__":
    name = sys.argv[1]
    out = PROBES[name]()
    print(f"PROBE {name} OK {out.shape}")
