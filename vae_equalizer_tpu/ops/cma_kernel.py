"""Per-symbol 2x2 butterfly CMA as one Pallas TPU kernel.

The per-symbol CMA recurrence (taps feed back into the next output) is the
single most performance-critical sequential structure of the reference
(SURVEY.md "hard parts" #1; shared_funcs.py:355-378). The lax.scan reference
implementation (models/cma.py) executes one XLA loop iteration per symbol
with HBM-resident state; this kernel instead runs the whole frame inside one
Pallas call with the signal, taps and outputs resident in VMEM — no per-step
dispatch, no HBM traffic in the loop.

Mosaic bans dynamic *lane* indexing (loads and stores must be 128-aligned in
the last dim), so:
  * window loads fetch an aligned 256-lane overlapping block by its leading
    index and rotate it into place (dynamic lane roll is allowed);
  * outputs accumulate into an (8, 128) register tile via one-hot lane masks
    and flush once per 128 symbols with an aligned store.

Numerics and output-roll semantics match models.cma.cma_dp exactly (same
increments, same reference storage roll applied by the wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cma_dp_pallas"]


def _cma_kernel(y_ref, h0_ref, scal_ref, out_ref, h_ref, *, n_sym, m, sps, update):
    """y: (n_blocks, 4, 256) overlapping 128-aligned lane blocks
    (block b = padded signal samples [b*128, b*128+256)); h0: (8, M);
    scal: (1, 2) SMEM [lr, R].

    out: (8, n_pad) — rows 0..3 = (x_I, x_Q, y_I, y_Q) outputs, rows 4..5 =
    per-pol CMA error, rows 6..7 zero; h: (8, M) [row = chi*4 + nu*2 + c].
    """
    lr = scal_ref[0, 0]
    R = scal_ref[0, 1]
    h_ref[:, :] = h0_ref[:, :]
    n_chunks = out_ref.shape[-1] // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def chunk(c, _):
        def sym(i, acc):
            k = c * 128 + i
            pos = k * sps
            w256 = y_ref[pos // 128]  # (4, 256), 128-aligned load
            w = pltpu.roll(w256, -(pos % 128), axis=1)[:, :m]  # (4, M)
            h = h_ref[:, :]  # (8, M)
            hx, hy = h[0:4], h[4:8]  # per-chi rows (nu, re/im)
            # out_re[chi] = sum_nu w[nu,I].h[chi,nu,re] - w[nu,Q].h[chi,nu,im]
            # out_im[chi] = sum_nu w[nu,I].h[chi,nu,im] + w[nu,Q].h[chi,nu,re]
            o_re_x = jnp.sum(hx[0] * w[0]) - jnp.sum(hx[1] * w[1]) + jnp.sum(hx[2] * w[2]) - jnp.sum(hx[3] * w[3])
            o_im_x = jnp.sum(hx[1] * w[0]) + jnp.sum(hx[0] * w[1]) + jnp.sum(hx[3] * w[2]) + jnp.sum(hx[2] * w[3])
            o_re_y = jnp.sum(hy[0] * w[0]) - jnp.sum(hy[1] * w[1]) + jnp.sum(hy[2] * w[2]) - jnp.sum(hy[3] * w[3])
            o_im_y = jnp.sum(hy[1] * w[0]) + jnp.sum(hy[0] * w[1]) + jnp.sum(hy[3] * w[2]) + jnp.sum(hy[2] * w[3])
            e_x = R - o_re_x * o_re_x - o_im_x * o_im_x
            e_y = R - o_re_y * o_re_y - o_im_y * o_im_y

            vals = jnp.stack([o_re_x, o_im_x, o_re_y, o_im_y, e_x, e_y, 0.0, 0.0])
            acc = acc + jnp.where(lane == i, vals.reshape(8, 1), 0.0)

            if update:
                # d h[chi,nu,re] ~ o_re*w[nu,I] + o_im*w[nu,Q];
                # d h[chi,nu,im] ~ o_im*w[nu,I] - o_re*w[nu,Q]
                @pl.when(k < n_sym)
                def _():
                    inc_x = jnp.stack(
                        [
                            o_re_x * w[0] + o_im_x * w[1],
                            o_im_x * w[0] - o_re_x * w[1],
                            o_re_x * w[2] + o_im_x * w[3],
                            o_im_x * w[2] - o_re_x * w[3],
                        ]
                    )
                    inc_y = jnp.stack(
                        [
                            o_re_y * w[0] + o_im_y * w[1],
                            o_im_y * w[0] - o_re_y * w[1],
                            o_re_y * w[2] + o_im_y * w[3],
                            o_im_y * w[2] - o_re_y * w[3],
                        ]
                    )
                    h_ref[0:4, :] = hx + 2.0 * lr * e_x * inc_x
                    h_ref[4:8, :] = hy + 2.0 * lr * e_y * inc_y

            return acc

        acc = jax.lax.fori_loop(0, 128, sym, jnp.zeros((8, 128), jnp.float32))
        out_ref[:, pl.ds(pl.multiple_of(c * 128, 128), 128)] = acc
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(jax.jit, static_argnames=("sps", "update", "interpret"))
def cma_dp_pallas(rx, R, h, lr, sps: int, update: bool = True, interpret: bool = False):
    """Drop-in Pallas replacement for models.cma.cma_dp.

    rx: (2, 2, N) float32; h: (2, 2, 2, M). Returns (out (2,2,N//sps), h,
    e (N//sps, 2)) with the reference storage roll applied.
    """
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    n_sym = n // sps
    n_pad = -(-n_sym // 128) * 128
    # normalization identical to models.cma._normalize_dp
    y = jnp.pad(rx, ((0, 0), (0, 0), (mh, mh)))
    y = y / jnp.mean(y[:, 0, :] ** 2 + y[:, 1, :] ** 2)
    y_flat = y.reshape(4, n + 2 * mh)
    # overlapping 128-aligned lane blocks covering the padded symbol range
    n_blocks = -(-(n_pad * sps) // 128) + 1
    y_pad = jnp.pad(y_flat, ((0, 0), (0, max(0, n_blocks * 128 + 128 - (n + 2 * mh)))))
    starts = jnp.arange(n_blocks) * 128
    y_blocks = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(y_pad, s, 256, axis=1)
    )(starts)  # (n_blocks, 4, 256)
    h_flat = h.reshape(8, m)
    scal = jnp.array([[lr, R]], jnp.float32)

    kernel = functools.partial(_cma_kernel, n_sym=n_sym, m=m, sps=sps, update=update)
    outs, h_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(y_blocks, h_flat, scal)

    offset = mh - mh // sps
    out4 = jnp.roll(outs[:4, :n_sym], -offset, axis=-1).reshape(2, 2, n_sym)
    e2 = jnp.roll(outs[4:6, :n_sym], -offset, axis=-1).T  # (n_sym, 2)
    return out4, h_out.reshape(2, 2, 2, m), e2
