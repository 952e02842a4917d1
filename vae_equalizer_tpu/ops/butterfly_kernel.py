"""Fused 2x2 butterfly FIR + PCS soft demapper as one Pallas TPU kernel.

The strided complex butterfly convolution is laid out as shift-and-matmul:
the input is de-interleaved into its sps polyphase components on the XLA
side, and the kernel accumulates one (4 out-rows x 4 in-rows) matmul per tap
against a shifted slice — MXU work with everything resident in VMEM — then
applies the Gaussian PCS demapper (metric + softmin over levels) in the same
kernel, so the equalized symbols never round-trip to HBM before the
posterior computation.

Used on the inference/eval paths (the training path stays on XLA autodiff);
parity: models/vae_le.py::vae_le_dp_forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vae_le_dp_forward_pallas"]


def _kernel(xph_ref, w_ref, amps_ref, scal_ref, q_ref, out_ref, acc, *, n_out, m, sps, n_lev):
    """xph: (sps, 4, Lp) polyphase input rows (x_I^x, x_I^y, -x_Q^x, -x_Q^y
    ordering is built by the wrapper as channel arrangements); w: (2*sps_taps
    layout) — see wrapper; amps: (1, n_lev) in SMEM-ish VMEM row;
    scal: (1, 4) SMEM [var_x, var_y, nu_sc, pad].

    Outputs: q (4*n_lev, N) rows = (pol, comp, lev); out (4, N) rows =
    (pol*2 + comp).
    """
    acc[:, :] = jnp.zeros_like(acc)
    n_taps_ph = m // sps + 1

    def tap(j, _):
        # accumulate one shifted matmul per (phase, tap) pair
        def phase(p, _):
            # w row block for phase p, tap j: (8, 4); zero-padded beyond M
            wj = w_ref[:, pl.ds((j * sps + p) * 4, 4)]  # (8, 4)
            xj = xph_ref[p, :, pl.ds(j, n_out)]  # (4, N)
            acc[:, :] += jnp.dot(wj, xj, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, sps, phase, 0)
        return 0

    jax.lax.fori_loop(0, n_taps_ph, tap, 0)
    out_ref[:, :] = acc[0:4, :]

    var_x = scal_ref[0, 0]
    var_y = scal_ref[0, 1]
    nu_sc = scal_ref[0, 2]
    amps = amps_ref[0, :]  # (n_lev,)
    pen = nu_sc * amps * amps  # (n_lev,)

    def demap(row, _):
        # row = pol*2 + comp; metric (n_lev, N) -> softmin over levels
        o = acc[pl.ds(row, 1), :]  # (1, N)
        # accumulator rows are (x_I, y_I, x_Q, y_Q): even rows = pol X
        var = jnp.where(row % 2 == 0, var_x, var_y)
        d = o - amps[:, None]
        metric = d * d / (2.0 * var) + pen[:, None]
        mmin = jnp.min(metric, axis=0, keepdims=True)
        e = jnp.exp(mmin - metric)  # softmin with max-subtraction
        q = e / jnp.sum(e, axis=0, keepdims=True)
        q_ref[pl.ds(row * n_lev, n_lev), :] = q
        return 0

    jax.lax.fori_loop(0, 4, demap, 0)


@functools.partial(jax.jit, static_argnames=("sps", "interpret"))
def vae_le_dp_forward_pallas(w, x, amps, var, nu_sc, sps: int, interpret: bool = False):
    """Drop-in (inference) replacement for models.vae_le.vae_le_dp_forward.

    w: (2, 4, M); x: (2, 2, L). Returns (q (2, 2n, N), out (2, 2, N)).
    """
    m = w.shape[-1]
    pad = m // 2
    n_lev = amps.shape[0]
    l_in = x.shape[-1]
    n_out = (l_in + 2 * pad - m) // sps + 1

    # channel arrangements for the I and Q outputs (models/vae_le.py):
    #   out_I rows use (x_I^x, x_I^y, -x_Q^x, -x_Q^y)
    #   out_Q rows use (x_Q^x, x_Q^y,  x_I^x,  x_I^y)
    x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])  # (4, L)

    # weights for 4 output rows (x_I, y_I, x_Q, y_Q): row o<2 uses w[o] on
    # x_i-rows; row o>=2 uses w[o-2] on x_q-rows. Build one (4, 4, M) bank,
    # input rows shared by feeding BOTH arrangements... instead: keep two
    # 2-row convs as a single 8-row trick: stack arrangements as 4 input rows
    # per phase and weights as (8, 4, M) with rows (x_I, y_I, x_Q, y_Q) x
    # (acc padding) — simpler: run rows (out_I | out_Q) against the SAME
    # 4-row input by exploiting that x_q rows are a signed permutation of
    # x_i rows: x_q = S @ x_i with S = [[0,0,-1,0],[0,0,0,-1],[1,0,0,0],[0,1,0,0]]
    # so W_q' = w @ S acts on x_i directly.
    s_perm = jnp.array(
        [[0.0, 0.0, -1.0, 0.0],
         [0.0, 0.0, 0.0, -1.0],
         [1.0, 0.0, 0.0, 0.0],
         [0.0, 1.0, 0.0, 0.0]],
        jnp.float32,
    )
    w_q = jnp.einsum("oim,ij->ojm", w, s_perm)  # acts on x_i
    # kernel accumulator rows: (x_I, y_I, x_Q, y_Q) then 4 zero-pad rows to
    # keep an (8, N) tile
    w_all = jnp.concatenate([w[0:1], w[1:2], w_q[0:1], w_q[1:2], jnp.zeros((4, 4, m), w.dtype)])

    # polyphase de-interleave of the padded input
    xp = jnp.pad(x_i, ((0, 0), (pad, pad)))
    n_taps_ph = m // sps + 1
    lp = n_out + n_taps_ph  # per-phase length with slack
    need = sps * (lp + 1)
    xp = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[-1]))))
    xph = jnp.stack([xp[:, p::sps][:, :lp] for p in range(sps)])  # (sps, 4, lp)

    # weight layout: (8, sps*n_taps_ph*4) where block (j*sps+p) holds the
    # tap k = j*sps + p as an (8, 4) matrix (zero when k >= M)
    wk = jnp.zeros((8, sps * n_taps_ph, 4), jnp.float32)
    for k in range(m):
        j, p = divmod(k, sps)
        wk = wk.at[:, j * sps + p, :].set(w_all[:, :, k])
    wk = wk.reshape(8, sps * n_taps_ph * 4)

    scal = jnp.array([[var[0], var[1], nu_sc, 0.0]], jnp.float32)
    amps_row = amps.reshape(1, n_lev).astype(jnp.float32)

    kernel = functools.partial(_kernel, n_out=n_out, m=m, sps=sps, n_lev=n_lev)
    q, out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4 * n_lev, n_out), jnp.float32),
            jax.ShapeDtypeStruct((4, n_out), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((8, n_out), jnp.float32)],
        interpret=interpret,
    )(xph, wk, amps_row, scal)

    # rows: 0 = x_I, 1 = y_I, 2 = x_Q, 3 = y_Q
    out2 = jnp.stack([jnp.stack([out[0], out[2]]), jnp.stack([out[1], out[3]])])
    qr = q.reshape(4, n_lev, n_out)
    q2 = jnp.stack(
        [jnp.concatenate([qr[0], qr[2]]), jnp.concatenate([qr[1], qr[3]])]
    )  # (2, 2n, N)
    return q2, out2
