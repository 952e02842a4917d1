"""Whole-frame fused CMA kernel: ALL chunked tap updates in one pallas_call.

The CMAbatch/CMAflex engine (models/cma.py:_cma_chunked, reference
shared_funcs.py:381-488) adapts the 2x2 butterfly taps only every
``symb_step`` symbols, using the accumulated increments of the last
``batch_len`` symbols. Between updates the taps are constant, so a chunk is
a pure convolution — exactly as MXU-friendly as the VAE frame kernel's
minibatch (ops/frame_kernel.py), and the round-2 lesson applies unchanged:
the per-chunk ``lax.scan`` step costs its *serial instruction stream*
(~434 us/chunk measured), not FLOPs. Here every chunk is:

  forward(old taps)  O_old = HARR (4, 4M) @ X4 (4M, S)
  update             HARR += 2 lr * sum(ring of partial sums)
  forward(new taps)  O_new = HARR @ X4
  outputs            O = col0 ? O_old : O_new   (the symbol at an update
                     point is emitted BEFORE the update, shared_funcs.py:398)
  partial sums       P_re = (e o_re)(2,S) @ W0^T + (e o_im) @ W1^T
                     P_im = (e o_im)(2,S) @ W0^T - (e o_re) @ W1^T
  ring               shift slots, insert P (flex keeps batch_len/symb_step
                     slots; CMAbatch keeps one)

Layouts: the persistent state is the *arranged* butterfly matrix
  HARR (4, 4M): rows (chi*2 + comp); re row = [h_re(nu0)|h_re(nu1)|
  -h_im(nu0)|-h_im(nu1)], im row = [h_im(nu0)|h_im(nu1)|h_re(nu0)|h_re(nu1)]
so the forward is ONE matmul against the global stride-sps im2col
  X4 ((c*2+nu)*M + k, t) = y[nu, c, t*sps + k]
(built once on the XLA side; chunks are lane-blocks of it). The update
partial sums land in the same arrangement (PARR), so the kernel never
de-arranges: h is reconstructed from HARR by the wrapper.

The prefix [0, j0) (constant initial taps) and the tail after the last
update run on the XLA side via the same ``models/cma.py`` helpers; numerics
equal the scan engine up to f32 reduction order (the e-weighting of
increments is applied at chunk time — the same value the reference computes
at update time).

Restrictions: sps == 2 (polyphase im2col), update=True path only (the
no-update eval path is already a single XLA conv). Parity:
tests/test_cma_frame_kernel.py vs models/cma.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.cma import _butterfly_out, _increments, _normalize_dp

__all__ = ["cma_chunked_frame_pallas", "cma_chunked_frame_pallas_rb"]

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _kernel(
    x4_ref, harr_in, ring_in, scal_ref,
    harr_out, ring_out, o_ref,
    harr_sc, ring_sc, parr_sc,
    *, m, s, n_slots,
):
    ci = pl.program_id(0)
    lr2 = scal_ref[0, 0]  # 2 * lr
    big_r = scal_ref[0, 1]  # CMA modulus R

    @pl.when(ci == 0)
    def _():
        harr_sc[...] = harr_in[...]
        ring_sc[...] = ring_in[...]

    x4 = x4_ref[0]  # (4M, S) this chunk's windows
    w0 = x4[: 2 * m, :]  # c=0 plane rows (nu, k)
    w1 = x4[2 * m :, :]

    # ---- forward with pre-update taps (only column 0 is emitted from this)
    o_old = _dot(harr_sc[...], x4)  # (4, S) rows (chi*2 + comp)

    # ---- tap update: sum the ring of partial sums
    up = ring_sc[0:4, :]
    for j in range(1, n_slots):
        up = up + ring_sc[4 * j : 4 * j + 4, :]
    harr_sc[...] = harr_sc[...] + lr2 * up

    # ---- forward with post-update taps; splice column 0 from o_old
    o_new = _dot(harr_sc[...], x4)
    t_id = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    col0 = (t_id < 1).astype(jnp.float32)
    o = o_old * col0 + o_new * (1.0 - col0)
    o_ref[0] = o

    # ---- error + e-weighted outputs (rows chi)
    e_x = big_r - o[0:1, :] * o[0:1, :] - o[1:2, :] * o[1:2, :]
    e_y = big_r - o[2:3, :] * o[2:3, :] - o[3:4, :] * o[3:4, :]
    eo_re = jnp.concatenate([e_x * o[0:1, :], e_y * o[2:3, :]])  # (2, S)
    eo_im = jnp.concatenate([e_x * o[1:2, :], e_y * o[3:4, :]])

    # ---- chunk partial sums, already in the HARR arrangement
    p_re = _dot(eo_re, w0, ((1,), (1,))) + _dot(eo_im, w1, ((1,), (1,)))  # (2, 2M)
    p_im = _dot(eo_im, w0, ((1,), (1,))) - _dot(eo_re, w1, ((1,), (1,)))
    for chi in range(2):
        parr_sc[2 * chi : 2 * chi + 1, : 2 * m] = p_re[chi : chi + 1, :]
        parr_sc[2 * chi : 2 * chi + 1, 2 * m :] = -p_im[chi : chi + 1, :]
        parr_sc[2 * chi + 1 : 2 * chi + 2, : 2 * m] = p_im[chi : chi + 1, :]
        parr_sc[2 * chi + 1 : 2 * chi + 2, 2 * m :] = p_re[chi : chi + 1, :]

    # ---- ring shift (static) + insert
    for j in range(n_slots - 1):
        ring_sc[4 * j : 4 * j + 4, :] = ring_sc[4 * (j + 1) : 4 * (j + 1) + 4, :]
    ring_sc[4 * (n_slots - 1) : 4 * n_slots, :] = parr_sc[...]

    harr_out[...] = harr_sc[...]
    ring_out[...] = ring_sc[...]


def _arrange_h(h: jnp.ndarray) -> jnp.ndarray:
    """h (2, 2, 2, M) -> HARR (4, 4M); rows (chi*2+comp), see module doc."""
    hre = h[:, :, 0, :]  # (chi, nu, M)
    him = h[:, :, 1, :]
    m = h.shape[-1]
    re_rows = jnp.concatenate([hre.reshape(2, 2 * m), -him.reshape(2, 2 * m)], axis=1)
    im_rows = jnp.concatenate([him.reshape(2, 2 * m), hre.reshape(2, 2 * m)], axis=1)
    return jnp.stack([re_rows, im_rows], axis=1).reshape(4, 4 * m)


def _dearrange_h(harr: jnp.ndarray, m: int) -> jnp.ndarray:
    """HARR (4, 4M) -> h (2, 2, 2, M)."""
    re = harr[0::2, : 2 * m].reshape(2, 2, m)  # (chi, nu, M)
    im = harr[1::2, : 2 * m].reshape(2, 2, m)
    return jnp.stack([re, im], axis=2)


def _partial_sums(e_blk: jnp.ndarray, inc_blk: jnp.ndarray) -> jnp.ndarray:
    """Per-slot e-weighted increment sums in HARR arrangement.

    e_blk (n_slots, S, chi); inc_blk (n_slots, S, chi, nu, c, M) ->
    (n_slots*4, 4M).
    """
    p = jnp.einsum("jtx,jtxvck->jxvck", e_blk, inc_blk)  # (slots, chi, nu, c, M)
    n_slots, _, _, _, m = p.shape[0], *p.shape[1:]
    pre = p[:, :, :, 0, :].reshape(n_slots, 2, 2 * m)
    pim = p[:, :, :, 1, :].reshape(n_slots, 2, 2 * m)
    re_rows = jnp.concatenate([pre, -pim], axis=2)  # (slots, 2, 4M)
    im_rows = jnp.concatenate([pim, pre], axis=2)
    return jnp.stack([re_rows, im_rows], axis=2).reshape(n_slots * 4, 4 * m)


@functools.partial(
    jax.jit, static_argnames=("batch_len", "symb_step", "sps", "interpret")
)
def cma_chunked_frame_pallas(
    rx, R, h, lr, batch_len: int, symb_step: int, sps: int,
    interpret: bool = False,
):
    """Whole-frame CMAbatch/CMAflex: drop-in for models/cma.py:_cma_chunked
    with ``update=True``. Returns (out (2, 2, N//sps), h, e (N//sps, 2))
    with the reference's storage roll, exactly like the scan engine.
    """
    assert sps == 2, "polyphase im2col assumes sps == 2"
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    n_sym = n // sps
    B, S = batch_len, symb_step
    assert B % S == 0, "batch_len must be a multiple of symb_step"
    n_slots = B // S
    offset = mh - mh // sps
    y = _normalize_dp(rx, mh)  # (2, 2, N + 2*mh)

    j0 = -(-B // S) * S + offset
    if n_sym <= j0:
        raise ValueError(f"frame too short for chunked CMA: N_sym={n_sym} <= j0={j0}")
    n_full = (n_sym - j0 - 1) // S
    tail = n_sym - j0 - n_full * S

    def run_const(ks, h_):
        idx = ks[:, None] * sps + jnp.arange(m)[None, :]
        w = y[:, :, idx].transpose(2, 0, 1, 3)  # (T, nu, c, M)
        o_re, o_im = _butterfly_out(w, h_)
        e = R - o_re**2 - o_im**2
        return o_re, o_im, e, _increments(w, o_re, o_im)

    # ---- prefix [0, j0): constant initial taps; ring init from its tail
    o_re_p, o_im_p, e_pre, inc_pre = run_const(jnp.arange(j0), h)
    ring0 = _partial_sums(
        e_pre[j0 - B :].reshape(n_slots, S, 2),
        inc_pre[j0 - B :].reshape(n_slots, S, 2, 2, 2, m),
    )

    # ---- global im2col X4 ((c*2+nu)*M + k, t) = y[nu, c, t*sps + k],
    # sliced to the kernel's chunk range and lane-blocked per chunk
    t0 = j0
    tn = n_full * S
    idx = (t0 + jnp.arange(tn))[None, :] * sps + jnp.arange(m)[:, None]  # (M, T)
    x4 = y[:, :, idx]  # (nu, c, M, T)
    x4 = x4.transpose(1, 0, 2, 3).reshape(4 * m, tn)  # rows (c, nu, k)
    x4_blocks = x4.reshape(4 * m, n_full, S).transpose(1, 0, 2)  # (chunks, 4M, S)

    scal = jnp.stack([2.0 * jnp.float32(lr), jnp.float32(R)]).reshape(1, 2)
    harr0 = _arrange_h(h)

    kernel = functools.partial(_kernel, m=m, s=S, n_slots=n_slots)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    harr_o, ring_o, o_all = pl.pallas_call(
        kernel,
        grid=(n_full,),
        out_shape=(
            jax.ShapeDtypeStruct((4, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((4 * n_slots, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((n_full, 4, S), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4 * m, S), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            full(), full(),
            pl.BlockSpec((1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            full(), full(),
            pl.BlockSpec((1, 4, S), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 4 * m), jnp.float32),  # HARR
            pltpu.VMEM((4 * n_slots, 4 * m), jnp.float32),  # ring
            pltpu.VMEM((4, 4 * m), jnp.float32),  # PARR assembly
        ],
        interpret=interpret,
    )(x4_blocks, harr0, ring0, scal)

    h_mid = _dearrange_h(harr_o, m)
    # chunk outputs: (n_full, 4, S) rows (chi*2+comp) -> (T, chi), errors
    o_re_c = o_all[:, 0::2, :].transpose(0, 2, 1).reshape(-1, 2)
    o_im_c = o_all[:, 1::2, :].transpose(0, 2, 1).reshape(-1, 2)
    e_c = R - o_re_c**2 - o_im_c**2

    # ---- tail: one final update from the kernel's ring, then `tail` outputs
    k_start = j0 + n_full * S
    w0 = jax.lax.dynamic_slice(y, (0, 0, k_start * sps), (2, 2, m))
    o_re0, o_im0 = _butterfly_out(w0, h_mid)
    e0 = R - o_re0**2 - o_im0**2
    up = jnp.sum(ring_o.reshape(n_slots, 4, 4 * m), axis=0)
    h_fin = _dearrange_h(harr_o + 2.0 * lr * up, m)
    o_re_t, o_im_t, e_t, _ = run_const(k_start + 1 + jnp.arange(tail - 1), h_fin)

    o_re = jnp.concatenate([o_re_p, o_re_c, o_re0[None], o_re_t])
    o_im = jnp.concatenate([o_im_p, o_im_c, o_im0[None], o_im_t])
    e = jnp.concatenate([e_pre, e_c, e0[None], e_t])
    out = jnp.stack([o_re, o_im], axis=1).transpose(2, 1, 0)
    return jnp.roll(out, -offset, axis=-1), h_fin, jnp.roll(e, -offset, axis=0)


# ---------------------------------------------------------------------------
# Runs-batched variant: R independent frames in ONE pallas_call
# ---------------------------------------------------------------------------

def _bdot(a, b, contract=((2,), (1,))):
    """Runs-batched matmul: contract over given dims, batch over dim 0."""
    return jax.lax.dot_general(
        a, b, (contract, ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _kernel_rb(
    x4_ref, col0_ref, harr_in, ring_in, scal_ref,
    harr_out, ring_out, o_ref,
    harr_sc, ring_sc, parr_sc, o_sc, eo_sc,
    *, m, s, n_slots,
):
    """Runs-batched chunk body: same math as ``_kernel`` with a leading runs
    dim on every tensor — 6 batched dots per chunk under the Mosaic-safe
    construct policy of the DP rb frame kernel (ops/frame_kernel.py):
    batched dot_generals, same-shape elementwise, ref-slice loads/stores;
    sublane-sliced values are parked in scratch first (o, eo)."""
    ci = pl.program_id(0)
    lr2 = scal_ref[0, 0]  # 2 * lr
    big_r = scal_ref[0, 1]  # CMA modulus R

    @pl.when(ci == 0)
    def _():
        harr_sc[...] = harr_in[...]
        ring_sc[...] = ring_in[...]

    x4 = x4_ref[0]  # (R, 4M, S) this chunk's windows
    col0 = col0_ref[...]  # (R, 4, S) first-column indicator

    # ---- forward with pre-update taps (only column 0 is emitted from this)
    o_old = _bdot(harr_sc[...], x4)  # (R, 4, S) rows (chi*2 + comp)

    # ---- tap update: sum the ring of partial sums
    up = ring_sc[:, 0:4, :]
    for j in range(1, n_slots):
        up = up + ring_sc[:, 4 * j : 4 * j + 4, :]
    harr_sc[...] = harr_sc[...] + lr2 * up

    # ---- forward with post-update taps; splice column 0 from o_old
    o_new = _bdot(harr_sc[...], x4)
    o_sc[...] = o_old * col0 + o_new * (1.0 - col0)
    o_ref[0] = o_sc[...]

    # ---- error + e-weighted outputs, assembled through scratch (rows chi)
    e_x = big_r - o_sc[:, 0:1, :] * o_sc[:, 0:1, :] - o_sc[:, 1:2, :] * o_sc[:, 1:2, :]
    e_y = big_r - o_sc[:, 2:3, :] * o_sc[:, 2:3, :] - o_sc[:, 3:4, :] * o_sc[:, 3:4, :]
    eo_sc[:, 0:1, :] = e_x * o_sc[:, 0:1, :]  # eo_re rows
    eo_sc[:, 1:2, :] = e_y * o_sc[:, 2:3, :]
    eo_sc[:, 2:3, :] = e_x * o_sc[:, 1:2, :]  # eo_im rows
    eo_sc[:, 3:4, :] = e_y * o_sc[:, 3:4, :]

    # ---- chunk partial sums, already in the HARR arrangement
    w0 = x4[:, : 2 * m, :]  # c=0 plane rows (nu, k)
    w1 = x4[:, 2 * m :, :]
    eo_re = eo_sc[:, 0:2, :]
    eo_im = eo_sc[:, 2:4, :]
    p_re = _bdot(eo_re, w0, ((2,), (2,))) + _bdot(eo_im, w1, ((2,), (2,)))
    p_im = _bdot(eo_im, w0, ((2,), (2,))) - _bdot(eo_re, w1, ((2,), (2,)))
    for chi in range(2):
        parr_sc[:, 2 * chi : 2 * chi + 1, : 2 * m] = p_re[:, chi : chi + 1, :]
        parr_sc[:, 2 * chi : 2 * chi + 1, 2 * m :] = -p_im[:, chi : chi + 1, :]
        parr_sc[:, 2 * chi + 1 : 2 * chi + 2, : 2 * m] = p_im[:, chi : chi + 1, :]
        parr_sc[:, 2 * chi + 1 : 2 * chi + 2, 2 * m :] = p_re[:, chi : chi + 1, :]

    # ---- ring shift (static) + insert
    for j in range(n_slots - 1):
        ring_sc[:, 4 * j : 4 * j + 4, :] = ring_sc[:, 4 * (j + 1) : 4 * (j + 1) + 4, :]
    ring_sc[:, 4 * (n_slots - 1) : 4 * n_slots, :] = parr_sc[...]

    harr_out[...] = harr_sc[...]
    ring_out[...] = ring_sc[...]


@functools.partial(
    jax.jit, static_argnames=("batch_len", "symb_step", "sps", "interpret")
)
def cma_chunked_frame_pallas_rb(
    rx, R, h, lr, batch_len: int, symb_step: int, sps: int,
    interpret: bool = False,
):
    """Runs-batched ``cma_chunked_frame_pallas``: R independent frames per
    pallas_call (one grid step = one chunk of ALL runs, batched MXU dots —
    a vmapped pallas_call would serialize its grid steps instead).

    rx: (R, 2, 2, N); h: (R, 2, 2, 2, M); lr shared by all runs (the
    reference's repeats differ only by channel noise, Eval_run_DP.py:44).
    Returns (out (R, 2, 2, N//sps), h (R, ...), e (R, N//sps, 2)) — the
    single-run contract with a leading runs axis. The prefix/tail segments
    and the im2col are plain XLA, vmapped over runs.
    """
    assert sps == 2, "polyphase im2col assumes sps == 2"
    n_rb = rx.shape[0]
    m = h.shape[-1]
    mh = m // 2
    n = rx.shape[-1]
    n_sym = n // sps
    B, S = batch_len, symb_step
    assert B % S == 0, "batch_len must be a multiple of symb_step"
    n_slots = B // S
    offset = mh - mh // sps

    j0 = -(-B // S) * S + offset
    if n_sym <= j0:
        raise ValueError(f"frame too short for chunked CMA: N_sym={n_sym} <= j0={j0}")
    n_full = (n_sym - j0 - 1) // S
    tail = n_sym - j0 - n_full * S

    def run_const(y_, ks, h_):
        idx = ks[:, None] * sps + jnp.arange(m)[None, :]
        w = y_[:, :, idx].transpose(2, 0, 1, 3)  # (T, nu, c, M)
        o_re, o_im = _butterfly_out(w, h_)
        e = R - o_re**2 - o_im**2
        return o_re, o_im, e, _increments(w, o_re, o_im)

    def prep(rx_r, h_r):
        y_ = _normalize_dp(rx_r, mh)  # (2, 2, N + 2*mh)
        # prefix [0, j0): constant initial taps; ring init from its tail
        o_re_p, o_im_p, e_pre, inc_pre = run_const(y_, jnp.arange(j0), h_r)
        ring0 = _partial_sums(
            e_pre[j0 - B :].reshape(n_slots, S, 2),
            inc_pre[j0 - B :].reshape(n_slots, S, 2, 2, 2, m),
        )
        idx = (j0 + jnp.arange(n_full * S))[None, :] * sps + jnp.arange(m)[:, None]
        x4 = y_[:, :, idx].transpose(1, 0, 2, 3).reshape(4 * m, n_full * S)
        x4_blocks = x4.reshape(4 * m, n_full, S).transpose(1, 0, 2)
        return y_, o_re_p, o_im_p, e_pre, ring0, x4_blocks, _arrange_h(h_r)

    y, o_re_p, o_im_p, e_pre, ring0, x4b, harr0 = jax.vmap(prep)(rx, h)
    x4b = jnp.moveaxis(x4b, 0, 1)  # (chunks, R, 4M, S)

    import numpy as _np

    col0_np = _np.zeros((4, S), _np.float32)
    col0_np[:, 0] = 1.0
    col0 = jnp.broadcast_to(jnp.asarray(col0_np), (n_rb, 4, S))
    scal = jnp.stack([2.0 * jnp.float32(lr), jnp.float32(R)]).reshape(1, 2)

    kernel = functools.partial(_kernel_rb, m=m, s=S, n_slots=n_slots)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    harr_o, ring_o, o_all = pl.pallas_call(
        kernel,
        grid=(n_full,),
        out_shape=(
            jax.ShapeDtypeStruct((n_rb, 4, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((n_rb, 4 * n_slots, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((n_full, n_rb, 4, S), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (1, n_rb, 4 * m, S), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(), full(), full(),
            pl.BlockSpec((1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            full(), full(),
            pl.BlockSpec(
                (1, n_rb, 4, S), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rb, 4, 4 * m), jnp.float32),  # HARR
            pltpu.VMEM((n_rb, 4 * n_slots, 4 * m), jnp.float32),  # ring
            pltpu.VMEM((n_rb, 4, 4 * m), jnp.float32),  # PARR assembly
            pltpu.VMEM((n_rb, 4, S), jnp.float32),  # spliced outputs
            pltpu.VMEM((n_rb, 4, S), jnp.float32),  # e-weighted rows
        ],
        interpret=interpret,
    )(x4b, col0, harr0, ring0, scal)

    def finish(y_, harr_o_r, ring_o_r, o_all_r, o_re_p_r, o_im_p_r, e_pre_r):
        h_mid = _dearrange_h(harr_o_r, m)
        o_re_c = o_all_r[:, 0::2, :].transpose(0, 2, 1).reshape(-1, 2)
        o_im_c = o_all_r[:, 1::2, :].transpose(0, 2, 1).reshape(-1, 2)
        e_c = R - o_re_c**2 - o_im_c**2
        k_start = j0 + n_full * S
        w0 = jax.lax.dynamic_slice(y_, (0, 0, k_start * sps), (2, 2, m))
        o_re0, o_im0 = _butterfly_out(w0, h_mid)
        e0 = R - o_re0**2 - o_im0**2
        up = jnp.sum(ring_o_r.reshape(n_slots, 4, 4 * m), axis=0)
        h_fin = _dearrange_h(harr_o_r + 2.0 * jnp.float32(lr) * up, m)
        o_re_t, o_im_t, e_t, _ = run_const(
            y_, k_start + 1 + jnp.arange(tail - 1), h_fin
        )
        o_re = jnp.concatenate([o_re_p_r, o_re_c, o_re0[None], o_re_t])
        o_im = jnp.concatenate([o_im_p_r, o_im_c, o_im0[None], o_im_t])
        e = jnp.concatenate([e_pre_r, e_c, e0[None], e_t])
        out = jnp.stack([o_re, o_im], axis=1).transpose(2, 1, 0)
        return jnp.roll(out, -offset, axis=-1), h_fin, jnp.roll(e, -offset, axis=0)

    return jax.vmap(finish)(
        y, harr_o, ring_o, jnp.moveaxis(o_all, 0, 1), o_re_p, o_im_p, e_pre,
    )
