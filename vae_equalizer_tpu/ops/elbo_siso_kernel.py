"""Fused SISO VAE train-step kernel: loss + gradients in one Pallas call.

The pol=1 counterpart of ops/elbo_kernel.py for the AWGN VAE-LE experiment
(reference: twoFIR + loss_function, func_VAELE_MQAM_shaping.py:63-95,206-231):
complex FIR forward -> per-component mean-|.| normalization -> Gaussian soft
demapper (metric d^2/var, no PCS correction inside the metric) -> shaped
SISO ELBO, plus the hand-derived backward for (w, h). The normalization
  norm_c = out_c * amp_mean / mean|out_c|
adds one extra VJP link the DP kernel does not have:
  gout_c = k_c * (gnorm_c - sign(out_c) * <gnorm_c, norm_c> / (N * amp_mean)),
  k_c = amp_mean / mean|out_c|.

Backend constraints as in ops/elbo_kernel.py: static-unrolled tap loops, no
MXU, parity-split symbol/sample domains, in-place scratch accumulation.
Restrictions: sps == 2, odd M.

Layouts (rows x lanes):
  xph/xqph (2 phase, 8, Nsym + mh + 1)  polyphase I-/Q-arrangements
                                        (rows 0..1 = data, rest zero)
  rx       (2, Nsamp)  rows (I, Q);  rxe/rxo (2, Nsym) parity planes
  w8       (8, 2*M)    per-tap (8, 2) blocks, rows (I_out, Q_out, 0 x6)
  h8       (2, M)      rows (h_re, h_im)
  amps/P   (1, n_lev); scal (1, 8) SMEM [var, amp_mean, eps, ...]
Outputs:
  gw8 (8, M) rows (in0, in1, 0 x6);  gh (2, M);  stats (8, 128) row0 [loss];
  q (2*n_lev, Nsym);  out (2, Nsym) unnormalized filter output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vae_siso_loss_and_grad_pallas"]


def _kernel(
    xph_ref, xqph_ref, rx_ref, rxe_ref, rxo_ref, w_ref, h_ref, amps_ref, p_ref, scal_ref,
    gw_ref, gh_ref, stats_ref, qout_ref, outout_ref,
    acc, q_sc, eq_sc, v_sc, d_sc, gd_sc, gn_sc,
    *, n_sym, m, n_lev,
):
    n_samp = 2 * n_sym
    mh = m // 2
    mh2 = 2 * mh
    n_eff = float(n_samp - mh2)
    var = scal_ref[0, 0]
    amp_mean = scal_ref[0, 1]
    eps = scal_ref[0, 2]
    amps = amps_ref[0, :]  # (n_lev,)
    p_row = p_ref[0, :]

    # ---------------- forward: complex FIR (VPU outer products, polyphase)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    mask_i = (row_id < 1).astype(jnp.float32)
    mask_q = ((row_id >= 1) & (row_id < 2)).astype(jnp.float32)
    acc[:, :] = jnp.zeros(acc.shape, jnp.float32)
    n_taps_ph = m // 2 + 1
    for j in range(n_taps_ph):
        for p in range(2):
            k = j * 2 + p
            if k >= m:
                continue
            wj = w_ref[:, k * 2 : k * 2 + 2]  # (8, 2) rows (I_out, Q_out, pads)
            xj = xph_ref[p, :, j : j + n_sym]  # I arrangement (8, N)
            xqj = xqph_ref[p, :, j : j + n_sym]  # Q arrangement
            for i in range(2):
                wcol = wj[:, i : i + 1]  # (8, 1)
                acc[:, :] += wcol * (mask_i * xj[i : i + 1, :] + mask_q * xqj[i : i + 1, :])

    out = acc[:, :]  # (8, N): rows (I, Q, 0...)

    # ---------------- normalization + demapper + posterior moments
    # norm_c = out_c * k_c, k_c = amp_mean / mean|out_c|
    mu_i = jnp.sum(jnp.abs(out[0:1, :])) / float(n_sym)
    mu_q = jnp.sum(jnp.abs(out[1:2, :])) / float(n_sym)
    k_i = amp_mean / mu_i
    k_q = amp_mean / mu_q
    for r in range(2):
        k_c = k_i if r == 0 else k_q
        norm = out[r : r + 1, :] * k_c
        dlt = norm - amps[:, None]
        metric = dlt * dlt / var  # twoFIR demapper: d^2/var, no PCS term
        mmin = jnp.min(metric, axis=0, keepdims=True)
        e = jnp.exp(mmin - metric)
        q = e / jnp.sum(e, axis=0, keepdims=True)  # (n_lev, N)
        q_sc[r * n_lev : (r + 1) * n_lev, :] = q
        eq_sc[r : r + 1, :] = jnp.sum(amps[:, None] * q, axis=0, keepdims=True)
        v_sc[r : r + 1, :] = jnp.sum((amps * amps)[:, None] * q, axis=0, keepdims=True)
    v_sc[0:2, :] = v_sc[0:2, :] - eq_sc[0:2, :] * eq_sc[0:2, :]

    # ---------------- D conv (parity split, symbol domain)
    # D[c, n] for n in [Mh, Nsamp); even n -> even taps, odd n -> odd taps.
    # d_sc rows (re, im); lanes [0:ne | ne:ne+no] = even/odd-n blocks.
    ne = n_sym - mh
    no = n_sym - mh
    d_sc[:, :] = jnp.zeros(d_sc.shape, jnp.float32)
    for a in range(mh + 1):
        j_even = 2 * a
        sl = eq_sc[0:2, mh - a : n_sym - a]  # rows (EqI, EqQ)
        hr = h_ref[0, j_even]
        hi = h_ref[1, j_even]
        d_sc[0:1, 0:ne] += hr * sl[0:1, :] - hi * sl[1:2, :]
        d_sc[1:2, 0:ne] += hi * sl[0:1, :] + hr * sl[1:2, :]
    for a in range(mh):
        j_odd = 2 * a + 1
        sl = eq_sc[0:2, mh - a : n_sym - a]
        hr = h_ref[0, j_odd]
        hi = h_ref[1, j_odd]
        d_sc[0:1, ne : ne + no] += hr * sl[0:1, :] - hi * sl[1:2, :]
        d_sc[1:2, ne : ne + no] += hi * sl[0:1, :] + hr * sl[1:2, :]

    # ---------------- E term
    vsum = v_sc[0:1, :] + v_sc[1:2, :]  # (1, Nsym)
    e_term = jnp.zeros((1, 1), jnp.float32)
    s_cols = []
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))  # ceil((Mh - j)/2)
        hi_t = min((n_samp - j - 1) // 2 + 1, n_sym)
        s_j = jnp.sum(vsum[:, lo:hi_t])
        s_cols.append(s_j)
        habsq = h_ref[0, j] * h_ref[0, j] + h_ref[1, j] * h_ref[1, j]
        e_term = e_term + habsq * s_j

    # ---------------- C and loss
    rx = rx_ref[:, :]
    rx_w = rx[:, mh : n_samp - mh]
    c_base = jnp.sum(rx_w * rx_w)
    rxe = rxe_ref[:, :]  # (2, Nsym) even samples
    rxo = rxo_ref[:, :]
    if mh % 2 == 0:
        rx_al_e = rxe[:, mh - mh // 2 : n_sym - mh // 2]
        rx_al_o = rxo[:, mh - mh // 2 : n_sym - mh // 2]
    else:
        rx_al_e = rxo[:, mh - (mh + 1) // 2 : n_sym - (mh + 1) // 2]
        rx_al_o = rxe[:, mh - mh // 2 : n_sym - mh // 2]

    cross = (
        jnp.sum(rx_al_e[0:1, :] * d_sc[0:1, 0:ne]) + jnp.sum(rx_al_o[0:1, :] * d_sc[0:1, ne : ne + no])
        + jnp.sum(rx_al_e[1:2, :] * d_sc[1:2, 0:ne]) + jnp.sum(rx_al_o[1:2, :] * d_sc[1:2, ne : ne + no])
    )
    dd = jnp.sum(d_sc[0:2, 0 : ne + no] * d_sc[0:2, 0 : ne + no])
    c = c_base - 2.0 * cross + dd + e_term[0, 0]

    # entropy/KL over inner symbols
    ent = jnp.zeros((1, 1), jnp.float32)
    for r in range(2):
        q = q_sc[r * n_lev : (r + 1) * n_lev, mh : n_sym - mh]
        ratio = q / p_row[:, None]
        ent = ent + jnp.sum(-q * jnp.log(ratio + eps))

    qout_ref[:, :] = q_sc[:, :]
    outout_ref[:, :] = out[0:2, :]

    loss = n_eff * jnp.log(c) - ent[0, 0]
    stats_ref[:, :] = jnp.zeros(stats_ref.shape, jnp.float32)
    stats_ref[0:1, 0:1] = loss.reshape(1, 1)

    # ================ backward ================
    g_c = n_eff / c
    gd_sc[0:2, 0:ne] = g_c * (2.0 * d_sc[0:2, 0:ne] - 2.0 * rx_al_e[0:2, :])
    gd_sc[0:2, ne : ne + no] = g_c * (2.0 * d_sc[0:2, ne : ne + no] - 2.0 * rx_al_o[0:2, :])

    # ---- gh
    for j in range(m):
        a, par = divmod(j, 2)
        sl = eq_sc[0:2, mh - a : n_sym - a]
        gdr = gd_sc[:, 0:ne] if par == 0 else gd_sc[:, ne : ne + no]
        gdre = gdr[0:1, :]
        gdim = gdr[1:2, :]
        eqi = sl[0:1, :]
        eqq = sl[1:2, :]
        ghr = jnp.sum(gdre * eqi) + jnp.sum(gdim * eqq) + 2.0 * g_c * h_ref[0, j] * s_cols[j]
        ghi = -jnp.sum(gdre * eqq) + jnp.sum(gdim * eqi) + 2.0 * g_c * h_ref[1, j] * s_cols[j]
        gh_ref[0:1, j : j + 1] = ghr.reshape(1, 1)
        gh_ref[1:2, j : j + 1] = ghi.reshape(1, 1)

    # ---- gEq (symbol domain)
    geq = jnp.zeros((2, n_sym), jnp.float32)
    for j in range(m):
        a, par = divmod(j, 2)
        blk = slice(0, ne) if par == 0 else slice(ne, ne + no)
        gdb = gd_sc[:, blk]
        cnt = ne if par == 0 else no
        t_lo = mh - a
        t_hi = t_lo + cnt
        hr = h_ref[0, j]
        hi = h_ref[1, j]
        gdre = gdb[0:1, :]
        gdim = gdb[1:2, :]
        acc_i = gdre * hr + gdim * hi
        acc_q = -gdre * hi + gdim * hr
        padded = [jnp.pad(r, ((0, 0), (t_lo, n_sym - t_hi))) for r in (acc_i, acc_q)]
        geq = geq + jnp.concatenate(padded)

    # ---- gV
    gv = jnp.zeros((1, n_sym), jnp.float32)
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))
        hi_t = min((n_samp - j - 1) // 2 + 1, n_sym)
        habsq = h_ref[0, j] * h_ref[0, j] + h_ref[1, j] * h_ref[1, j]
        ones = jnp.ones((1, hi_t - lo), jnp.float32)
        gv = gv + jnp.pad(ones * (g_c * habsq), ((0, 0), (lo, n_sym - hi_t)))

    # ---- moments -> gq -> softmin VJP -> gnorm -> normalization VJP -> gout
    gn_sc[:, :] = jnp.zeros(gn_sc.shape, jnp.float32)
    t_in = jax.lax.broadcasted_iota(jnp.int32, (1, n_sym), 1)
    t_mask = ((t_in >= mh) & (t_in < n_sym - mh)).astype(jnp.float32)
    for r in range(2):
        k_c = k_i if r == 0 else k_q
        norm = out[r : r + 1, :] * k_c
        g_eq_r = geq[r : r + 1, :] - 2.0 * eq_sc[r : r + 1, :] * gv
        g_eq2_r = gv
        q = q_sc[r * n_lev : (r + 1) * n_lev, :]
        gq = amps[:, None] * g_eq_r + (amps * amps)[:, None] * g_eq2_r
        ratio = q / p_row[:, None]
        gq = gq + (jnp.log(ratio + eps) + ratio / (ratio + eps)) * t_mask
        inner = jnp.sum(q * gq, axis=0, keepdims=True)
        gm = -q * (gq - inner)
        gnorm = jnp.sum(gm * 2.0 * (norm - amps[:, None]), axis=0, keepdims=True) / var
        # normalization VJP: gout = k (gnorm - sign(out) <gnorm, norm>/(N amp_mean))
        dot = jnp.sum(gnorm * norm)
        gn_sc[r : r + 1, :] = k_c * (
            gnorm - jnp.sign(out[r : r + 1, :]) * (dot / (float(n_sym) * amp_mean))
        )

    # ---- gw: gw[i,k] = sum_t gout_I[t] xi_p[i,2t+k] + gout_Q[t] xq_p[i,2t+k]
    for k in range(m):
        a, par = divmod(k, 2)
        xj = xph_ref[par, :, a : a + n_sym]
        xqj = xqph_ref[par, :, a : a + n_sym]
        gI = gn_sc[0:1, :]
        gQ = gn_sc[1:2, :]
        for i in range(2):
            val = jnp.sum(gI * xj[i : i + 1, :]) + jnp.sum(gQ * xqj[i : i + 1, :])
            gw_ref[i : i + 1, k : k + 1] = val.reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vae_siso_loss_and_grad_pallas(w, h, x, amps, amp_mean, var, P, interpret: bool = False):
    """(loss, gw, gh, q, out) of the fused SISO VAE loss. sps=2, odd M only.

    w: (1, 2, M); h: (2, M); x: (2, Nsamp); P: (n_lev,) PCS prior. Matches
    jax.value_and_grad of elbo_siso(vae_le_siso_forward(...)) to f32.
    """
    m = w.shape[-1]
    assert m % 2 == 1, "odd tap count only"
    n_samp = x.shape[-1]
    n_sym = n_samp // 2
    n_lev = amps.shape[0]
    mh = m // 2

    x_i = jnp.stack([x[0], x[1]])  # (2, N) arrangement for the I output
    x_q = jnp.stack([x[1], -x[0]])  # arrangement for the Q output
    lp = n_sym + mh + 1

    def phases(arr):
        xp = jnp.pad(arr, ((0, 0), (mh, mh)))
        need = 2 * (lp + 1)
        xp = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[-1]))))
        ph = jnp.stack([xp[:, p::2][:, :lp] for p in range(2)])
        return jnp.pad(ph, ((0, 0), (0, 6), (0, 0)))  # + explicit zero rows

    xph = phases(x_i)
    xqph = phases(x_q)
    rx2 = x.reshape(2, n_samp)
    rxe = rx2[:, 0::2]
    rxo = rx2[:, 1::2]

    # per-tap (8, 2) weight blocks, rows (I_out, Q_out, 0 x6): both output
    # rows apply the same taps to their arrangement (models/vae_le.py SISO)
    w8 = jnp.concatenate([w[0:1, :, :], w[0:1, :, :], jnp.zeros((6, 2, m), w.dtype)])
    w8 = jnp.moveaxis(w8, -1, 1).reshape(8, m * 2)  # lane block k*2+i
    scal = jnp.array([[var, amp_mean, 1e-12, 0, 0, 0, 0, 0]], jnp.float32)
    amps_row = amps.reshape(1, n_lev).astype(jnp.float32)
    p_row = P.reshape(1, n_lev).astype(jnp.float32)

    kernel = functools.partial(_kernel, n_sym=n_sym, m=m, n_lev=n_lev)
    gw8, gh, stats, q, out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, m), jnp.float32),
            jax.ShapeDtypeStruct((2, m), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((2 * n_lev, n_sym), jnp.float32),
            jax.ShapeDtypeStruct((2, n_sym), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, n_sym), jnp.float32),  # acc / out
            pltpu.VMEM((2 * n_lev, n_sym), jnp.float32),  # q
            pltpu.VMEM((2, n_sym), jnp.float32),  # eq
            pltpu.VMEM((2, n_sym), jnp.float32),  # var
            pltpu.VMEM((2, n_samp), jnp.float32),  # d (parity blocks)
            pltpu.VMEM((2, n_samp), jnp.float32),  # gd
            pltpu.VMEM((2, n_sym), jnp.float32),  # gout
        ],
        interpret=interpret,
    )(xph, xqph, rx2, rxe, rxo, w8, h, amps_row, p_row, scal)

    loss = stats[0, 0]
    return loss, gw8.reshape(1, 2, m), gh, q, out
