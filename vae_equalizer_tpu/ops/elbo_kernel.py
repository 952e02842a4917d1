"""Fused DP VAE train-step kernel: loss + gradients in one Pallas call.

Computes, entirely in VMEM, the forward chain butterfly FIR -> PCS soft
demapper -> ELBO and its hand-derived backward (ops/elbo_vjp.py states and
validates the math against jax.grad), returning
``(loss, var_est, grad_w, grad_h)`` — the whole training step minus the
optimizer update. One kernel invocation replaces the ~10^2 XLA ops of
value_and_grad per minibatch, and every contraction runs as exact-f32 VPU
arithmetic (this backend's MXU silently rounds small matmuls to bf16).

Backend constraints honored (see ops/cma_kernel.py): no dynamic lane
indexing (everything is static-unrolled over the M taps), no MXU, in-place
scratch accumulation. Restrictions: sps == 2, odd M (the reference operating
point: M=25); other shapes use the XLA path.

Layouts (rows x lanes):
  xph    (2 phase, 8, Nsym + mh + 1)   polyphase I-arrangement (+4 zero rows)
  xqph   (2 phase, 8, Nsym + mh + 1)   polyphase Q-arrangement
  rx     (4, Nsamp)                    rows chi*2 + c
  w8     (8, 4*M)                      per-tap (8,4) blocks: rows
                                       (x_I, y_I, x_Q, y_Q, 0...) x in-rows
  h8     (8, M)                        rows chi*4 + nu*2 + c
  amps/P (1, n_lev);  scal (1, 8) SMEM [var_x, var_y, nu_sc, eps]
Outputs:
  gw8    (8, M)    rows o*4 + i
  gh8    (8, M)    rows chi*4 + nu*2 + c
  stats  (8, 128)  row 0: [loss, var_est_x, var_est_y, 0...]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vae_dp_loss_and_grad_pallas"]


def _kernel(
    xph_ref, xqph_ref, rx_ref, rxe_ref, rxo_ref, w_ref, h_ref, amps_ref, p_ref, scal_ref,
    gw_ref, gh_ref, stats_ref, qout_ref, outout_ref,
    acc, q_sc, eq_sc, v_sc, d_sc, gd_sc, gout_sc,
    *, n_sym, m, n_lev,
):
    n_samp = 2 * n_sym
    mh = m // 2
    mh2 = 2 * mh
    n_eff = float(n_samp - mh2)
    var_x = scal_ref[0, 0]
    var_y = scal_ref[0, 1]
    nu_sc = scal_ref[0, 2]
    eps = scal_ref[0, 3]
    amps = amps_ref[0, :]  # (n_lev,)
    p_row = p_ref[0, :]

    # ---------------- forward: butterfly (VPU outer products, polyphase)
    n_taps_ph = m // 2 + 1
    # I-output rows (0,1) consume the I arrangement; Q-output rows (2,3) the Q
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    mask_i = (row_id < 2).astype(jnp.float32)
    mask_q = ((row_id >= 2) & (row_id < 4)).astype(jnp.float32)
    acc[:, :] = jnp.zeros(acc.shape, jnp.float32)
    for j in range(n_taps_ph):
        for p in range(2):
            k = j * 2 + p
            if k >= m:
                continue
            wj = w_ref[:, k * 4 : k * 4 + 4]  # (8, 4) rows (x_I,y_I,x_Q,y_Q,pad)
            xj = xph_ref[p, :, j : j + n_sym]  # I arrangement (8, N)
            xqj = xqph_ref[p, :, j : j + n_sym]  # Q arrangement
            for i in range(4):
                wcol = wj[:, i : i + 1]  # (8, 1)
                acc[:, :] += wcol * (mask_i * xj[i : i + 1, :] + mask_q * xqj[i : i + 1, :])

    out = acc[:, :]  # (8, N): rows (x_I, y_I, x_Q, y_Q, pad...)

    # ---------------- demapper + posterior moments
    # row r of out -> (pol = r % 2, comp = r // 2)
    for r in range(4):
        o = out[r : r + 1, :]
        var = var_x if r % 2 == 0 else var_y
        dlt = o - amps[:, None]
        metric = dlt * dlt / (2.0 * var) + nu_sc * (amps * amps)[:, None]
        mmin = jnp.min(metric, axis=0, keepdims=True)
        e = jnp.exp(mmin - metric)
        q = e / jnp.sum(e, axis=0, keepdims=True)  # (n_lev, N)
        q_sc[r * n_lev : (r + 1) * n_lev, :] = q
        eq_sc[r : r + 1, :] = jnp.sum(amps[:, None] * q, axis=0, keepdims=True)
        v_sc[r : r + 1, :] = jnp.sum((amps * amps)[:, None] * q, axis=0, keepdims=True)
    v_sc[0:4, :] = v_sc[0:4, :] - eq_sc[0:4, :] * eq_sc[0:4, :]

    # ---------------- D conv (parity split, symbol domain)
    # D[chi, c, n] for n in [Mh, Nsamp); n = 2u  -> even taps j = 2a
    #                                    n = 2u+1 -> odd taps j = 2a+1
    # even-n positions: u in [mh, Nsym); odd-n: n = 2u+1 in [Mh, Nsamp) -> u in [mh, Nsym-1]...
    # count: N - Mh samples total; even count = Nsym - mh, odd = Nsym - mh (n max Nsamp-1 odd)
    # hcomb for D_re: + hr on EqI, - hi on EqQ; D_im: + hi on EqI, + hr on EqQ
    # store D in d_sc rows 0..7: (chi*2+c) x parity blocks [0:Ne | Ne:Ne+No]
    ne = n_sym - mh  # even-position count
    d_sc[:, :] = jnp.zeros(d_sc.shape, jnp.float32)
    for a in range(mh + 1):
        j_even = 2 * a
        # Eq_sym[., u - a] for u in [mh, Nsym) -> slice [mh - a, Nsym - a)
        sl = eq_sc[0:4, mh - a : n_sym - a]  # rows (xI, yI, xQ, yQ)
        for chi in range(2):
            hr = h_ref[chi * 4 + 0, j_even]
            hr2 = h_ref[chi * 4 + 2, j_even]
            hi = h_ref[chi * 4 + 1, j_even]
            hi2 = h_ref[chi * 4 + 3, j_even]
            # D_re[chi] += hr(x)*EqI(x) - hi(x)*EqQ(x) + hr(y)*EqI(y) - hi(y)*EqQ(y)
            d_sc[chi * 2 + 0, 0:ne] += (
                hr * sl[0] - hi * sl[2] + hr2 * sl[1] - hi2 * sl[3]
            )
            d_sc[chi * 2 + 1, 0:ne] += (
                hi * sl[0] + hr * sl[2] + hi2 * sl[1] + hr2 * sl[3]
            )
    no = n_sym - mh  # odd-position count (n = 2u+1, u in [mh, Nsym))
    for a in range(mh):
        j_odd = 2 * a + 1
        # n = 2u+1, j = 2a+1 -> Eq index (n-j)/2 = u - a, u in [mh, Nsym)
        sl = eq_sc[0:4, mh - a : n_sym - a]
        for chi in range(2):
            hr = h_ref[chi * 4 + 0, j_odd]
            hr2 = h_ref[chi * 4 + 2, j_odd]
            hi = h_ref[chi * 4 + 1, j_odd]
            hi2 = h_ref[chi * 4 + 3, j_odd]
            d_sc[chi * 2 + 0, ne : ne + no] += (
                hr * sl[0] - hi * sl[2] + hr2 * sl[1] - hi2 * sl[3]
            )
            d_sc[chi * 2 + 1, ne : ne + no] += (
                hi * sl[0] + hr * sl[2] + hi2 * sl[1] + hr2 * sl[3]
            )

    # ---------------- E term: S[nu, j] = sum_t Vsum_sym[nu, t] 1[Mh <= 2t + j < Nsamp]
    vsum_x = v_sc[0:1, :] + v_sc[2:3, :]  # (1, Nsym) pol x
    vsum_y = v_sc[1:2, :] + v_sc[3:4, :]
    # e_term accumulated per chi
    e_x = jnp.zeros((1, 1), jnp.float32)
    e_y = jnp.zeros((1, 1), jnp.float32)
    s_cols = []  # per-tap (S_x, S_y) scalars reused by the backward
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))  # ceil((Mh - j)/2)
        hi_t = (n_samp - j - 1) // 2 + 1  # t < (Nsamp - j)/2
        hi_t = min(hi_t, n_sym)
        sx = jnp.sum(vsum_x[:, lo:hi_t])
        sy = jnp.sum(vsum_y[:, lo:hi_t])
        s_cols.append((sx, sy))
        habsq_xx = h_ref[0, j] * h_ref[0, j] + h_ref[1, j] * h_ref[1, j]
        habsq_xy = h_ref[2, j] * h_ref[2, j] + h_ref[3, j] * h_ref[3, j]
        habsq_yx = h_ref[4, j] * h_ref[4, j] + h_ref[5, j] * h_ref[5, j]
        habsq_yy = h_ref[6, j] * h_ref[6, j] + h_ref[7, j] * h_ref[7, j]
        e_x = e_x + habsq_xx * sx + habsq_xy * sy
        e_y = e_y + habsq_yx * sx + habsq_yy * sy

    # ---------------- C and loss
    # rx rows: chi*2 + c. Window [mh, Nsamp - mh). Alignment rx[n - mh] with D[n]:
    # n = 2u -> rx[2u - mh]; with mh even: even rx sample (u - mh/2);
    # with mh odd: odd rx sample. Build rx polyphase slices statically.
    rx = rx_ref[:, :]
    rx_w2 = rx[:, mh : n_samp - mh]
    c_base_x = jnp.sum(rx_w2[0:1, :] * rx_w2[0:1, :]) + jnp.sum(rx_w2[1:2, :] * rx_w2[1:2, :])
    c_base_y = jnp.sum(rx_w2[2:3, :] * rx_w2[2:3, :]) + jnp.sum(rx_w2[3:4, :] * rx_w2[3:4, :])
    # rx aligned to D, parity split (planes deinterleaved on the XLA side;
    # Mosaic cannot lower strided lane gathers). Static on mh % 2:
    rxe = rxe_ref[:, :]  # (4, Nsym) even samples
    rxo = rxo_ref[:, :]
    if mh % 2 == 0:
        # n = 2u -> rx index 2(u - mh/2): even plane; u in [mh, Nsym)
        rx_al_e = rxe[:, mh - mh // 2 : n_sym - mh // 2]  # (4, ne)
        rx_al_o = rxo[:, mh - mh // 2 : n_sym - mh // 2]  # n = 2u+1 -> odd plane
    else:
        # n = 2u -> rx[2u - mh] odd plane index u - (mh+1)//2
        rx_al_e = rxo[:, mh - (mh + 1) // 2 : n_sym - (mh + 1) // 2]
        # n = 2u+1 -> rx[2u+1-mh] even plane index u - mh//2
        rx_al_o = rxe[:, mh - mh // 2 : n_sym - mh // 2]

    cross_x = (
        jnp.sum(rx_al_e[0:1, :] * d_sc[0:1, 0:ne]) + jnp.sum(rx_al_o[0:1, :] * d_sc[0:1, ne : ne + no])
        + jnp.sum(rx_al_e[1:2, :] * d_sc[1:2, 0:ne]) + jnp.sum(rx_al_o[1:2, :] * d_sc[1:2, ne : ne + no])
    )
    cross_y = (
        jnp.sum(rx_al_e[2:3, :] * d_sc[2:3, 0:ne]) + jnp.sum(rx_al_o[2:3, :] * d_sc[2:3, ne : ne + no])
        + jnp.sum(rx_al_e[3:4, :] * d_sc[3:4, 0:ne]) + jnp.sum(rx_al_o[3:4, :] * d_sc[3:4, ne : ne + no])
    )
    dd_x = jnp.sum(d_sc[0:2, 0 : ne + no] * d_sc[0:2, 0 : ne + no])
    dd_y = jnp.sum(d_sc[2:4, 0 : ne + no] * d_sc[2:4, 0 : ne + no])
    c_x = c_base_x - 2.0 * cross_x + dd_x + e_x[0, 0]
    c_y = c_base_y - 2.0 * cross_y + dd_y + e_y[0, 0]

    # KL over inner symbols
    kl = jnp.zeros((1, 1), jnp.float32)
    for r in range(4):
        q = q_sc[r * n_lev : (r + 1) * n_lev, mh : n_sym - mh]
        ratio = q / p_row[:, None]
        kl = kl + jnp.sum(-q * jnp.log(ratio + eps))

    qout_ref[:, :] = q_sc[:, :]
    outout_ref[:, :] = out

    loss = n_eff * (jnp.log(c_x) + jnp.log(c_y)) - kl[0, 0]
    stats_ref[:, :] = jnp.zeros(stats_ref.shape, jnp.float32)
    stats_ref[0:1, 0:1] = loss.reshape(1, 1)
    stats_ref[0:1, 1:2] = (c_x / n_eff).reshape(1, 1)
    stats_ref[0:1, 2:3] = (c_y / n_eff).reshape(1, 1)

    # ================ backward ================
    g_cx = n_eff / c_x
    g_cy = n_eff / c_y
    # gD = gC * (2 D - 2 rx_al), parity-split layout like d_sc
    gd_sc[0:2, 0:ne] = g_cx * (2.0 * d_sc[0:2, 0:ne] - 2.0 * rx_al_e[0:2, :])
    gd_sc[0:2, ne : ne + no] = g_cx * (2.0 * d_sc[0:2, ne : ne + no] - 2.0 * rx_al_o[0:2, :])
    gd_sc[2:4, 0:ne] = g_cy * (2.0 * d_sc[2:4, 0:ne] - 2.0 * rx_al_e[2:4, :])
    gd_sc[2:4, ne : ne + no] = g_cy * (2.0 * d_sc[2:4, ne : ne + no] - 2.0 * rx_al_o[2:4, :])

    # ---- gh: ghr[chi,nu,j] = sum_n gD_re Eq[nu,I,n-j] + gD_im Eq[nu,Q,n-j] (+ E term)
    for j in range(m):
        a, par = divmod(j, 2)
        if par == 0:
            sl = eq_sc[0:4, mh - a : n_sym - a]  # aligns with even-n block
            gdr = gd_sc[:, 0:ne]
        else:
            sl = eq_sc[0:4, mh - a : n_sym - a]
            gdr = gd_sc[:, ne : ne + no]
        sx, sy = s_cols[j]
        for chi in range(2):
            gdre = gdr[chi * 2 : chi * 2 + 1, :]
            gdim = gdr[chi * 2 + 1 : chi * 2 + 2, :]
            for nu in range(2):
                eqi = sl[nu : nu + 1, :]
                eqq = sl[nu + 2 : nu + 3, :]
                s_nu = sx if nu == 0 else sy
                ghr = jnp.sum(gdre * eqi) + jnp.sum(gdim * eqq) + 2.0 * (g_cx if chi == 0 else g_cy) * h_ref[chi * 4 + nu * 2 + 0, j] * s_nu
                ghi = -jnp.sum(gdre * eqq) + jnp.sum(gdim * eqi) + 2.0 * (g_cx if chi == 0 else g_cy) * h_ref[chi * 4 + nu * 2 + 1, j] * s_nu
                row_r = chi * 4 + nu * 2
                gh_ref[row_r : row_r + 1, j : j + 1] = ghr.reshape(1, 1)
                gh_ref[row_r + 1 : row_r + 2, j : j + 1] = ghi.reshape(1, 1)

    # ---- gEq (symbol domain): gEqUp[nu,c,2t] = sum_{chi,j} gD terms at n = 2t + j
    # accumulate into gout scratch rows reused as gEq (4 rows: xI yI xQ yQ)
    geq = jnp.zeros((4, n_sym), jnp.float32)
    for j in range(m):
        a, par = divmod(j, 2)
        # n = 2t + j; even j -> even-n block at u = t + a (u in [mh, Nsym))
        # -> t in [mh - a, Nsym - a); block index u - mh = t + a - mh
        blk = slice(0, ne) if par == 0 else slice(ne, ne + no)
        gdb = gd_sc[:, blk]  # (4, cnt)
        cnt = ne if par == 0 else no
        t_lo = mh - a
        t_hi = t_lo + cnt
        # guard: t range must stay within [0, Nsym); for j <= Mh it does
        rows = []
        for nu in range(2):
            acc_i = jnp.zeros((1, cnt), jnp.float32)
            acc_q = jnp.zeros((1, cnt), jnp.float32)
            for chi in range(2):
                hr = h_ref[chi * 4 + nu * 2 + 0, j]
                hi = h_ref[chi * 4 + nu * 2 + 1, j]
                gdre = gdb[chi * 2 : chi * 2 + 1, :]
                gdim = gdb[chi * 2 + 1 : chi * 2 + 2, :]
                acc_i = acc_i + gdre * hr + gdim * hi
                acc_q = acc_q + -gdre * hi + gdim * hr
            rows.append((acc_i, acc_q))
        # place [t_lo, t_hi) via static padding (Mosaic has no scatter)
        padded = [
            jnp.pad(r, ((0, 0), (t_lo, n_sym - t_hi)))
            for r in (rows[0][0], rows[1][0], rows[0][1], rows[1][1])
        ]
        geq = geq + jnp.concatenate(padded)

    # ---- gV: g_vsum[nu, t] = sum_chi gC_chi * sum_j habsq[chi,nu,j] 1[lo_j <= t < hi_j]
    gv = jnp.zeros((2, n_sym), jnp.float32)
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))
        hi_t = min((n_samp - j - 1) // 2 + 1, n_sym)
        habsq_xx = h_ref[0, j] * h_ref[0, j] + h_ref[1, j] * h_ref[1, j]
        habsq_xy = h_ref[2, j] * h_ref[2, j] + h_ref[3, j] * h_ref[3, j]
        habsq_yx = h_ref[4, j] * h_ref[4, j] + h_ref[5, j] * h_ref[5, j]
        habsq_yy = h_ref[6, j] * h_ref[6, j] + h_ref[7, j] * h_ref[7, j]
        ones = jnp.ones((1, hi_t - lo), jnp.float32)
        row0 = jnp.pad(ones * (g_cx * habsq_xx + g_cy * habsq_yx), ((0, 0), (lo, n_sym - hi_t)))
        row1 = jnp.pad(ones * (g_cx * habsq_xy + g_cy * habsq_yy), ((0, 0), (lo, n_sym - hi_t)))
        gv = gv + jnp.concatenate([row0, row1])

    # ---- moments -> gq -> softmin VJP -> gout
    gout_sc[:, :] = jnp.zeros(gout_sc.shape, jnp.float32)
    t_in = jax.lax.broadcasted_iota(jnp.int32, (1, n_sym), 1)
    t_mask = ((t_in >= mh) & (t_in < n_sym - mh)).astype(jnp.float32)
    for r in range(4):
        nu = r % 2  # row r: 0=(x,I) 1=(y,I) 2=(x,Q) 3=(y,Q)
        var = var_x if r % 2 == 0 else var_y
        gvr = gv[nu : nu + 1, :]
        g_eq_r = geq[r : r + 1, :] - 2.0 * eq_sc[r : r + 1, :] * gvr
        g_eq2_r = gvr
        q = q_sc[r * n_lev : (r + 1) * n_lev, :]
        gq = amps[:, None] * g_eq_r + (amps * amps)[:, None] * g_eq2_r
        ratio = q / p_row[:, None]
        gq = gq + (jnp.log(ratio + eps) + ratio / (ratio + eps)) * t_mask
        inner = jnp.sum(q * gq, axis=0, keepdims=True)
        gm = -q * (gq - inner)
        o = out[r : r + 1, :]
        gout_sc[r : r + 1, :] = jnp.sum(gm * (o - amps[:, None]), axis=0, keepdims=True) / var

    # ---- gw: gw[o,i,k] = sum_t gout_I[o,t] xi_p[i,2t+k] + gout_Q[o,t] xq_p[i,2t+k]
    for k in range(m):
        a, par = divmod(k, 2)
        xj = xph_ref[par, :, a : a + n_sym]  # (8, N) rows 0..3 real
        xqj = xqph_ref[par, :, a : a + n_sym]
        for o in range(2):
            gI = gout_sc[o : o + 1, :]  # rows 0,1 are I outputs
            gQ = gout_sc[o + 2 : o + 3, :]
            for i in range(4):
                val = jnp.sum(gI * xj[i : i + 1, :]) + jnp.sum(gQ * xqj[i : i + 1, :])
                gw_ref[o * 4 + i : o * 4 + i + 1, k : k + 1] = val.reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vae_dp_loss_and_grad_pallas(w, h, x, amps, var, nu_sc, P, interpret: bool = False):
    """(loss, var_est, gw, gh) of the fused DP VAE loss. sps=2, odd M only.

    w: (2, 4, M); h: (2, 2, 2, M); x: (2, 2, Nsamp). Matches
    jax.value_and_grad of the XLA path (ops/elbo_vjp.py reference) to f32.
    """
    m = w.shape[-1]
    assert m % 2 == 1, "odd tap count only"
    n_samp = x.shape[-1]
    n_sym = n_samp // 2
    n_lev = amps.shape[0]
    mh = m // 2

    # polyphase arrangements (same construction as ops/butterfly_kernel.py)
    x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])
    x_q = jnp.concatenate([x[:, 1, :], x[:, 0, :]])
    lp = n_sym + mh + 1

    def phases(arr):
        xp = jnp.pad(arr, ((0, 0), (mh, mh)))
        need = 2 * (lp + 1)
        xp = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[-1]))))
        ph = jnp.stack([xp[:, p::2][:, :lp] for p in range(2)])
        return jnp.pad(ph, ((0, 0), (0, 4), (0, 0)))  # + explicit zero rows

    xph = phases(x_i)
    xqph = phases(x_q)
    rx4 = x.reshape(4, n_samp)
    rxe = rx4[:, 0::2]  # parity planes (XLA-side deinterleave)
    rxo = rx4[:, 1::2]

    # per-tap (8, 4) weight blocks, rows (x_I, y_I, x_Q, y_Q, 0 x4): the Q
    # output rows apply the SAME taps to the Q arrangement (models/vae_le.py)
    w8 = jnp.concatenate([w[0:1], w[1:2], w[0:1], w[1:2], jnp.zeros((4, 4, m), w.dtype)])
    w8 = jnp.moveaxis(w8, -1, 1).reshape(8, m * 4)  # lane block k*4+i = tap k, in-row i
    h8 = h.reshape(8, m)
    scal = jnp.array([[var[0], var[1], nu_sc, 1e-12, 0, 0, 0, 0]], jnp.float32)
    amps_row = amps.reshape(1, n_lev).astype(jnp.float32)
    p_row = P.reshape(1, n_lev).astype(jnp.float32)

    kernel = functools.partial(_kernel, n_sym=n_sym, m=m, n_lev=n_lev)
    gw8, gh8, stats, q8, out8 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((4 * n_lev, n_sym), jnp.float32),
            jax.ShapeDtypeStruct((8, n_sym), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, n_sym), jnp.float32),  # acc / out
            pltpu.VMEM((4 * n_lev, n_sym), jnp.float32),  # q
            pltpu.VMEM((8, n_sym), jnp.float32),  # eq
            pltpu.VMEM((8, n_sym), jnp.float32),  # var
            pltpu.VMEM((8, n_samp), jnp.float32),  # d (parity blocks)
            pltpu.VMEM((8, n_samp), jnp.float32),  # gd
            pltpu.VMEM((8, n_sym), jnp.float32),  # gout
        ],
        interpret=interpret,
    )(xph, xqph, rx4, rxe, rxo, w8, h8, amps_row, p_row, scal)

    loss = stats[0, 0]
    var_est = stats[0, 1:3]
    # q rows: (x_I, y_I, x_Q, y_Q) level blocks -> (2 pol, 2n, N)
    q4 = q8.reshape(4, n_lev, n_sym)
    q = jnp.stack(
        [jnp.concatenate([q4[0], q4[2]]), jnp.concatenate([q4[1], q4[3]])]
    )
    out = jnp.stack(
        [jnp.stack([out8[0], out8[2]]), jnp.stack([out8[1], out8[3]])]
    )
    return loss, var_est, gw8.reshape(2, 4, m), gh8.reshape(2, 2, 2, m), q, out
