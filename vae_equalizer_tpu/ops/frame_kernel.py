"""Whole-frame fused DP VAE training kernel: ALL minibatch steps in one call.

One ``pallas_call`` runs the full frame's online training — for each of the
``m_max`` minibatches: butterfly forward -> PCS soft demapper -> ELBO ->
hand-derived backward (the math of ops/elbo_kernel.py, validated against
jax.grad by ops/elbo_vjp.py) -> in-kernel Adam update — as a sequential TPU
grid with the parameters and optimizer moments carried across grid steps in
VMEM scratch. Minibatch inputs stream HBM->VMEM block by block (Pallas
double-buffers them); per-step posteriors/outputs stream back out.

Why: profiling (tools/profile_frame.py) shows the per-minibatch train step
costs ~53 us of which compute is ~1 us — the rest is per-op dispatch of the
~100 XLA ops (or kernel + optax ops) inside the lax.scan. Fusing the whole
frame removes that per-step overhead entirely; the optimizer recurrence is
inherently sequential, so a sequential in-kernel grid loses no parallelism.

Differences from the step kernel (ops/elbo_kernel.py):
  * weights live in the gradient layout wg (8, M) = w.reshape(8, M), rows
    o*4+i — the layout the backward writes — so Adam is one elementwise
    update; the forward reads per-(o,i,k) scalar coefficients instead of the
    step kernel's per-tap (8,4) blocks (~400 VPU madds, negligible).
  * Adam (optax.adam semantics: b1=.9, b2=.999, eps=1e-8, eps_root=0, bias
    correction with t = step+1) runs in-kernel; the net group's lr is halved
    once when the global step reaches ``lr_half_step`` and the channel
    estimate keeps the base lr (reference func_VAELE_DP_MQAM_shaping.py:
    28-31,45-46 via train/dp.py:_vae_optimizer).

Restrictions: sps == 2 and odd M (the reference operating point, M=25), like
the step kernel. Parity: tests/test_frame_kernel.py checks the whole-frame
trajectory against the step kernel + optax loop in interpret mode.

Layouts (rows x lanes), per minibatch block:
  xph/xqph (1, 2, 8, n_sym + mh + 1)  polyphase I/Q arrangements (+4 zero rows)
  rx       (1, 4, 2*n_sym)            rows chi*2 + c
  rxe/rxo  (1, 4, n_sym)              parity planes
  wg/h8 and Adam moments (8, M)
  scal     (1, 8) SMEM  [var_x, var_y, nu_sc, eps_kl, lr, lr_half_step, step0, 0]
Outputs:
  w/h/moments (8, M); stats (m_max, 128) row m: [loss, var_est_x, var_est_y];
  q (m_max, 4*n_lev, n_sym); out (m_max, 4, n_sym) rows (x_I, y_I, x_Q, y_Q)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vae_dp_frame_train_pallas"]

_B1 = 0.9
_B2 = 0.999
_EPS_ADAM = 1e-8


def _kernel(
    xph_ref, xqph_ref, rx_ref, rxe_ref, rxo_ref,
    w_in, h_in, mw_in, vw_in, mh_in, vh_in, amps_ref, p_ref, scal_ref,
    w_out, h_out, mw_out, vw_out, mh_out, vh_out, stats_ref, qout_ref, outout_ref,
    w_sc, h_sc, mw_sc, vw_sc, mh_sc, vh_sc,
    q_sc, eq_sc, v_sc, d_sc, gd_sc, gout_sc, gw_sc, gh_sc,
    *, n_sym, m, n_lev,
):
    mi = pl.program_id(0)

    @pl.when(mi == 0)
    def _():
        w_sc[:, :] = w_in[:, :]
        h_sc[:, :] = h_in[:, :]
        mw_sc[:, :] = mw_in[:, :]
        vw_sc[:, :] = vw_in[:, :]
        mh_sc[:, :] = mh_in[:, :]
        vh_sc[:, :] = vh_in[:, :]

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

    # ---------------- forward: butterfly in the wg (8, M) weight layout.
    # Output rows (x_I, y_I, x_Q, y_Q): row o of the I component consumes the
    # I arrangement, row o of Q the Q arrangement, with the SAME taps
    # (models/vae_le.py; step kernel's per-tap blocks unrolled to scalars).
    rows_i = [jnp.zeros((1, n_sym), jnp.float32) for _ in range(2)]
    rows_q = [jnp.zeros((1, n_sym), jnp.float32) for _ in range(2)]
    for k in range(m):
        a, ph = divmod(k, 2)
        xj = xph_ref[0, ph, :, a : a + n_sym]  # (8, n_sym), rows 0..3 live
        xqj = xqph_ref[0, ph, :, a : a + n_sym]
        for o in range(2):
            for i in range(4):
                c = w_sc[o * 4 + i, k]
                rows_i[o] = rows_i[o] + c * xj[i : i + 1, :]
                rows_q[o] = rows_q[o] + c * xqj[i : i + 1, :]
    out = jnp.concatenate([rows_i[0], rows_i[1], rows_q[0], rows_q[1]])  # (4, N)

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

    # ---------------- D conv (parity split, symbol domain) — see
    # ops/elbo_kernel.py for the index derivation.
    ne = n_sym - mh  # even-position count
    d_sc[:, :] = jnp.zeros(d_sc.shape, jnp.float32)
    for a in range(mh + 1):
        j_even = 2 * a
        sl = eq_sc[0:4, mh - a : n_sym - a]  # rows (xI, yI, xQ, yQ)
        for chi in range(2):
            hr = h_sc[chi * 4 + 0, j_even]
            hr2 = h_sc[chi * 4 + 2, j_even]
            hi = h_sc[chi * 4 + 1, j_even]
            hi2 = h_sc[chi * 4 + 3, j_even]
            d_sc[chi * 2 + 0, 0:ne] += (
                hr * sl[0] - hi * sl[2] + hr2 * sl[1] - hi2 * sl[3]
            )
            d_sc[chi * 2 + 1, 0:ne] += (
                hi * sl[0] + hr * sl[2] + hi2 * sl[1] + hr2 * sl[3]
            )
    no = n_sym - mh  # odd-position count
    for a in range(mh):
        j_odd = 2 * a + 1
        sl = eq_sc[0:4, mh - a : n_sym - a]
        for chi in range(2):
            hr = h_sc[chi * 4 + 0, j_odd]
            hr2 = h_sc[chi * 4 + 2, j_odd]
            hi = h_sc[chi * 4 + 1, j_odd]
            hi2 = h_sc[chi * 4 + 3, j_odd]
            d_sc[chi * 2 + 0, ne : ne + no] += (
                hr * sl[0] - hi * sl[2] + hr2 * sl[1] - hi2 * sl[3]
            )
            d_sc[chi * 2 + 1, ne : ne + no] += (
                hi * sl[0] + hr * sl[2] + hi2 * sl[1] + hr2 * sl[3]
            )

    # ---------------- E term
    vsum_x = v_sc[0:1, :] + v_sc[2:3, :]  # (1, Nsym) pol x
    vsum_y = v_sc[1:2, :] + v_sc[3:4, :]
    e_x = jnp.zeros((1, 1), jnp.float32)
    e_y = jnp.zeros((1, 1), jnp.float32)
    s_cols = []  # per-tap (S_x, S_y) scalars reused by the backward
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))  # ceil((Mh - j)/2)
        hi_t = (n_samp - j - 1) // 2 + 1
        hi_t = min(hi_t, n_sym)
        sx = jnp.sum(vsum_x[:, lo:hi_t])
        sy = jnp.sum(vsum_y[:, lo:hi_t])
        s_cols.append((sx, sy))
        habsq_xx = h_sc[0, j] * h_sc[0, j] + h_sc[1, j] * h_sc[1, j]
        habsq_xy = h_sc[2, j] * h_sc[2, j] + h_sc[3, j] * h_sc[3, j]
        habsq_yx = h_sc[4, j] * h_sc[4, j] + h_sc[5, j] * h_sc[5, j]
        habsq_yy = h_sc[6, j] * h_sc[6, j] + h_sc[7, j] * h_sc[7, j]
        e_x = e_x + habsq_xx * sx + habsq_xy * sy
        e_y = e_y + habsq_yx * sx + habsq_yy * sy

    # ---------------- C and loss
    rx = rx_ref[0, :, :]
    rx_w2 = rx[:, mh : n_samp - mh]
    c_base_x = jnp.sum(rx_w2[0:1, :] * rx_w2[0:1, :]) + jnp.sum(rx_w2[1:2, :] * rx_w2[1:2, :])
    c_base_y = jnp.sum(rx_w2[2:3, :] * rx_w2[2:3, :]) + jnp.sum(rx_w2[3:4, :] * rx_w2[3:4, :])
    rxe = rxe_ref[0, :, :]  # (4, Nsym) even samples
    rxo = rxo_ref[0, :, :]
    if mh % 2 == 0:
        rx_al_e = rxe[:, mh - mh // 2 : n_sym - mh // 2]  # (4, ne)
        rx_al_o = rxo[:, mh - mh // 2 : n_sym - mh // 2]
    else:
        rx_al_e = rxo[:, mh - (mh + 1) // 2 : n_sym - (mh + 1) // 2]
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

    qout_ref[0, :, :] = q_sc[:, :]
    outout_ref[0, :, :] = out

    loss = n_eff * (jnp.log(c_x) + jnp.log(c_y)) - kl[0, 0]
    row = jnp.concatenate(
        [loss.reshape(1, 1), (c_x / n_eff).reshape(1, 1), (c_y / n_eff).reshape(1, 1)],
        axis=1,
    )
    stats_ref[0, :, :] = jnp.pad(row, ((0, 0), (0, 125)))

    # ================ backward ================
    g_cx = n_eff / c_x
    g_cy = n_eff / c_y
    gd_sc[0:2, 0:ne] = g_cx * (2.0 * d_sc[0:2, 0:ne] - 2.0 * rx_al_e[0:2, :])
    gd_sc[0:2, ne : ne + no] = g_cx * (2.0 * d_sc[0:2, ne : ne + no] - 2.0 * rx_al_o[0:2, :])
    gd_sc[2:4, 0:ne] = g_cy * (2.0 * d_sc[2:4, 0:ne] - 2.0 * rx_al_e[2:4, :])
    gd_sc[2:4, ne : ne + no] = g_cy * (2.0 * d_sc[2:4, ne : ne + no] - 2.0 * rx_al_o[2:4, :])

    # ---- gh
    for j in range(m):
        a, par = divmod(j, 2)
        sl = eq_sc[0:4, mh - a : n_sym - a]
        gdr = gd_sc[:, 0:ne] if par == 0 else gd_sc[:, ne : ne + no]
        sx, sy = s_cols[j]
        for chi in range(2):
            gdre = gdr[chi * 2 : chi * 2 + 1, :]
            gdim = gdr[chi * 2 + 1 : chi * 2 + 2, :]
            for nu in range(2):
                eqi = sl[nu : nu + 1, :]
                eqq = sl[nu + 2 : nu + 3, :]
                s_nu = sx if nu == 0 else sy
                ghr = jnp.sum(gdre * eqi) + jnp.sum(gdim * eqq) + 2.0 * (g_cx if chi == 0 else g_cy) * h_sc[chi * 4 + nu * 2 + 0, j] * s_nu
                ghi = -jnp.sum(gdre * eqq) + jnp.sum(gdim * eqi) + 2.0 * (g_cx if chi == 0 else g_cy) * h_sc[chi * 4 + nu * 2 + 1, j] * s_nu
                row_r = chi * 4 + nu * 2
                gh_sc[row_r : row_r + 1, j : j + 1] = ghr.reshape(1, 1)
                gh_sc[row_r + 1 : row_r + 2, j : j + 1] = ghi.reshape(1, 1)

    # ---- gEq (symbol domain)
    geq = jnp.zeros((4, n_sym), jnp.float32)
    for j in range(m):
        a, par = divmod(j, 2)
        blk = slice(0, ne) if par == 0 else slice(ne, ne + no)
        gdb = gd_sc[:, blk]  # (4, cnt)
        cnt = ne if par == 0 else no
        t_lo = mh - a
        t_hi = t_lo + cnt
        rows = []
        for nu in range(2):
            acc_i = jnp.zeros((1, cnt), jnp.float32)
            acc_q = jnp.zeros((1, cnt), jnp.float32)
            for chi in range(2):
                hr = h_sc[chi * 4 + nu * 2 + 0, j]
                hi = h_sc[chi * 4 + nu * 2 + 1, j]
                gdre = gdb[chi * 2 : chi * 2 + 1, :]
                gdim = gdb[chi * 2 + 1 : chi * 2 + 2, :]
                acc_i = acc_i + gdre * hr + gdim * hi
                acc_q = acc_q + -gdre * hi + gdim * hr
            rows.append((acc_i, acc_q))
        padded = [
            jnp.pad(r, ((0, 0), (t_lo, n_sym - t_hi)))
            for r in (rows[0][0], rows[1][0], rows[0][1], rows[1][1])
        ]
        geq = geq + jnp.concatenate(padded)

    # ---- gV
    gv = jnp.zeros((2, n_sym), jnp.float32)
    for j in range(m):
        lo = max(0, -(-(mh2 - j) // 2))
        hi_t = min((n_samp - j - 1) // 2 + 1, n_sym)
        habsq_xx = h_sc[0, j] * h_sc[0, j] + h_sc[1, j] * h_sc[1, j]
        habsq_xy = h_sc[2, j] * h_sc[2, j] + h_sc[3, j] * h_sc[3, j]
        habsq_yx = h_sc[4, j] * h_sc[4, j] + h_sc[5, j] * h_sc[5, j]
        habsq_yy = h_sc[6, j] * h_sc[6, j] + h_sc[7, j] * h_sc[7, j]
        ones = jnp.ones((1, hi_t - lo), jnp.float32)
        row0 = jnp.pad(ones * (g_cx * habsq_xx + g_cy * habsq_yx), ((0, 0), (lo, n_sym - hi_t)))
        row1 = jnp.pad(ones * (g_cx * habsq_xy + g_cy * habsq_yy), ((0, 0), (lo, n_sym - hi_t)))
        gv = gv + jnp.concatenate([row0, row1])

    # ---- moments -> gq -> softmin VJP -> gout
    gout_sc[:, :] = jnp.zeros(gout_sc.shape, jnp.float32)
    t_in = jax.lax.broadcasted_iota(jnp.int32, (1, n_sym), 1)
    t_mask = ((t_in >= mh) & (t_in < n_sym - mh)).astype(jnp.float32)
    for r in range(4):
        nu = r % 2
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

    # ---- gw in the wg (8, M) layout: gw[o*4+i, k]
    for k in range(m):
        a, par = divmod(k, 2)
        xj = xph_ref[0, par, :, a : a + n_sym]
        xqj = xqph_ref[0, par, :, a : a + n_sym]
        for o in range(2):
            gI = gout_sc[o : o + 1, :]
            gQ = gout_sc[o + 2 : o + 3, :]
            for i in range(4):
                val = jnp.sum(gI * xj[i : i + 1, :]) + jnp.sum(gQ * xqj[i : i + 1, :])
                gw_sc[o * 4 + i : o * 4 + i + 1, k : k + 1] = val.reshape(1, 1)

    # ================ in-kernel Adam (optax.adam semantics) ================
    lr = scal_ref[0, 4]
    lr_half_step = scal_ref[0, 5]
    step0 = scal_ref[0, 6]
    step_f = step0 + mi.astype(jnp.float32)  # 0-based global step index
    t = step_f + 1.0  # optax bias-correction count
    # b**t as exp(t*ln b): Mosaic has no powf lowering
    bc1 = 1.0 - jnp.exp(t * math.log(_B1))
    bc2 = 1.0 - jnp.exp(t * math.log(_B2))
    lr_w = lr * jnp.where(step_f >= lr_half_step, 0.5, 1.0)

    gw = gw_sc[:, :]
    mw_sc[:, :] = _B1 * mw_sc[:, :] + (1.0 - _B1) * gw
    vw_sc[:, :] = _B2 * vw_sc[:, :] + (1.0 - _B2) * gw * gw
    w_sc[:, :] = w_sc[:, :] - lr_w * (mw_sc[:, :] / bc1) / (
        jnp.sqrt(vw_sc[:, :] / bc2) + _EPS_ADAM
    )

    gh = gh_sc[:, :]
    mh_sc[:, :] = _B1 * mh_sc[:, :] + (1.0 - _B1) * gh
    vh_sc[:, :] = _B2 * vh_sc[:, :] + (1.0 - _B2) * gh * gh
    h_sc[:, :] = h_sc[:, :] - lr * (mh_sc[:, :] / bc1) / (
        jnp.sqrt(vh_sc[:, :] / bc2) + _EPS_ADAM
    )

    w_out[:, :] = w_sc[:, :]
    h_out[:, :] = h_sc[:, :]
    mw_out[:, :] = mw_sc[:, :]
    vw_out[:, :] = vw_sc[:, :]
    mh_out[:, :] = mh_sc[:, :]
    vh_out[:, :] = vh_sc[:, :]


@functools.partial(jax.jit, static_argnames=("bl_sym", "interpret"))
def vae_dp_frame_train_pallas(
    w, h, opt, rx, amps, var, nu_sc, P, lr, step0, lr_half_step,
    *, bl_sym: int, interpret: bool = False,
):
    """Run one frame's FULL online training (all minibatches + Adam) fused.

    w: (2, 4, M); h: (2, 2, 2, M); opt: dict(mw, vw, mh, vh) of Adam moments
    in the param shapes; rx: (2, 2, Nsamp) with Nsamp a multiple of
    2*bl_sym; lr/step0/lr_half_step: traced scalars (step0 = global step
    index of the frame's first minibatch, so the lr schedule and bias
    correction continue across frames). sps=2, odd M only.

    Returns (w', h', opt', losses (m_max,), var_est (m_max, 2),
    q (m_max, 2, 2*n_lev, bl_sym), out (m_max, 2, 2, bl_sym)) — exactly the
    per-frame quantities of the lax.scan step path in train/dp.py.
    """
    m = w.shape[-1]
    assert m % 2 == 1, "odd tap count only"
    n_sym = bl_sym
    n_samp_mb = 2 * bl_sym
    m_max = rx.shape[-1] // n_samp_mb
    n_lev = amps.shape[0]
    mh = m // 2
    lp = n_sym + mh + 1

    # per-minibatch polyphase arrangements, vectorized over minibatches
    # (identical construction to ops/elbo_kernel.py's wrapper)
    rx_mb = jnp.moveaxis(
        rx[:, :, : m_max * n_samp_mb].reshape(2, 2, m_max, n_samp_mb), 2, 0
    )  # (m_max, 2, 2, Nsamp_mb)

    def arrange(x):
        x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])
        x_q = jnp.concatenate([x[:, 1, :], x[:, 0, :]])

        def phases(arr):
            xp = jnp.pad(arr, ((0, 0), (mh, mh)))
            need = 2 * (lp + 1)
            xp = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[-1]))))
            ph = jnp.stack([xp[:, p::2][:, :lp] for p in range(2)])
            return jnp.pad(ph, ((0, 0), (0, 4), (0, 0)))  # + explicit zero rows

        rx4 = x.reshape(4, n_samp_mb)
        return phases(x_i), phases(x_q), rx4, rx4[:, 0::2], rx4[:, 1::2]

    xph, xqph, rx4, rxe, rxo = jax.vmap(arrange)(rx_mb)

    wg = w.reshape(8, m)
    h8 = h.reshape(8, m)
    mw8 = opt["mw"].reshape(8, m)
    vw8 = opt["vw"].reshape(8, m)
    mh8 = opt["mh"].reshape(8, m)
    vh8 = opt["vh"].reshape(8, m)
    scal = jnp.stack(
        [var[0], var[1], jnp.float32(nu_sc), jnp.float32(1e-12),
         jnp.float32(lr), jnp.float32(lr_half_step), jnp.float32(step0),
         jnp.float32(0.0)]
    ).reshape(1, 8).astype(jnp.float32)
    amps_row = amps.reshape(1, n_lev).astype(jnp.float32)
    p_row = P.reshape(1, n_lev).astype(jnp.float32)

    kernel = functools.partial(_kernel, n_sym=n_sym, m=m, n_lev=n_lev)
    full = lambda *ndim: pl.BlockSpec(memory_space=pltpu.VMEM)
    per_mb3 = lambda c, l: pl.BlockSpec((1, c, l), lambda mi: (mi, 0, 0), memory_space=pltpu.VMEM)

    (w_o, h_o, mw_o, vw_o, mh_o, vh_o, stats, q_all, out_all) = pl.pallas_call(
        kernel,
        grid=(m_max,),
        out_shape=(
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
            jax.ShapeDtypeStruct((m_max, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((m_max, 4 * n_lev, n_sym), jnp.float32),
            jax.ShapeDtypeStruct((m_max, 4, n_sym), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 2, 8, lp), lambda mi: (mi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, lp), lambda mi: (mi, 0, 0, 0), memory_space=pltpu.VMEM),
            per_mb3(4, n_samp_mb),
            per_mb3(4, n_sym),
            per_mb3(4, n_sym),
            full(), full(), full(), full(), full(), full(),
            full(), full(),
            pl.BlockSpec((1, 8), lambda mi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            full(), full(), full(), full(), full(), full(),
            pl.BlockSpec((1, 1, 128), lambda mi: (mi, 0, 0), memory_space=pltpu.VMEM),
            per_mb3(4 * n_lev, n_sym),
            per_mb3(4, n_sym),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, m), jnp.float32),  # w
            pltpu.VMEM((8, m), jnp.float32),  # h
            pltpu.VMEM((8, m), jnp.float32),  # mw
            pltpu.VMEM((8, m), jnp.float32),  # vw
            pltpu.VMEM((8, m), jnp.float32),  # mh
            pltpu.VMEM((8, m), jnp.float32),  # vh
            pltpu.VMEM((4 * n_lev, n_sym), jnp.float32),  # q
            pltpu.VMEM((8, n_sym), jnp.float32),  # eq
            pltpu.VMEM((8, n_sym), jnp.float32),  # var moments
            pltpu.VMEM((8, n_samp_mb), jnp.float32),  # d (parity blocks)
            pltpu.VMEM((8, n_samp_mb), jnp.float32),  # gd
            pltpu.VMEM((8, n_sym), jnp.float32),  # gout
            pltpu.VMEM((8, m), jnp.float32),  # gw
            pltpu.VMEM((8, m), jnp.float32),  # gh
        ],
        interpret=interpret,
    )(xph, xqph, rx4, rxe, rxo, wg, h8, mw8, vw8, mh8, vh8, amps_row, p_row, scal)

    losses = stats[:, 0, 0]
    var_est = stats[:, 0, 1:3]
    q4 = q_all.reshape(m_max, 4, n_lev, n_sym)
    q = jnp.stack(
        [
            jnp.concatenate([q4[:, 0], q4[:, 2]], axis=1),
            jnp.concatenate([q4[:, 1], q4[:, 3]], axis=1),
        ],
        axis=1,
    )  # (m_max, 2, 2*n_lev, n_sym)
    out = jnp.stack(
        [
            jnp.stack([out_all[:, 0], out_all[:, 2]], axis=1),
            jnp.stack([out_all[:, 1], out_all[:, 3]], axis=1),
        ],
        axis=1,
    )  # (m_max, 2, 2, n_sym)
    opt_new = {
        "mw": mw_o.reshape(2, 4, m),
        "vw": vw_o.reshape(2, 4, m),
        "mh": mh_o.reshape(2, 2, 2, m),
        "vh": vh_o.reshape(2, 2, 2, m),
    }
    return w_o.reshape(2, 4, m), h_o.reshape(2, 2, 2, m), opt_new, losses, var_est, q, out
