"""Whole-EXPERIMENT fused VAE-NN training kernel: all epochs in one call.

The AWGN VAE-NN experiment (reference func_VAENN_MQAM.py:215-297) trains a
two-layer CNN demapper (conv(2->2n, k1) -> ELU -> conv(2n->2n, k2=3,
stride sps) -> +phase-averaged residual -> per-half softmax) jointly with
the channel-model taps h under the uniform-prior SISO ELBO, AMSGrad, 500
epochs x n_batches minibatches. Like the other whole-experiment kernels
(ops/siso_frame_kernel.py is the linear-equalizer analog), the serial
per-step cost is the instruction stream, so every contraction is ONE MXU
matmul:

  conv1 + b1   H1  = W1' (C, 2k1+1) @ X1' (2k1+1, L)   in-kernel im2col
                                                        (+ ones row = bias)
  phase split  Ee/Eo = E (C, L) @ Se/So (L, N)          selection matmuls
                                                        (strided lane slices
                                                        are not lowerable)
  conv2 + b2   Z   = W2' (C, 3C+1) @ E2 (3C+1, N)       E2 rows = the three
                                                        k2=3 stride-2 taps
                                                        [odd<<1|even|odd] +
                                                        ones (= bias)
  residual     Z  += SelHalf (C, 2) @ Xres (2, N)
  softmax      per half, max row-chain + selection matmuls
  ELBO D/E/C/KL and their VJPs: exactly the siso_frame_kernel formulation
  (uniform prior: the KL ratio is q itself)
  softmax VJP  gZ  = q (gq - SelHalf @ sum_half(q gq))
  conv2 bwd    gW2' = gZ @ E2^T ;  gE2 = W2'^T @ gZ     (one matmul each;
                                                        bias grads ride the
                                                        ones rows for free)
  conv1 bwd    gW1' = (gE * elu'(H1)) @ X1'^T

One grid step = one minibatch; the grid covers the entire experiment with
all parameters (W1', W2', h) and their three AMSGrad moments carried in
VMEM scratch. Parameters stream out at the reference's eval points (same
output index map as siso_frame_kernel), so the evaluations run VECTORIZED
afterwards. Net_BN: the functional BatchNorm (batch stats in train mode,
torch running-average conventions) runs in-kernel — per-channel sums as
(C, L) @ (L, 1) matmuls, gamma/beta trained by the same AMSGrad, running
stats momentum-updated in scratch and streamed out at the eval points.

Restrictions: sps == 2, odd m_est, kernel_2 == 3 (the reference default).
Parity: tests/test_nn_frame_kernel.py vs the train_vae_nn_awgn epoch scan
(jax autodiff + optax.amsgrad) in interpret mode.

scal (1, 8) SMEM: [eps_kl, lr, 0...]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frame_kernel import _support_masks

__all__ = ["nn_frame_opt_init", "vae_nn_experiment_train_pallas"]

_B1 = 0.9
_B2 = 0.999
_EPS = 1e-8
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32,
        precision=_HI,
    )


def nn_frame_opt_init(w1f, w2f, hpm, bnp=None) -> dict:
    """Zero AMSGrad moments (mu, nu, nu_max) in the FLAT param shapes."""
    z = lambda x: jnp.zeros_like(x)
    if bnp is None:
        bnp = jnp.zeros((w1f.shape[0], 2), jnp.float32)
    return {
        "m1": z(w1f), "v1": z(w1f), "x1": z(w1f),
        "m2": z(w2f), "v2": z(w2f), "x2": z(w2f),
        "mh": z(hpm), "vh": z(hpm), "xh": z(hpm),
        "mb": z(bnp), "vb": z(bnp), "xb": z(bnp),
    }


def _kernel(
    rx_ref, rxe_ref, rxo_ref,
    maske_ref, masko_ref, masket_ref, maskot_ref,
    se_ref, so_ref, selh_ref, selsum_ref, eqsel_ref, selamp_ref, ones_ref,
    w1_in, w2_in, h_in, bnp_in, rs_in,
    m1_in, v1_in, x1_in, m2_in, v2_in, x2_in, mh_in, vh_in, xh_in,
    mb_in, vb_in, xb_in,
    scal_ref,
    w1_out, w2_out, h_out, bnp_out, rs_out,
    m1_out, v1_out, x1_out, m2_out, v2_out, x2_out, mh_out, vh_out, xh_out,
    mb_out, vb_out, xb_out,
    stats_ref, w1ev_ref, w2ev_ref, hev_ref, bnpev_ref, rsev_ref,
    w1_sc, w2_sc, h_sc, bnp_sc, rs_sc, m1_sc, v1_sc, x1_sc_opt,
    m2_sc, v2_sc, x2_sc, mh_sc, vh_sc, xh_sc, mb_sc, vb_sc, xb_sc,
    rxpad_sc, x1_sc, h1_sc, xhat_sc, stdi_sc, gbn_sc,
    e2_sc, z_sc, mm2_sc, q_sc, g4_sc, shl_sc,
    eq_sc, eqwin_e_sc, eqwin_o_sc, gdwin_e_sc, gdwin_o_sc, ct_e_sc, ct_o_sc,
    gh_sc,
    *, n_sym, m, k1, n_lev, batchnorm,
):
    mi = pl.program_id(0)
    ch = 2 * n_lev
    n_samp = 2 * n_sym
    mh = m // 2
    mhe = mh + 1
    ne = n_sym - mh
    n_eff = float(n_samp - 2 * mh)
    p1 = k1 // 2
    eps = scal_ref[0, 0]
    lr = scal_ref[0, 1]

    @pl.when(mi == 0)
    def _():
        w1_sc[...] = w1_in[...]
        w2_sc[...] = w2_in[...]
        h_sc[...] = h_in[...]
        bnp_sc[...] = bnp_in[...]
        rs_sc[...] = rs_in[...]
        m1_sc[...] = m1_in[...]
        v1_sc[...] = v1_in[...]
        x1_sc_opt[...] = x1_in[...]
        m2_sc[...] = m2_in[...]
        v2_sc[...] = v2_in[...]
        x2_sc[...] = x2_in[...]
        mh_sc[...] = mh_in[...]
        vh_sc[...] = vh_in[...]
        xh_sc[...] = xh_in[...]
        mb_sc[...] = mb_in[...]
        vb_sc[...] = vb_in[...]
        xb_sc[...] = xb_in[...]
        # static regions: zero conv1 pad margins, the conv2 shift column,
        # the gE2-shift tail, and set the bias ones rows
        rxpad_sc[...] = jnp.zeros(rxpad_sc.shape, jnp.float32)
        x1_sc[2 * k1 : 2 * k1 + 1, :] = jnp.ones((1, n_samp), jnp.float32)
        e2_sc[:, 0:1] = jnp.zeros((3 * ch + 1, 1), jnp.float32)
        e2_sc[3 * ch : 3 * ch + 1, :] = jnp.ones((1, n_sym), jnp.float32)
        shl_sc[:, n_sym : n_sym + 1] = jnp.zeros((ch, 1), jnp.float32)

    # ---------------- conv1 via in-kernel im2col (+ bias ones row)
    rxpad_sc[:, p1 : p1 + n_samp] = rx_ref[0]
    for k in range(k1):
        x1_sc[2 * k : 2 * k + 2, :] = rxpad_sc[:, k : k + n_samp]
    h1 = _dot(w1_sc[...], x1_sc[...])  # (C, L)
    h1_sc[...] = h1
    e = jnp.where(h1 > 0.0, h1, jnp.exp(h1) - 1.0)  # ELU

    if batchnorm:
        # functional BatchNorm on the post-ELU activations (Net_BN): batch
        # statistics in train mode, torch conventions (biased var in the
        # normalization, unbiased in the running average). Per-channel sums
        # are (C, L) @ (L, 1) matmuls; (C, 1) columns broadcast on the VPU.
        m_bn = scal_ref[0, 2]
        eps_bn = scal_ref[0, 3]
        unb = scal_ref[0, 4]  # L / (L - 1)
        inv_l = 1.0 / float(n_samp)
        # ones is (L, 8): 1-lane matmul outputs are the riskier Mosaic
        # shape, so reduce to 8 lanes and take a lane slice of the value
        mu = _dot(e, ones_ref[...])[:, 0:1] * inv_l  # (C, 1)
        var_b = _dot(e * e, ones_ref[...])[:, 0:1] * inv_l - mu * mu
        stdi = jax.lax.rsqrt(var_b + eps_bn)
        stdi_sc[:, 0:1] = stdi
        xhat = (e - mu) * stdi
        xhat_sc[...] = xhat
        e = bnp_sc[:, 0:1] * xhat + bnp_sc[:, 1:2]
        rs_sc[:, 0:1] = (1.0 - m_bn) * rs_sc[:, 0:1] + m_bn * mu
        rs_sc[:, 1:2] = (1.0 - m_bn) * rs_sc[:, 1:2] + m_bn * (var_b * unb)

    # ---------------- conv2 operand: phase split + shifted odd + bias row
    e_even = _dot(e, se_ref[...])  # (C, N)
    e_odd = _dot(e, so_ref[...])
    e2_sc[0:ch, 1:n_sym] = e_odd[:, : n_sym - 1]  # x[2n-1] tap
    e2_sc[ch : 2 * ch, :] = e_even  # x[2n] tap
    e2_sc[2 * ch : 3 * ch, :] = e_odd  # x[2n+1] tap
    xres = 0.5 * (rxe_ref[0] + rxo_ref[0])  # (2, N) sps-phase average
    z = _dot(w2_sc[...], e2_sc[...]) + _dot(selh_ref[...], xres)
    z_sc[...] = z

    # ---------------- per-half softmax (max row-chain on the parked ref)
    for half in range(2):
        r0 = half * n_lev
        mm = z_sc[r0 : r0 + 1, :]
        for l in range(1, n_lev):
            mm = jnp.maximum(mm, z_sc[r0 + l : r0 + l + 1, :])
        mm2_sc[half : half + 1, :] = mm
    ex = jnp.exp(z - _dot(selh_ref[...], mm2_sc[...]))
    s2 = _dot(selsum_ref[...], ex)  # (2, N)
    q = ex * _dot(selh_ref[...], 1.0 / s2)
    q_sc[...] = q

    # ---------------- posterior moments -> D conv -> E -> C -> entropy
    mo4 = _dot(eqsel_ref[...], q)  # rows (EqI, EqQ, Eq2I, Eq2Q)
    eq_sc[...] = mo4[0:2, :]
    v2r = mo4[2:4, :] - mo4[0:2, :] * mo4[0:2, :]
    vsum = v2r[0:1, :] + v2r[1:2, :]  # (1, N)

    def win_stack(sc, n_a):
        r = 0
        for g in range(2):
            for a in range(n_a):
                sc[r : r + 1, :] = eq_sc[g : g + 1, mh - a : n_sym - a]
                r += 1
        return sc[...]

    eqwin_e = win_stack(eqwin_e_sc, mhe)
    eqwin_o = win_stack(eqwin_o_sc, mh)
    h_e = h_sc[:, :mhe]
    h_o = h_sc[:, mhe:]

    def ct_d(sc, h_p, n_a):
        sc[0:1, :n_a] = h_p[0:1, :]
        sc[0:1, n_a:] = -h_p[1:2, :]
        sc[1:2, :n_a] = h_p[1:2, :]
        sc[1:2, n_a:] = h_p[0:1, :]
        return sc[...]

    d_e = _dot(ct_d(ct_e_sc, h_e, mhe), eqwin_e)  # (2, ne)
    d_o = _dot(ct_d(ct_o_sc, h_o, mh), eqwin_o)

    s_e = _dot(vsum, maske_ref[...])  # (1, mhe)
    s_o = _dot(vsum, masko_ref[...])
    s_cat = jnp.concatenate([s_e, s_o], axis=1)  # (1, M) parity-major
    habsq = h_sc[0:1, :] * h_sc[0:1, :] + h_sc[1:2, :] * h_sc[1:2, :]
    e_term = jnp.sum(habsq * s_cat)

    rx = rx_ref[0]
    rx_w = rx[:, mh : n_samp - mh]
    c_base = jnp.sum(rx_w * rx_w)
    rxe = rxe_ref[0]
    rxo = rxo_ref[0]
    if mh % 2 == 0:
        rx_al_e = rxe[:, mh - mh // 2 : n_sym - mh // 2]
        rx_al_o = rxo[:, mh - mh // 2 : n_sym - mh // 2]
    else:
        rx_al_e = rxo[:, mh - (mh + 1) // 2 : n_sym - (mh + 1) // 2]
        rx_al_o = rxe[:, mh - mh // 2 : n_sym - mh // 2]
    cross = jnp.sum(rx_al_e * d_e) + jnp.sum(rx_al_o * d_o)
    dd = jnp.sum(d_e * d_e) + jnp.sum(d_o * d_o)
    c = c_base - 2.0 * cross + dd + e_term

    t_in = jax.lax.broadcasted_iota(jnp.int32, (1, n_sym), 1)
    t_mask = ((t_in >= mh) & (t_in < n_sym - mh)).astype(jnp.float32)
    ent = jnp.sum(-q * jnp.log(q + eps) * t_mask)  # uniform-prior entropy

    loss = n_eff * jnp.log(c) - ent
    stats_ref[0] = jnp.pad(loss.reshape(1, 1), ((0, 0), (0, 127)))

    # ================ backward ================
    g_c = n_eff / c
    gd_e = g_c * (2.0 * d_e - 2.0 * rx_al_e)
    gd_o = g_c * (2.0 * d_o - 2.0 * rx_al_o)

    def gh_from(ghm, h_p, s_p, n_a, lane0):
        gh_sc[0:1, lane0 : lane0 + n_a] = (
            ghm[0:1, :n_a] + ghm[1:2, n_a:] + 2.0 * g_c * h_p[0:1, :] * s_p
        )
        gh_sc[1:2, lane0 : lane0 + n_a] = (
            -ghm[0:1, n_a:] + ghm[1:2, :n_a] + 2.0 * g_c * h_p[1:2, :] * s_p
        )

    gh_from(_dot(gd_e, eqwin_e, ((1,), (1,))), h_e, s_e, mhe, 0)
    gh_from(_dot(gd_o, eqwin_o, ((1,), (1,))), h_o, s_o, mh, mhe)
    gh = gh_sc[...]

    def gdwin(sc, gd_p, n_a):
        padded = jnp.pad(gd_p, ((0, 0), (mh, n_a - 1)))
        r = 0
        for cpt in range(2):
            for a in range(n_a):
                sc[r : r + 1, :] = padded[cpt : cpt + 1, a : a + n_sym]
                r += 1
        return sc[...]

    def ct2(sc, h_p, n_a):
        sc[0:1, :n_a] = h_p[0:1, :]
        sc[0:1, n_a:] = h_p[1:2, :]
        sc[1:2, :n_a] = -h_p[1:2, :]
        sc[1:2, n_a:] = h_p[0:1, :]
        return sc[...]

    geq = _dot(ct2(ct_e_sc, h_e, mhe), gdwin(gdwin_e_sc, gd_e, mhe)) + _dot(
        ct2(ct_o_sc, h_o, mh), gdwin(gdwin_o_sc, gd_o, mh)
    )  # (2, N)
    gco = g_c * habsq
    gv = _dot(gco[:, :mhe], masket_ref[...]) + _dot(gco[:, mhe:], maskot_ref[...])

    # ---- gq = SelAmp @ (gEq' rows, gv rows) + entropy term
    g4_sc[0:2, :] = geq - 2.0 * eq_sc[...] * gv
    g4_sc[2:3, :] = gv
    g4_sc[3:4, :] = gv
    gq = _dot(selamp_ref[...], g4_sc[...])
    gq = gq + (jnp.log(q + eps) + q / (q + eps)) * t_mask

    # ---- softmax VJP -> gZ
    inner2 = _dot(selsum_ref[...], q * gq)  # (2, N)
    gz = q * (gq - _dot(selh_ref[...], inner2))

    # ---- conv2 backward (bias grads ride the ones rows)
    gw2 = _dot(gz, e2_sc[...], ((1,), (1,)))  # (C, 3C+1)
    ge2 = _dot(w2_sc[...], gz, ((0,), (0,)))  # (3C+1, N)
    shl_sc[:, :n_sym] = ge2[0:ch, :]
    ge_odd = ge2[2 * ch : 3 * ch, :] + shl_sc[:, 1 : n_sym + 1]
    ge = _dot(ge2[ch : 2 * ch, :], se_ref[...], ((1,), (1,))) + _dot(
        ge_odd, so_ref[...], ((1,), (1,))
    )  # (C, L)

    # ---- BatchNorm VJP (between the conv2 and ELU backward passes)
    if batchnorm:
        xhat = xhat_sc[...]
        stdi = stdi_sc[:, 0:1]
        inv_l = 1.0 / float(n_samp)
        gbn_sc[:, 0:1] = _dot(ge * xhat, ones_ref[...])[:, 0:1]  # g_gamma
        gbn_sc[:, 1:2] = _dot(ge, ones_ref[...])[:, 0:1]  # g_beta
        g_xhat = ge * bnp_sc[:, 0:1]
        s1 = _dot(g_xhat, ones_ref[...])[:, 0:1] * inv_l
        s2 = _dot(g_xhat * xhat, ones_ref[...])[:, 0:1] * inv_l
        ge = stdi * (g_xhat - s1 - xhat * s2)

    # ---- ELU VJP + conv1 backward
    h1v = h1_sc[...]
    gh1 = ge * jnp.where(h1v > 0.0, 1.0, jnp.exp(h1v))
    gw1 = _dot(gh1, x1_sc[...], ((1,), (1,)))  # (C, 2k1+1)

    # ================ in-kernel AMSGrad (optax semantics) ================
    t = mi.astype(jnp.float32) + 1.0
    bc1 = 1.0 - jnp.exp(t * math.log(_B1))
    bc2 = 1.0 - jnp.exp(t * math.log(_B2))

    def ams(m_sc, v_sc, x_sc, p_sc, g):
        m_sc[...] = _B1 * m_sc[...] + (1.0 - _B1) * g
        v_sc[...] = _B2 * v_sc[...] + (1.0 - _B2) * g * g
        x_sc[...] = jnp.maximum(x_sc[...], v_sc[...] / bc2)
        p_sc[...] = p_sc[...] - lr * (m_sc[...] / bc1) / (jnp.sqrt(x_sc[...]) + _EPS)

    ams(m1_sc, v1_sc, x1_sc_opt, w1_sc, gw1)
    ams(m2_sc, v2_sc, x2_sc, w2_sc, gw2)
    ams(mh_sc, vh_sc, xh_sc, h_sc, gh)
    if batchnorm:
        ams(mb_sc, vb_sc, xb_sc, bnp_sc, gbn_sc[...])

    w1_out[...] = w1_sc[...]
    w2_out[...] = w2_sc[...]
    h_out[...] = h_sc[...]
    bnp_out[...] = bnp_sc[...]
    rs_out[...] = rs_sc[...]
    m1_out[...] = m1_sc[...]
    v1_out[...] = v1_sc[...]
    x1_out[...] = x1_sc_opt[...]
    m2_out[...] = m2_sc[...]
    v2_out[...] = v2_sc[...]
    x2_out[...] = x2_sc[...]
    mh_out[...] = mh_sc[...]
    vh_out[...] = vh_sc[...]
    xh_out[...] = xh_sc[...]
    mb_out[...] = mb_sc[...]
    vb_out[...] = vb_sc[...]
    xb_out[...] = xb_sc[...]
    w1ev_ref[0] = w1_sc[...]
    w2ev_ref[0] = w2_sc[...]
    hev_ref[0] = h_sc[...]
    bnpev_ref[0] = bnp_sc[...]
    rsev_ref[0] = rs_sc[...]


def flatten_nn_params(net_params):
    """{"w1","b1","w2","b2"} -> (W1' (C, 2k1+1), W2' (C, 3C+1)).

    W1' columns: (tap k, channel c) pairs col 2k+c (matching the in-kernel
    im2col row order) + bias; W2' columns: the k2=3 stride-2 taps in E2 row
    order [d=0 | d=1 | d=2] + bias."""
    w1, b1 = net_params["w1"], net_params["b1"]  # (C, 2, k1), (C,)
    w2, b2 = net_params["w2"], net_params["b2"]  # (C, C, 3), (C,)
    w1f = jnp.concatenate(
        [jnp.moveaxis(w1, 1, 2).reshape(w1.shape[0], -1), b1[:, None]], axis=1
    )
    w2f = jnp.concatenate(
        [w2[:, :, 0], w2[:, :, 1], w2[:, :, 2], b2[:, None]], axis=1
    )
    return w1f, w2f


def unflatten_nn_params(w1f, w2f, k1: int):
    """Inverse of flatten_nn_params (works on leading batch dims)."""
    ch = w1f.shape[-2]
    w1 = jnp.moveaxis(
        w1f[..., : 2 * k1].reshape(w1f.shape[:-1] + (k1, 2)), -1, -2
    )
    b1 = w1f[..., 2 * k1]
    w2 = jnp.stack(
        [w2f[..., 0:ch], w2f[..., ch : 2 * ch], w2f[..., 2 * ch : 3 * ch]],
        axis=-1,
    )
    b2 = w2f[..., 3 * ch]
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def _to_parity_major(h2: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([h2[..., 0::2], h2[..., 1::2]], axis=-1)


def _from_parity_major(hpm: jnp.ndarray, m: int) -> jnp.ndarray:
    mhe = m // 2 + 1
    out = jnp.zeros(hpm.shape[:-1] + (m,), hpm.dtype)
    out = out.at[..., 0::2].set(hpm[..., :mhe])
    return out.at[..., 1::2].set(hpm[..., mhe:])


@functools.partial(
    jax.jit,
    static_argnames=("bl_sym", "n_batches", "epe", "k1", "interpret"),
)
def vae_nn_experiment_train_pallas(
    w1f, w2f, h, opt, rx_epochs, amps, lr, bn=None, momentum=0.1,
    *, bl_sym: int, n_batches: int, epe: int, k1: int, interpret: bool = False,
):
    """Run the FULL AWGN VAE-NN experiment (all epochs) in one pallas_call.

    w1f/w2f: flat conv params (flatten_nn_params); h: (2, M) channel taps;
    opt: nn_frame_opt_init dict (moments in the FLAT shapes, h parity-major);
    rx_epochs: (num_epochs, 2, n_samp >= n_batches*2*bl_sym); lr: traced
    scalar; bn (Net_BN): ((C, 2) [gamma | beta], (C, 2) [running mean |
    running var]) — trained / momentum-updated in-kernel respectively.
    sps=2, odd M, kernel_2=3 only.

    Returns (w1f', w2f', h', bnp', rs', opt', losses (steps,), w1_evals,
    w2_evals, h_evals, bnp_evals, rs_evals) with the eval snapshots at the
    reference's eval points (slot i = params after epoch i*epe + 1; last
    slot = final params), exactly like ops/siso_frame_kernel.py.
    """
    batchnorm = bn is not None
    m = h.shape[-1]
    assert m % 2 == 1, "odd tap count only"
    ch = w1f.shape[0]
    n_lev = ch // 2
    assert amps.shape[0] == n_lev
    n_sym = bl_sym
    n_samp_mb = 2 * bl_sym
    mh = m // 2
    mhe = mh + 1
    num_epochs = rx_epochs.shape[0]
    steps = num_epochs * n_batches
    n_evals = num_epochs // epe

    rx_mb = rx_epochs[:, :, : n_batches * n_samp_mb].reshape(
        num_epochs, 2, n_batches, n_samp_mb
    )
    rx_mb = jnp.moveaxis(rx_mb, 2, 1).reshape(steps, 2, n_samp_mb)
    rxe = rx_mb[:, :, 0::2]
    rxo = rx_mb[:, :, 1::2]

    mask_e, mask_o = _support_masks(m, n_sym)
    mask_e = jnp.asarray(mask_e)
    mask_o = jnp.asarray(mask_o)

    # constant selection matrices
    se_np = np.zeros((n_samp_mb, n_sym), np.float32)
    so_np = np.zeros((n_samp_mb, n_sym), np.float32)
    se_np[2 * np.arange(n_sym), np.arange(n_sym)] = 1.0
    so_np[2 * np.arange(n_sym) + 1, np.arange(n_sym)] = 1.0
    selh_np = np.zeros((ch, 2), np.float32)  # half membership
    selh_np[:n_lev, 0] = 1.0
    selh_np[n_lev:, 1] = 1.0
    a = amps.astype(jnp.float32)
    a2 = a * a
    z = jnp.zeros_like(a)
    cat = lambda x, y: jnp.concatenate([x, y])
    eqsel = jnp.stack([cat(a, z), cat(z, a), cat(a2, z), cat(z, a2)])  # (4, ch)
    selamp = jnp.concatenate(
        [jnp.stack([a, z, a2, z], axis=1), jnp.stack([z, a, z, a2], axis=1)]
    )  # (ch, 4)

    h8 = _to_parity_major(h)
    scal = jnp.stack(
        [jnp.float32(1e-12), jnp.float32(lr), jnp.float32(momentum),
         jnp.float32(1e-5), jnp.float32(n_samp_mb / (n_samp_mb - 1))]
        + [jnp.float32(0.0)] * 3
    ).reshape(1, 8).astype(jnp.float32)
    if batchnorm:
        bnp0, rs0 = bn
    else:
        bnp0 = jnp.zeros((ch, 2), jnp.float32)
        rs0 = jnp.zeros((ch, 2), jnp.float32)

    kernel = functools.partial(
        _kernel, n_sym=n_sym, m=m, k1=k1, n_lev=n_lev, batchnorm=batchnorm
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    per_mb = lambda c, l: pl.BlockSpec(
        (1, c, l), lambda mi: (mi, 0, 0), memory_space=pltpu.VMEM
    )
    ev_idx = lambda mi: ((mi // n_batches + epe - 1) // epe, 0, 0)
    pshape = lambda a: jax.ShapeDtypeStruct(a.shape, jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        out_shape=(
            pshape(w1f), pshape(w2f), pshape(h8), pshape(bnp0), pshape(rs0),
            pshape(w1f), pshape(w1f), pshape(w1f),
            pshape(w2f), pshape(w2f), pshape(w2f),
            pshape(h8), pshape(h8), pshape(h8),
            pshape(bnp0), pshape(bnp0), pshape(bnp0),
            jax.ShapeDtypeStruct((steps, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_evals + 1,) + w1f.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_evals + 1,) + w2f.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_evals + 1,) + h8.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_evals + 1,) + bnp0.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_evals + 1,) + rs0.shape, jnp.float32),
        ),
        in_specs=[
            per_mb(2, n_samp_mb), per_mb(2, n_sym), per_mb(2, n_sym),
            full(), full(), full(), full(),  # masks
            full(), full(), full(), full(), full(), full(), full(),  # selections + ones
            full(), full(), full(), full(), full(),  # params (+ bn, stats)
            full(), full(), full(), full(), full(), full(),  # conv moments
            full(), full(), full(),  # h moments
            full(), full(), full(),  # bn moments
            pl.BlockSpec((1, 8), lambda mi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            full(), full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
            pl.BlockSpec((1, 1, 128), lambda mi: (mi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + w1f.shape, ev_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + w2f.shape, ev_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + h8.shape, ev_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bnp0.shape, ev_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + rs0.shape, ev_idx, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(w1f.shape, jnp.float32),  # w1
            pltpu.VMEM(w2f.shape, jnp.float32),  # w2
            pltpu.VMEM(h8.shape, jnp.float32),  # h
            pltpu.VMEM(bnp0.shape, jnp.float32),  # bn gamma/beta
            pltpu.VMEM(rs0.shape, jnp.float32),  # bn running stats
            pltpu.VMEM(w1f.shape, jnp.float32),  # m1
            pltpu.VMEM(w1f.shape, jnp.float32),  # v1
            pltpu.VMEM(w1f.shape, jnp.float32),  # x1 (nu_max)
            pltpu.VMEM(w2f.shape, jnp.float32),  # m2
            pltpu.VMEM(w2f.shape, jnp.float32),  # v2
            pltpu.VMEM(w2f.shape, jnp.float32),  # x2
            pltpu.VMEM(h8.shape, jnp.float32),  # mh
            pltpu.VMEM(h8.shape, jnp.float32),  # vh
            pltpu.VMEM(h8.shape, jnp.float32),  # xh
            pltpu.VMEM(bnp0.shape, jnp.float32),  # mb
            pltpu.VMEM(bnp0.shape, jnp.float32),  # vb
            pltpu.VMEM(bnp0.shape, jnp.float32),  # xb
            pltpu.VMEM((2, k1 - 1 + n_samp_mb), jnp.float32),  # rx padded
            pltpu.VMEM((2 * k1 + 1, n_samp_mb), jnp.float32),  # conv1 im2col
            pltpu.VMEM((ch, n_samp_mb), jnp.float32),  # pre-ELU h1
            pltpu.VMEM((ch, n_samp_mb), jnp.float32),  # BN xhat
            pltpu.VMEM((ch, 2), jnp.float32),  # BN 1/std
            pltpu.VMEM((ch, 2), jnp.float32),  # BN grad rows
            pltpu.VMEM((3 * ch + 1, n_sym), jnp.float32),  # conv2 operand
            pltpu.VMEM((ch, n_sym), jnp.float32),  # z (pre-softmax)
            pltpu.VMEM((2, n_sym), jnp.float32),  # per-half max rows
            pltpu.VMEM((ch, n_sym), jnp.float32),  # q
            pltpu.VMEM((4, n_sym), jnp.float32),  # gq build rows
            pltpu.VMEM((ch, n_sym + 1), jnp.float32),  # gE2 shift
            pltpu.VMEM((2, n_sym), jnp.float32),  # eq rows
            pltpu.VMEM((2 * mhe, n_sym - mh), jnp.float32),  # eqwin even
            pltpu.VMEM((2 * mh, n_sym - mh), jnp.float32),  # eqwin odd
            pltpu.VMEM((2 * mhe, n_sym), jnp.float32),  # gdwin even
            pltpu.VMEM((2 * mh, n_sym), jnp.float32),  # gdwin odd
            pltpu.VMEM((2, 2 * mhe), jnp.float32),  # CT even
            pltpu.VMEM((2, 2 * mh), jnp.float32),  # CT odd
            pltpu.VMEM((2, m), jnp.float32),  # gh assembly
        ],
        interpret=interpret,
    )(
        rx_mb, rxe, rxo, mask_e, mask_o,
        jnp.transpose(mask_e), jnp.transpose(mask_o),
        jnp.asarray(se_np), jnp.asarray(so_np), jnp.asarray(selh_np),
        jnp.asarray(selh_np.T.copy()), eqsel, selamp,
        jnp.ones((n_samp_mb, 8), jnp.float32),
        w1f, w2f, h8, bnp0, rs0,
        opt["m1"], opt["v1"], opt["x1"], opt["m2"], opt["v2"], opt["x2"],
        opt["mh"], opt["vh"], opt["xh"],
        opt["mb"], opt["vb"], opt["xb"], scal,
    )
    (w1_o, w2_o, h_o, bnp_o, rs_o, m1_o, v1_o, x1_o, m2_o, v2_o, x2_o,
     mh_o, vh_o, xh_o, mb_o, vb_o, xb_o, stats,
     w1_ev, w2_ev, h_ev, bnp_ev, rs_ev) = outs
    losses = stats[:, 0, 0]
    opt_new = {
        "m1": m1_o, "v1": v1_o, "x1": x1_o,
        "m2": m2_o, "v2": v2_o, "x2": x2_o,
        "mh": mh_o, "vh": vh_o, "xh": xh_o,
        "mb": mb_o, "vb": vb_o, "xb": xb_o,
    }
    return (
        w1_o, w2_o, _from_parity_major(h_o, m), bnp_o, rs_o, opt_new, losses,
        w1_ev, w2_ev, _from_parity_major(h_ev, m), bnp_ev, rs_ev,
    )
