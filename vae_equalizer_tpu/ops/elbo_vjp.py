"""Hand-derived VJP of the fused DP VAE loss (butterfly -> demapper -> ELBO).

loss(w, h, x) = sum_chi n_eff*log C_chi - KL, with
  out = butterfly(w, x);  q = softmin(metric(out));  moments -> D, E, C, KL
(models/vae_le.py + models/losses.py give the reference forward).

This module states the closed-form backward in plain JAX, validated against
jax.grad (tests/test_elbo_vjp.py); ops/elbo_kernel.py ports the same math
into Pallas TPU kernels. Restriction: sps == 2 (the framework's operating
point); other sps fall back to the XLA path.

Gradient derivation (dL/dloss = 1):
  gC  = n_eff / C
  gD  = gC * (-2*rx_w + 2*D)                       (per component)
  gh  = corr(gD, EqUp) + gC * 2h * S               (conv-wrt-weights + E term)
  gEqUp = corr(gD, h)                              (transposed conv)
  gV  = sum_chi gC_chi * habsq_chi masked by the tap window
  gEq = gEqUp[::sps] - 2*Eq*gV ;  gEq2 = gV
  gq  = a*gEq + a^2*gEq2  + [inner t] (log(q/P+eps) + q/(q+eps*P))
  gm  = -q*(gq - sum_l q*gq)                        (softmax(-m) VJP)
  gout = sum_l gm_l * (out - a_l)/var
  gw  = strided-corr(gout, x arrangements)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.losses import posterior_moments
from ..models.vae_le import vae_le_dp_forward

__all__ = ["vae_dp_loss_fwd", "vae_dp_loss_bwd", "vae_dp_loss_reference"]


def vae_dp_loss_reference(w, h, x, amps, var, nu_sc, P, eps=1e-12):
    """XLA reference: identical math to the training loss (for grad checks)."""
    from ..models.losses import elbo_dp

    q, _ = vae_le_dp_forward(w, x, amps, var, nu_sc, 2)
    return elbo_dp(q, x, h, amps, P, eps)


def _conv_weights(h):
    """(chi, 2, nu*2, taps) flipped conv bank used by elbo_dp's D computation."""
    hr, hi = h[:, :, 0, :], h[:, :, 1, :]
    w_re = jnp.stack([hr, -hi], axis=2)
    w_im = jnp.stack([hi, hr], axis=2)
    return jnp.stack([w_re, w_im], axis=1).reshape(4, 4, h.shape[-1])


def vae_dp_loss_fwd(w, h, x, amps, var, nu_sc, P, eps=1e-12):
    """Forward returning (loss, var_est) and the residuals for the backward."""
    n_samp = x.shape[-1]
    m = h.shape[-1]
    mh = m // 2
    mh2 = 2 * mh
    q, out = vae_le_dp_forward(w, x, amps, var, nu_sc, 2)
    eq, eq2 = posterior_moments(q, amps, 2)  # upsampled (2, 2, N)
    v = eq2 - eq * eq

    wk = _conv_weights(h)[:, :, ::-1]
    d = jax.lax.conv_general_dilated(
        eq.reshape(1, 4, n_samp), wk, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
    )[0].reshape(2, 2, n_samp - mh2)

    h_absq = jnp.sum(h * h, axis=2)  # (chi, nu, j)
    vsum = jnp.sum(v, axis=1)  # (nu, n)
    c_v = jnp.concatenate([jnp.zeros((2, 1)), jnp.cumsum(vsum, axis=-1)], axis=-1)
    j = jnp.arange(mh2 + 1)
    s = c_v[:, n_samp - j] - c_v[:, mh2 - j]  # (nu, j)
    e_term = jnp.einsum("xnj,nj->x", h_absq, s)

    rx_w = x[:, :, mh : n_samp - mh]
    c = jnp.sum(rx_w * rx_w, axis=(1, 2))
    c = c - 2.0 * jnp.sum(rx_w[:, 0] * d[:, 0] + rx_w[:, 1] * d[:, 1], axis=1)
    c = c + jnp.sum(d * d, axis=(1, 2)) + e_term

    n_sym = q.shape[-1]
    q_c = q[:, :, mh : n_sym - mh]
    p_col = jnp.tile(P, 2)[None, :, None]
    kl = jnp.sum(-q_c * jnp.log(q_c / p_col + eps))

    n_eff = n_samp - mh2
    loss = jnp.sum(n_eff * jnp.log(c)) - kl
    residuals = (q, out, eq, v, d, c, s)
    return (loss, c / n_eff), residuals


def vae_dp_loss_bwd(w, h, x, amps, var, nu_sc, P, residuals, eps=1e-12):
    """Closed-form (gw, gh) for dL/dloss = 1 (var_est is stop-gradiented)."""
    q, out, eq, v, d, c, s = residuals
    n_samp = x.shape[-1]
    n_sym = n_samp // 2
    n_lev = amps.shape[0]
    m = h.shape[-1]
    mh = m // 2
    mh2 = 2 * mh
    n_eff = n_samp - mh2

    g_c = n_eff / c  # (2,)
    rx_w = x[:, :, mh : n_samp - mh]
    g_d = g_c[:, None, None] * (2.0 * d - 2.0 * rx_w)  # (chi, c, N-Mh)

    # --- gh: conv-wrt-weight correlations + the E-term contribution
    # D_re[chi,n] = sum_{nu,j} hr Eq[nu,I,n-j] - hi Eq[nu,Q,n-j]
    # D_im[chi,n] = sum_{nu,j} hi Eq[nu,I,n-j] + hr Eq[nu,Q,n-j]
    # => ghr[chi,nu,j] = sum_n gD_re[n] Eq[nu,I,n-j] + gD_im[n] Eq[nu,Q,n-j]
    #    ghi[chi,nu,j] = sum_n -gD_re[n] Eq[nu,Q,n-j] + gD_im[n] Eq[nu,I,n-j]
    idx = (mh2 + jnp.arange(n_samp - mh2))[None, :] - jnp.arange(mh2 + 1)[:, None]  # (j, n)
    eq_sl = eq[:, :, idx]  # (nu, c, j, n)
    ghr = jnp.einsum("xn,vjn->xvj", g_d[:, 0], eq_sl[:, 0]) + jnp.einsum(
        "xn,vjn->xvj", g_d[:, 1], eq_sl[:, 1]
    )
    ghi = -jnp.einsum("xn,vjn->xvj", g_d[:, 0], eq_sl[:, 1]) + jnp.einsum(
        "xn,vjn->xvj", g_d[:, 1], eq_sl[:, 0]
    )
    # E term: E = sum |h|^2 S  =>  gh += gC * 2h * S
    gh_e = 2.0 * g_c[:, None, None, None] * h * s[None, :, None, :]
    gh = jnp.stack([ghr, ghi], axis=2)
    gh = jnp.pad(gh, ((0, 0), (0, 0), (0, 0), (0, m - (mh2 + 1)))) + gh_e

    # --- gEqUp (transposed conv): D[chi, n] touches EqUp[nu, p] for
    # j = n - p in [0, Mh]; so gEqUp[nu,I,p] = sum_{chi,j} gD_re[chi, p+j]*hr
    # + gD_im[chi, p+j]*hi (and the hi/hr swap for the Q plane). g_d is
    # indexed by n - Mh, so front-pad Mh zeros: gd_pad[k] = g_d[k - Mh].
    gd_pad = jnp.pad(g_d, ((0, 0), (0, 0), (mh2, mh2)))
    pidx = jnp.arange(mh2 + 1)[:, None] + jnp.arange(n_samp)[None, :]  # (j, p) -> p + j
    gd_sl = gd_pad[:, :, pidx]  # (chi, c, j, p)
    hr, hi = h[:, :, 0, : mh2 + 1], h[:, :, 1, : mh2 + 1]
    g_eq_i = jnp.einsum("xjp,xvj->vp", gd_sl[:, 0], hr) + jnp.einsum(
        "xjp,xvj->vp", gd_sl[:, 1], hi
    )
    g_eq_q = -jnp.einsum("xjp,xvj->vp", gd_sl[:, 0], hi) + jnp.einsum(
        "xjp,xvj->vp", gd_sl[:, 1], hr
    )
    g_equp = jnp.stack([g_eq_i, g_eq_q], axis=1)  # (nu, c, n_samp)

    # --- gV via the E term: S[nu,j] = sum over window of Vsum -> per-sample mask
    t_n = jnp.arange(n_samp)
    win = (t_n[None, :] >= (mh2 - jnp.arange(mh2 + 1))[:, None]) & (
        t_n[None, :] < (n_samp - jnp.arange(mh2 + 1))[:, None]
    )  # (j, n)
    g_vsum = jnp.einsum("x,xvj,jn->vn", g_c, jnp.sum(h * h, axis=2), win.astype(h.dtype))
    # v enters as sum over c: gV[nu,c,n] = g_vsum[nu,n]
    g_v = jnp.broadcast_to(g_vsum[:, None, :], (2, 2, n_samp))

    # --- moments to q (on the symbol grid: even samples only)
    g_eq_sym = g_equp[:, :, ::2] - 2.0 * eq[:, :, ::2] * g_v[:, :, ::2]
    g_eq2_sym = g_v[:, :, ::2]
    a = amps[None, None, :, None]
    gq_mom = a * g_eq_sym[:, :, None, :] + a * a * g_eq2_sym[:, :, None, :]  # (nu, c, l, t)
    gq_mom = gq_mom.reshape(2, 2 * n_lev, n_sym)

    # --- KL direct term on the inner symbols: loss = ... - KL with
    # KL = sum -q log(q/P + eps), so dloss/dq = +(log(r+eps) + r/(r+eps))
    p_col = jnp.tile(P, 2)[None, :, None]
    r = q / p_col
    gq_kl = jnp.log(r + eps) + r / (r + eps)
    t_mask = ((jnp.arange(n_sym) >= mh) & (jnp.arange(n_sym) < n_sym - mh)).astype(q.dtype)
    gq = gq_mom + gq_kl * t_mask[None, None, :]

    # --- softmin VJP -> gout
    gq4 = gq.reshape(2, 2, n_lev, n_sym)
    q4 = q.reshape(2, 2, n_lev, n_sym)
    inner = jnp.sum(q4 * gq4, axis=2, keepdims=True)
    gm = -q4 * (gq4 - inner)
    g_out = jnp.sum(gm * (out[:, :, None, :] - amps[None, None, :, None]), axis=2) / var[
        :, None, None
    ]

    # --- conv backward wrt the butterfly weights
    # out rows (x_I, y_I) use arrangement x_i with w; (x_Q, y_Q) use x_q = perm(x_i)
    x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])  # (4, L)
    x_q = jnp.concatenate([x[:, 1, :], x[:, 0, :]])
    pad = m // 2
    xi_p = jnp.pad(x_i, ((0, 0), (pad, pad)))
    xq_p = jnp.pad(x_q, ((0, 0), (pad, pad)))
    kidx = 2 * jnp.arange(n_sym)[None, :] + jnp.arange(m)[:, None]  # (k, t)
    gw = jnp.einsum("xt,ikt->xik", g_out[:, 0, :], xi_p[:, kidx]) + jnp.einsum(
        "xt,ikt->xik", g_out[:, 1, :], xq_p[:, kidx]
    )
    return gw, gh
