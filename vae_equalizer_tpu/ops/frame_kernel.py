"""Whole-frame fused DP VAE training kernel: ALL minibatch steps in one call,
for a BATCH of independent runs at once.

One ``pallas_call`` runs the full frame's online training — for each of the
``m_max`` minibatches: butterfly forward -> PCS soft demapper -> ELBO ->
hand-derived backward (the math of ops/elbo_kernel.py, validated against
jax.grad by ops/elbo_vjp.py) -> in-kernel Adam update — as a sequential TPU
grid with the parameters and optimizer moments carried across grid steps in
VMEM scratch. Minibatch inputs stream HBM->VMEM block by block (Pallas
double-buffers them); per-step posteriors/outputs stream back out.

Why fused AND matmul-based: profiling (tools/profile_frame.py) showed the
per-minibatch step costs ~53 us in every serial formulation — XLA scan,
step-kernel scan, and a VPU-unrolled in-kernel grid alike — because the cost
is the *serial instruction stream* on tiny (8, 100) tiles, not dispatch. So
every tap contraction here is one MXU matmul over an im2col arrangement
instead of an unrolled tap loop:

  forward   out   = W (R, 2, 4M) @ X_im2col (R, 4M, N)     per I/Q arrangement
  D conv    D     = CT (R, 4, 4(mh+1)) @ EQwin             per tap parity
  E term    S     = Vsum (R, 2, N) @ MASK (N, mh+1)        tap-support masks
  gh        GH    = gD (R, 4, ne) @ EQwin^T
  gEq       GEQ   = CT2 (R, 4, 4(mh+1)) @ gDwin
  gV        gv    = GCO (R, 2, mh+1) @ MASK^T
  gw        GW    = gout (R, 2, N) @ X_im2col^T

Why runs-batched (round 3): a sweep's independent repeats used to ride
``jax.vmap`` of the single-run kernel, which prepends a serial grid
dimension — 128 runs executed 128x the grid steps and aggregate throughput
saturated at 1.8x one run. Measured on this backend (tools/mosaic_probe2.py)
a leading batch dimension is nearly free instead: elementwise ops on
(R, s, l) tiles cost the same as (s, l) up to R~32, and batched
``dot_general`` over R=8 runs costs the same as one small dot (independent
MXU passes pipeline). So every tensor here carries a leading runs axis R and
every contraction is a batched matmul: one grid step trains ONE minibatch of
ALL R runs. The scratch-store assembly loops (windows, coefficient matrices)
keep their single-run op count — each store covers all R runs.

The im2col is assembled IN-KERNEL from streamed padded signed parity rows
(col k of the im2col is the contiguous parity-(k%2) slice starting at lane
k//2 — the polyphase identity xph[p, i, j] = xpad[i, 2j+p] of
ops/elbo_kernel.py), with K-MAJOR rows so each tap is one contiguous 4-row
store; the host streams (R, 16, N+mh) per step instead of the (R, 4M, 2N)
materialized im2col — the round-4 cost bisect measured the streamed-im2col
variant spending 22.7 of 34.3 us/step on input DMA
(artifacts/r4_cost_bisect16.log). The 0/1 tap-support masks are
precomputed on the XLA side; coefficient matrices CT/CT2 are built by one
signed row-mix dot against the channel estimate (hmix), so the kernel
never needs a strided lane access (Mosaic cannot lower those). Matmuls run
at HIGHEST precision (f32-accurate bf16 passes).

Parameter layouts (chosen so Adam is elementwise and every consumer reads
contiguous lanes):
  w   (R, 2, 4M)  = w.reshape(R, 2, 4M)   rows o, lanes i*M + k (im2col layout)
  h   (R, 8, M)   parity-major: lanes [0:mh+1] even taps, [mh+1:] odd taps,
                  rows chi*4 + nu*2 + c

Adam (optax.adam semantics: b1=.9, b2=.999, eps=1e-8, eps_root=0, bias
correction with t = step+1) runs in-kernel; the net group's lr is halved
once when the global step reaches ``lr_half_step`` and the channel estimate
keeps the base lr (reference func_VAELE_DP_MQAM_shaping.py:28-31,45-46 via
train/dp.py:_vae_optimizer).

Restrictions: sps == 2 and odd M (the reference operating point, M=25), like
the step kernel. Parity: tests/test_frame_kernel.py checks the whole-frame
trajectory against the step kernel + optax loop in interpret mode, and the
runs-batched call against a stack of single-run calls.

scal (1, 8) SMEM: [var_x, var_y, nu_sc, eps_kl, lr, lr_half_step, step0, 0]
(shared across the R runs — a batch is R repeats of ONE grid point).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "frame_opt_init",
    "vae_dp_frame_train_pallas",
    "vae_dp_frame_train_pallas_rb",
]


def frame_opt_init(params) -> dict:
    """Zero Adam moments for the frame kernel's optimizer state.

    params: {"w": (..., 2, 4, M), "h": (..., 2, 2, 2, M)} -> {"mw","vw","mh",
    "vh"} zeros of the matching shapes (the kernel carries them across
    frames; equivalent to optax.adam's init for the same parameters).
    """
    return {
        "mw": jnp.zeros_like(params["w"]), "vw": jnp.zeros_like(params["w"]),
        "mh": jnp.zeros_like(params["h"]), "vh": jnp.zeros_like(params["h"]),
    }

_B1 = 0.9
_B2 = 0.999
_EPS_ADAM = 1e-8
_HI = jax.lax.Precision.HIGHEST
# component row r = pol + 2*comp -> its row in the GROUP-ordered
# (xI, xQ, yI, yQ) posterior-mean scratch (see the demapper note in _kernel)
_EQP = (0, 2, 1, 3)


def _bdot(a, b, contract=((2,), (1,))):
    """Runs-batched matmul: contract over given dims, batch over dim 0."""
    return jax.lax.dot_general(
        a, b, (contract, ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _kernel(
    xin_ref, rxe_ref, rxo_ref,
    maskpm_ref, masktpm_ref,
    selv_ref, selt_ref, sels_ref, eqv_ref,
    amp232n_ref, selta8_ref, sels2_ref, ones128_ref,
    pfull4_ref, tmask_ref, ones_l_ref, csum_ref, permcat_ref, hmix_ref,
    w_in, h_in, mw_in, vw_in, mh_in, vh_in, scal_ref,
    *rest,
    n_sym, m, n_lev, n_rb, stream_dtype=jnp.float32,
    per_run_lr=False, emit_eval=False, emit_q=True, cut=None,
):
    # (A pack=2 sublane-packing variant — two runs per batch element with
    # block-diagonal contractions — was built for VERDICT r3 item 2 and then
    # measured a slight LOSS at every group size once the dot bill was
    # merged: elementwise tiles bind, not the MXU (PARITY_RESULTS round 4).
    # It was deleted in round 5; see git history for the body forks.)
    if per_run_lr:
        # per-run learning rates as materialized full-shape factors (one in
        # the w-param layout, one in the h layout) — lets runs that differ
        # in lr share one kernel batch (sweep lr-axis batching); the scalar
        # trace is unchanged when per_run_lr is off
        lrw_ref, lrh_ref, *rest = rest
    if emit_eval:
        # levsel: level-weight selection for the in-kernel decision stream
        levsel_ref, *rest = rest
    (w_out, h_out, mw_out, vw_out, mh_out, vh_out, stats_ref, *rest) = rest
    if emit_q:
        qout_ref, *rest = rest
    outout_ref, *rest = rest
    if emit_eval:
        decout_ref, eqout_ref, mmout_ref, s1out_ref, *rest = rest
    (w_sc, h_sc, mw_sc, vw_sc, mh_sc, vh_sc, q_sc,
     eqwin_sc, gdwin_sc, gh_sc, ctd_sc, ct2_sc,
     out4_sc, eq4_sc, v4_sc, d_sc, gd_sc, ghm_sc, geq_sc,
     gv_sc, habsq_sc, scat_sc, gdpad_sc, gout_sc, goutc_sc, stats_sc,
     mm4_sc, eq12_sc, st_sc, sums_sc, gev8_sc, gfac_sc, hsig_sc,
     xcol_sc) = rest
    # Mosaic-safe construct policy for R > 1 (the compiler SIGABRTs on
    # several 3D patterns when the leading dim exceeds 1): only same-shape
    # elementwise ops, batched dot_general, scratch/input ref loads and
    # stores (offsets allowed), lane slices of values, scalar (0-d)
    # broadcasts, and jnp.ones/zeros fills. In particular: NO (R,1,1)-shaped
    # values, NO multi-axis or sublane reductions (sublane min via an
    # unrolled row chain), NO sublane-offset slices of values (everything
    # row-sliced goes through a scratch ref first), and NO rank-promoting
    # broadcasts (constants arrive pre-materialized at full (R, ., .) shape).
    #
    # Round-3 cost model (tools/mosaic_probe4.py, measured on v5e): a
    # DEPENDENT batched MXU dot costs ~110-270 ns at R=8 regardless of size,
    # while elementwise ops and scratch stores are ~5 ns even on (R, 1, N)
    # slices — so this body minimizes the NUMBER of dot_generals:
    #   * row-replication "expands" are row STORES, not ones-matmuls;
    #   * ALL lane-total reductions (C terms, E terms, KL) go through ONE
    #     stacked (R, K, Nsamp) @ (R, Nsamp, 128) matmul, whose K rows are
    #     the products to sum, followed by ONE (R, 8, K) combine matmul
    #     (csum) that forms c_x / c_y / kl as signed row combinations;
    #   * the demapper and the softmin VJP run on all 4 components at once
    #     as (R, 4*n_lev, N) tensors, with the level<->component moves done
    #     by constant selection matmuls (selv/selt/sels/eqv).
    mi = pl.program_id(0)
    nl4 = 4 * n_lev
    kst = 24 + nl4  # stacked-sum rows PER RUN: 4 C-base + 16 cross/dd + 4 E + KL

    def _cut(k, probe):
        # cost-bisect gate (tools/rb_cost_bisect.py): truncate the body after
        # checkpoint k, parking one element of the last product so the prefix
        # is not dead-code-eliminated. cut=None (production) emits nothing.
        if cut is None or cut > k:
            return False
        stats_sc[...] = jnp.zeros(stats_sc.shape, jnp.float32)
        stats_sc[:, 0:1, 0:1] = probe[:, 0:1, 0:1]
        stats_ref[0] = stats_sc[...]
        return True

    @pl.when(mi == 0)
    def _():
        w_sc[...] = w_in[...]
        h_sc[...] = h_in[...]
        mw_sc[...] = mw_in[...]
        vw_sc[...] = vw_in[...]
        mh_sc[...] = mh_in[...]
        vh_sc[...] = vh_in[...]
        # the sum-stack's uncovered lanes must read zero; every step stores
        # the same static regions, so zeroing once is enough
        st_sc[...] = jnp.zeros(st_sc.shape, jnp.float32)
        # ctd is a BLOCK-DIAGONAL operand (rows 0-3 even-parity lanes, rows
        # 4-7 odd): the off-diagonal blocks must read zero, and every step
        # writes only the diagonal blocks, so zeroing once is enough
        ctd_sc[...] = jnp.zeros(ctd_sc.shape, jnp.float32)
        # out4_sc row 4 is a constant ones row: the demapper's (out - amp)
        # subtraction rides the selv matmul (its last column is -amp*s)
        out4_sc[:, 4:5, :] = jnp.ones(
            (out4_sc.shape[0], 1, out4_sc.shape[2]), jnp.float32
        )

    n_samp = 2 * n_sym
    mh = m // 2
    mhe = mh + 1  # even-tap count; odd-tap count = mh
    n_eff = float(n_samp - 2 * mh)
    ne = n_sym - mh  # positions per tap parity (even == odd count here)
    eps = scal_ref[0, 3]
    f32 = jnp.float32
    # ---------------- im2col assembled IN-KERNEL from the streamed padded
    # signed parity rows (the SISO-kernel trick, ops/siso_frame_kernel.py):
    # col k of the im2col is the contiguous parity-(k%2) slice starting at
    # lane k//2, so 2 four-row stores per tap rebuild the full (P*4M, 2N)
    # im2col in scratch. Row order is K-MAJOR (row k*4 + i; w's lanes are
    # host-converted to match) so each tap is one contiguous 4-row store.
    # This cuts the kernel's per-step HBM input ~10x — the cost bisect
    # (tools/rb_cost_bisect.py, artifacts/r4_cost_bisect16.log) measured the
    # streamed precomputed-im2col variant spending 22.7 of 34.3 us/step in
    # the forward cut, i.e. the step was input-DMA-bound, not compute-bound.
    for k in range(m):
        src = (k % 2) * 8
        o = k // 2
        dst = 4 * k
        xcol_sc[:, dst : dst + 4, 0:n_sym] = (
            xin_ref[0, :, src : src + 4, o : o + n_sym]
        )
        xcol_sc[:, dst : dst + 4, n_sym : 2 * n_sym] = (
            xin_ref[0, :, src + 4 : src + 8, o : o + n_sym]
        )
    xc = xcol_sc[...]
    selt = selt_ref[...]  # (R, 4n, 4): row r*n + l -> component col r
    sels = sels_ref[...]  # (R, 4, 4n): component <- sum of its level rows

    # ---------------- forward: butterfly as ONE batched MXU matmul over the
    # lane-concatenated I|Q im2col arrangement
    oiq = _bdot(w_sc[...], xc)  # (R, 2, 2N) rows (x, y)
    out4_sc[:, 0:2, :] = oiq[:, 0:2, :n_sym]
    out4_sc[:, 2:4, :] = oiq[:, 0:2, n_sym:]
    # stream_dtype=bf16 halves the HBM write of the two big per-step streams
    # (q dominates: (m_max, R, 4n, N) f32 is the kernel's largest output);
    # the f32 path stores as-is so the validated trace is unchanged
    out_cast = (lambda a: a) if stream_dtype == jnp.float32 else (
        lambda a: a.astype(stream_dtype))
    outout_ref[0] = out_cast(out4_sc[:, 0:4, :])
    if _cut(1, oiq):
        return

    # ---------------- demapper, all 4 components at once on (R, 4n, N).
    # selv cols 0-3 = selt * s_pol(row), col 4 (hitting out4's constant
    # ones row) = -amp*s, s = sqrt(0.5/var): ONE matmul yields
    # d32 = s*(out - amp); met = d32^2 + nu*amp^2 with the 1/(2 var)
    # folded into the constants.
    d32 = _bdot(selv_ref[...], out4_sc[...])  # (R, 4n, N)
    met = d32 * d32 + amp232n_ref[...]
    # met parks in q_sc so the per-component min row-chain slices a ref
    q_sc[...] = met
    for r in range(4):
        r0 = r * n_lev
        mm = q_sc[:, r0 : r0 + 1, :]
        for l in range(1, n_lev):
            mm = jnp.minimum(mm, q_sc[:, r0 + l : r0 + l + 1, :])
        mm4_sc[:, r : r + 1, :] = mm
    e32 = jnp.exp(_bdot(selt, mm4_sc[...]) - met)
    q_sc[...] = e32
    s1 = _bdot(sels, q_sc[...])  # (R, 4, N) per-component normalizers
    q32 = q_sc[...] * _bdot(selt, 1.0 / s1)
    q_sc[...] = q32
    if emit_q:
        qout_ref[0] = out_cast(q32)
    if _cut(2, q32):
        return
    # eqv rows: 0-4 E_q in GROUP order (xI, xQ, yI, yQ) for the window
    # stacks, 4-8 E_q in component order, 8-12 E_q[x^2]
    eq12_sc[...] = _bdot(eqv_ref[...], q32)
    eq4_sc[...] = eq12_sc[:, 0:4, :]
    v4_sc[...] = (
        eq12_sc[:, 8:12, :] - eq12_sc[:, 4:8, :] * eq12_sc[:, 4:8, :]
    )
    if emit_eval:
        # in-kernel eval emission (round 4): the eval stage's soft-SER and
        # sync no longer read the (m_max, R, 4n, N) posterior stream at all.
        # Decisions: argmax_l q == argmin_l met, and e32 = exp(mm - met) hits
        # exactly 1.0 at the per-component minimum (exp(0.0)), so the
        # decision index is ONE compare + ONE level-weight dot. A bitwise met
        # tie would sum the tied level indices (an out-of-range "level" that
        # always counts as a symbol error) — measure-zero on real data.
        dec4 = _bdot(levsel_ref[...], (e32 >= 1.0).astype(f32))
        decout_ref[0] = out_cast(dec4)
        # E_q[x^I] rows (xI, yI) of the comp section
        eqout_ref[0, :, 0:2, :] = out_cast(eq12_sc[:, 4:6, :])
        # demapper sufficient statistics (round 5): per-component met minimum
        # + softmin normalizer — with the emitted out stream these 8 rows
        # reconstruct log q at ANY level (q[l] = exp(mm - met_l)/s1), so the
        # eval MI never reads the (m_max, R, 4n, N) posterior stream and the
        # production aggregate path can skip writing it entirely (emit_q)
        mmout_ref[0] = out_cast(mm4_sc[...])
        s1out_ref[0] = out_cast(s1)
    if _cut(3, v4_sc[...]):
        return

    # ---------------- D conv: BOTH tap parities in one matmul pair.
    # Window rows are SHIFT-major within each parity block (row r0 + a*4 + g,
    # even block rows [0, 4*mhe), odd block after): one 4-row block store per
    # shift a from a lane slice of the group-ordered eq4 value. The
    # coefficient matrix ctd is BLOCK-DIAGONAL over parities (rows 0-3 hit
    # even lanes, rows 4-7 odd lanes; off-blocks zeroed once) and stays
    # (g, a)-major; the constant block-diag permutation PERM
    # (permcat_ref, PERM[g*n_a + a, a*4 + g] = 1 per block) is folded into
    # the adjacent matmul: CTD @ EQwin_g = (CTD @ PERM) @ EQwin_a. One
    # (R, 8, 4M) @ (R, 4M, ne) dot then yields d_e (rows 0-3) AND d_o
    # (rows 4-7) — half the dot count of the per-parity formulation.
    def win_stack(sc, src, rbase, r0, n_a):
        for a in range(n_a):
            sc[:, rbase + r0 + 4 * a : rbase + r0 + 4 * a + 4, :] = (
                src[:, :, mh - a : n_sym - a]
            )

    eq4v = eq4_sc[...]  # (R, 4, N) group order
    win_stack(eqwin_sc, eq4v, 0, 0, mhe)
    win_stack(eqwin_sc, eq4v, 0, 4 * mhe, mh)
    eqwin = eqwin_sc[...]  # (R, 4M, ne) parity-blocked shift-major
    if _cut(4, eqwin):
        return
    permcat = permcat_ref[...]

    # ctd/ct2 coefficient builds as ONE batched dot: hmix (32, 8) mixes the
    # signed h rows for BOTH coefficient matrices (rows 0-15 the ctd blocks
    # g = b*4 + (chi*2 + c), rows 16-31 the ct2 blocks
    # g = 16 + b*4 + (nu*2 + c')), parked in hsig_sc so the block placements
    # are 4-row REF-slice stores — replaces the 64 single-row store loop
    # (the step is VPU-tile-issue bound: stores cost per run, dots amortize
    # over the batch; PARITY_RESULTS roofline refresh).
    hsig_sc[...] = _bdot(hmix_ref[:, 0:32, 0:8], h_sc[...])
    for b in range(4):
        ctd_sc[:, 0:4, b * mhe : (b + 1) * mhe] = (
            hsig_sc[:, 4 * b : 4 * b + 4, 0:mhe]
        )
        ctd_sc[:, 4:8, 4 * mhe + b * mh : 4 * mhe + (b + 1) * mh] = (
            hsig_sc[:, 4 * b : 4 * b + 4, mhe:m]
        )
        ct2_sc[:, 0:4, b * mhe : (b + 1) * mhe] = (
            hsig_sc[:, 16 + 4 * b : 16 + 4 * b + 4, 0:mhe]
        )
        ct2_sc[:, 0:4, 4 * mhe + b * mh : 4 * mhe + (b + 1) * mh] = (
            hsig_sc[:, 16 + 4 * b : 16 + 4 * b + 4, mhe:m]
        )
    d_sc[...] = _bdot(_bdot(ctd_sc[...], permcat), eqwin)  # (R, 8, ne)
    if _cut(5, d_sc[...]):
        return

    # ---------------- E term: S (R, 2, M) = Vsum (R, 2, N) @ MASK, with the
    # even|odd tap-support masks lane-concatenated (parity-major) into ONE dot
    vsum = jnp.concatenate(
        [v4_sc[:, 0:1, :] + v4_sc[:, 2:3, :], v4_sc[:, 1:2, :] + v4_sc[:, 3:4, :]],
        axis=1,
    )  # (R, 2, N) per pol
    scat_sc[...] = _bdot(vsum, maskpm_ref[...])  # (R, 2, M) parity-major
    # |h|^2 rows chi*2 + nu = row-pair sums of h*h: one elementwise square +
    # one tiny batched dot with the constant pair-sum mix (the last 4 rows
    # of hmix), instead of 4 slice-square-add-store chains
    hh = h_sc[...] * h_sc[...]
    habsq_sc[...] = _bdot(hmix_ref[:, 32:36, :], hh)
    if _cut(6, habsq_sc[...]):
        return

    # ---------------- C terms, E totals and KL: ONE stacked lane-sum matmul.
    # st rows (lanes beyond each piece's width stay zero):
    #   0-3   rx_w2^2                 (c_base; x rows 0-1, y rows 2-3)
    #   4-7   rx_al_e * d_e           (cross, even positions)
    #   8-11  rx_al_o * d_o           (cross, odd)
    #   12-15 d_e^2 / 16-19 d_o^2     (dd)
    #   20-23 |h|^2 * S               (E term; x rows 20-21, y rows 22-23)
    #   24-.. -q log(q/P + eps)       (KL, inner symbols)
    # csum then combines rows into c_x / c_y / kl with the -2 cross signs.
    if mh % 2 == 0:
        al_lo = mh - mh // 2
        rx_e_ref, rx_o_ref = rxe_ref, rxo_ref
        al_lo_o = mh - mh // 2
    else:
        al_lo = mh - (mh + 1) // 2
        rx_e_ref, rx_o_ref = rxo_ref, rxe_ref
        al_lo_o = mh - mh // 2

    # c_base = sum of squares over the window, parity-split: the lane
    # sum over [mh, n_samp-mh) equals the even-phase window sum plus the
    # odd-phase one, so the raw interleaved stream is never needed
    je, jo = (mh + 1) // 2, mh // 2
    rx_we = rxe_ref[0, :, 0:4, je : je + ne]
    rx_wo = rxo_ref[0, :, 0:4, jo : jo + ne]
    rx_al_e = rx_e_ref[0, :, 0:4, al_lo : al_lo + ne]  # (R, 4, ne)
    rx_al_o = rx_o_ref[0, :, 0:4, al_lo_o : al_lo_o + ne]
    d_e = d_sc[:, 0:4, :]  # rows 0-3 d_e, 4-7 d_o
    d_o = d_sc[:, 4:8, :]
    st_sc[:, 0:4, 0:ne] = rx_we * rx_we
    st_sc[:, 0:4, ne : 2 * ne] = rx_wo * rx_wo
    st_sc[:, 4:8, :ne] = rx_al_e * d_e
    st_sc[:, 8:12, :ne] = rx_al_o * d_o
    st_sc[:, 12:16, :ne] = d_e * d_e
    st_sc[:, 16:20, :ne] = d_o * d_o
    st_sc[:, 20:22, :m] = habsq_sc[:, 0:2, :] * scat_sc[:, 0:2, :]
    st_sc[:, 22:24, :m] = habsq_sc[:, 2:4, :] * scat_sc[:, 0:2, :]
    ratio32 = q32 / pfull4_ref[...]
    st_sc[:, 24:kst, : n_sym - 2 * mh] = -q32[:, :, mh : n_sym - mh] * jnp.log(
        ratio32[:, :, mh : n_sym - mh] + eps
    )
    # lane totals at 8 lanes (a 128-lane ones operand costs ~18M MACs/step
    # of pure replication), then one tiny expand to the lane-replicated rows
    tot = _bdot(st_sc[...], ones_l_ref[...])  # (R, kst, 8)
    sums8 = _bdot(csum_ref[...], tot)  # (R, 8, 8)
    sums_sc[...] = _bdot(sums8[:, :, 0:1], ones128_ref[...])  # (R, 8, 128)
    stats_sc[...] = jnp.zeros(stats_sc.shape, f32)
    c_x = sums_sc[:, 0:1, :]
    c_y = sums_sc[:, 1:2, :]
    kl = sums_sc[:, 2:3, :]

    loss = n_eff * (jnp.log(c_x) + jnp.log(c_y)) - kl  # (R, 1, 128)
    stats_sc[:, 0:1, 0:1] = loss[:, :, 0:1]
    stats_sc[:, 0:1, 1:2] = (c_x / n_eff)[:, :, 0:1]
    stats_sc[:, 0:1, 2:3] = (c_y / n_eff)[:, :, 0:1]
    g_cx = n_eff / c_x  # (R, 1, 128) lane-replicated
    g_cy = n_eff / c_y
    stats_ref[0] = stats_sc[...]
    if cut is not None and cut <= 7:
        return

    # ================ backward ================
    # gfac rows (chi*2 + c) = (g_cx, g_cx, g_cy, g_cy): row stores
    gfac_sc[:, 0:1, :] = g_cx[:, :, :ne]
    gfac_sc[:, 1:2, :] = g_cx[:, :, :ne]
    gfac_sc[:, 2:3, :] = g_cy[:, :, :ne]
    gfac_sc[:, 3:4, :] = g_cy[:, :, :ne]
    gfac = gfac_sc[...]
    gd_sc[:, 0:4, :] = gfac * (2.0 * d_e - 2.0 * rx_al_e)
    gd_sc[:, 4:8, :] = gfac * (2.0 * d_o - 2.0 * rx_al_o)
    if _cut(8, gd_sc[...]):
        return

    # ---- gh: GHM (R, 8, 4M) = gd (both parities stacked) @ EQwin^T, one
    # matmul pair for both parities — rows 0-3 even (valid in the even lane
    # block), rows 4-7 odd (odd lanes); the off-blocks are computed garbage
    # the assembly never reads. EQwin is shift-major, so multiply by PERM^T
    # (contract dim 2 of the block-diag permutation) to restore the
    # (g, a)-major columns gh_assemble slices.
    ghm_sc[...] = _bdot(
        _bdot(gd_sc[...], eqwin, ((2,), (2,))), permcat, ((2,), (2,))
    )

    def gh_assemble(r0, base, lane0, lane1, n_a):
        for chi in range(2):
            g_c = g_cx if chi == 0 else g_cy
            g_c_na = g_c[:, :, :n_a]
            for nu in range(2):
                bi = base + (2 * nu) * n_a  # (nu, I) block
                bq = base + (2 * nu + 1) * n_a  # (nu, Q) block
                ghr = (
                    ghm_sc[:, r0 + chi * 2 : r0 + chi * 2 + 1, bi : bi + n_a]
                    + ghm_sc[:, r0 + chi * 2 + 1 : r0 + chi * 2 + 2, bq : bq + n_a]
                )
                ghi = (
                    -ghm_sc[:, r0 + chi * 2 : r0 + chi * 2 + 1, bq : bq + n_a]
                    + ghm_sc[:, r0 + chi * 2 + 1 : r0 + chi * 2 + 2, bi : bi + n_a]
                )
                s_nu = scat_sc[:, nu : nu + 1, lane0:lane1]
                rh = chi * 4 + nu * 2
                gh_sc[:, rh : rh + 1, lane0:lane1] = (
                    ghr + 2.0 * g_c_na * h_sc[:, rh : rh + 1, lane0:lane1] * s_nu
                )
                gh_sc[:, rh + 1 : rh + 2, lane0:lane1] = (
                    ghi + 2.0 * g_c_na * h_sc[:, rh + 1 : rh + 2, lane0:lane1] * s_nu
                )

    gh_assemble(0, 0, 0, mhe, mhe)
    gh_assemble(4, 4 * mhe, mhe, m, mh)
    gh = gh_sc[...]  # (R, 8, M) parity-major
    if _cut(9, gh):
        return

    # ---- gEq: GEQ (R, 4, N) = CT2 (R, 4, 4M) @ gDwin (R, 4M, N) — the
    # parity sum rides the contraction: ct2 lane-concatenates the even and
    # odd coefficient blocks in the SAME 4 rows (not block-diagonal — the
    # two parities' contributions must ADD), gdwin stacks both parities'
    # shift-major windows, and one matmul pair yields geq_e + geq_o.
    def gdwin(r0, gd_r0, n_a):
        # gdpad[t] = gd_p[t - mh]; window a places gd_p[b] at t = mh - a + b
        gdpad_sc[...] = jnp.zeros(gdpad_sc.shape, f32)
        gdpad_sc[:, :, mh : mh + ne] = gd_sc[:, gd_r0 : gd_r0 + 4, :]
        gdpad = gdpad_sc[...]
        for a in range(n_a):
            gdwin_sc[:, r0 + 4 * a : r0 + 4 * a + 4, :] = gdpad[:, :, a : a + n_sym]

    gdwin(0, 0, mhe)  # ct2 was filled with the hmix dot in the forward
    gdwin(4 * mhe, 4, mh)
    geq_sc[...] = _bdot(
        _bdot(ct2_sc[...], permcat), gdwin_sc[...]
    )  # (R, 4, N) rows (x,I)(x,Q)(y,I)(y,Q)
    if _cut(10, geq_sc[...]):
        return

    # ---- gV: gv (R, 2, N) = GCO (R, 2, M) @ MASK_pm^T
    g_cx_m = g_cx[:, :, :m]
    g_cy_m = g_cy[:, :, :m]
    gco = jnp.concatenate(
        [
            g_cx_m * habsq_sc[:, 0:1, :] + g_cy_m * habsq_sc[:, 2:3, :],
            g_cx_m * habsq_sc[:, 1:2, :] + g_cy_m * habsq_sc[:, 3:4, :],
        ],
        axis=1,
    )  # (R, 2, M) rows nu
    gv_sc[...] = _bdot(gco, masktpm_ref[...])

    # ---- moments -> gq -> softmin VJP -> gout, all 4 components at once.
    # gE (rows 0-3) and gVar (rows 4-7) stack into one scratch so the gq
    # build is ONE dot against [selg*amp | selg*amp^2] — selta8's columns
    # are GROUP-ordered (host side) so both row sections stay in the
    # geq/eq4 group layout: 4 single-row gv replications + ONE fused
    # (R, 4, N) op instead of the former 16-issue per-row loop.
    for g in range(4):  # gVar rows, group order (xI, xQ, yI, yQ): nu = g // 2
        gev8_sc[:, 4 + g : 5 + g, :] = gv_sc[:, g // 2 : g // 2 + 1, :]
    gev8_sc[:, 0:4, :] = (
        geq_sc[...] - 2.0 * eq4_sc[...] * gev8_sc[:, 4:8, :]
    )
    gq32 = _bdot(selta8_ref[...], gev8_sc[...])
    gq32 = gq32 + (jnp.log(ratio32 + eps) + ratio32 / (ratio32 + eps)) * tmask_ref[...]
    if _cut(11, gq32):
        return
    inner = _bdot(sels, q32 * gq32)  # (R, 4, N)
    gm = -q32 * (gq32 - _bdot(selt, inner))
    # (out - amp)/var = 2 s * d32; the 2 s_pol factor is folded into sels2
    gout_sc[...] = _bdot(sels2_ref[...], gm * d32)

    # ---- gw: (R, 2, 4M) = gout_cat @ XC^T — the I|Q contributions sum in
    # ONE dot by contracting over the lane-concatenated sample axis
    goutc_sc[:, 0:2, :n_sym] = gout_sc[:, 0:2, :]
    goutc_sc[:, 0:2, n_sym:] = gout_sc[:, 2:4, :]
    gw = _bdot(goutc_sc[...], xc, ((2,), (2,)))
    if _cut(12, gw):
        return

    # ================ in-kernel Adam (optax.adam semantics) ================
    lr = scal_ref[0, 4]
    lr_half_step = scal_ref[0, 5]
    step0 = scal_ref[0, 6]
    step_f = step0 + mi.astype(jnp.float32)  # 0-based global step index
    t = step_f + 1.0  # optax bias-correction count
    # b**t as exp(t*ln b): Mosaic has no powf lowering
    bc1 = 1.0 - jnp.exp(t * math.log(_B1))
    bc2 = 1.0 - jnp.exp(t * math.log(_B2))
    half = jnp.where(step_f >= lr_half_step, 0.5, 1.0)
    if per_run_lr:
        lr_w = lrw_ref[...] * half  # (R, 2P, P*4M) full-shape lr factor
        lr_h = lrh_ref[...]
    else:
        lr_w = lr * half
        lr_h = lr

    mw_sc[...] = _B1 * mw_sc[...] + (1.0 - _B1) * gw
    vw_sc[...] = _B2 * vw_sc[...] + (1.0 - _B2) * gw * gw
    w_sc[...] = w_sc[...] - lr_w * (mw_sc[...] / bc1) / (
        jnp.sqrt(vw_sc[...] / bc2) + _EPS_ADAM
    )

    mh_sc[...] = _B1 * mh_sc[...] + (1.0 - _B1) * gh
    vh_sc[...] = _B2 * vh_sc[...] + (1.0 - _B2) * gh * gh
    h_sc[...] = h_sc[...] - lr_h * (mh_sc[...] / bc1) / (
        jnp.sqrt(vh_sc[...] / bc2) + _EPS_ADAM
    )

    w_out[...] = w_sc[...]
    h_out[...] = h_sc[...]
    mw_out[...] = mw_sc[...]
    vw_out[...] = vw_sc[...]
    mh_out[...] = mh_sc[...]
    vh_out[...] = vh_sc[...]


def _support_masks(m: int, n_sym: int):
    """0/1 tap-support masks: mask[t, j] = 1 iff ceil((Mh-j)/2) <= t < (Nsamp-j-1)//2+1.

    Parity-split columns (even taps j=2a first); also returns transposes.
    """
    import numpy as np

    mh = m // 2
    n_samp = 2 * n_sym
    mask = np.zeros((n_sym, m), np.float32)
    for j in range(m):
        lo = max(0, -(-(2 * mh - j) // 2))
        hi = min((n_samp - j - 1) // 2 + 1, n_sym)
        mask[lo:hi, j] = 1.0
    return mask[:, 0::2], mask[:, 1::2]


def _win_perm(n_a: int):
    """PERM[g*n_a + a, a*4 + g] = 1: maps (g, a)-major coefficient lanes onto
    the shift-major window rows; folded into the D/gEq/gh matmuls (NumPy —
    setup-path constants must never lower as device ops, CLAUDE.md)."""
    import numpy as np

    p = np.zeros((4 * n_a, 4 * n_a), np.float32)
    for g in range(4):
        for a in range(n_a):
            p[g * n_a + a, a * 4 + g] = 1.0
    return p


def _to_parity_major(h8: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([h8[..., 0::2], h8[..., 1::2]], axis=-1)


def _from_parity_major(hpm: jnp.ndarray, m: int) -> jnp.ndarray:
    mhe = m // 2 + 1
    out = jnp.zeros(hpm.shape[:-1] + (m,), hpm.dtype)
    out = out.at[..., 0::2].set(hpm[..., :mhe])
    return out.at[..., 1::2].set(hpm[..., mhe:])


@functools.partial(
    jax.jit,
    static_argnames=("bl_sym", "stride_sym", "interpret", "stream_bf16",
                     "emit_eval", "emit_q", "cut"),
)
def vae_dp_frame_train_pallas_rb(
    w, h, opt, rx, amps, var, nu_sc, P, lr, step0, lr_half_step,
    *, bl_sym: int, stride_sym: int | None = None, interpret: bool = False,
    stream_bf16: bool = False, emit_eval: bool = False, emit_q: bool = True,
    cut: int | None = None,
):
    """Run one frame's FULL online training for R independent runs, fused.

    w: (R, 2, 4, M); h: (R, 2, 2, 2, M); opt: dict(mw, vw, mh, vh) of Adam
    moments in the param shapes; rx: (R, 2, 2, Nsamp) with Nsamp a multiple
    of 2*bl_sym; lr/step0/lr_half_step: traced scalars shared by all runs
    (step0 = global step index of the frame's first minibatch, so the lr
    schedule and bias correction continue across frames). sps=2, odd M only.

    One grid step trains one minibatch of ALL R runs (batched MXU matmuls +
    leading-dim elementwise ops — measured near-free up to R~16 on v5e, see
    the module docstring); VMEM sizing keeps R <= ~16 for the reference
    shapes (R=16: ~10 MB of streamed blocks + scratch).

    Step-count limit: the global step is carried in-kernel as float32
    (scal[0,6] + program_id), so past 2**24 total minibatch steps the +1
    increments are lost and Adam's bias correction / the lr-half compare
    freeze at their 2**24-step values. The reference workload is 17k steps
    per experiment (~1000x headroom); at 2**24 steps bc1/bc2 are 1.0 to
    float32 precision and any reachable lr threshold is long past, so the
    frozen values equal the exact ones — provided lr_half_step < 2**24
    (it must stay exactly representable).

    ``stride_sym`` (default bl_sym = non-overlapping) sets the window
    stride: the VAEflex overlapping-window scheme trains on
    ``(Nsym - bl_sym) // stride`` windows starting every ``stride`` symbols
    (func_VAEflex_DP_MQAM_shaping.py:59-70); requires bl_sym % stride == 0
    (windows assemble from reshaped chunks — a gather would be slow).

    Returns (w', h', opt', losses (m_max, R), var_est (m_max, R, 2),
    q (m_max, R, 2, 2*n_lev, bl_sym), out (m_max, R, 2, 2, bl_sym)) — the
    per-frame quantities of the lax.scan step path in train/dp.py with a
    runs axis after the minibatch axis. With ``emit_eval=True`` four eval
    streams are appended: dec (m_max, R, 2, 2, bl) argmax level indices,
    eq (m_max, R, 2, bl) E_q[x^I], and the round-5 demapper sufficient
    statistics mm / s1 (m_max, R, 2, 2, bl) — per-component met minimum and
    softmin normalizer, from which q reconstructs at any level as
    exp(mm - met_l)/s1. With ``emit_q=False`` (requires emit_eval) the
    kernel skips writing the posterior stream — its largest output — and
    the q slot returns None; the eval pipeline runs entirely from the
    emitted streams (train/dp.py:_dp_frame_eval_mb,
    metrics/mi.py:mutual_information_ambiguity_mb_stats).

    ``stream_bf16``: store the two big per-step output streams (q, out) as
    bfloat16 — halves their HBM write here and their read in the eval stage
    (both HBM-bound at saturation, PARITY_RESULTS round 3). Training is
    unaffected (the in-VMEM f32 scratch carries the backward pass); only
    the recorded posteriors/constellation stream lose precision, which
    moves SER/MI by < the run-to-run band (tests/test_frame_kernel.py).
    """
    n_rb = w.shape[0]
    n_gp = n_rb  # batch elements (one per run)
    m = w.shape[-1]
    assert m % 2 == 1, "odd tap count only"
    n_sym = bl_sym
    n_samp_mb = 2 * bl_sym
    n_lev = amps.shape[0]
    mh = m // 2
    mhe = mh + 1

    # per-minibatch im2col arrangements: X[r, (i*M + k), n] = xpad[r, i, 2n+k]
    # (the polyphase identity xph[p, i, j] = xpad[i, 2j + p] of the step
    # kernel, flattened over taps), vectorized over minibatches and runs
    if stride_sym is None or stride_sym == bl_sym:
        m_max = rx.shape[-1] // n_samp_mb
        rx_mb = jnp.moveaxis(
            rx[..., : m_max * n_samp_mb].reshape(n_rb, 2, 2, m_max, n_samp_mb), 3, 0
        )  # (m_max, R, 2, 2, Nsamp_mb)
    else:
        fs = stride_sym
        assert bl_sym % fs == 0, "window length must be a multiple of the stride"
        k_ch = bl_sym // fs  # chunks per window
        n_sym_tot = rx.shape[-1] // 2
        n_ch = n_sym_tot // fs
        m_max = (n_sym_tot - bl_sym) // fs  # reference's n_windows
        ch = rx[..., : n_ch * 2 * fs].reshape(n_rb, 2, 2, n_ch, 2 * fs)
        wins = jnp.stack(
            [ch[:, :, :, i : i + m_max] for i in range(k_ch)], axis=-2
        )  # (R, 2, 2, m_max, k_ch, 2*fs): window w = chunks w..w+k_ch-1
        rx_mb = jnp.moveaxis(wins.reshape(n_rb, 2, 2, m_max, n_samp_mb), 3, 0)

    l_in = n_sym + mh  # lanes needed: col k reads parity lanes k//2 .. +n_sym

    def arrange(x):  # x: (2, 2, n_samp_mb) one run's minibatch
        # the kernel assembles the im2col itself (col k = the contiguous
        # parity-(k%2) slice starting at lane k//2), so the host streams only
        # the PADDED SIGNED PARITY ROWS of the two arrangements — ~10x less
        # HBM per step than the materialized (P*4M, 2N) im2col the kernel
        # used to stream (input-DMA-bound, artifacts/r4_cost_bisect16.log)
        x_i = jnp.concatenate([x[:, 0, :], -x[:, 1, :]])
        x_q = jnp.concatenate([x[:, 1, :], x[:, 0, :]])
        xp = jnp.pad(jnp.concatenate([x_i, x_q]), ((0, 0), (mh, mh + m)))
        # rows: parity*8 + [x_i rows 0-3 | x_q rows 0-3]
        xin = jnp.stack(
            [xp[:, 0::2][:, :l_in], xp[:, 1::2][:, :l_in]]
        ).reshape(16, l_in)
        rx4 = x.reshape(4, n_samp_mb)
        return xin, rx4[:, 0::2], rx4[:, 1::2]

    xin_s, rxe, rxo = jax.vmap(jax.vmap(arrange))(rx_mb)

    mask_e, mask_o = _support_masks(m, n_sym)

    # materialized full-shape broadcast operands (see the construct-policy
    # note in _kernel: rank-promoting broadcasts crash Mosaic at R > 1)
    import numpy as _np

    bcast = lambda a: jnp.broadcast_to(jnp.asarray(a, jnp.float32), (n_gp,) + a.shape)
    mask_pm = _np.concatenate([mask_e, mask_o], axis=1)  # (N, M) parity-major
    maskpm3 = bcast(mask_pm)
    masktpm3 = bcast(mask_pm.T.copy())

    # constant selection matrices + row-constant tensors for the merged
    # all-component demapper / softmin / stacked-sum formulation (see the
    # cost-model note in _kernel: minimize the number of dot_generals).
    nl4 = 4 * n_lev
    kst = 24 + nl4
    comp_of_row = _np.arange(nl4) // n_lev  # component r of row r*n+l
    lev_of_row = _np.arange(nl4) % n_lev
    selt_np = _np.zeros((nl4, 4), _np.float32)
    selt_np[_np.arange(nl4), comp_of_row] = 1.0
    selt3 = bcast(selt_np)
    sels3 = bcast(selt_np.T.copy())
    ind_g = _np.zeros((4, nl4), _np.float32)  # group row gpos(r) <- comp rows
    for r in range(4):
        ind_g[_EQP[r], r * n_lev : (r + 1) * n_lev] = 1.0

    amps_f = amps.astype(jnp.float32)
    a_row = amps_f[lev_of_row]  # (nl4,) level amplitude per row
    per_run_var = jnp.ndim(var) == 2
    if per_run_var:
        # per-run demapper variance (sweep snr-axis batching): the two
        # var-folded selection constants become per-run stacks; everything
        # else (incl. the kernel body) is var-independent.
        if jnp.shape(var) != (n_rb, 2):
            raise ValueError(f"per-run var must be ({n_rb}, 2), got {jnp.shape(var)}")
    s_pol = jnp.sqrt(0.5 / var.astype(jnp.float32))  # (2,) or (R, 2)
    s_row = s_pol[..., comp_of_row % 2]  # rows of pol x get s_x, y rows s_y
    # selv: cols 0-4 select the component scaled by s; the last col hits
    # out4's constant ones row with -amp*s, so ONE matmul yields
    # s*(out - amp)
    if per_run_var:
        selv3 = jnp.concatenate(
            [jnp.asarray(selt_np)[None] * s_row[:, :, None],
             (-a_row[None] * s_row)[:, :, None]],
            axis=2,
        )  # (R, nl4, 5)
    else:
        selv5 = jnp.concatenate(
            [jnp.asarray(selt_np) * s_row[:, None],
             (-a_row * s_row)[:, None]],
            axis=1,
        )
        selv3 = jnp.broadcast_to(selv5[None], (n_gp, nl4, 5))
    brow = lambda v: jnp.broadcast_to(v[None, :, None], (n_gp, nl4, n_sym))
    per_run_nu = jnp.ndim(nu_sc) > 0
    if per_run_nu:
        # per-run shaping factor (sweep nu-axis batching): nu enters the
        # kernel ONLY through this met constant and the KL prior below —
        # the body is nu-independent
        if jnp.shape(nu_sc) != (n_rb,):
            raise ValueError(
                f"per-run nu_sc must have shape ({n_rb},), got {jnp.shape(nu_sc)}"
            )
        amp232n = jnp.broadcast_to(
            (jnp.asarray(nu_sc, jnp.float32)[:, None]
             * (a_row * a_row)[None, :])[:, :, None],
            (n_gp, nl4, n_sym),
        )
    else:
        amp232n = brow(jnp.float32(nu_sc) * a_row * a_row)
    # [selg*amp | selg*amp^2] against the stacked (gE; gVar) rows (backward
    # gq build in ONE dot; columns in GROUP order so the gev8 assembly reads
    # geq/eq4 in their native layout), and sels with 2 s_pol folded in
    # (softmin -> gout)
    selg_np = _np.zeros((nl4, 4), _np.float32)
    selg_np[_np.arange(nl4), _np.asarray(_EQP)[comp_of_row]] = 1.0
    selta8m = jnp.concatenate(
        [jnp.asarray(selg_np) * a_row[:, None],
         jnp.asarray(selg_np) * (a_row * a_row)[:, None]],
        axis=1,
    )  # (nl4, 8)
    selta83 = jnp.broadcast_to(selta8m[None], (n_gp, nl4, 8))
    if per_run_var:
        sels23 = jnp.asarray(selt_np.T)[None] * (2.0 * s_row)[:, None, :]
    else:
        sels23 = jnp.broadcast_to(
            (jnp.asarray(selt_np.T) * (2.0 * s_row)[None, :])[None],
            (n_gp, 4, nl4))
    ones128 = jnp.ones((n_gp, 1, 128), jnp.float32)
    eqv_m = jnp.concatenate(
        [
            jnp.asarray(ind_g) * a_row[None, :],  # E_q, group order
            jnp.asarray(selt_np.T) * a_row[None, :],  # E_q, comp order
            jnp.asarray(selt_np.T) * (a_row * a_row)[None, :],  # E_q[x^2]
        ]
    )  # (12, nl4) — row sections 0:4 / 4:8 / 8:12
    eqv3 = jnp.broadcast_to(eqv_m[None], (n_gp, 12, nl4))

    levsel3 = jnp.broadcast_to(
        (jnp.asarray(selt_np.T) * lev_of_row[None, :].astype(_np.float32))[None],
        (n_gp, 4, nl4),
    )
    p_f = P.astype(jnp.float32)
    if jnp.ndim(P) == 2:  # per-run PCS pmf (sweep nu-axis batching)
        if jnp.shape(P)[0] != n_rb:
            raise ValueError(
                f"per-run P must have leading dim {n_rb}, got {jnp.shape(P)}"
            )
        pfull4 = jnp.broadcast_to(
            jnp.tile(p_f, (1, 4))[:, :, None], (n_gp, nl4, n_sym)
        )
    else:
        pfull4 = jnp.broadcast_to(
            jnp.tile(p_f, 4)[None, :, None], (n_gp, nl4, n_sym)
        )
    t_np = _np.arange(n_sym)
    inner_np = ((t_np >= mh) & (t_np < n_sym - mh)).astype(_np.float32)
    tmask32 = jnp.broadcast_to(
        jnp.asarray(inner_np)[None, None, :], (n_gp, nl4, n_sym)
    )
    ones_l = jnp.ones((n_gp, n_samp_mb, 8), jnp.float32)
    # csum rows: 0 = c_x, 1 = c_y, 2 = kl (see the st row map in _kernel)
    csum_np = _np.zeros((8, kst), _np.float32)
    csum_np[0, [0, 1, 12, 13, 16, 17, 20, 21]] = 1.0
    csum_np[0, [4, 5, 8, 9]] = -2.0
    csum_np[1, [2, 3, 14, 15, 18, 19, 22, 23]] = 1.0
    csum_np[1, [6, 7, 10, 11]] = -2.0
    csum_np[2, 24:kst] = 1.0
    csum3 = bcast(csum_np)
    permcat_np = _np.zeros((4 * m, 4 * m), _np.float32)  # blockdiag(perm_e, perm_o)
    permcat_np[: 4 * mhe, : 4 * mhe] = _win_perm(mhe)
    permcat_np[4 * mhe :, 4 * mhe :] = _win_perm(mh)
    permcat3 = bcast(permcat_np)
    # hmix: ONE constant whose dot against h builds every h-derived operand.
    # Rows 0-15 (cols 0:8): the ctd signed-copy mixes, row b*4 + (chi*2 + k)
    # = the b-th lane block of D_re (k=0: +/-h[chi*4+b]) / D_im (k=1:
    # +h[chi*4 + (b^1)]); rows 16-31: the ct2 mixes, row 16 + b*4 +
    # (nu*2 + c'); rows 32:36 (full 8 cols): the |h|^2 row-pair sums.
    hmix_np = _np.zeros((36, 8), _np.float32)
    for b in range(4):
        for chi in range(2):
            hmix_np[b * 4 + chi * 2, chi * 4 + b] = 1.0 if b % 2 == 0 else -1.0
            hmix_np[b * 4 + chi * 2 + 1, chi * 4 + (b ^ 1)] = 1.0
        for nu in range(2):
            hmix_np[16 + b * 4 + nu * 2, 4 * (b // 2) + nu * 2 + b % 2] = 1.0
            hmix_np[16 + b * 4 + nu * 2 + 1,
                    4 * (b // 2) + nu * 2 + (1 - b % 2)] = (
                -1.0 if b % 2 == 0 else 1.0
            )
    for g in range(4):
        hmix_np[32 + g, 2 * g] = 1.0
        hmix_np[32 + g, 2 * g + 1] = 1.0
    hmix3 = bcast(hmix_np)

    # w-group lanes are K-MAJOR (lane k*4 + i) to match the in-kernel
    # im2col's row order; converted here and back on output
    _wkm = lambda a: jnp.moveaxis(a, -2, -1).reshape(n_rb, 2, 4 * m)
    w2 = _wkm(w)
    h8 = _to_parity_major(h.reshape(n_rb, 8, m))
    mw2 = _wkm(opt["mw"])
    vw2 = _wkm(opt["vw"])
    mh8 = _to_parity_major(opt["mh"].reshape(n_rb, 8, m))
    vh8 = _to_parity_major(opt["vh"].reshape(n_rb, 8, m))
    per_run_lr = jnp.ndim(lr) > 0
    if per_run_lr and jnp.shape(lr) != (n_rb,):
        raise ValueError(f"per-run lr must have shape ({n_rb},), got {jnp.shape(lr)}")
    # the rb body never reads the scal var slots (var is folded into the
    # selection constants above); fill them from run 0 for shape uniformity
    scal = jnp.stack(
        [var[0, 0] if per_run_var else var[0],
         var[0, 1] if per_run_var else var[1],
         # the body never reads the nu slot (nu is folded into amp232n);
         # run 0's value keeps the scal shape uniform, like the var slots
         jnp.asarray(nu_sc, jnp.float32).reshape(-1)[0], jnp.float32(1e-12),
         jnp.float32(0.0) if per_run_lr else jnp.float32(lr),
         jnp.float32(lr_half_step), jnp.float32(step0),
         jnp.float32(0.0)]
    ).reshape(1, 8).astype(jnp.float32)

    sdt = jnp.bfloat16 if stream_bf16 else jnp.float32
    kernel = functools.partial(
        _kernel, n_sym=n_sym, m=m, n_lev=n_lev, n_rb=n_rb,
        stream_dtype=sdt, per_run_lr=per_run_lr, emit_eval=emit_eval,
        emit_q=emit_q, cut=cut,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    per_mb4 = lambda c, l: pl.BlockSpec(
        (1, n_gp, c, l), lambda mi: (mi, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        per_mb4(16, l_in),  # padded signed parity rows (in-kernel im2col)
        per_mb4(4, n_sym),
        per_mb4(4, n_sym),
        full(), full(),  # parity-major mask + its transpose
        full(), full(), full(), full(),  # selv/selt/sels/eqv
        full(), full(), full(), full(),  # amp232n, selta8, sels2, ones128
        full(), full(), full(), full(),  # pfull4, tmask, ones_l, csum
        full(), full(),  # block-diag window permutation, hmix
        full(), full(), full(), full(), full(), full(),  # params/moments
        pl.BlockSpec((1, 8), lambda mi: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [
        xin_s, rxe, rxo, maskpm3, masktpm3,
        selv3, selt3, sels3, eqv3,
        amp232n, selta83, sels23, ones128,
        pfull4, tmask32, ones_l, csum3, permcat3, hmix3,
        w2, h8, mw2, vw2, mh8, vh8, scal,
    ]
    scratch_shapes = [
        pltpu.VMEM((n_gp, 2, 4 * m), jnp.float32),  # w
        pltpu.VMEM((n_gp, 8, m), jnp.float32),  # h (parity-major)
        pltpu.VMEM((n_gp, 2, 4 * m), jnp.float32),  # mw
        pltpu.VMEM((n_gp, 2, 4 * m), jnp.float32),  # vw
        pltpu.VMEM((n_gp, 8, m), jnp.float32),  # mh
        pltpu.VMEM((n_gp, 8, m), jnp.float32),  # vh
        pltpu.VMEM((n_gp, 4 * n_lev, n_sym), jnp.float32),  # q
        pltpu.VMEM((n_gp, 4 * m, n_sym - mh), jnp.float32),  # eqwin (e|o stack)
        pltpu.VMEM((n_gp, 4 * m, n_sym), jnp.float32),  # gdwin (e|o stack)
        pltpu.VMEM((n_gp, 8, m), jnp.float32),  # gh assembly
        pltpu.VMEM((n_gp, 8, 4 * m), jnp.float32),  # ctd (block-diag coeffs)
        pltpu.VMEM((n_gp, 4, 4 * m), jnp.float32),  # ct2 (lane-concat coeffs)
        pltpu.VMEM((n_gp, 5, n_sym), jnp.float32),  # out rows + ones row
        pltpu.VMEM((n_gp, 4, n_sym), jnp.float32),  # Eq rows
        pltpu.VMEM((n_gp, 4, n_sym), jnp.float32),  # Var rows
        pltpu.VMEM((n_gp, 8, n_sym - mh), jnp.float32),  # d (e|o rows)
        pltpu.VMEM((n_gp, 8, n_sym - mh), jnp.float32),  # gd (e|o rows)
        pltpu.VMEM((n_gp, 8, 4 * m), jnp.float32),  # ghm (e|o rows)
        pltpu.VMEM((n_gp, 4, n_sym), jnp.float32),  # gEq rows
        pltpu.VMEM((n_gp, 2, n_sym), jnp.float32),  # gV rows
        pltpu.VMEM((n_gp, 4, m), jnp.float32),  # |h|^2 rows
        pltpu.VMEM((n_gp, 2, m), jnp.float32),  # S rows (parity-major)
        pltpu.VMEM((n_gp, 4, n_sym + mhe - 1), jnp.float32),  # gd padded
        pltpu.VMEM((n_gp, 4, n_sym), jnp.float32),  # gout rows
        pltpu.VMEM((n_gp, 2, 2 * n_sym), jnp.float32),  # gout I|Q concat
        pltpu.VMEM((n_gp, 1, 128), jnp.float32),  # stats row
        pltpu.VMEM((n_gp, 4, n_sym), jnp.float32),  # per-comp min rows
        pltpu.VMEM((n_gp, 12, n_sym), jnp.float32),  # EQV moment rows
        pltpu.VMEM((n_gp, kst, n_samp_mb), jnp.float32),  # sum stack
        pltpu.VMEM((n_gp, 8, 128), jnp.float32),  # combined sums
        pltpu.VMEM((n_gp, 8, n_sym), jnp.float32),  # stacked (gE; gVar) rows
        pltpu.VMEM((n_gp, 4, n_sym - mh), jnp.float32),  # gfac rows
        pltpu.VMEM((n_gp, 32, m), jnp.float32),  # h signed-mix park (ctd/ct2)
        pltpu.VMEM((n_gp, 4 * m, 2 * n_sym), jnp.float32),  # im2col
    ]
    if per_run_lr:
        # run r gets lr[r] over its whole row block
        lr_g = jnp.asarray(lr, jnp.float32)[:, None, None]
        lrw3 = jnp.broadcast_to(lr_g, (n_gp, 2, 4 * m))
        lrh3 = jnp.broadcast_to(lr_g, (n_gp, 8, m))
        in_specs += [full(), full()]
        inputs += [lrw3, lrh3]
    if emit_eval:
        in_specs.append(full())
        inputs.append(levsel3)

    if not emit_q and not emit_eval:
        raise ValueError("emit_q=False requires emit_eval=True (nothing "
                         "would carry the posterior information out)")
    out_shape = [
        jax.ShapeDtypeStruct((n_gp, 2, 4 * m), jnp.float32),
        jax.ShapeDtypeStruct((n_gp, 8, m), jnp.float32),
        jax.ShapeDtypeStruct((n_gp, 2, 4 * m), jnp.float32),
        jax.ShapeDtypeStruct((n_gp, 2, 4 * m), jnp.float32),
        jax.ShapeDtypeStruct((n_gp, 8, m), jnp.float32),
        jax.ShapeDtypeStruct((n_gp, 8, m), jnp.float32),
        jax.ShapeDtypeStruct((m_max, n_gp, 1, 128), jnp.float32),
    ]
    out_specs = [
        full(), full(), full(), full(), full(), full(),
        pl.BlockSpec((1, n_gp, 1, 128), lambda mi: (mi, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    if emit_q:
        out_shape.append(jax.ShapeDtypeStruct((m_max, n_gp, 4 * n_lev, n_sym), sdt))
        out_specs.append(per_mb4(4 * n_lev, n_sym))
    out_shape.append(jax.ShapeDtypeStruct((m_max, n_gp, 4, n_sym), sdt))
    out_specs.append(per_mb4(4, n_sym))
    if emit_eval:
        out_shape += [
            jax.ShapeDtypeStruct((m_max, n_gp, 4, n_sym), sdt),  # dec
            jax.ShapeDtypeStruct((m_max, n_gp, 2, n_sym), sdt),  # E_q[x^I]
            jax.ShapeDtypeStruct((m_max, n_gp, 4, n_sym), sdt),  # mm
            jax.ShapeDtypeStruct((m_max, n_gp, 4, n_sym), sdt),  # s1
        ]
        out_specs += [per_mb4(4, n_sym), per_mb4(2, n_sym),
                      per_mb4(4, n_sym), per_mb4(4, n_sym)]
    (w_o, h_o, mw_o, vw_o, mh_o, vh_o, stats, *streams) = pl.pallas_call(
        kernel,
        grid=(m_max,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        # stream buffers + scratch exceed the 16 MiB default scoped-vmem
        # limit past ~8 runs/group (rb=16); the v5e has
        # 128 MiB physical VMEM, so raise the compile-time cap (the limit
        # gates allocation only — configs under 16 MiB are unaffected)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if emit_q:
        q_all, *streams = streams
    out_all, *eval_all = streams

    losses = stats[:, :, 0, 0]  # (m_max, R)
    var_est = stats[:, :, 0, 1:3]  # (m_max, R, 2)
    if emit_q:
        q4 = q_all.reshape(m_max, n_rb, 4, n_lev, n_sym)
        q = jnp.stack(
            [
                jnp.concatenate([q4[:, :, 0], q4[:, :, 2]], axis=2),
                jnp.concatenate([q4[:, :, 1], q4[:, :, 3]], axis=2),
            ],
            axis=2,
        )  # (m_max, R, 2, 2*n_lev, n_sym)
    else:
        q = None
    out = jnp.stack(
        [
            jnp.stack([out_all[:, :, 0], out_all[:, :, 2]], axis=2),
            jnp.stack([out_all[:, :, 1], out_all[:, :, 3]], axis=2),
        ],
        axis=2,
    )  # (m_max, R, 2, 2, n_sym)
    _wkm_inv = lambda a: jnp.moveaxis(a.reshape(n_rb, 2, m, 4), -2, -1)
    opt_new = {
        "mw": _wkm_inv(mw_o),
        "vw": _wkm_inv(vw_o),
        "mh": _from_parity_major(mh_o, m).reshape(n_rb, 2, 2, 2, m),
        "vh": _from_parity_major(vh_o, m).reshape(n_rb, 2, 2, 2, m),
    }
    base = (
        _wkm_inv(w_o),
        _from_parity_major(h_o, m).reshape(n_rb, 2, 2, 2, m),
        opt_new,
        losses,
        var_est,
        q,
        out,
    )
    if not emit_eval:
        return base
    # dec/mm/s1 rows are comp-order like q (xI, yI, xQ, yQ); eq rows per pol
    d4, eq2, mm4, s14 = eval_all

    def to_pol(a4):  # (m_max, R, 4, N) comp order -> (m_max, R, 2, 2, N)
        return jnp.stack(
            [
                jnp.stack([a4[:, :, 0], a4[:, :, 2]], axis=2),
                jnp.stack([a4[:, :, 1], a4[:, :, 3]], axis=2),
            ],
            axis=2,
        )

    return base + (to_pol(d4), eq2, to_pol(mm4), to_pol(s14))




def vae_dp_frame_train_pallas(
    w, h, opt, rx, amps, var, nu_sc, P, lr, step0, lr_half_step,
    *, bl_sym: int, stride_sym: int | None = None, interpret: bool = False,
    emit_eval: bool = False, emit_q: bool = True,
):
    """Run one frame's FULL online training (all minibatches + Adam) fused.

    Single-run surface over the runs-batched body at R=1 (the dedicated
    _kernel_r1 body was retired after the merged-dot rework closed the gap:
    rb@R=1 measured 11.7M sym/s implied vs the old body's 11.8M on v5e —
    PARITY_RESULTS "rb body at R=1", artifacts/r4_eval_breakdown.log).

    w: (2, 4, M); h: (2, 2, 2, M); opt: dict(mw, vw, mh, vh) of Adam moments
    in the param shapes; rx: (2, 2, Nsamp) with Nsamp a multiple of
    2*bl_sym; lr/step0/lr_half_step: traced scalars (step0 = global step
    index of the frame's first minibatch, so the lr schedule and bias
    correction continue across frames). sps=2, odd M only. ``stride_sym``
    as on vae_dp_frame_train_pallas_rb (VAEflex overlapping windows,
    func_VAEflex_DP_MQAM_shaping.py:59-70).

    Returns (w', h', opt', losses (m_max,), var_est (m_max, 2),
    q (m_max, 2, 2*n_lev, bl_sym), out (m_max, 2, 2, bl_sym)) — exactly the
    per-frame quantities of the lax.scan step path in train/dp.py.
    """
    w_r, h_r, opt_r, losses, var_est, q, out, *ev = vae_dp_frame_train_pallas_rb(
        w[None], h[None], jax.tree.map(lambda x: x[None], opt), rx[None],
        amps, var, nu_sc, P, lr, step0, lr_half_step,
        bl_sym=bl_sym, stride_sym=stride_sym, interpret=interpret,
        emit_eval=emit_eval, emit_q=emit_q,
    )
    base = (
        w_r[0], h_r[0], jax.tree.map(lambda x: x[0], opt_r),
        losses[:, 0], var_est[:, 0],
        None if q is None else q[:, 0], out[:, 0],
    )
    return base + tuple(a[:, 0] for a in ev)
