"""L3 tests: SER / sync / CPE golden parity with the reference + invariances."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_equalizer_tpu.metrics import (
    cpe_dp,
    cpe_siso,
    find_shift_dp,
    find_shift_symb_dp,
    mutual_information,
    ser_const_siso,
    ser_constell_shaping,
    ser_iqflip,
    ser_q_siso,
)


def test_ser_q_siso_golden(golden):
    g = golden("ser_siso")
    num_lev = g["amp_levels"].shape[0]
    got = ser_q_siso(jnp.asarray(g["q"]), jnp.asarray(g["tx"]), num_lev)
    np.testing.assert_allclose(float(got), g["ser_q"], atol=1e-6)


def test_ser_const_siso_golden(golden):
    g = golden("ser_siso")
    got = ser_const_siso(jnp.asarray(g["rx"]), jnp.asarray(g["tx"]), jnp.asarray(g["amp_levels"]))
    np.testing.assert_allclose(float(got), g["ser_cma"], atol=1e-6)


def test_ser_iqflip_golden(golden):
    g = golden("ser_dp")
    got = ser_iqflip(jnp.asarray(g["q"]), jnp.asarray(g["tx"]))
    np.testing.assert_allclose(np.asarray(got), g["ser_iqflip"], atol=1e-6)


def test_ser_constell_shaping_golden(golden):
    g = golden("ser_dp")
    got = ser_constell_shaping(
        jnp.asarray(g["rx"]),
        jnp.asarray(g["tx"]),
        jnp.asarray(g["amp_levels"]),
        float(g["nu_sc"]),
        jnp.asarray(g["var"]),
    )
    np.testing.assert_allclose(np.asarray(got), g["ser_constell"], atol=1e-6)


def test_ser_ambiguity_invariance():
    """SER must be invariant under the 8 phase/IQ ambiguities of the decisions."""
    rng = np.random.default_rng(7)
    num_lev = 8
    N = 500
    amps = (np.arange(-7, 8, 2) / np.sqrt(42)).astype(np.float32)
    tx_idx = rng.integers(0, num_lev, size=(2, 2, N))
    tx = amps[tx_idx]
    # q peaked at the correct symbols
    q = np.full((2, 2 * num_lev, N), 1e-3, np.float32)
    for p in range(2):
        q[p, tx_idx[p, 0], np.arange(N)] = 1.0
        q[p, num_lev + tx_idx[p, 1], np.arange(N)] = 1.0
    base = np.asarray(ser_iqflip(jnp.asarray(q), jnp.asarray(tx)))
    assert np.all(base < 1e-6)
    # pi/2-rotated decisions (I<->Q swap with one negation) must still give ~0
    q_rot = np.concatenate([q[:, num_lev:][:, ::-1], q[:, :num_lev]], axis=1)
    rot = np.asarray(ser_iqflip(jnp.asarray(q_rot), jnp.asarray(tx)))
    assert np.all(rot < 1e-6)


def test_ser_weighted_mask_matches_slice():
    """weight-mask evaluation == slicing the same symbols (static-shape trick)."""
    rng = np.random.default_rng(8)
    num_lev = 8
    N = 300
    amps = (np.arange(-7, 8, 2) / np.sqrt(42)).astype(np.float32)
    tx = amps[rng.integers(0, num_lev, size=(2, N))]
    q = rng.random((2 * num_lev, N)).astype(np.float32)
    lo, hi = 11, N - 17
    want = ser_q_siso(jnp.asarray(q[:, lo:hi]), jnp.asarray(tx[:, lo:hi]), num_lev)
    w = np.zeros(N, np.float32)
    w[lo:hi] = 1
    got = ser_q_siso(jnp.asarray(q), jnp.asarray(tx), num_lev, weight=jnp.asarray(w))
    np.testing.assert_allclose(float(got), float(want), atol=1e-7)


def test_find_shift_dp_golden(golden):
    g = golden("find_shift")
    shift, r = find_shift_dp(jnp.asarray(g["q"]), jnp.asarray(g["tx"]), 21, jnp.asarray(g["amp_levels"]))
    np.testing.assert_array_equal(np.asarray(shift), g["shift"])
    assert int(r) == int(g["r"])
    shift2, r2 = find_shift_symb_dp(jnp.asarray(g["out"]), jnp.asarray(g["tx"]), 21)
    np.testing.assert_array_equal(np.asarray(shift2), g["shift_symb"])
    assert int(r2) == int(g["r_symb"])


def test_cpe_dp_golden(golden):
    g = golden("cpe_dp")
    got = np.asarray(jax.jit(cpe_dp)(jnp.asarray(g["y"])))
    np.testing.assert_allclose(got, g["y_corr"], rtol=2e-4, atol=2e-5)


def test_cpe_siso_golden(golden):
    g = golden("cpe_awgn")
    got = np.asarray(jax.jit(cpe_siso)(jnp.asarray(g["y"])))
    np.testing.assert_allclose(got, g["y_corr"], rtol=2e-4, atol=2e-5)


def test_mutual_information_limits():
    """Perfect posteriors -> MI = source entropy; prior posteriors -> MI = 0."""
    rng = np.random.default_rng(9)
    num_lev = 8
    N = 4000
    amps = (np.arange(-7, 8, 2) / np.sqrt(42)).astype(np.float32)
    P = np.exp(-0.0872449 * (amps / np.abs(amps).min()) ** 2)
    P = (P / P.sum()).astype(np.float32)
    tx_idx = rng.choice(num_lev, size=(2, N), p=P)
    tx = amps[tx_idx]
    q_perfect = np.zeros((2 * num_lev, N), np.float32)
    q_perfect[tx_idx[0], np.arange(N)] = 1
    q_perfect[num_lev + tx_idx[1], np.arange(N)] = 1
    ent = -2 * np.sum(P * np.log2(P))
    mi = float(mutual_information(jnp.asarray(q_perfect), jnp.asarray(tx), jnp.asarray(amps), jnp.asarray(P)))
    # empirical entropy of the finite sample differs from H(P) slightly
    assert abs(mi - ent) < 0.1
    q_prior = np.concatenate([np.tile(P[:, None], (1, N)), np.tile(P[:, None], (1, N))]).astype(np.float32)
    mi0 = float(mutual_information(jnp.asarray(q_prior), jnp.asarray(tx), jnp.asarray(amps), jnp.asarray(P)))
    assert abs(mi0) < 1e-5


def test_ser_symb_siso_golden(golden):
    from vae_equalizer_tpu.metrics.ser import ser_symb_siso

    g = golden("ser_symb")
    got = ser_symb_siso(jnp.asarray(g["rx"]), jnp.asarray(g["tx"]), jnp.asarray(g["amps"]), 2)
    np.testing.assert_allclose(float(got), g["ser"], atol=1e-6)


def test_decode_levels_exact_all_mods():
    """The level inverse map must be exact for every supported QAM size —
    the old (L-1)/2-scale form only rounded correctly up to 64-QAM."""
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.metrics.ser import _decode_levels

    for mod in ("4-QAM", "16-QAM", "64-QAM", "256-QAM"):
        c = make_constellation(mod, 0.0)
        idx = np.asarray(_decode_levels(jnp.asarray(c.amps), len(c.amps)))
        np.testing.assert_array_equal(idx, np.arange(len(c.amps)), err_msg=mod)


def test_ser_constell_shaping_nonfinite_is_error():
    """NaN/Inf equalizer output must count as a symbol error (a diverged run
    reports SER ~1, not 'decoded as the lowest level')."""
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.core.constellation import demapper_noise_var

    c = make_constellation("64-QAM", 0.0)
    amps = jnp.asarray(c.amps)
    var = jnp.full((2,), demapper_noise_var(c, 23.0), jnp.float32)
    rng = np.random.default_rng(0)
    tx = np.asarray(c.amps)[rng.integers(0, 8, size=(2, 2, 500))].astype(np.float32)
    ser_clean = ser_constell_shaping(jnp.asarray(tx), jnp.asarray(tx), amps, c.nu_sc, var)
    assert np.all(np.asarray(ser_clean) < 1e-6)
    rx_bad = np.full_like(tx, np.nan)
    ser_nan = ser_constell_shaping(jnp.asarray(rx_bad), jnp.asarray(tx), amps, c.nu_sc, var)
    assert np.all(np.asarray(ser_nan) == 1.0), ser_nan


def test_aligned_eval_matches_roll_dp():
    """align_tx_dp (roll tx+weight into the equalizer frame) reproduces the
    roll_dp formulation exactly: SER sums are 0/1-exact, MI to f32 noise."""
    from vae_equalizer_tpu.metrics.mi import mutual_information_ambiguity
    from vae_equalizer_tpu.train.eval_utils import (
        align_tx_dp,
        margin_weight_maxshift,
        roll_dp,
    )

    rng = np.random.default_rng(7)
    n, num_lev = 400, 8
    amps = jnp.asarray((2 * np.arange(num_lev) - (num_lev - 1)) / np.sqrt(2 * (num_lev**2 - 1) / 3), jnp.float32)
    P = jnp.asarray(np.full(num_lev, 1 / num_lev), jnp.float32)
    for r_val, s0, s1 in [(0, 3, -2), (1, -4, 5), (0, 0, 0), (1, 7, 7)]:
        logits = rng.normal(size=(2, 2 * num_lev, n)).astype(np.float32)
        q = np.exp(logits)
        q[:, :num_lev] /= q[:, :num_lev].sum(1, keepdims=True)
        q[:, num_lev:] /= q[:, num_lev:].sum(1, keepdims=True)
        tx_idx = rng.integers(0, num_lev, size=(2, 2, n))
        tx = np.asarray(amps)[tx_idx].astype(np.float32)
        out = np.asarray(amps)[rng.integers(0, num_lev, size=(2, 2, n))] + \
            0.05 * rng.normal(size=(2, 2, n)).astype(np.float32)
        q, tx, out = jnp.asarray(q), jnp.asarray(tx), jnp.asarray(out.astype(np.float32))
        shift = jnp.asarray([s0, s1], jnp.int32)
        r = jnp.int32(r_val)
        w = margin_weight_maxshift(n, jnp.max(jnp.abs(shift)))

        # reference: roll the big tensors into tx's frame
        q_r = roll_dp(q, shift, r)
        out_r = roll_dp(out, shift, r)
        ser_ref = ser_iqflip(q_r, tx, weight=w)
        mi_ref = mutual_information_ambiguity(q_r, tx, amps, P, weight=w)
        serc_ref = ser_constell_shaping(out_r, tx, amps, 0.02, jnp.full((2,), 0.1, jnp.float32), weight=w)

        # aligned: roll tx + weight into the equalizer's frame
        tx_al, w_al = align_tx_dp(tx, shift, r, w)
        # aligned metrics come back per equalizer pol; report per tx pol
        ser_new = jnp.roll(ser_iqflip(q, tx_al, weight=w_al), r)
        mi_new = jnp.roll(mutual_information_ambiguity(q, tx_al, amps, P, weight=w_al), r)
        serc_new = jnp.roll(ser_constell_shaping(out, tx_al, amps, 0.02, jnp.full((2,), 0.1, jnp.float32), weight=w_al), r)

        np.testing.assert_allclose(np.asarray(ser_new), np.asarray(ser_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(serc_new), np.asarray(serc_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mi_new), np.asarray(mi_ref), rtol=2e-5, atol=2e-5)


def test_mi_ambiguity_trace_matches_onehot_mi():
    """The trace-based ambiguity MI equals the (independent, one-hot based)
    mutual_information when q is peaked at tx so the identity variant wins."""
    from vae_equalizer_tpu.metrics.mi import mutual_information_ambiguity

    rng = np.random.default_rng(3)
    n, num_lev = 300, 8
    amps = jnp.asarray((2 * np.arange(num_lev) - (num_lev - 1)) / np.sqrt(2 * (num_lev**2 - 1) / 3), jnp.float32)
    P = jnp.asarray(np.full(num_lev, 1 / num_lev), jnp.float32)
    tx_idx = rng.integers(0, num_lev, size=(2, 2, n))
    q = np.full((2, 2 * num_lev, n), 0.1 / (num_lev - 1), np.float32)
    for pol in range(2):
        for c in range(2):
            q[pol, c * num_lev + tx_idx[pol, c], np.arange(n)] = 0.9
    tx = jnp.asarray(np.asarray(amps)[tx_idx].astype(np.float32))
    q = jnp.asarray(q)
    w = jnp.ones(n, jnp.float32).at[:11].set(0.0)
    got = mutual_information_ambiguity(q, tx, amps, P, weight=w)
    want = mutual_information(q, tx, amps, P, weight=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_dp_frame_eval_mb_matches_packed():
    """The minibatch-layout eval (_dp_frame_eval_mb: mb-layout sync/argmax/
    MI selections, no posterior transpose) returns the same metrics as the
    packed-layout _dp_frame_eval on the identical posterior stream."""
    from vae_equalizer_tpu.train.dp import _dp_frame_eval, _dp_frame_eval_mb
    from vae_equalizer_tpu.train.eval_utils import margin_weight_maxshift

    rng = np.random.default_rng(11)
    n_mb, bl, num_lev = 6, 50, 8
    n = n_mb * bl
    amps = jnp.asarray(
        (2 * np.arange(num_lev) - (num_lev - 1)) / np.sqrt(2 * (num_lev**2 - 1) / 3),
        jnp.float32,
    )
    P = jnp.asarray(np.full(num_lev, 1 / num_lev), jnp.float32)
    var = jnp.full((2,), 0.1, jnp.float32)

    logits = rng.normal(size=(n_mb, 2, 2 * num_lev, bl)).astype(np.float32)
    q_mb = np.exp(logits)
    q_mb[:, :, :num_lev] /= q_mb[:, :, :num_lev].sum(2, keepdims=True)
    q_mb[:, :, num_lev:] /= q_mb[:, :, num_lev:].sum(2, keepdims=True)
    tx_idx = rng.integers(0, num_lev, size=(2, 2, n))
    tx = jnp.asarray(np.asarray(amps)[tx_idx].astype(np.float32))
    out = jnp.asarray(
        (np.asarray(amps)[rng.integers(0, num_lev, size=(2, 2, n))]
         + 0.05 * rng.normal(size=(2, 2, n))).astype(np.float32)
    )
    q_mb = jnp.asarray(q_mb)
    q_train = jnp.moveaxis(q_mb, 0, 2).reshape(2, 2 * num_lev, n)
    weight_fn = lambda s0, ms: margin_weight_maxshift(n, ms)

    ref = _dp_frame_eval(q_train, out, tx, amps, P, 0.02, var, weight_fn)
    got = _dp_frame_eval_mb(q_mb, out, tx, amps, P, 0.02, var, weight_fn)
    for a, b, tol in zip(got, ref, (1e-6, 1e-6, 2e-5, 0, 0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=tol)

    # the kernel-emitted eval streams path (round 4): precomputed argmax
    # decisions (n_mb, 2, 2, bl) + E_q[x^I] (n_mb, 2, bl) replace the q_mb
    # reads for the sync and the soft SER — metrics must be unchanged
    dec_mb = jnp.stack(
        [jnp.argmax(q_mb[:, :, :num_lev], 2), jnp.argmax(q_mb[:, :, num_lev:], 2)],
        axis=2,
    ).astype(jnp.float32)
    eq_mb = jnp.sum(q_mb[:, :, :num_lev] * amps[None, None, :, None], axis=2)
    got2 = _dp_frame_eval_mb(q_mb, out, tx, amps, P, 0.02, var, weight_fn,
                             dec_mb=dec_mb, eq_mb=eq_mb)
    for a, b, tol in zip(got2, ref, (1e-6, 1e-6, 2e-5, 0, 0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=tol)


def test_mi_ambiguity_mb_single_pass_matches():
    """The single-read level-sweep MI (``_mb_sp``) equals the trace form
    (``_mb``) — same 8-variant algebra, reorganized so each posterior row is
    loaded once (the eval stage is HBM-bound, PARITY_RESULTS round 4)."""
    from vae_equalizer_tpu.metrics.mi import (
        mutual_information_ambiguity_mb,
        mutual_information_ambiguity_mb_sp,
    )
    from vae_equalizer_tpu.core import make_constellation

    rng = np.random.default_rng(11)
    n_mb, bl, num_lev = 6, 50, 8
    n = n_mb * bl
    const = make_constellation("64-QAM", 0.0525)
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    logits = rng.normal(size=(n_mb, 2, 2 * num_lev, bl)).astype(np.float32)
    q_mb = np.exp(logits)
    q_mb[:, :, :num_lev] /= q_mb[:, :, :num_lev].sum(2, keepdims=True)
    q_mb[:, :, num_lev:] /= q_mb[:, :, num_lev:].sum(2, keepdims=True)
    tx = np.asarray(amps)[rng.integers(0, num_lev, size=(2, 2, n))]
    for w in (None, jnp.asarray((rng.random((2, n)) > 0.1).astype(np.float32))):
        ref = mutual_information_ambiguity_mb(jnp.asarray(q_mb), jnp.asarray(tx), amps, P, weight=w)
        got = mutual_information_ambiguity_mb_sp(jnp.asarray(q_mb), jnp.asarray(tx), amps, P, weight=w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ser_constell_shaping_matches_rotation_stack():
    """The derived-decision form (two compare sweeps + bin(-x) = #(x <= -d_l),
    commit 9a240ef) must reproduce a brute-force materialized rotation stack
    hypothesis-for-hypothesis — including rx samples placed EXACTLY on
    decision boundaries, where the sign-flip identity is the easy thing to
    get wrong."""
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.core.constellation import demapper_noise_var
    from vae_equalizer_tpu.metrics.ser import _decode_levels, _wmean

    c = make_constellation("64-QAM", 0.0225)
    amps = jnp.asarray(c.amps)
    num_lev = len(c.amps)
    var = jnp.full((2,), demapper_noise_var(c, 23.0), jnp.float32)
    rng = np.random.default_rng(7)
    tx = np.asarray(c.amps)[rng.integers(0, num_lev, size=(2, 2, 400))].astype(np.float32)
    rx = tx + rng.normal(0, 0.15, size=tx.shape).astype(np.float32)
    # place some samples exactly on the shaped decision boundaries
    d_vec = np.asarray((1 + 2 * c.nu_sc * float(var[0])) * (amps[:-1] + amps[1:]) / 2)
    rx[:, :, :num_lev - 1] = d_vec
    rx[:, :, num_lev : 2 * num_lev - 1] = -d_vec
    rx, tx = jnp.asarray(rx), jnp.asarray(tx)
    w = jnp.asarray((rng.random((2, 400)) > 0.1).astype(np.float32))

    got = ser_constell_shaping(rx, tx, amps, c.nu_sc, var, weight=w)

    # brute force: materialize the 4-rotation stack, bin each with the same
    # normalization, min over 8 hypotheses (the pre-9a240ef formulation)
    full = 2 * ((num_lev - 1) / 2)
    data = _decode_levels(tx, num_lev)
    data_iqinv = jnp.stack(
        [data[:, 0], (full - data[:, 1].astype(jnp.float32)).astype(jnp.int32)], axis=1)
    txf = tx.astype(jnp.float32)
    mag_tx = _wmean(jnp.sqrt(txf[:, 0] ** 2 + txf[:, 1] ** 2), w, axis=(0, -1))
    mag_rx = _wmean(jnp.sqrt(rx[:, 0] ** 2 + rx[:, 1] ** 2), w, axis=(0, -1))
    rxs = rx * (mag_tx / mag_rx)
    rx_pi4 = jnp.stack([-rxs[:, 1], rxs[:, 0]], axis=1)
    rx_variants = jnp.stack([rxs, -rxs, rx_pi4, -rx_pi4])
    both_data = jnp.stack([data, data_iqinv])
    dec = jnp.zeros(rx_variants.shape, jnp.int32)
    dv = jnp.asarray(d_vec)
    for lev in range(num_lev - 1):
        dec = dec + (rx_variants >= dv[lev]).astype(jnp.int32)
    err = jnp.any(dec[:, None] != both_data[None], axis=3)
    ref = jnp.min(_wmean(err, w, axis=-1), axis=(0, 1))

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-7)


def test_mi_ambiguity_mb_single_pass_odd_levels():
    """The paired level sweep's odd-n middle-level branch (mi.py, `if n % 2`)
    must match the trace form too — square QAM always has an even per-dim
    level count, so this synthetic 7-level constellation is the only
    execution the branch gets (round-4 advisor finding)."""
    from vae_equalizer_tpu.metrics.mi import (
        mutual_information_ambiguity_mb,
        mutual_information_ambiguity_mb_sp,
    )

    rng = np.random.default_rng(3)
    n_mb, bl, num_lev = 5, 40, 7
    n = n_mb * bl
    amps = jnp.asarray(
        (2 * np.arange(num_lev) - (num_lev - 1))
        / np.sqrt(2 * (num_lev**2 - 1) / 3),
        jnp.float32,
    )
    # level-reversal-symmetric pmf (the variant algebra requires it, like MB)
    p = np.exp(-0.2 * (np.arange(num_lev) - (num_lev - 1) / 2) ** 2)
    P = jnp.asarray(p / p.sum(), jnp.float32)
    logits = rng.normal(size=(n_mb, 2, 2 * num_lev, bl)).astype(np.float32)
    q_mb = np.exp(logits)
    q_mb[:, :, :num_lev] /= q_mb[:, :, :num_lev].sum(2, keepdims=True)
    q_mb[:, :, num_lev:] /= q_mb[:, :, num_lev:].sum(2, keepdims=True)
    tx = np.asarray(amps)[rng.integers(0, num_lev, size=(2, 2, n))]
    for w in (None, jnp.asarray((rng.random((2, n)) > 0.1).astype(np.float32))):
        ref = mutual_information_ambiguity_mb(
            jnp.asarray(q_mb), jnp.asarray(tx), amps, P, weight=w)
        got = mutual_information_ambiguity_mb_sp(
            jnp.asarray(q_mb), jnp.asarray(tx), amps, P, weight=w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_bounded_sync_window_matches_full_frame():
    """corr_len=2000 (train/dp._SYNC_CORR_LEN) finds the same (shift, r) as
    the reference's full-frame DP correlation (shared_funcs.py:297,324) on
    flagship-shaped signals: 10000-symbol MB-PCS 64-QAM frames, swept true
    shifts across the full +/-10 lag grid, both pol assignments, and noise
    down to early-frame correlation quality (rho ~ 0.2, i.e. an equalizer
    output that is still mostly noise). This pins the ONE semantic deviation
    from the reference (round-4 verdict weak #3).

    Below rho ~ 0.2 the windows start to disagree (measured offline: 13% of
    trials differ by one lag at rho = 0.14, 58% at rho = 0.10, while the
    full window still finds the truth) — at that point the equalizer output
    is ~98% noise and frame SER is saturated regardless, so the deviation is
    documented (MIGRATION.md) rather than load-bearing; the second half of
    this test pins that measured disagreement band."""
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.metrics.sync import _dp_shift_core
    from vae_equalizer_tpu.train.dp import _SYNC_CORR_LEN

    const = make_constellation("64-QAM", 0.0525)
    amps = np.asarray(const.amps)
    P = np.asarray(const.P, np.float64)
    N = 10000
    rng = np.random.default_rng(5)
    core = jax.jit(_dp_shift_core, static_argnums=(2, 3, 4))

    def make(true_r, s0, s1, noise_std):
        idx = rng.choice(len(amps), size=(2, 2, N), p=P)
        tx = amps[idx].astype(np.float32)
        e = np.empty((2, N), np.float32)
        for j, s in enumerate((s0, s1)):
            src = tx[(j + true_r) % 2, 0]
            e[j] = np.roll(src, s) + noise_std * rng.normal(
                size=N).astype(np.float32)
        return jnp.asarray(e), jnp.asarray(tx)

    checked = 0
    for true_r in (0, 1):
        for s0, s1 in ((0, 0), (10, -10), (-10, 10), (3, -7), (-6, 2)):
            # noise_std=3.5 -> rho ~= 0.2: an early, barely-converged frame
            for noise_std in (0.5, 2.0, 3.5):
                e, txj = make(true_r, s0, s1, noise_std)
                sh_b, r_b = core(e, txj, 21, 1, _SYNC_CORR_LEN)
                sh_f, r_f = core(e, txj, 21, 1, None)
                assert int(r_f) == true_r and list(np.asarray(sh_f)) == [s0, s1], (
                    "full-frame sync itself failed — test signal too noisy")
                assert int(r_b) == int(r_f)
                assert list(np.asarray(sh_b)) == list(np.asarray(sh_f))
                checked += 1
    assert checked == 30

    # quantified disagreement band at rho ~= 0.14 (noise_std=5): the bounded
    # window may miss by a lag or two on a ~98%-noise signal while the full
    # window holds — pin that it stays a MINORITY of trials and that the
    # full window stays exact (the offline 60-trial study measured 13%)
    disagree = 0
    for t in range(10):
        e, txj = make(t % 2, 4, -9, 5.0)
        sh_b, r_b = core(e, txj, 21, 1, _SYNC_CORR_LEN)
        sh_f, r_f = core(e, txj, 21, 1, None)
        assert int(r_f) == t % 2 and list(np.asarray(sh_f)) == [4, -9]
        disagree += int(
            int(r_b) != int(r_f)
            or list(np.asarray(sh_b)) != list(np.asarray(sh_f))
        )
    assert disagree <= 5


def test_mi_ambiguity_mb_stats_matches_posterior_form():
    """The sufficient-statistics MI (out, mm, s1 rows — round 5) equals the
    posterior-stream form on posteriors generated by the same PCS softmin
    demapper formula the kernel uses: q[l] = exp(mm - met_l)/s1 with
    met_l = (out - a_l)^2/(2 var) + nu a_l^2."""
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.metrics.mi import (
        mutual_information_ambiguity_mb,
        mutual_information_ambiguity_mb_stats,
    )

    rng = np.random.default_rng(21)
    n_mb, bl = 6, 50
    const = make_constellation("64-QAM", 0.0525)
    amps = jnp.asarray(const.amps)
    n = len(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    nu_sc = const.nu_sc
    var = jnp.asarray([0.11, 0.13], jnp.float32)
    N = n_mb * bl

    # equalizer-like output: near a random level + noise (so met spans a
    # realistic range, incl. some deep-error symbols)
    lev = rng.integers(0, n, size=(2, 2, N))
    out_tm = np.asarray(amps)[lev] + rng.normal(0, 0.4, size=(2, 2, N))
    out_tm = out_tm.astype(np.float32)

    a = np.asarray(amps, np.float64)
    met = ((out_tm[:, :, None, :] - a[None, None, :, None]) ** 2
           / (2 * np.asarray(var, np.float64)[:, None, None, None])
           + nu_sc * (a ** 2)[None, None, :, None])  # (2pol, 2comp, n, N)
    mm = met.min(axis=2)  # (2, 2, N)
    e = np.exp(mm[:, :, None, :] - met)
    s1 = e.sum(axis=2)
    q = e / s1[:, :, None, :]  # (2, 2, n, N)

    def to_mb(x):  # (..., N) -> (n_mb, ..., bl)
        return np.moveaxis(x.reshape(x.shape[:-1] + (n_mb, bl)), -2, 0)

    q_mb = to_mb(np.concatenate([q[:, 0], q[:, 1]], axis=1)).astype(np.float32)
    tx = np.asarray(amps)[rng.integers(0, n, size=(2, 2, N))].astype(np.float32)

    for w in (None, jnp.asarray((rng.random((2, N)) > 0.1).astype(np.float32))):
        ref = mutual_information_ambiguity_mb(
            jnp.asarray(q_mb), jnp.asarray(tx), amps, P, weight=w)
        got = mutual_information_ambiguity_mb_stats(
            jnp.asarray(to_mb(out_tm).astype(np.float32)),
            jnp.asarray(to_mb(mm).astype(np.float32)),
            jnp.asarray(to_mb(s1).astype(np.float32)),
            jnp.asarray(tx), amps, P, nu_sc, var, weight=w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_align_idx_dp_matches_align_tx_dp():
    """The index-domain alignment (roll int8 indices + direct shifted-mask
    build, round-5 align lever) must reproduce align_tx_dp exactly:
    amps[idx_al] == tx_al and w_al == rolled mask, for both weight builders
    and the full (shift, r) range."""
    from vae_equalizer_tpu.metrics.ser import _decode_levels
    from vae_equalizer_tpu.train.eval_utils import (
        align_idx_dp,
        align_tx_dp,
        batch_cut_weight,
        margin_weight_maxshift,
    )

    rng = np.random.default_rng(13)
    num_lev, m_max, bl = 8, 6, 100
    N = m_max * bl
    amps = jnp.asarray(
        (2 * np.arange(num_lev) - (num_lev - 1)) / np.sqrt(2 * (num_lev**2 - 1) / 3),
        jnp.float32,
    )
    tx = jnp.asarray(np.asarray(amps)[rng.integers(0, num_lev, size=(2, 2, N))])
    idx = _decode_levels(tx, num_lev).astype(jnp.int8)

    for r_val in (0, 1):
        for s0, s1 in ((0, 0), (10, -10), (-7, 3)):
            shift = jnp.asarray([s0, s1], jnp.int32)
            r = jnp.int32(r_val)
            ms = jnp.max(jnp.abs(shift))
            for build, build_t in (
                (lambda: batch_cut_weight(m_max, bl, shift[0], ms, 11),
                 lambda t: batch_cut_weight(m_max, bl, shift[0], ms, 11, t=t)),
                (lambda: margin_weight_maxshift(N, ms),
                 lambda t: margin_weight_maxshift(N, ms, t=t)),
            ):
                w = build()
                tx_al, w_al = align_tx_dp(tx, shift, r, w)
                idx_al, w_al2 = align_idx_dp(idx, shift, r, build_t)
                np.testing.assert_array_equal(
                    np.asarray(amps)[np.asarray(idx_al)], np.asarray(tx_al))
                np.testing.assert_array_equal(np.asarray(w_al2), np.asarray(w_al))
