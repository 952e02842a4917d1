"""Sweep engine: grid expansion, vmapped+sharded runs, incremental results."""

import jax
import numpy as np

from vae_equalizer_tpu.parallel import expand_grid, run_mesh, run_sweep
from vae_equalizer_tpu.parallel.sweep import assemble_mat
from vae_equalizer_tpu.train import train_vae_le_awgn
from vae_equalizer_tpu.utils.config import AwgnVaeLeConfig


def test_expand_grid():
    base = AwgnVaeLeConfig()
    cfgs, coords, axes = expand_grid(base, snr_db=[20.0, 24.0], lr=[1e-3, 5e-3, 7e-3])
    assert len(cfgs) == 6
    assert cfgs[0].snr_db == 20.0 and cfgs[-1].lr == 7e-3
    assert coords[0] == (0, 0) and coords[-1] == (1, 2)
    assert list(axes) == ["snr_db", "lr"]


def test_vmapped_runs_match_single_runs():
    """runs=k must produce the same per-run trajectories as k separate calls
    would — i.e. runs are independent (no cross-run state leakage)."""
    cfg = AwgnVaeLeConfig(mod="4-QAM", snr_db=18.0, num_epochs=8, epe=4, n_valid=2000, n_train=600)
    res = train_vae_le_awgn(cfg, jax.random.PRNGKey(0), runs=4)
    assert res["ser"].shape == (4, 2)
    # independent seeds -> runs differ
    assert np.unique(res["ser"][:, 0]).size > 1


def test_sweep_sharded_over_mesh(tmp_path):
    mesh = run_mesh()  # 8 virtual CPU devices (conftest)
    cfg = AwgnVaeLeConfig(mod="4-QAM", snr_db=18.0, num_epochs=6, epe=3, n_valid=2000, n_train=600)
    results, axes_values, jsonl = run_sweep(
        "VAE-LE-AWGN", cfg, {"lr": [3e-3, 5e-3]}, iters=8,
        key=jax.random.PRNGKey(1), mesh=mesh, out_dir=tmp_path,
    )
    assert len(results) == 2
    assert jsonl.exists() and len(jsonl.read_text().splitlines()) == 2
    ser = assemble_mat(results, axes_values, 8, ())
    assert ser.shape == (2, 8, 2)  # grid x iters x evals
    assert np.all(np.isfinite(ser))


def test_checkpoint_roundtrip_and_warm_start(tmp_path):
    """Save a trained state, reload it, and warm-start a new run from it."""
    from vae_equalizer_tpu.utils import io

    cfg = AwgnVaeLeConfig(mod="4-QAM", snr_db=18.0, num_epochs=20, epe=10, n_valid=2000, n_train=600)
    res = train_vae_le_awgn(cfg, jax.random.PRNGKey(2))
    io.save_checkpoint(tmp_path / "ck.npz", res["params"])
    loaded = io.load_checkpoint(tmp_path / "ck.npz")
    for k in ("w", "h"):
        np.testing.assert_array_equal(loaded[k], np.asarray(res["params"][k]))
    # warm start: resumes from the trained operating point, SER stays low
    cfg2 = AwgnVaeLeConfig(mod="4-QAM", snr_db=18.0, num_epochs=4, epe=2, n_valid=2000, n_train=600)
    import jax.numpy as jnp

    res2 = train_vae_le_awgn(
        cfg2, jax.random.PRNGKey(3), params_init={k: jnp.asarray(v) for k, v in loaded.items()}
    )
    assert res2["ser"][0] <= res["ser"][-1] + 0.05


def test_sweep_saves_checkpoints(tmp_path):
    cfg = AwgnVaeLeConfig(mod="4-QAM", snr_db=18.0, num_epochs=4, epe=2, n_valid=2000, n_train=600)
    results, _, _ = run_sweep(
        "VAE-LE-AWGN", cfg, {"lr": [5e-3]}, iters=2, key=jax.random.PRNGKey(4),
        out_dir=tmp_path, save_params=True,
    )
    assert "checkpoint" in results[0]
    from vae_equalizer_tpu.utils import io

    ck = io.load_checkpoint(results[0]["checkpoint"])
    assert ck["w"].shape[0] == 2  # runs-stacked params


def test_mid_experiment_checkpoint_resume(tmp_path):
    """Kill a frame-loop experiment mid-run; resuming from the periodic
    training-state checkpoint reproduces the uninterrupted run exactly
    (params, opt state, frame index and PRNG inputs all round-trip)."""
    from vae_equalizer_tpu.train import train_vae_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    cfg = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=10, n_frame_max=1000, lr=2.5e-3)
    key = jax.random.PRNGKey(21)
    full = train_vae_dp(cfg, key)

    ckpt = tmp_path / "state.npz"

    class Boom(RuntimeError):
        pass

    def killer(frame, m):
        if frame == 5:
            raise Boom()

    try:
        train_vae_dp(cfg, key, checkpoint=ckpt, checkpoint_every=3, progress=killer)
        raise AssertionError("killer did not fire")
    except Boom:
        pass
    assert ckpt.exists()
    resumed = train_vae_dp(cfg, key, checkpoint=ckpt, checkpoint_every=3)
    np.testing.assert_allclose(resumed["ser"], full["ser"], atol=1e-7)
    np.testing.assert_allclose(resumed["mi"], full["mi"], atol=1e-5)
    for k in ("w", "h"):
        np.testing.assert_allclose(
            np.asarray(resumed["params"][k]), np.asarray(full["params"][k]), atol=1e-7
        )


def test_sweep_resume_mid_grid_and_mid_point(tmp_path):
    """skip_done + checkpoint_every: a killed sweep resumes past finished
    grid points AND inside the interrupted one, and the final .mat tensor
    matches an uninterrupted sweep."""
    from vae_equalizer_tpu.parallel.sweep import run_sweep
    from vae_equalizer_tpu.utils.config import DpConfig

    base = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=6, n_frame_max=1000, lr=2.5e-3)
    axes = {"lr": [2.5e-3, 2e-3]}
    key = jax.random.PRNGKey(5)

    ref_results, axes_values, _ = run_sweep(
        "VAE", base, axes, iters=2, key=key, out_dir=tmp_path / "ref",
        tag="t", checkpoint_every=2,
    )

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def killer(frame, m):
        calls["n"] += 1
        if calls["n"] == 10:  # inside grid point 2 (6 frames each)
            raise Boom()

    out = tmp_path / "resumable"
    try:
        run_sweep("VAE", base, axes, iters=2, key=key, out_dir=out, tag="t",
                  checkpoint_every=2, progress=killer)
        raise AssertionError("killer did not fire")
    except Boom:
        pass
    state_files = list(out.glob("state_t_*.npz"))
    assert len(state_files) == 1  # point 2 left its mid-experiment state

    results, axes_values2, jsonl = run_sweep(
        "VAE", base, axes, iters=2, key=key, out_dir=out, tag="t",
        checkpoint_every=2, skip_done=True,
    )
    assert len(results) == 2
    assert not list(out.glob("state_t_*.npz"))  # cleaned up after finishing
    ref = assemble_mat(ref_results, axes_values, 2, (4,))
    got = assemble_mat(results, axes_values2, 2, (4,))
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_sweep_resume_rejects_other_runner_mode(tmp_path):
    """A grid point finished in one runner mode (e.g. plain XLA) must not
    satisfy a skip_done resume in another (e.g. use_pallas) — the record's
    runner_kwargs are part of its identity, like the state-file hash."""
    from vae_equalizer_tpu.parallel.sweep import run_sweep
    from vae_equalizer_tpu.utils.config import DpConfig

    base = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=2, n_frame_max=500)
    axes = {"lr": [2.5e-3]}
    key = jax.random.PRNGKey(6)
    out = tmp_path / "s"

    r1, _, jsonl1 = run_sweep("VAE", base, axes, iters=1, key=key,
                              out_dir=out, tag="t")
    assert r1[0]["runner_kwargs"] == {}

    # same grid, same mode -> skipped (resumed from the record)
    r2, _, jsonl2 = run_sweep("VAE", base, axes, iters=1, key=key,
                              out_dir=out, tag="t", skip_done=True)
    assert jsonl2 == jsonl1 and r2[0] is not r1[0] and r2[0]["coords"] == [0]
    assert r2[0]["wall_s"] == r1[0]["wall_s"]  # not re-run

    # same grid, different runner mode -> re-run, record updated
    r3, _, _ = run_sweep(
        "VAE", base, axes, iters=1, key=key, out_dir=out, tag="t",
        skip_done=True, runner_kwargs={"chunk_frames": 2},
    )
    assert r3[0]["runner_kwargs"] == {"chunk_frames": 2}
    assert r3[0]["wall_s"] != r1[0]["wall_s"]  # actually executed again


def test_load_state_rejects_other_carry_structure(tmp_path):
    """A mid-experiment checkpoint written by a different runner mode (its
    carry pytree differs) must fail with a clear error, not a positional
    leaf cast (train/harness.py:_load_state)."""
    import pytest

    from vae_equalizer_tpu.train.harness import _load_state, _save_state

    carry_a = ({"w": np.zeros((2, 3), np.float32)}, np.zeros((4,), np.float32))
    carry_b = ({"w": np.zeros((2, 3), np.float32)},
               np.zeros((4,), np.float32), np.int32(0))
    hist = {"x": np.zeros(3, np.float32)}
    path = tmp_path / "state.npz"
    _save_state(path, 1, carry_a, hist)
    with pytest.raises(ValueError, match="different runner mode"):
        _load_state(path, carry_b, dict(hist))
    # matching structure loads fine
    frame, carry = _load_state(path, carry_a, dict(hist))
    assert frame == 1


def test_sweep_batch_lr_axis(tmp_path, monkeypatch):
    """batch_lr_axis: an n_lr x iters group runs as ONE runner call (lr
    folded per-run into the runs-batched kernel) yet still yields one
    JSONL record per grid point with that point's config and results."""
    import vae_equalizer_tpu.ops.frame_kernel as fk
    from vae_equalizer_tpu.parallel.sweep import run_sweep
    from vae_equalizer_tpu.utils.config import DpConfig

    orig = fk.vae_dp_frame_train_pallas_rb
    monkeypatch.setattr(
        fk, "vae_dp_frame_train_pallas_rb",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    calls = {"n": 0}
    real_vae = dict(run_sweep.__globals__["RUNNERS"])["VAE"]

    def counting(cfg, k, **kw):
        calls["n"] += 1
        return real_vae(cfg, k, **kw)

    monkeypatch.setitem(run_sweep.__globals__["RUNNERS"], "VAE", counting)

    base = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=2, n_frame_max=400,
                    batch_len=100, n_lrhalf=10**6)
    axes = {"snr_db": [20.0], "lr": [2.5e-3, 1e-3]}
    results, axes_values, jsonl = run_sweep(
        "VAE", base, axes, iters=2, key=jax.random.PRNGKey(3),
        out_dir=tmp_path, tag="b",
        runner_kwargs={"use_pallas": "frame", "runs_batch": 2},
        batch_lr_axis=True,
    )
    assert calls["n"] == 1  # the whole lr axis ran as one call
    assert len(results) == 2
    assert len(jsonl.read_text().splitlines()) == 2
    for rec, lr in zip(results, [2.5e-3, 1e-3]):
        assert rec["config"]["lr"] == lr
        assert np.asarray(rec["ser"]).shape == (2, 4, 2)
        assert np.all(np.isfinite(np.asarray(rec["ser"])))
    # the two lr points trained with different lrs -> different results
    assert not np.allclose(results[0]["ser"], results[1]["ser"])
    ser = assemble_mat(results, axes_values, 2, (4,))
    assert ser.shape == (4, 1, 2, 2, 2) and np.all(np.isfinite(ser))


def test_sweep_batch_lr_and_snr_axes(tmp_path, monkeypatch):
    """batch_lr_axis + batch_snr_axis together: a 2-snr x 2-lr grid runs as
    ONE call of 2*2*iters runs; each point's record carries its own config,
    results, and per-point demapper variance (var_real archive key)."""
    import vae_equalizer_tpu.ops.frame_kernel as fk
    from vae_equalizer_tpu.parallel.sweep import run_sweep
    from vae_equalizer_tpu.utils.config import DpConfig

    orig = fk.vae_dp_frame_train_pallas_rb
    monkeypatch.setattr(
        fk, "vae_dp_frame_train_pallas_rb",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    calls = {"n": 0}
    real_vae = dict(run_sweep.__globals__["RUNNERS"])["VAE"]

    def counting(cfg, k, **kw):
        calls["n"] += 1
        return real_vae(cfg, k, **kw)

    monkeypatch.setitem(run_sweep.__globals__["RUNNERS"], "VAE", counting)

    base = DpConfig(mod="4-QAM", num_frames=2, n_frame_max=400,
                    batch_len=100, n_lrhalf=10**6)
    axes = {"snr_db": [20.0, 14.0], "lr": [2.5e-3, 1e-3]}
    results, axes_values, jsonl = run_sweep(
        "VAE", base, axes, iters=1, key=jax.random.PRNGKey(9),
        out_dir=tmp_path, tag="bs",
        runner_kwargs={"use_pallas": "frame", "runs_batch": 2},
        batch_lr_axis=True, batch_snr_axis=True,
    )
    assert calls["n"] == 1  # the whole 2x2 grid ran as one call
    assert len(results) == 4
    vars_seen = {}
    for rec in results:
        assert np.all(np.isfinite(np.asarray(rec["ser"])))
        vars_seen.setdefault(rec["config"]["snr_db"], set()).add(
            float(np.asarray(rec["var"])[0])
        )
    # per-point var tracks the point's OWN snr (not the first point's)
    assert len(vars_seen) == 2
    assert all(len(v) == 1 for v in vars_seen.values())
    v20 = vars_seen[20.0].pop()
    v14 = vars_seen[14.0].pop()
    assert v14 > v20
    ser = assemble_mat(results, axes_values, 1, (4,))
    assert ser.shape == (4, 2, 2, 1, 2) and np.all(np.isfinite(ser))
    var_mat = assemble_mat(results, axes_values, 1, (2,), key="var")
    assert var_mat.shape == (2, 2, 2, 1, 1)


def test_sweep_batch_nu_axis(tmp_path, monkeypatch):
    """batch_nu_axis: a 2-nu grid (uniform + shaped, the reference's nu_vec
    values) runs as ONE call; each point's record carries its own config and
    its own nu-dependent demapper variance."""
    import vae_equalizer_tpu.ops.frame_kernel as fk
    from vae_equalizer_tpu.parallel.sweep import run_sweep
    from vae_equalizer_tpu.utils.config import DpConfig

    orig = fk.vae_dp_frame_train_pallas_rb
    monkeypatch.setattr(
        fk, "vae_dp_frame_train_pallas_rb",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    calls = {"n": 0}
    real_vae = dict(run_sweep.__globals__["RUNNERS"])["VAE"]

    def counting(cfg, k, **kw):
        calls["n"] += 1
        return real_vae(cfg, k, **kw)

    monkeypatch.setitem(run_sweep.__globals__["RUNNERS"], "VAE", counting)

    base = DpConfig(mod="64-QAM", num_frames=2, n_frame_max=400,
                    batch_len=100, n_lrhalf=10**6)
    axes = {"nu": [0.0, 0.0872449]}
    results, axes_values, jsonl = run_sweep(
        "VAE", base, axes, iters=2, key=jax.random.PRNGKey(11),
        out_dir=tmp_path, tag="bn",
        runner_kwargs={"use_pallas": "frame", "runs_batch": 2},
        batch_nu_axis=True,
    )
    assert calls["n"] == 1  # both nu points in one call
    assert len(results) == 2
    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.core.constellation import demapper_noise_var

    for rec in results:
        assert np.all(np.isfinite(np.asarray(rec["ser"])))
        want = demapper_noise_var(
            make_constellation("64-QAM", rec["config"]["nu"]), base.snr_db)
        np.testing.assert_allclose(np.asarray(rec["var"]),
                                   np.full(2, want, np.float32), rtol=1e-6)
    ser = assemble_mat(results, axes_values, 2, (4,))
    assert ser.shape == (4, 2, 2, 2) and np.all(np.isfinite(ser))
