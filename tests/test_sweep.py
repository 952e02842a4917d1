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
