"""Driver CLIs: in-process --quick runs produce artifacts (fast configs)."""

import numpy as np
import scipy.io as sio


def test_eval_run_dp_vaeflex_quick(tmp_path):
    from vae_equalizer_tpu.drivers import eval_run_dp

    eval_run_dp.main([
        "--quick", "--loss-type", "VAEflex", "--iters", "2", "--no-mesh",
        "--out", str(tmp_path),
    ])
    mats = list(tmp_path.glob("*.mat"))
    assert len(mats) == 1
    d = sio.loadmat(mats[0], simplify_cells=True)["dict"]
    assert np.all(np.isfinite(np.asarray(d["SER"])))
    # archive keys are a superset of the reference's save_dict
    # (Eval_run_DP.py:99-113): Var_est per frame, var_real per point
    ser = np.asarray(d["SER"])
    var_est = np.asarray(d["Var_est"])
    var_real = np.asarray(d["var_real"])
    assert var_est.shape == (2,) + ser.shape[1:]
    # loadmat squeezes the trailing length-1 history axis of var_real
    assert var_real.shape == (2,) + ser.shape[1:-1]
    assert np.all(np.isfinite(var_est)) and np.all(var_real > 0)
    assert len(list(tmp_path.glob("sweep_*.jsonl"))) == 1


def test_eval_run_cma_quick(tmp_path):
    from vae_equalizer_tpu.drivers import eval_run_shaping_cma

    eval_run_shaping_cma.main([
        "--quick", "--iters", "2", "--no-mesh", "--out", str(tmp_path),
        "--num-epochs", "10",
    ])
    assert len(list(tmp_path.glob("*.mat"))) == 1


def test_eval_run_dp_sp_sharded_quick(tmp_path):
    """--sp 2: the sequence-parallel runner behind the standard sweep CLI."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from vae_equalizer_tpu.drivers import eval_run_dp

    eval_run_dp.main([
        "--quick", "--loss-type", "VAE", "--sp", "2", "--iters", "2",
        "--out", str(tmp_path),
    ])
    mats = list(tmp_path.glob("*.mat"))
    assert len(mats) == 1
    d = sio.loadmat(mats[0], simplify_cells=True)["dict"]
    ser = np.asarray(d["SER"])
    assert np.all(np.isfinite(ser))
    # iters rounded up to the dp axis (4 rows on an 8-device, sp=2 mesh)
    assert ser.shape[-2] == 4


def test_eval_run_vaenn_pallas_frame_quick(tmp_path, monkeypatch):
    """--pallas-frame: the whole-experiment NN kernel behind the sweep CLI."""
    import vae_equalizer_tpu.ops.nn_frame_kernel as nfk
    from vae_equalizer_tpu.drivers import eval_run_vaenn

    orig = nfk.vae_nn_experiment_train_pallas
    monkeypatch.setattr(
        nfk, "vae_nn_experiment_train_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    eval_run_vaenn.main([
        "--quick", "--iters", "1", "--no-mesh", "--pallas-frame",
        "--batch-len", "500", "--out", str(tmp_path),
    ])
    mats = list(tmp_path.glob("*.mat"))
    assert len(mats) == 1

    bn_dir = tmp_path / "bn"
    bn_dir.mkdir()
    eval_run_vaenn.main([
        "--quick", "--iters", "1", "--no-mesh", "--pallas-frame",
        "--net-type", "Net_BN", "--batch-len", "500", "--out", str(bn_dir),
    ])
    assert len(list(bn_dir.glob("*.mat"))) == 1
