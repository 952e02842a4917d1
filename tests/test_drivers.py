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
    assert len(list(tmp_path.glob("sweep_*.jsonl"))) == 1


def test_eval_run_cma_quick(tmp_path):
    from vae_equalizer_tpu.drivers import eval_run_shaping_cma

    eval_run_shaping_cma.main([
        "--quick", "--iters", "2", "--no-mesh", "--out", str(tmp_path),
        "--num-epochs", "10",
    ])
    assert len(list(tmp_path.glob("*.mat"))) == 1
