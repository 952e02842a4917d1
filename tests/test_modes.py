"""Kernel-path coverage guard (train/modes.py).

Every (DP runner x use_pallas mode) combination must either run end-to-end
on a tiny workload or raise the documented ValueError — the support matrix
is a single table the drivers and runners both import, so a mode silently
falling back to another path (e.g. CMAbatch ignoring use_pallas=True, a
round-2 gap) cannot reappear.
"""

import jax
import pytest

from vae_equalizer_tpu.train.dp import run_cma_dp, train_vae_dp, train_vae_flex_dp
from vae_equalizer_tpu.train.modes import PALLAS_MODES, check_pallas_mode
from vae_equalizer_tpu.utils.config import DpConfig

_RUNNERS = {
    "VAE": train_vae_dp,
    "VAEflex": train_vae_flex_dp,
    "CMA": run_cma_dp,
    "CMAbatch": run_cma_dp,
    "CMAflex": run_cma_dp,
}
_ALL_MODES = (False, True, "frame")


def _tiny_cfg(loss_type):
    return DpConfig(
        loss_type=loss_type, mod="4-QAM", snr_db=20.0, num_frames=2,
        n_frame_max=600, batch_len=100, flex_step=10, m_est=5, n_lrhalf=170,
    )


def _interpret_kernels(monkeypatch):
    """Force every fused kernel into interpret mode (CPU test backend)."""
    import vae_equalizer_tpu.ops as ops
    import vae_equalizer_tpu.ops.cma_frame_kernel as cfk
    import vae_equalizer_tpu.ops.elbo_kernel as ek
    import vae_equalizer_tpu.ops.frame_kernel as fk

    for mod, name in ((fk, "vae_dp_frame_train_pallas"),
                      (fk, "vae_dp_frame_train_pallas_rb"),
                      (ek, "vae_dp_loss_and_grad_pallas"),
                      (cfk, "cma_chunked_frame_pallas"),
                      (ops, "cma_dp_pallas")):
        orig = getattr(mod, name)
        monkeypatch.setattr(
            mod, name,
            lambda *a, _orig=orig, **k: _orig(*a, **{**k, "interpret": True}),
        )


@pytest.mark.parametrize("mode", _ALL_MODES, ids=str)
@pytest.mark.parametrize("loss_type", sorted(_RUNNERS))
def test_every_mode_runs_or_raises(loss_type, mode, monkeypatch):
    _interpret_kernels(monkeypatch)
    cfg = _tiny_cfg(loss_type)
    runner = _RUNNERS[loss_type]
    kwargs = {"use_pallas": mode}
    if mode in PALLAS_MODES[loss_type]:
        res = runner(cfg, jax.random.PRNGKey(0), **kwargs)
        assert res["ser"].shape[-1] == cfg.num_frames
    else:
        with pytest.raises(ValueError, match="use_pallas"):
            runner(cfg, jax.random.PRNGKey(0), **kwargs)


def test_driver_table_matches_runner_table():
    """The CLI derives its validation from the same table (no drift)."""
    from vae_equalizer_tpu.drivers import eval_run_dp

    src = open(eval_run_dp.__file__).read()
    assert "PALLAS_MODES" in src
    # a frame-capable runner must accept the mode the table promises
    for lt, modes in PALLAS_MODES.items():
        assert False in modes  # XLA path always available
    check_pallas_mode("VAE", "frame")
    with pytest.raises(ValueError, match="unknown loss_type"):
        check_pallas_mode("nope", False)
