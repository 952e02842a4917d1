"""Kernel-path support matrix: which ``use_pallas`` modes each DP runner takes.

Single source of truth shared by the runners (train/dp.py raises the
documented ValueError for unsupported combinations instead of silently
ignoring the flag) and the sweep CLI (drivers/eval_run_dp.py derives its
argument validation from this table); tests/test_modes.py asserts every
(runner x mode) combination either runs or raises this error.

Modes:
  False    — pure-XLA path (lax.scan over minibatch steps / the CMA
             recurrence); always available.
  True     — fused per-step Pallas kernel (ops/elbo_kernel.py for the VAE
             family, ops/cma_kernel.py for plain CMA); sps=2, odd M.
  "frame"  — whole-frame MXU kernel: ALL of a frame's minibatch steps (and
             Adam, where the algorithm has one) in one pallas_call
             (ops/frame_kernel.py); sps=2, odd M.
"""

from __future__ import annotations

__all__ = ["PALLAS_MODES", "check_pallas_mode"]

PALLAS_MODES: dict[str, tuple] = {
    "VAE": (False, True, "frame"),
    "VAEflex": (False, True, "frame"),
    # per-symbol CMA has no chunk structure to fuse ("frame" N/A); its
    # per-symbol recurrence kernel is mode True (ops/cma_kernel.py)
    "CMA": (False, True),
    "CMAbatch": (False, "frame"),
    "CMAflex": (False, "frame"),
}


def check_pallas_mode(loss_type: str, use_pallas) -> None:
    """Raise the documented ValueError for an unsupported kernel path."""
    allowed = PALLAS_MODES.get(loss_type)
    if allowed is None:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    if use_pallas not in allowed:
        raise ValueError(
            f"use_pallas={use_pallas!r} is not supported for {loss_type} "
            f"(supported modes: {allowed}); see train/modes.py"
        )
