"""Pallas TPU kernels for the hot compute paths.

Each kernel has an XLA reference implementation in models/ (used as fallback
and for golden tests); the Pallas paths keep the whole recurrence / fusion in
VMEM to eliminate per-step dispatch overhead.
"""

from .cma_kernel import cma_dp_pallas
from .butterfly_kernel import vae_le_dp_forward_pallas

__all__ = ["cma_dp_pallas", "vae_le_dp_forward_pallas"]
